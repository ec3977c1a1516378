"""Band-arm pre-qualification: escape rates + parity on the bench workload.

Escape behavior is hardware-independent (it depends on window sizes and
mean-shift trajectories, not on timing), so this runs fine on CPU while the
chip is busy/down:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/exp_band_escape.py \
        --bands 128x192,96x160,96x128,80x128

For each band arm it counts stream-tick escapes over --passes pool passes
and asserts that non-escaped streams' windows bit-match the full-frame step
(the band-local contract, models/camshift.track_band).  Arms with ~0%
escapes are safe to take to the on-chip timing sweep (exp_streams_ab.py);
an arm that escapes every tick would pay the cost-bounded recompute and
lose its pdf savings.
"""

import os as _os
import sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _ROOT)

import argparse
import importlib.util
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--bands", type=str, default="128x192,96x160,96x128,80x128")
    args = ap.parse_args()
    bands = []
    for tok in args.bands.split(","):
        h, w = tok.split("x")
        bands.append((int(h), int(w)))

    import jax
    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    H, W = 240, 320
    N = args.streams
    rng = np.random.default_rng(0)
    pool = jnp.asarray(bench.build_pool(N, H, W, args.pool, 0, rng))

    config = TrackerConfig()
    cascade = ht.cascade()
    full = jax.jit(jax.vmap(ft.make_step(cascade, config, (H, W), "full")))
    track = jax.jit(jax.vmap(ft.make_step(cascade, config, (H, W), "track")))

    s1 = ft.init_state(config.whitebalancing)
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + x.shape).copy(), s1)
    t0 = time.time()
    for _ in range(17):
        st, out = full(st, pool[0])
    locked = (np.asarray(out.mode_after) == ft.MODE_CS).mean()
    ww = np.asarray(st.cs.window)
    print(f"# lock {time.time() - t0:.0f}s, {100 * locked:.0f}% locked; "
          f"window w {ww[:, 2].min()}-{ww[:, 2].max()} "
          f"h {ww[:, 3].min()}-{ww[:, 3].max()}", file=_sys.stderr)

    for band in bands:
        banded = jax.jit(jax.vmap(ft.make_step(
            cascade, config, (H, W), "track", band=band)))
        sb = jax.tree_util.tree_map(jnp.copy, st)
        sf = jax.tree_util.tree_map(jnp.copy, st)
        nesc = ticks_esc = mismatches = 0
        total = args.passes * args.pool
        for t in range(total):
            f = pool[t % args.pool]
            sb, ob, esc = banded(sb, f)
            sf, of = track(sf, f)
            e = np.asarray(esc)
            nesc += int(e.sum())
            ticks_esc += int(e.any())
            wb_ = np.asarray(sb.cs.window)
            wf_ = np.asarray(sf.cs.window)
            bad = (~e) & (wb_ != wf_).any(axis=1)
            mismatches += int(bad.sum())
            if e.any():
                # serving would recompute escaped streams full-frame; mirror
                # that so the arms stay comparable on later ticks
                sb = jax.tree_util.tree_map(
                    lambda b, f_: jnp.where(
                        jnp.reshape(esc, (N,) + (1,) * (b.ndim - 1)), f_, b),
                    sb, sf)
        print(f"band={band[0]}x{band[1]}: {nesc} escape stream-ticks "
              f"({100 * nesc / (N * total):.2f}%/stream), "
              f"{ticks_esc}/{total} ticks with >=1 escape, "
              f"{mismatches} non-escaped window mismatches "
              f"{'OK' if mismatches == 0 else 'FAIL'}")


if __name__ == "__main__":
    main()
