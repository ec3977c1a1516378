"""Empirical band-sizing rule: smallest escape-free band vs tracked size.

For a range of blob (face-proxy) sizes, run band-local camshift directly
(mc.track_band, no detector needed) on a moving-blob clip and report, per
band arm, the escape rate and the steady search-window size.  Escape
behavior is hardware-independent -> CPU is fine:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/exp_band_rule.py

The output grounds the BatchedTracker band sizing guidance: a band must
hold the 1.1x-grown search window plus the per-tick mean-shift trajectory
and the 8-aligned re-centering slack.
"""

import os as _os
import sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _ROOT)

import argparse

import numpy as np


def blob_clip(H, W, s, ticks, rng):
    """Moving colored blob of size s on a textured background."""
    frames = []
    bg = rng.integers(60, 90, (H, W, 3), dtype=np.uint8)
    x0, y0 = 40, (H - s) // 2
    for t in range(ticks):
        f = bg.copy()
        x = x0 + 2 * t
        f[y0:y0 + s, x:x + s] = (210, 120, 60)
        frames.append(f)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="16,32,56,80")
    ap.add_argument("--bands", type=str,
                    default="40x64,48x64,64x96,80x128,96x128,128x192")
    ap.add_argument("--ticks", type=int, default=40)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    bands = []
    for tok in args.bands.split(","):
        h, w = tok.split("x")
        bands.append((int(h), int(w)))

    import jax
    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import camshift as mc

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    H, W = 240, 320
    rng = np.random.default_rng(7)
    clips = {s: blob_clip(H, W, s, args.ticks, rng) for s in sizes}

    steps = {}
    for band in bands:
        steps[band] = jax.jit(lambda s_, f_, b=band: mc.track_band(
            s_, f_, True, band=b))
    full = jax.jit(lambda s_, f_: mc.track(s_, f_, True))

    for s in sizes:
        frames = clips[s]
        st0 = mc.init_tracker(
            jnp.asarray(frames[0]),
            jnp.asarray((40, (H - s) // 2, s, s), jnp.int32))
        # steady window size from the full-frame path
        stf = st0
        for f in frames[1:]:
            stf, _ = full(stf, jnp.asarray(f))
        win = np.asarray(stf.window)
        line = [f"blob {s:3d}px -> search window {win[2]}x{win[3]}:"]
        for band in bands:
            st = st0
            nesc = 0
            for f in frames[1:]:
                st2, esc = steps[band](st, jnp.asarray(f))
                e = bool(np.asarray(esc))
                nesc += e
                if e:  # serving recomputes full-frame; mirror it
                    st, _ = full(st, jnp.asarray(f))
                else:
                    st = st2
            tag = "ok" if nesc == 0 else f"{nesc}esc"
            line.append(f"{band[0]}x{band[1]}={tag}")
        print(" ".join(line), flush=True)


if __name__ == "__main__":
    main()
