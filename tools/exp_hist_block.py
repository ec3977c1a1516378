"""Experiment: histogram scan block size inside the real band track step.

The full-frame histogram is the biggest in-context cost of the steady tick
(~2.6 ms of 5.16, tools/exp_step_split.py).  The scan runs 5 blocks of
15,360 px; fewer/bigger blocks shorten the sequential carry chain (the
one-hot transients stay fused either way — or OOM, which this measures).

Run on the chip: python tools/exp_hist_block.py --streams 256
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--blocks", type=str, default="15360,38400,76800")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from headtrackr_tpu.models import camshift as cs
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig

    N, n = args.streams, args.iters
    H, W = 240, 320
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    casc = frontalface()
    state1 = ft.init_state(True)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + np.shape(x)).copy(), state1)
    win = jnp.tile(jnp.asarray([100, 80, 50, 50], jnp.int32), (N, 1))
    state = state._replace(cs=state.cs._replace(window=win),
                           mode=jnp.full((N,), ft.MODE_CS, jnp.int32))
    for blk in [int(b) for b in args.blocks.split(",")]:
        # NOTE: monkeypatching cs.histogram_scan with functools.partial(
        # block=blk) is a silent no-op here — track_band passes
        # block=config.histBlock explicitly and a call-site keyword
        # overrides the partial's.  The config knob is the real path.
        cfg = TrackerConfig(ui=False, histBlock=blk)
        step1 = ft.make_step(casc, cfg, (H, W), "track", band=cs.DEFAULT_BAND)
        vstep = jax.vmap(step1)

        @jax.jit
        def scan_fn(st, frames):
            def body(s, _):
                s2, out, esc = vstep(s, frames)
                return s2, None
            s, _ = jax.lax.scan(body, st, None, length=n)
            return s
        try:
            st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
            np.asarray(st.mode)
            t0 = time.time()
            st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
            np.asarray(st.mode)
            dt = time.time() - t0
            print(f"hist_block={blk:6d}  {1000 * dt / n:.3f} ms/tick")
        except Exception as e:  # OOM etc.
            print(f"hist_block={blk:6d}  FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
