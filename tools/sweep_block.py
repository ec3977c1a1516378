"""Sweep the hist/pdf scan block size (ops/histogram.histogram_and_pdf).

The camshift pixel scans walk 320x240 = 76,800 pixels in blocks; the block
size trades scan-step count against one-hot transient size.  Times the fused
hist+pdf pass at serving batch size for candidate blocks.

Run:  python tools/sweep_block.py --streams 256 --iters 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--blocks", type=str, default="4096,8192,12800,19200,38400")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from headtrackr_tpu.ops import histogram as hg

    N = args.streams
    H, W = 240, 320
    n = args.iters
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
    bins = jnp.asarray(hg.rgb_bins(jnp.asarray(frames_np)))
    mh0 = jnp.ones((N, 4096), jnp.float32)

    for blk in [int(b) for b in args.blocks.split(",")]:
        @jax.jit
        def scan_fn(mh, bins, blk=blk):
            def body(m, _):
                cur, pdf = jax.vmap(
                    lambda b, mm: hg.histogram_and_pdf(b, mm, block=blk)
                )(bins, m)
                return cur + pdf[:, :1, :1].sum() * 1e-30, None
            m, _ = jax.lax.scan(body, mh, None, length=n)
            return m

        out = scan_fn(mh0, bins)
        np.asarray(out[0, 0])  # compile + run
        t0 = time.time()
        out = scan_fn(mh0, bins)
        np.asarray(out[0, 0])
        dt = time.time() - t0
        print(f"block {blk:6d}: {1000 * dt / n:.2f} ms/tick", flush=True)


if __name__ == "__main__":
    main()
