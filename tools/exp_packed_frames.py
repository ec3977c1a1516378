"""Experiment: frame layout for the camshift bins compute.

exp_step_split measured ~2.3 ms/tick (40% of the band track step) in the
rgb->bins step.  Hypothesis: extracting channels from the trailing size-3
axis of (N, H, W, 3) u8 frames is a lane-layout disaster (the minor axis
tiles onto 128 lanes); a u32-PACKED frame (one word per pixel, like the
browser's RGBA ImageData) makes bins pure VPU shifts on a clean layout.

Run on the chip: python tools/exp_packed_frames.py --streams 256
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from headtrackr_tpu.ops import histogram as hg

    N, n = args.streams, args.iters
    H, W = 240, 320
    rng = np.random.default_rng(0)
    rgb_np = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
    packed_np = (rgb_np[..., 0].astype(np.uint32)
                 | (rgb_np[..., 1].astype(np.uint32) << 8)
                 | (rgb_np[..., 2].astype(np.uint32) << 16))
    rgb = jnp.asarray(rgb_np)
    packed = jnp.asarray(packed_np)

    def bins_u32(p):
        v = p.astype(jnp.int32)
        return (256 * ((v >> 4) & 0xF) + 16 * ((v >> 12) & 0xF)
                + ((v >> 20) & 0xF))

    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.time() - t0
        print(f"{name:22s} {1000 * dt / n:.3f} ms/tick")

    @jax.jit
    def bins_rgb_scan(rgb):
        def body(c, _):
            b = jax.vmap(hg.rgb_bins)(rgb)
            return c + b[:, ::37, ::41].sum(), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return c

    @jax.jit
    def bins_u32_scan(packed):
        def body(c, _):
            b = jax.vmap(bins_u32)(packed)
            return c + b[:, ::37, ::41].sum(), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return c

    @jax.jit
    def hist_rgb_scan(rgb):
        def body(c, _):
            h = jax.vmap(lambda f: hg.histogram_scan(hg.rgb_bins(f)))(rgb)
            return c + h[:, :1].sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    @jax.jit
    def hist_u32_scan(packed):
        def body(c, _):
            h = jax.vmap(lambda p: hg.histogram_scan(bins_u32(p)))(packed)
            return c + h[:, :1].sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    # bins agree
    b1 = np.asarray(jax.vmap(hg.rgb_bins)(rgb[:2]))
    b2 = np.asarray(jax.vmap(bins_u32)(packed[:2]))
    np.testing.assert_array_equal(b1, b2)
    print("bins_u32 == rgb_bins: OK")

    timed("bins_from_rgb(N,H,W,3)", bins_rgb_scan, rgb)
    timed("bins_from_u32(N,H,W)", bins_u32_scan, packed)
    timed("hist_from_rgb", hist_rgb_scan, rgb)
    timed("hist_from_u32", hist_u32_scan, packed)


if __name__ == "__main__":
    main()
