"""Experiment: MXU-tile packing for the full-frame histogram pass.

The serving histogram dot is (block, 64)^T @ (block, 64) -> (64, 64) per
stream: M = N = 64 engages only 25% of the 128x128 MXU tile.  Packing TWO
streams per dot widens both one-hot factors to 128 columns (cols 64j + v for
stream j of the pair): the (128, 128) product's DIAGONAL 64x64 blocks are
exactly the two streams' histograms (each row of a factor has one nonzero
per stream, so off-diagonal blocks are cross-stream counts, discarded).
2x the MACs for 2 streams in fully-used tiles: wins iff the pass is
tile-bound rather than MAC-bound.

Also measures a bf16 variant of the baseline (f32 accum is exact for 0/1
products up to 2^24).

Run on the chip: python tools/exp_hist_pack.py --streams 256
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
    ap.add_argument("--block", type=int, default=15360)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from headtrackr_tpu.ops import histogram as hg

    N, n, block = args.streams, args.iters, args.block
    H, W = 240, 320
    P = H * W
    nb = P // block
    rng = np.random.default_rng(0)
    bins_np = rng.integers(0, 4096, (N, P), dtype=np.int32)
    bins = jnp.asarray(bins_np.reshape(N, nb, block))

    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.time() - t0
        print(f"{name:26s} {1000 * dt / n:.3f} ms/tick")

    def one_hots(blk, dtype, width=64, off_hi=0, off_lo=0):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        hi = ((blk >> 6) + off_hi)[:, None]
        lo = ((blk & 63) + off_lo)[:, None]
        return (hi == iota).astype(dtype), (lo == iota).astype(dtype)

    # --- baseline: per-stream int8 (the production formulation)
    def hist1_int8(bins_blk):
        def body(acc, blk):
            oh_hi, oh_lo = one_hots(blk, jnp.int8)
            h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + h, None
        acc, _ = jax.lax.scan(body, jnp.zeros((64, 64), jnp.int32), bins_blk)
        return acc

    @jax.jit
    def base_scan(bins):
        def tick(c, _):
            h = jax.vmap(hist1_int8)(bins)
            return c + h[:, :1, :1].sum(), None
        c, _ = jax.lax.scan(tick, jnp.int32(0), None, length=n)
        return c

    timed("baseline_int8_64x64", base_scan, bins)

    # --- bf16 one-hots, f32 accum
    def hist1_bf16(bins_blk):
        def body(acc, blk):
            oh_hi, oh_lo = one_hots(blk, jnp.bfloat16)
            h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return acc + h, None
        acc, _ = jax.lax.scan(body, jnp.zeros((64, 64), jnp.float32), bins_blk)
        return acc

    @jax.jit
    def bf16_scan(bins):
        def tick(c, _):
            h = jax.vmap(hist1_bf16)(bins)
            return c + h[:, :1, :1].sum(), None
        c, _ = jax.lax.scan(tick, jnp.float32(0), None, length=n)
        return c

    timed("baseline_bf16_64x64", bf16_scan, bins)

    # --- paired: 2 streams per dot, 128x128 product, diagonal blocks kept
    bins_pairs = jnp.asarray(bins_np.reshape(N // 2, 2, nb, block))

    def hist2_int8(pair_blk):  # (2, nb, block)
        def body(acc, blk2):  # blk2: (2, block)
            a_hi, a_lo = one_hots(blk2[0], jnp.int8, 128, 0, 0)
            b_hi, b_lo = one_hots(blk2[1], jnp.int8, 128, 64, 64)
            oh_hi = a_hi + b_hi
            oh_lo = a_lo + b_lo
            h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + h, None
        acc, _ = jax.lax.scan(body, jnp.zeros((128, 128), jnp.int32),
                              pair_blk.transpose(1, 0, 2))
        return acc[:64, :64], acc[64:, 64:]

    @jax.jit
    def pair_scan(bins_pairs):
        def tick(c, _):
            ha, hb = jax.vmap(hist2_int8)(bins_pairs)
            return c + ha[:, :1, :1].sum() + hb[:, :1, :1].sum(), None
        c, _ = jax.lax.scan(tick, jnp.int32(0), None, length=n)
        return c

    timed("paired_int8_128x128", pair_scan, bins_pairs)

    # correctness: paired == baseline on a small case
    hb = jax.vmap(hist1_int8)(bins[:2])
    ha2, hb2 = hist2_int8(bins_pairs[0])
    np.testing.assert_array_equal(np.asarray(hb[0]), np.asarray(ha2))
    np.testing.assert_array_equal(np.asarray(hb[1]), np.asarray(hb2))
    print("paired == baseline: OK")


if __name__ == "__main__":
    main()
