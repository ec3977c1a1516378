"""A/B: 8-bit-native one-hot compares for the histogram scan.

Motivation: the steady tick is VPU-bound on one-hot generation (~5 G lane-ops
/tick at 256 streams — docs/PERFORMANCE.md "Speed-of-light").  The current
formulation compares i32 lanes (`hi == iota32`) and casts to i8 for the MXU.
TPU packs int8 at 4 elements per 32-bit lane (min tile (32, 128) vs f32's
(8, 128)), so IF the vectorizer executes i8 compares at packed rate, an
i8-native compare chain cuts the one-hot generation floor up to 4x.

Arms (all exact-count equivalent, asserted):
  current   — i32 compare -> i8 cast (production, ops/histogram.py)
  i8cmp     — cast hi/lo to i8 first, compare i8 == iota8
  u8native  — hi/lo computed IN u8 from the raw channels (hi = (r>>4)*4 +
              (g>>6), lo = ((g>>4)&3)*16 + (b>>4)), no i32 anywhere;
              padding uses 255 (>= 64, never matches)
  sparse64  — K=64 sparse-model counts (ops/histogram.sparse_hist_counts),
              the sparseHist serving path's scan, for scale

Run on the chip: python tools/exp_i8_compare.py --streams 256
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.ops import histogram as hg

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))

    N, n, block = args.streams, args.iters, args.block
    H, W = 240, 320
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    acc0 = jnp.zeros((N, 4096), jnp.float32)
    iota8 = jax.lax.broadcasted_iota(jnp.int8, (1, 64), 1)

    def hist_current(frame):
        return hg.histogram_scan(hg.rgb_bins(frame), block=block)

    def hist_i8cmp(frame):
        flat = hg.rgb_bins(frame).reshape(-1)
        blocks = hg._blocked(flat, block)

        def body(acc, blk):
            hi = (blk >> 6).astype(jnp.int8)[:, None]
            lo = (blk & 63).astype(jnp.int8)[:, None]
            oh_hi = (hi == iota8).astype(jnp.int8)
            oh_lo = (lo == iota8).astype(jnp.int8)
            h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + h, None

        h64, _ = jax.lax.scan(body, jnp.zeros((64, 64), jnp.int32), blocks)
        return h64.reshape(4096).astype(jnp.float32)

    def hist_u8native(frame):
        # bin = r4*256 + g4*16 + b4;  hi = bin>>6 = r4*4 + g4>>2;
        # lo = bin&63 = (g4&3)*16 + b4 — all u8 arithmetic, no i32 lanes
        r, g, b = frame[..., 0], frame[..., 1], frame[..., 2]
        hi = ((r >> 4) * jnp.uint8(4) + (g >> 6)).reshape(-1)
        lo = (((g >> 4) & jnp.uint8(3)) * jnp.uint8(16) + (b >> 4)).reshape(-1)
        P = hi.shape[0]
        nb = -(-P // block)
        pad = nb * block - P
        hi = jnp.pad(hi, (0, pad), constant_values=255).reshape(nb, block)
        lo = jnp.pad(lo, (0, pad), constant_values=255).reshape(nb, block)
        iota_u8 = jax.lax.broadcasted_iota(jnp.uint8, (1, 64), 1)

        def body(acc, xs):
            bh, bl = xs
            oh_hi = (bh[:, None] == iota_u8).astype(jnp.int8)
            oh_lo = (bl[:, None] == iota_u8).astype(jnp.int8)
            h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + h, None

        h64, _ = jax.lax.scan(body, jnp.zeros((64, 64), jnp.int32), (hi, lo))
        return h64.reshape(4096).astype(jnp.float32)

    sbins = jnp.asarray(rng.choice(4096, 64, replace=False).astype(np.int32))

    def hist_sparse64(frame):
        c = hg.sparse_hist_counts(hg.rgb_bins(frame), sbins, block=block)
        return jnp.zeros((4096,), jnp.float32).at[:64].set(c)

    arms = [("current", hist_current), ("i8cmp", hist_i8cmp),
            ("u8native", hist_u8native), ("sparse64", hist_sparse64)]

    # correctness (single frame, on-backend)
    ref = np.asarray(hist_current(frames[0]))
    for name, fn in arms[1:-1]:
        got = np.asarray(fn(frames[0]))
        assert np.array_equal(ref, got), f"{name} mismatch"
    sp = np.asarray(hist_sparse64(frames[0]))[:64]
    assert np.array_equal(sp, ref[np.asarray(sbins)]), "sparse64 mismatch"
    print("# correctness: all arms exact", file=_sys.stderr)

    progs = {}
    for name, fn in arms:
        vfn = jax.vmap(fn)

        @jax.jit
        def scan_fn(acc, frames, vfn=vfn):
            def body(m, _):
                return m + vfn(frames) * 1e-30, None
            m, _ = jax.lax.scan(body, acc, None, length=n)
            return m

        m = scan_fn(acc0, frames)
        np.asarray(m[0, 0])
        progs[name] = scan_fn
    times = {k: [] for k in progs}
    for _ in range(args.reps):
        for name, fn in progs.items():
            t0 = time.time()
            m = fn(acc0, frames)
            np.asarray(m[0, 0])
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ms = 1000 * np.asarray(ts) / n
        print(f"{name:10s} {ms.mean():.3f} ms/tick (min {ms.min():.3f})")


if __name__ == "__main__":
    main()
