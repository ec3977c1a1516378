"""A/B: combined 128-lane one-hot vs two 64-wide one-hots for hist/pdf.

Motivation: the full-frame histogram chain is ~2.6 ms of the 5.8 ms serving
tick (tools/exp_step_split.py) and is VPU-bound on the one-hot comparisons:
a (P, 64) operand occupies (8, 128) tiles HALF-EMPTY, so every
compare/cast op on it costs the same cycles as a full (P, 128) op.

Combined formulation: ONE (P, 128) operand E with
    E[:, j]      = (hi == j)         j < 64
    E[:, 64+j]   = (lo == j)
built as  E = (where(iota128 < 64, hi, 64 + lo) == iota128)   [select+eq+cast
= 3 full-width ops vs 2x(eq+cast) = 4].  Then

    hist64x64 = (E^T E)[0:64, 64:128]     -- one 128x128 MXU tile, same
                                             passes as the padded 64x64 dot
    pdf       = rowsum((E @ M) * E),  M = [[0, W], [0, 0]]

Fusion hazard (ops/histogram.py docstring): one-hot DOT operands must stay
single-consumer or XLA materializes them to HBM (measured 5x).  E^T E uses E
as both dot operands — this experiment measures whether that still fuses.

Run on the chip: python tools/exp_hist_combined.py --streams 256
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

_HI = 64


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
    P = H * W
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    mh0 = jnp.ones((N, 4096), jnp.float32)

    iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def hist_current(bins):
        return hg.histogram_scan(bins, block=block)

    def hist_combined(bins):
        flat = bins.reshape(-1)
        blocks = hg._blocked(flat, block)

        def body(acc, blk):
            hi = (blk >> 6)[:, None]
            lo = (blk & 63)[:, None]
            idx = jnp.where(iota128 < 64, hi, 64 + lo)
            E = (idx == iota128).astype(jnp.int8)
            h128 = jax.lax.dot_general(E, E, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            return acc + h128, None

        h128, _ = jax.lax.scan(body, jnp.zeros((128, 128), jnp.int32), blocks)
        return h128[0:64, 64:128].reshape(4096).astype(jnp.float32)

    def histpdf_current(mh, bins):
        cur, pdf = hg.histogram_and_pdf(bins, mh, block=block)
        return cur + pdf.reshape(-1)[:4096]

    def histpdf_combined(mh, bins):
        cur = hist_combined(bins)
        wts = hg.backprojection_weights(mh, cur)
        Wm = wts.reshape(64, 64)
        M = jnp.zeros((128, 128), jnp.float32).at[0:64, 64:128].set(Wm)
        flat = bins.reshape(-1)
        blocks = hg._blocked(flat, block)

        def body(_, blk):
            hi = (blk >> 6)[:, None]
            lo = (blk & 63)[:, None]
            idx = jnp.where(iota128 < 64, hi, 64 + lo)
            E = (idx == iota128).astype(jnp.float32)
            R = jax.lax.dot_general(E, M, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return None, jnp.sum(R * E, axis=1)

        _, pdf = jax.lax.scan(body, None, blocks)
        return cur + pdf.reshape(-1)[:4096]

    # correctness first (tiny, on-chip)
    bins1 = hg.rgb_bins(frames[0])
    a = np.asarray(hist_current(bins1))
    b = np.asarray(hist_combined(bins1))
    assert np.array_equal(a, b), "combined hist mismatch"
    pa = np.asarray(histpdf_current(mh0[0], bins1))
    pb = np.asarray(histpdf_combined(mh0[0], bins1))
    err = np.abs(pa - pb).max() / max(np.abs(pa).max(), 1e-9)
    print(f"# correctness: hist exact, hist+pdf rel err {err:.2e} "
          f"(bf16 dot rounding differences expected)", file=_sys.stderr)

    def timed_pair(name1, fn1, name2, fn2, two_arg):
        progs = {}
        for name, fn in ((name1, fn1), (name2, fn2)):
            if two_arg:
                vfn = jax.vmap(fn, in_axes=(0, 0))

                @jax.jit
                def scan_fn(mh, frames, vfn=vfn):
                    def body(m, _):
                        bins = hg.rgb_bins(frames)
                        r = vfn(m, bins)
                        return m + r * 1e-30, None
                    m, _ = jax.lax.scan(body, mh, None, length=n)
                    return m
                args_ = (mh0, frames)
            else:
                vfn = jax.vmap(fn)

                @jax.jit
                def scan_fn(mh, frames, vfn=vfn):
                    def body(m, _):
                        bins = hg.rgb_bins(frames)
                        r = vfn(bins)
                        return m + r * 1e-30, None
                    m, _ = jax.lax.scan(body, mh, None, length=n)
                    return m
                args_ = (mh0, frames)
            m = scan_fn(*args_)
            np.asarray(m[0, 0])
            progs[name] = (scan_fn, args_)
        times = {k: [] for k in progs}
        for _ in range(args.reps):
            for name, (fn, a_) in progs.items():
                t0 = time.time()
                m = fn(*a_)
                np.asarray(m[0, 0])
                times[name].append(time.time() - t0)
        for name, ts in times.items():
            ms = 1000 * np.asarray(ts) / n
            print(f"{name:22s} {ms.mean():.3f} ms/tick (min {ms.min():.3f})")

    print("== hist only ==")
    timed_pair("hist_current", hist_current, "hist_combined", hist_combined,
               two_arg=False)
    print("== hist + full-frame pdf ==")
    timed_pair("histpdf_current", histpdf_current,
               "histpdf_combined", histpdf_combined, two_arg=True)


if __name__ == "__main__":
    main()
