"""Pallas kernel experiments for the camshift hist+pdf hot path.

Measures candidate kernel formulations on the real chip at serving batch.
The target layout: bins arrive as (N, R, 512) i32 lane-chunks; one-hots are
built TRANSPOSED as (64, 512) tiles (sublane-iota broadcast compares) so the
MXU contracts over the lane (pixel) dim and no reshapes/relayouts happen.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_experiments.py
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = args.streams
    P = 240 * 320                      # px/stream
    CH = 512                           # lane chunk
    R = P // CH                        # 150 chunks/stream
    K = args.iters
    rng = np.random.default_rng(0)

    bins_np = rng.integers(0, 4096, (N, R, CH)).astype(np.int32)
    bins = jnp.asarray(bins_np)
    model_np = rng.integers(1, 200, (N, 64, 64)).astype(np.float32)
    model = jnp.asarray(model_np)

    def timed(name, jfn, *fargs):
        if args.only and args.only not in name:
            return
        t0 = time.time()
        out = jfn(*fargs)
        s0 = float(np.asarray(jnp.sum(out[0] if isinstance(out, tuple)
                                      else out)))
        tc = time.time() - t0
        t0 = time.time()
        out = jfn(*fargs)
        s = float(np.asarray(jnp.sum(out[0] if isinstance(out, tuple)
                                     else out)))
        dt = time.time() - t0
        print(f"{name:46s} {dt / K * 1000:8.3f} ms/tick  "
              f"(compile+1st {tc:.1f}s, chk {s:.4e})")

    # ---------------- k1: hist kernel, bf16 transposed one-hots ------------
    BR = 30  # rows of 512 px per grid step (15360 px)

    def hist_kernel_w(bins_ref, out_ref, acc):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        jj = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0)

        def row(i, _):
            bb = bins_ref[0, pl.ds(i, 1), :]  # (1, CH)
            a_hi = ((bb >> 6) == jj).astype(jnp.bfloat16)   # (64, CH)
            a_lo = ((bb & 63) == jj).astype(jnp.bfloat16)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, BR, row, 0)

        @pl.when(r == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc[:]

    def hist_call_w(b):
        return pl.pallas_call(
            hist_kernel_w,
            grid=(N, R // BR),
            in_specs=[pl.BlockSpec((1, BR, CH), lambda n, r: (n, r, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, 64), lambda n, r: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32)],
        )(b)

    def loopK(fn, x):
        def body(i, acc):
            h = fn(x + acc)
            return (jnp.sum(h) % 2).astype(jnp.int32)
        return jax.jit(lambda xx: jax.lax.fori_loop(
            0, K, body, jnp.int32(0)))

    timed("k1 hist kernel (bf16 transposed one-hot)",
          loopK(hist_call_w, bins), bins)

    # correctness check vs numpy (CPU reference on small slice)
    h = np.asarray(hist_call_w(bins))[0].reshape(-1)
    want = np.bincount(bins_np[0].reshape(-1), minlength=4096)
    ok = np.array_equal(h.astype(np.int64), want)
    print(f"   k1 exactness vs bincount: {ok}")

    # ---------------- k2: fused hist+pdf kernel ----------------------------
    def hp_kernel(bins_ref, model_ref, hist_ref, pdf_ref, acc, w0, w1, w2):
        n, phase, r = (pl.program_id(0), pl.program_id(1), pl.program_id(2))

        @pl.when((phase == 0) & (r == 0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        BRl = bins_ref.shape[1]
        jj = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0)

        @pl.when(phase == 0)
        def _():
            def row(i, _):
                bb = bins_ref[0, pl.ds(i, 1), :]
                a_hi = ((bb >> 6) == jj).astype(jnp.bfloat16)
                a_lo = ((bb & 63) == jj).astype(jnp.bfloat16)
                acc[:] += jax.lax.dot_general(
                    a_hi, a_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0
            jax.lax.fori_loop(0, BRl, row, 0)

            @pl.when(r == pl.num_programs(2) - 1)
            def _():
                cur = acc[:]
                hist_ref[0] = cur
                m = model_ref[0]
                wt = jnp.where(cur > 0, jnp.minimum(m / cur, 1.0), 0.0)
                a = wt.astype(jnp.bfloat16)
                bres = (wt - a.astype(jnp.float32)).astype(jnp.bfloat16)
                c = (wt - a.astype(jnp.float32)
                     - bres.astype(jnp.float32)).astype(jnp.bfloat16)
                w0[:] = a
                w1[:] = bres
                w2[:] = c

        @pl.when(phase == 1)
        def _():
            ones = jnp.ones((1, 64), jnp.bfloat16)

            def row(i, _):
                bb = bins_ref[0, pl.ds(i, 1), :]
                a_hi = ((bb >> 6) == jj).astype(jnp.bfloat16)
                a_lo = ((bb & 63) == jj).astype(jnp.bfloat16)
                # B_k = W_k^T @ a_hi  (64k, CH); exact per-plane bf16 values
                total = jnp.zeros((1, CH), jnp.float32)
                for wk in (w0, w1, w2):
                    Bk = jax.lax.dot_general(
                        wk[:], a_hi, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (64, CH)
                    masked = Bk.astype(jnp.bfloat16) * a_lo  # exact products
                    total += jax.lax.dot_general(
                        ones, masked, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (1, CH)
                pdf_ref[0, pl.ds(i, 1), :] = total
                return 0
            jax.lax.fori_loop(0, BRl, row, 0)

    def hp_call(b, m):
        return pl.pallas_call(
            hp_kernel,
            grid=(N, 2, R // BR),
            in_specs=[
                pl.BlockSpec((1, BR, CH), lambda n, p, r: (n, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 64, 64), lambda n, p, r: (n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 64, 64), lambda n, p, r: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, CH), lambda n, p, r: (n, r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
                jax.ShapeDtypeStruct((N, R, CH), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32),
                            pltpu.VMEM((64, 64), jnp.bfloat16),
                            pltpu.VMEM((64, 64), jnp.bfloat16),
                            pltpu.VMEM((64, 64), jnp.bfloat16)],
        )(b, m)

    def loopK2(fn, x, m):
        def body(i, acc):
            h, p = fn(x + acc, m)
            return (jnp.sum(p) % 2).astype(jnp.int32)
        return jax.jit(lambda xx, mm: jax.lax.fori_loop(
            0, K, body, jnp.int32(0)))

    timed("k2 fused hist+pdf kernel (exact f32 pdf)",
          loopK2(hp_call, bins, model), bins, model)

    # correctness vs f64 numpy
    hh, pp = hp_call(bins, model)
    hh0 = np.asarray(hh)[0]
    pp0 = np.asarray(pp)[0].reshape(-1)
    cur = np.bincount(bins_np[0].reshape(-1), minlength=4096).astype(
        np.float64).reshape(64, 64)
    wt = np.where(cur > 0, np.minimum(model_np[0] / cur, 1.0), 0.0)
    want_pdf = wt.reshape(-1)[bins_np[0].reshape(-1)]
    want_f32 = np.where(cur > 0, np.minimum(
        model_np[0].astype(np.float32) / cur.astype(np.float32), 1.0),
        0.0).reshape(-1)[bins_np[0].reshape(-1)]
    print(f"   k2 hist exact: {np.array_equal(hh0.reshape(64, 64), cur)}; "
          f"pdf == f32 ref: {np.array_equal(pp0, want_f32)}; "
          f"max|pdf-f64|: {np.abs(pp0 - want_pdf).max():.2e}")


if __name__ == "__main__":
    main()
