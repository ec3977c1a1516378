"""Pallas kernel experiments for the camshift hist+pdf hot path (round 2).

Lessons so far (measured on the chip, see git history):
  - XLA one-hot scan: hist 4.3 ms, hist+pdf 6.8 ms @ 256 streams.
  - Row-by-row (1, 512) kernel: WORSE (7-29 ms) — 150 tiny ops/stream.
  - This file: big lane-chunk layout (N, C, 19200): C large broadcast
    compares + MXU contractions per stream.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_experiments.py
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
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--planes", type=int, default=3)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = args.streams
    P = 240 * 320
    C = args.chunks                    # chunks per stream
    CH = P // C                        # 19200 lanes per chunk
    NPLANES = args.planes
    K = args.iters
    rng = np.random.default_rng(0)

    bins_np = rng.integers(0, 4096, (N, C, CH)).astype(np.int32)
    bins = jnp.asarray(bins_np)
    model_np = rng.integers(1, 200, (N, 64, 64)).astype(np.float32)
    model = jnp.asarray(model_np)

    def timed(name, jfn, *fargs):
        if args.only and args.only not in name:
            return
        t0 = time.time()
        out = jfn(*fargs)
        s0 = float(np.asarray(out))
        tc = time.time() - t0
        t0 = time.time()
        out = jfn(*fargs)
        s = float(np.asarray(out))
        dt = time.time() - t0
        print(f"{name:46s} {dt / K * 1000:8.3f} ms/tick  "
              f"(compile+1st {tc:.1f}s, chk {s:.4e})")

    def onehots_i(bins_ref, k, jji):
        bb = bins_ref[0, pl.ds(k, 1), :]                      # (1, CH) i32
        a_hi = ((bb >> 6) == jji).astype(jnp.bfloat16)        # (64, CH)
        a_lo = ((bb & 63) == jji).astype(jnp.bfloat16)
        return a_hi, a_lo

    # ---------------- k3: hist kernel, big-chunk one-hots ------------------
    def hist_kernel(bins_ref, out_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        jji = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0)

        def chunk(k, _):
            a_hi, a_lo = onehots_i(bins_ref, k, jji)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, C, chunk, 0)
        out_ref[0] = acc[:]

    def hist_call(b):
        return pl.pallas_call(
            hist_kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32)],
        )(b)

    def loopK(fn, x):
        def body(i, acc):
            h = fn(x + acc)
            return (jnp.sum(h) % 2).astype(jnp.int32)
        return jax.jit(lambda xx: jax.lax.fori_loop(0, K, body, jnp.int32(0)))

    timed("k3 hist kernel (big-chunk cmp)", loopK(hist_call, bins), bins)

    h = np.asarray(hist_call(bins))[0].reshape(-1)
    want = np.bincount(bins_np[0].reshape(-1), minlength=4096)
    print(f"   k3 exactness: {np.array_equal(h.astype(np.int64), want)}")

    # ---------------- k4: fused hist+pdf, big chunks ------------------------
    def hp_kernel(bins_ref, model_ref, hist_ref, pdf_ref, acc, wp):
        jji = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0)
        acc[:] = jnp.zeros_like(acc)

        def chunk0(k, _):
            a_hi, a_lo = onehots_i(bins_ref, k, jji)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, C, chunk0, 0)
        cur = acc[:]
        hist_ref[0] = cur
        wt = jnp.where(cur > 0, jnp.minimum(model_ref[0] / cur, 1.0), 0.0)
        rem = wt
        for i in range(NPLANES):
            p = rem.astype(jnp.bfloat16)
            wp[pl.ds(64 * i, 64), :] = p
            rem = rem - p.astype(jnp.float32)

        ones = jnp.ones((1, 64), jnp.bfloat16)

        def chunk1(k, _):
            a_hi, a_lo = onehots_i(bins_ref, k, jji)
            total = jnp.zeros((1, CH), jnp.float32)
            for i in range(NPLANES):
                Bk = jax.lax.dot_general(
                    wp[pl.ds(64 * i, 64), :], a_hi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (64, CH)
                masked = Bk.astype(jnp.bfloat16) * a_lo       # exact products
                total += jax.lax.dot_general(
                    ones, masked, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (1, CH)
            pdf_ref[0, pl.ds(k, 1), :] = total
            return 0

        jax.lax.fori_loop(0, C, chunk1, 0)

    def hp_call(b, m):
        return pl.pallas_call(
            hp_kernel,
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
                jax.ShapeDtypeStruct((N, C, CH), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32),
                            pltpu.VMEM((64 * NPLANES, 64), jnp.bfloat16)],
        )(b, m)

    def loopK2(fn, x, m):
        def body(i, acc):
            h, p = fn(x + acc, m)
            return (jnp.sum(p) % 2).astype(jnp.int32)
        return jax.jit(lambda xx, mm: jax.lax.fori_loop(
            0, K, body, jnp.int32(0)))

    timed(f"k4 fused hist+pdf ({NPLANES} weight planes)",
          loopK2(hp_call, bins, model), bins, model)

    hh, pp = hp_call(bins, model)
    hh0 = np.asarray(hh)[0]
    pp0 = np.asarray(pp)[0].reshape(-1)
    cur = np.bincount(bins_np[0].reshape(-1), minlength=4096).astype(
        np.float64).reshape(64, 64)
    wt64 = np.where(cur > 0, np.minimum(model_np[0] / cur, 1.0), 0.0)
    want_pdf = wt64.reshape(-1)[bins_np[0].reshape(-1)]
    print(f"   k4 hist exact: {np.array_equal(hh0.reshape(64, 64), cur)}; "
          f"max|pdf-f64|: {np.abs(pp0 - want_pdf).max():.2e}")


def extra():
    """Round-3 variants: packed compares, stacked planes, take_along probe."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--extra", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = args.streams
    P = 240 * 320
    C = args.chunks
    CH = P // C
    K = args.iters
    rng = np.random.default_rng(0)
    bins_np = rng.integers(0, 4096, (N, C, CH)).astype(np.int32)
    bins = jnp.asarray(bins_np)
    model_np = rng.integers(1, 200, (N, 64, 64)).astype(np.float32)
    model = jnp.asarray(model_np)

    def timed(name, jfn, *fargs):
        if args.only and args.only not in name:
            return
        t0 = time.time()
        s0 = float(np.asarray(jfn(*fargs)))
        tc = time.time() - t0
        t0 = time.time()
        s = float(np.asarray(jfn(*fargs)))
        dt = time.time() - t0
        print(f"{name:46s} {dt / K * 1000:8.3f} ms/tick  "
              f"(compile+1st {tc:.1f}s, chk {s:.4e})")

    def loopK(fn, x, *rest):
        def body(i, acc):
            outs = fn(x + acc, *rest)
            h = outs[0] if isinstance(outs, (tuple, list)) else outs
            return (jnp.sum(h) % 2).astype(jnp.int32)
        return jax.jit(lambda *a: jax.lax.fori_loop(0, K, body, jnp.int32(0)))

    jjb = None

    # --- k5: hist with bf16 compares ---
    def hist_k5(bins_ref, out_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        jj = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0).astype(jnp.bfloat16)

        def chunk(k, _):
            bb = bins_ref[0, pl.ds(k, 1), :]
            hi = (bb >> 6).astype(jnp.bfloat16)
            lo = (bb & 63).astype(jnp.bfloat16)
            a_hi = (hi == jj).astype(jnp.bfloat16)
            a_lo = (lo == jj).astype(jnp.bfloat16)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, C, chunk, 0)
        out_ref[0] = acc[:]

    def mk_call(kern, extra_scratch=()):
        return pl.pallas_call(
            kern, grid=(N,),
            in_specs=[pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32)]
            + list(extra_scratch))

    want = np.bincount(bins_np[0].reshape(-1), minlength=4096)
    try:
        timed("k5 hist bf16 compares", loopK(mk_call(hist_k5), bins), bins)
        h = np.asarray(mk_call(hist_k5)(bins))[0].reshape(-1)
        print(f"   k5 exactness: {np.array_equal(h.astype(np.int64), want)}")
    except Exception as e:
        print(f"k5 hist bf16 compares: UNSUPPORTED ({str(e)[:120]})")

    # --- k6: hist with int8 compares + int8 matmul ---
    def hist_k6(bins_ref, out_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        jj8 = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0).astype(jnp.int8)

        def chunk(k, _):
            bb = bins_ref[0, pl.ds(k, 1), :]
            hi = (bb >> 6).astype(jnp.int8)
            lo = (bb & 63).astype(jnp.int8)
            a_hi = (hi == jj8).astype(jnp.int8)
            a_lo = (lo == jj8).astype(jnp.int8)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, C, chunk, 0)
        out_ref[0] = acc[:]

    try:
        timed("k6 hist int8 compares+matmul", loopK(mk_call(hist_k6), bins),
              bins)
        h = np.asarray(mk_call(hist_k6)(bins))[0].reshape(-1)
        print(f"   k6 exactness: {np.array_equal(h.astype(np.int64), want)}")
    except Exception as e:
        print(f"k6 hist int8 compares: UNSUPPORTED ({str(e)[:120]})")

    # --- k7: fused, bf16 compares + stacked 192-row weight matmul ---
    def hp_k7(bins_ref, model_ref, hist_ref, pdf_ref, acc, wp):
        jj = jax.lax.broadcasted_iota(jnp.int32, (64, CH), 0)
        jj3 = jax.lax.broadcasted_iota(jnp.int32, (192, CH), 0) % 64
        acc[:] = jnp.zeros_like(acc)

        def ohs(k):
            bb = bins_ref[0, pl.ds(k, 1), :]
            return bb >> 6, bb & 63

        def chunk0(k, _):
            hi, lo = ohs(k)
            a_hi = (hi == jj).astype(jnp.bfloat16)
            a_lo = (lo == jj).astype(jnp.bfloat16)
            acc[:] += jax.lax.dot_general(
                a_hi, a_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, C, chunk0, 0)
        cur = acc[:]
        hist_ref[0] = cur
        wt = jnp.where(cur > 0, jnp.minimum(model_ref[0] / cur, 1.0), 0.0)
        rem = wt
        for i in range(3):
            p = rem.astype(jnp.bfloat16)
            wp[pl.ds(64 * i, 64), :] = p
            rem = rem - p.astype(jnp.float32)

        ones = jnp.ones((1, 192), jnp.bfloat16)

        def chunk1(k, _):
            hi, lo = ohs(k)
            a_hi = (hi == jj).astype(jnp.bfloat16)
            a_lo3 = (lo == jj3).astype(jnp.bfloat16)      # (192, CH)
            # stacked planes: one matmul (192,64)@(64,CH)
            B = jax.lax.dot_general(
                wp[:], a_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (192, CH)
            masked = B.astype(jnp.bfloat16) * a_lo3
            total = jax.lax.dot_general(
                ones, masked, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (1, CH)
            pdf_ref[0, pl.ds(k, 1), :] = total
            return 0

        jax.lax.fori_loop(0, C, chunk1, 0)

    def hp7_call(b, m):
        return pl.pallas_call(
            hp_k7, grid=(N,),
            in_specs=[
                pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, 64, 64), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, CH), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((N, 64, 64), jnp.float32),
                jax.ShapeDtypeStruct((N, C, CH), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32),
                            pltpu.VMEM((192, 64), jnp.bfloat16)],
        )(b, m)

    def loopK2(fn, x, m):
        def body(i, acc):
            h, p = fn(x + acc, m)
            return (jnp.sum(p) % 2).astype(jnp.int32)
        return jax.jit(lambda xx, mm: jax.lax.fori_loop(
            0, K, body, jnp.int32(0)))

    try:
        timed("k7 fused stacked planes",
              loopK2(hp7_call, bins, model), bins, model)
        hh, pp = hp7_call(bins, model)
        pp0 = np.asarray(pp)[0].reshape(-1)
        cur = want.astype(np.float64).reshape(64, 64)
        wt64 = np.where(cur > 0, np.minimum(model_np[0] / cur, 1.0), 0.0)
        want_pdf = wt64.reshape(-1)[bins_np[0].reshape(-1)]
        print(f"   k7 max|pdf-f64|: {np.abs(pp0 - want_pdf).max():.2e}")
    except Exception as e:
        print(f"k7 fused stacked planes: FAILED ({str(e)[:160]})")

    # --- k8: take_along_axis probe (lane gather within 64-wide rows) ---
    def ta_kernel(rows_ref, idx_ref, out_ref):
        r = rows_ref[:]                # (8, 128) f32
        i = idx_ref[:]                 # (8, 128) i32 in [0,128)
        out_ref[:] = jnp.take_along_axis(r, i, axis=1)

    def ta_call(r, i):
        return pl.pallas_call(
            ta_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(r, i)

    try:
        r = jnp.asarray(rng.random((8, 128)).astype(np.float32))
        ii = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))
        got = np.asarray(ta_call(r, ii))
        ok = np.array_equal(got, np.take_along_axis(
            np.asarray(r), np.asarray(ii), axis=1))
        print(f"k8 take_along_axis in Mosaic: works, exact={ok}")
    except Exception as e:
        print(f"k8 take_along_axis in Mosaic: FAILS ({type(e).__name__}: "
              f"{str(e)[:200]})")


if __name__ == "__main__":
    import sys
    if "--extra" in sys.argv:
        extra()
    else:
        main()
