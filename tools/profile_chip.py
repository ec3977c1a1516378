"""Per-stage camshift timings on the real chip (axon TPU).

Times jitted stages at serving batch size by chaining K iterations inside one
program (fori_loop with a data dependency) and pulling one scalar to host —
block_until_ready returns at enqueue on axon, so the host pull is the only
honest sync.  Usage:  python tools/profile_chip.py  (axon env by default).
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
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from headtrackr_tpu.models import camshift as mc
    from headtrackr_tpu.ops import histogram as oh

    N = args.streams
    H, W = args.hw
    K = args.iters
    rng = np.random.default_rng(0)

    bins_np = rng.integers(0, 4096, (N, H, W)).astype(np.int32)
    model_np = rng.integers(0, 200, (N, 4096)).astype(np.float32)
    pdf_np = rng.random((N, H, W)).astype(np.float32)
    win_np = np.tile(np.array([100, 80, 60, 70], np.int32), (N, 1))

    bins = jnp.asarray(bins_np)
    model = jnp.asarray(model_np)
    pdf = jnp.asarray(pdf_np)
    win = jnp.asarray(win_np)

    def timed(name, fn, *fargs):
        """fn(*fargs) -> array; loops K times with a dependency chain."""
        if args.only and args.only not in name:
            return

        def loop(a0, rest):
            def body(i, acc):
                out = fn(acc, *rest)
                return out
            return body(0, a0) if K == 1 else jax.lax.fori_loop(
                0, K, lambda i, acc: fn(acc, *rest), a0)

        jfn = jax.jit(loop)
        t0 = time.time()
        out = jfn(fargs[0], fargs[1:])
        s0 = float(np.asarray(jnp.sum(out)))  # sync (incl. compile)
        tc = time.time() - t0
        t0 = time.time()
        out = jfn(fargs[0], fargs[1:])
        s = float(np.asarray(jnp.sum(out)))
        dt = time.time() - t0
        per = (dt) / K * 1000
        print(f"{name:42s} {per:8.3f} ms/tick   (compile+1st {tc:.1f}s, "
              f"chk {s:.3e})")
        return per

    vm = jax.vmap

    def chain_i(x, v):
        """Mix a data-dependent parity into x (uint/int) - not foldable."""
        return x + (jnp.sum(v.astype(jnp.float32)) % 2).astype(x.dtype)

    # --- stage: histogram only (current int8 one-hot scan) ---
    def hist_only(b, m):
        h = vm(oh.histogram_4096)(b)
        return chain_i(b, h)

    timed("hist_4096 (one int8 matmul whole frame)", hist_only, bins, model)

    # --- stage: current fused hist+pdf scan ---
    def hp(b, m):
        cur, p = vm(oh.histogram_and_pdf)(b, m)
        return chain_i(b, p)

    timed("histogram_and_pdf (current scan)", hp, bins, model)

    # --- stage: pdf only (given weights) ---
    def pdf_only(b, m):
        wts = vm(oh.backprojection_weights)(m, m + 1)
        p = vm(oh.backprojection_pdf)(b, wts)
        return chain_i(b, p)

    timed("backprojection_pdf (f32 one-hot matmul)", pdf_only, bins, model)

    # --- stage: marginal planes ---
    def marg(p, w):
        cc, rc = vm(mc._marginal_planes)(p)
        return chain_i(p, cc) + chain_i(p, rc) - p

    timed("marginal_planes (2 tri matmuls)", marg, pdf, win)

    # --- stage: full mean_shift (marginals + 10 iters + 2nd moments) ---
    def ms(p, w):
        nw, mom, zm = vm(mc.mean_shift)(p, w)
        return chain_i(p, nw)

    timed("mean_shift (planes+loop+2nd moments)", ms, pdf, win)

    # --- stage: full camshift track step ---
    def full(frames_u8, st):
        st2, p = vm(lambda s, f: mc.track(s, f, True))(st, frames_u8)
        return chain_i(frames_u8, st2.track_x)

    frames_u8 = jnp.asarray(rng.integers(0, 255, (N, H, W, 3), np.uint8))
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (N,) + np.shape(x)).copy(),
        mc.CamshiftState(model_hist=jnp.zeros((4096,), jnp.float32),
                         window=jnp.array([100, 80, 60, 70], jnp.int32),
                         track_x=jnp.int32(0), track_y=jnp.int32(0),
                         track_w=jnp.int32(0), track_h=jnp.int32(0),
                         track_angle=jnp.float32(0)))
    timed("camshift track (full step)", full, frames_u8, st)

    # --- variant: pdf via 4x int8 byte-plane matmuls (exact f32) ---
    def pdf_bytes(b, m):
        wts = vm(oh.backprojection_weights)(m, m + 1)
        Wm = wts.reshape(N, 64, 64)
        bits = jax.lax.bitcast_convert_type(Wm, jnp.uint8)  # (N,64,64,4)
        flat = b.reshape(N, -1)
        P = flat.shape[1]
        block = 7680
        nb = P // block
        blocks = flat.reshape(N, nb, block)

        def one_stream(blk, byt):
            def body(_, bb):
                hi = (bb >> 6)[:, None]
                lo = (bb & 63)[:, None]
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
                oh_hi = (hi == iota).astype(jnp.int8)
                oh_lo = (lo == iota).astype(jnp.int8)
                outs = []
                for k in range(4):
                    pk = (byt[..., k].astype(jnp.int32) - 128).astype(jnp.int8)
                    rows = jnp.dot(oh_hi, pk,
                                   preferred_element_type=jnp.int32)
                    v = jnp.sum(rows * oh_lo.astype(jnp.int32), axis=1) + 128
                    outs.append(v.astype(jnp.uint32) << (8 * k))
                word = outs[0] | outs[1] | outs[2] | outs[3]
                return None, jax.lax.bitcast_convert_type(
                    word, jnp.float32)
            _, out = jax.lax.scan(body, None, blk)
            return out

        p = vm(one_stream)(blocks, bits)
        return chain_i(b, p)

    timed("pdf via 4x int8 byte planes (exact f32)", pdf_bytes, bins, model)

    # --- variant: hist via bf16 one-hots ---
    def hist_bf16(b, m):
        flat = b.reshape(N, -1)

        def one(bb):
            hi = (bb >> 6)[:, None]
            lo = (bb & 63)[:, None]
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
            oh_hi = (hi == iota).astype(jnp.bfloat16)
            oh_lo = (lo == iota).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        h = vm(one)(flat)
        return chain_i(b, h)

    timed("hist via bf16 one-hot (1 matmul)", hist_bf16, bins, model)


if __name__ == "__main__":
    main()
