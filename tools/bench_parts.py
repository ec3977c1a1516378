"""Component microbenchmark for the serving track step (real chip).

Breaks the steady-state tick into parts and times each as a device-side
lax.scan (one dispatch + one host pull per part, so the ~27 ms relay RTT
amortizes over N iterations).  Prints ms/tick for the 256-stream batch.

Run:  python tools/bench_parts.py --streams 256 --iters 30
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--parts", type=str, default="all",
                    help="comma list: rtt,h2d,track,trackband,bandparts,"
                         "histpdf,hist,pdfonly,meanshift,dispatch,bucket")
    args = ap.parse_args()
    want = set(args.parts.split(",")) if args.parts != "all" else None

    def on(name):
        return want is None or name in want

    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.models import camshift as cshift
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.ops import histogram as hg

    N = args.streams
    H, W = 240, 320
    n = args.iters
    rng = np.random.default_rng(0)
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    frames_np = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)

    # --- RTT: pull a tiny ready array
    tiny = jnp.zeros((1,), jnp.int32) + 1
    np.asarray(tiny)
    t0 = time.time()
    for _ in range(10):
        np.asarray(tiny)
    rtt = (time.time() - t0) / 10
    print(f"rtt_pull_ms {1000 * rtt:.2f}")

    def timed(name, fn, *a):
        """fn jitted; time n==1 scan-internal iterations (fn already scans)."""
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)  # compile + run once
        t0 = time.time()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.time() - t0 - rtt
        print(f"{name}_ms_per_tick {1000 * dt / n:.3f}")
        return dt

    # --- H2D: fresh host->device transfers, amortized sync
    if on("h2d"):
        bufs = [rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
                for _ in range(8)]
        x = jnp.asarray(bufs[0])
        np.asarray(x[0, 0, 0, 0])
        t0 = time.time()
        k = 16
        for i in range(k):
            x = jnp.asarray(bufs[i % 8])
        np.asarray(x[0, 0, 0, 0])
        dt = time.time() - t0 - rtt
        mb = N * H * W * 3 / 1e6
        print(f"h2d_ms_per_batch {1000 * dt / k:.3f}  "
              f"({mb:.1f} MB, {mb * k / dt / 1000:.2f} GB/s)")

    frames = jnp.asarray(frames_np)

    # --- full track step (CS fast path), scan-chained via state carry
    bt = None
    if on("track") or on("trackband") or on("bucket") or on("dispatch"):
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False)

    if on("trackband"):
        stepb1 = ft.make_step(bt.cascade, bt.config, (H, W), "track",
                              band=cshift.DEFAULT_BAND)
        vstepb = jax.vmap(stepb1)

        @jax.jit
        def trackband_scan(state, frames):
            def body(s, _):
                s2, out, esc = vstepb(s, frames)
                return s2, None
            s, _ = jax.lax.scan(body, state, None, length=n)
            return s
        timed("track_band_step", trackband_scan, bt.state, frames)

    if on("bandparts"):
        # incremental pieces of track_band (differences give the split):
        # bins+hist -> +weights+slice+bandpdf -> +meanshift -> full step
        from headtrackr_tpu.ops.histogram import (backprojection_weights,
                                                  histogram_scan, pdf_scan)
        bh, bw = cshift.DEFAULT_BAND
        mh0 = jnp.ones((N, 4096), jnp.float32)
        win0 = jnp.tile(jnp.asarray([100, 80, 50, 50], jnp.int32), (N, 1))

        def upto_hist(mh, frame):
            bins = hg.rgb_bins(frame)
            return histogram_scan(bins)

        def upto_pdf(mh, frame):
            bins = hg.rgb_bins(frame)
            cur = histogram_scan(bins)
            wts = backprojection_weights(mh, cur)
            band_bins = jax.lax.dynamic_slice(bins, (jnp.int32(56),
                                                     jnp.int32(64)), (bh, bw))
            return pdf_scan(band_bins, wts).sum() + cur

        def upto_ms(mh, frame):
            bins = hg.rgb_bins(frame)
            cur = histogram_scan(bins)
            wts = backprojection_weights(mh, cur)
            band_bins = jax.lax.dynamic_slice(bins, (jnp.int32(56),
                                                     jnp.int32(64)), (bh, bw))
            pdf = pdf_scan(band_bins, wts)
            win, m, zm, esc = cshift._mean_shift_core(
                pdf, win0[0], False, jnp.int32(56), jnp.int32(64), H, W)
            return cur + win[0].astype(jnp.float32)

        for name, fn1 in (("bins_hist", upto_hist), ("plus_band_pdf", upto_pdf),
                          ("plus_meanshift", upto_ms)):
            vfn = jax.vmap(fn1, in_axes=(0, 0))

            @jax.jit
            def scan_fn(mh, frames, vfn=vfn):
                def body(m, _):
                    r = vfn(m, frames)
                    return m + r[:, :1] * 1e-30, None
                m, _ = jax.lax.scan(body, mh, None, length=n)
                return m
            timed(name, scan_fn, mh0, frames)

    if on("track"):
        step1 = ft.make_step(bt.cascade, bt.config, (H, W), "track")
        vstep = jax.vmap(step1)

        @jax.jit
        def track_scan(state, frames):
            def body(s, _):
                s2, out = vstep(s, frames)
                return s2, None
            s, _ = jax.lax.scan(body, state, None, length=n)
            return s
        timed("track_step", track_scan, bt.state, frames)

    # --- hist + pdf (the camshift pixel scans), chained via model-hist carry
    bins = jnp.asarray(hg.rgb_bins(frames))
    mh0 = jnp.ones((N, 4096), jnp.float32)
    if on("histpdf"):
        @jax.jit
        def histpdf_scan(mh, bins):
            def body(m, _):
                cur, pdf = jax.vmap(hg.histogram_and_pdf)(bins, m)
                return cur + pdf[:, :1, :1].sum() * 1e-30, None
            m, _ = jax.lax.scan(body, mh, None, length=n)
            return m
        timed("hist_pdf", histpdf_scan, mh0, bins)

    if on("hist"):
        @jax.jit
        def hist_scan(mh, bins):
            def body(m, _):
                cur, _pdf = jax.vmap(hg.histogram_and_pdf)(bins, m)
                # consume only cur: XLA DCEs the pdf scan
                return cur, None
            m, _ = jax.lax.scan(body, mh, None, length=n)
            return m
        timed("hist_only", hist_scan, mh0, bins)

    if on("pdfonly"):
        @jax.jit
        def pdf_scan(mh, bins):
            w = hg.backprojection_weights(mh, mh * 0.5)

            def body(carry, _):
                pdf = jax.vmap(hg.backprojection_pdf)(bins, w + carry[:, None])
                return pdf[:, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.float32), None,
                                length=n)
            return c
        timed("pdf_only", pdf_scan, mh0, bins)

    # --- mean-shift (marginal planes + 10 iters + second moments)
    if on("meanshift"):
        pdf0 = jnp.asarray(rng.random((N, H, W), np.float32))
        win0 = jnp.tile(jnp.asarray([100, 80, 60, 60], jnp.int32), (N, 1))

        @jax.jit
        def ms_scan(win, pdf):
            def body(w, _):
                w2, m, _z = jax.vmap(cshift.mean_shift)(pdf, w)
                return w2, None
            w, _ = jax.lax.scan(body, win, None, length=n)
            return w
        timed("meanshift", ms_scan, win0, pdf0)

    # --- per-dispatch host overhead (trivial program, no scan)
    if on("dispatch"):
        @jax.jit
        def nop(s):
            return s + 1
        x = nop(jnp.zeros((N,), jnp.int32))
        np.asarray(x)
        t0 = time.time()
        for _ in range(50):
            x = nop(x)
        np.asarray(x)
        dt = time.time() - t0 - rtt
        print(f"dispatch_ms_per_call {1000 * dt / 50:.3f}")

    # --- bucket add-on: the full WB/VJ/CS step at several batch sizes
    if on("bucket"):
        full1 = ft.make_step(bt.cascade, bt.config, (H, W), "full")
        vfull = jax.vmap(full1)
        for nb in (8, 32, 128, N):
            if nb > N:
                continue
            sub = jax.tree_util.tree_map(lambda a: a[:nb], bt.state)

            @jax.jit
            def full_scan(state, frames):
                def body(s, _):
                    s2, out = vfull(s, frames)
                    return s2, None
                s, _ = jax.lax.scan(body, state, None, length=n)
                return s
            timed(f"full_step_{nb}", full_scan, sub, frames[:nb])


if __name__ == "__main__":
    main()
