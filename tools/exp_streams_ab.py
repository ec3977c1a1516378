"""Root-cause rig for the 512-stream scaling regression (VERDICT r2 weak #3).

Same-process, interleaved-repetition timing of the real run_scan workload at
several stream counts (tunnel noise hits all arms equally), plus an optional
piece-stubbed split (tools/exp_step_split.py style) of the band track step at
each N so a superlinear piece stands out.

r2 observation: 256 streams -> 39.7k fps but 512 -> 31.8k (per-stream tick
cost +25%) from separate bench runs; bench-to-bench spread on this tunnel
reached 11%, so the first job is to confirm the regression in-process.

Run on the chip:
  python tools/exp_streams_ab.py --streams 128,256,512
  python tools/exp_streams_ab.py --streams 256,512 --split
"""

import os as _os
import sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _ROOT)

import argparse
import importlib.util
import time

import numpy as np


def load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def split_at(N, iters=20):
    """Piece-stubbed marginal costs of the band track step at batch N.

    NOTE: the no_hist/no_pdf/no_ms stubs mirror tools/exp_step_split.py's
    (minus no_bins) — if _mean_shift_core or the scan signatures change,
    update BOTH."""
    import jax
    import jax.numpy as jnp
    from headtrackr_tpu.models import camshift as cs
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig

    H, W = 240, 320
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    cfg = TrackerConfig(ui=False)
    casc = frontalface()
    state1 = ft.init_state(True)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + np.shape(x)).copy(), state1)
    win = jnp.tile(jnp.asarray([100, 80, 50, 50], jnp.int32), (N, 1))
    state = state._replace(cs=state.cs._replace(window=win),
                           mode=jnp.full((N,), ft.MODE_CS, jnp.int32))

    real = dict(hist=cs.histogram_scan, pdf=cs.pdf_scan,
                ms=cs._mean_shift_core, bins=cs.rgb_bins)

    def stub(name):
        if name == "no_hist":
            cs.histogram_scan = lambda b, block=None: jnp.ones(
                (4096,), jnp.float32)
        elif name == "no_pdf":
            cs.pdf_scan = lambda b, w, block=None, exact=False: jnp.zeros(
                b.shape, jnp.float32)
        elif name == "no_ms":
            def fake_ms(pdf, window, exact, ry, rx, H_, W_):
                z = jnp.float32(0.0)
                mom = dict(m00=z, m10=z, m01=z, m11=z, m20=z, m02=z,
                           invM00=jnp.float32(jnp.inf), xc=z, yc=z,
                           mu20=z, mu02=z, mu11=z)
                return window, mom, jnp.bool_(True), jnp.bool_(False)
            cs._mean_shift_core = fake_ms

    def restore():
        cs.histogram_scan = real["hist"]
        cs.pdf_scan = real["pdf"]
        cs._mean_shift_core = real["ms"]
        cs.rgb_bins = real["bins"]

    res = {}
    for name in ("full", "no_hist", "no_pdf", "no_ms"):
        restore()
        stub(name)
        step1 = ft.make_step(casc, cfg, (H, W), "track", band=cs.DEFAULT_BAND)
        vstep = jax.vmap(step1)

        @jax.jit
        def scan_fn(st, frames):
            def body(s, _):
                s2, out, esc = vstep(s, frames)
                return s2, None
            s, _ = jax.lax.scan(body, st, None, length=iters)
            return s
        st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
        np.asarray(st.mode)
        t0 = time.time()
        st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
        np.asarray(st.mode)
        res[name] = 1000 * (time.time() - t0) / iters
    restore()
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=str, default="256,512")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=8)
    ap.add_argument("--split", action="store_true",
                    help="also piece-split the band track step at each N")
    ap.add_argument("--split-only", action="store_true",
                    help="skip the serving arms; just run the piece-split "
                         "(isolates raw step scaling from scheduler/fanout)")
    ap.add_argument("--escape-stats", action="store_true",
                    help="also count band escapes per tick at each N "
                         "(r3 measured: 0 at 256 and 512 on the bench "
                         "workload)")
    ap.add_argument("--overload", type=str, default="full",
                    help="comma list of overload policies to arm ('full', "
                         "'rotate'): 'rotate' drops the full-batch detect "
                         "branch from the program — tests whether that "
                         "branch's buffer reservation is what degrades the "
                         "whole serving program at large N")
    ap.add_argument("--band", type=str, default="auto",
                    help="comma list of band arms: 'auto' | 'none' | "
                         "explicit HxW sizes (e.g. '128x192,96x160,64x128' "
                         "for the band-size sweep); 'both' = auto,none")
    args = ap.parse_args()
    sizes = [int(s) for s in args.streams.split(",")]
    if args.split_only:
        import headtrackr_tpu as ht
        ht.enable_compilation_cache(_os.environ.get(
            "HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
        for N in sizes:
            res = split_at(N)
            parts = " ".join(f"{k}={v:.2f}" for k, v in res.items())
            print(f"split N={N}: {parts} ms/tick", flush=True)
        return
    if args.band == "both":
        bands = ["auto", None]
    else:
        bands = [cs.parse_band(t) for t in args.band.split(",")]
    overloads = args.overload.split(",")

    import jax
    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ftm

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    bench = load_bench()

    H, W = 240, 320
    rng = np.random.default_rng(0)
    arms = {}
    pools = {}
    for N in sizes:
        pool_np = bench.build_pool(N, H, W, args.pool, 4, rng)
        t0 = time.time()
        pool = jnp.asarray(pool_np)
        np.asarray(pool[0, 0, 0, 0])
        print(f"# N={N}: pool upload {time.time() - t0:.0f}s", file=_sys.stderr)
        pools[N] = pool
        for band in bands:
          for ovl in overloads:
            t0 = time.time()
            bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                                   bucket=args.bucket, band=band,
                                   overload=ovl)
            bt.warmup(scan_len=args.pool, host_sched=False)
            for _ in range(16):
                bt.step_auto(pool[0])
            locked = (bt.modes == ftm.MODE_CS).mean()
            print(f"# N={N} band={band} ovl={ovl}: compile+lock "
                  f"{time.time() - t0:.0f}s, {100 * locked:.0f}% locked",
                  file=_sys.stderr)
            bt.run_scan(pool)
            np.asarray(bt.modes)
            arms[(N, band, ovl)] = bt

    times = {k: [] for k in arms}
    for rep in range(args.reps):
        for key, bt in arms.items():
            pool = pools[key[0]]
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[key].append(time.time() - t0)
    for key, bt in arms.items():
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# arm {key}: {100 * locked:.0f}% locked after timed reps",
              file=_sys.stderr)
    base = None
    for (N, band, ovl), ts in times.items():
        ms = 1000 * np.asarray(ts) / args.pool
        fps = N * args.pool / np.asarray(ts)
        per = ms.min() / N  # min = least tunnel noise
        if base is None:
            base = per
        print(f"N={N:4d} band={str(band):10s} ovl={ovl:6s}: "
              f"{ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}) -> {fps.mean():.0f} fps mean / "
              f"{fps.max():.0f} best; per-stream {1000 * per:.1f} us "
              f"(x{per / base:.2f} vs first)")

    if args.escape_stats:
        # Escape-rate measurement per band arm: escaped ticks pay the
        # compacted full-frame recompute (escape_bucket), so a band that is
        # too small for the workload's window sizes loses its pdf savings.
        from headtrackr_tpu.models import camshift as csm
        from headtrackr_tpu.models import facetracker as ftb

        for (N, band, ovl) in list(arms):
            if ovl != overloads[0] or band is None:
                continue
            bt = arms[(N, band, ovl)]
            bsz = csm.DEFAULT_BAND if band == "auto" else band
            banded = jax.jit(jax.vmap(ftb.make_step(
                bt.cascade, bt.config, (H, W), "track", band=bsz)))
            st = bt.state
            pool = pools[N]
            nesc = tick_esc = 0
            for t in range(args.pool):
                st, out, esc = banded(st, pool[t])
                e = np.asarray(esc)
                nesc += int(e.sum())
                tick_esc += int(e.any())
            print(f"escapes N={N} band={band}: {nesc} stream-ticks "
                  f"({100 * nesc / (N * args.pool):.2f}%/stream), "
                  f"{tick_esc}/{args.pool} ticks had >=1 escape "
                  f"(fallback rate {100 * tick_esc / args.pool:.0f}%)")

    if args.split:
        # free the serving arms before the split compiles
        del arms
        for N in sizes:
            res = split_at(N)
            parts = " ".join(f"{k}={v:.2f}" for k, v in res.items())
            print(f"split N={N}: {parts} ms/tick")


if __name__ == "__main__":
    main()
