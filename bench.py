"""Benchmark: batched detect+track serving throughput on one chip.

Headline metric (BASELINE.md): 320x240 frames/sec/chip through the full
pipeline on 256 concurrent streams.  The workload is honest serving
(VERDICT r1 item 3):

  - every tick processes a DIFFERENT frame batch: a staged pool of
    ``--pool`` batches in which each stream's face moves +-2 px/tick along a
    ping-pong path (camshift re-localizes every tick; no tick reuses the
    previous tick's pixels);
  - a track-loss fraction is injected: each pool pass, ``--loss-streams``
    streams get one blue frame -> zero backprojection mass -> "redetecting"
    -> VJ relock, so the bucketed redetect program runs inside the timed
    region (~1/pool of ticks pay the detector);
  - scheduling is ON DEVICE (BatchedTracker.run_scan: top_k bucket +
    lax.cond per tick, ``--scan`` ticks per dispatch) — the throughput
    serving mode; a separate phase measures per-tick latency (step_auto +
    host sync every tick) and reports p50/p99.

Host->device: this rig's axon tunnel moves H2D at ~0.04 GB/s at ALL transfer
sizes and thread counts (tools/bench_h2d.py) — ~3 orders of magnitude below a
production PCIe link — so full-rate per-tick H2D is physically impossible here
(256 streams x 230 kB = 59 MB/tick would be ~1.4 s of wire time alone).  The
pool is therefore staged on device before the timed loop, and ``--h2d`` runs a
separate small-stream-count phase that times true end-to-end ingest (fresh
host frames through jnp.asarray every tick) and prints the measured rate next
to the wire ceiling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 20000 (the driver's v5e target; the JS reference
publishes no numbers and its loop is capped at ~50 fps/stream).

Run on the real chip:  python bench.py          (axon TPU by default)
CPU smoke:             PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                       python bench.py --streams 8 --ticks 32 --latency-ticks 4
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_BG = (120, 100, 90)


def _face_rgb():
    data = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "headtrackr_tpu", "data", "synthface.npz"))
    return data["rgb"]


def build_pool(n_streams, H, W, pool, loss_streams, rng, face_noise=0):
    """(pool, N, H, W, 3) u8: faces ping-pong +-2 px/tick; at pool index
    pool//2 the first ``loss_streams`` streams get a blue frame (no overlap
    with any face/bg histogram bin -> camshift zero-mass loss).

    face_noise=k overlays a STATIC per-stream CHROMA texture on the face
    pixels (travels with the face): the realistic-palette arm.  The synthetic
    face alone has ~2 distinct 4-bit RGB bins — unrealistically
    sparse-friendly — while a webcam face crop has ~100-300.  The texture is
    built from integer lattice vectors nearly orthogonal to the cascade's
    grayscale weighting (30r+59g+11b)/100 — t1*(2,0,-5) + t2*(-2,1,1),
    t1,t2 ~ U[-k,k] per pixel, drift <= 0.15 gray/unit — because the
    synthetic face is a cascade preimage with a tight detection margin:
    LUMA noise of +-6 already breaks VJ detection (measured), while chroma
    noise is invisible to grayscale yet spreads the 4-bit RGB histogram
    bins that camshift and sparseHist actually see.  k=20 puts the locked
    camshift MODEL crop at ~90-100 distinct bins with 100% lock
    (tests/test_serving_workload.py pins this)."""
    rgb = _face_rgb()
    fh, fw = rgb.shape[:2]
    pos = [(4 * int(rng.integers(2, (W - 2 * fw) // 4)),
            4 * int(rng.integers(2, (H - fh - 8) // 4)))
           for _ in range(n_streams)]
    if face_noise:
        k = face_noise
        t1 = rng.integers(-k, k + 1, (n_streams, fh, fw))
        t2 = rng.integers(-k, k + 1, (n_streams, fh, fw))
        tex = np.stack([2 * t1 - 2 * t2, t2, -5 * t1 + t2], -1)
        faces = np.clip(rgb.astype(np.int32)[None] + tex, 0, 255) \
            .astype(np.uint8)
    else:
        faces = np.broadcast_to(rgb, (n_streams, fh, fw, 3))
    half = pool // 2
    offs = [2 * t for t in range(half)] + [2 * (pool - t) for t in range(half, pool)]
    batches = np.empty((pool, n_streams, H, W, 3), np.uint8)
    for t in range(pool):
        batches[t] = _BG
        for i, (px, py) in enumerate(pos):
            x = px + offs[t]
            batches[t, i, py:py + fh, x:x + fw] = faces[i]
    if loss_streams:
        blue = np.zeros((H, W, 3), np.uint8)
        blue[..., 2] = 250
        batches[half, :loss_streams] = blue
    return batches


def measure_serving(bt, pool, scan_len, n_ticks, ft, sparse_hist=None,
                    tag=""):
    """Lock phase + timed steady-state scan on a warmed BatchedTracker.
    Returns (fps, lock_fps, telemetry-dict).  Shared by the headline arm and
    the reference-exact arm so both numbers come from the same protocol."""
    import numpy as np
    import jax.numpy as jnp

    N = int(pool.shape[1])
    pool_len = int(pool.shape[0])
    t_l0 = time.time()
    for _ in range(16):
        bt.step_auto(pool[0])
    locked = (bt.modes == ft.MODE_CS).mean()
    dt_l = time.time() - t_l0
    lock_fps = 16 * N / dt_l
    print(f"#{tag} lock: {16 * N} frames in {dt_l:.1f}s "
          f"({lock_fps:.0f} fps cold-start), "
          f"{100 * locked:.1f}% locked", file=sys.stderr)
    if locked < 0.99:
        print(f"#{tag} WARNING: only {100 * locked:.1f}% locked",
              file=sys.stderr)
    nbins = (np.asarray(bt.state.cs.model_hist) != 0).sum(axis=-1)
    sparse_msg = ""
    if sparse_hist:
        n_over = int(np.asarray(bt.state.cs.model_overflow).sum())
        sparse_msg = (f"; sparseHist={sparse_hist}: {n_over}/{N} models "
                      f"overflow K (full-frame fallback)")
    print(f"#{tag} model palette: {nbins.min()}-{nbins.max()} distinct bins "
          f"(median {int(np.median(nbins))}){sparse_msg}", file=sys.stderr)

    # Steady state (timed): scan chunks over the pool; faces move every tick,
    # loss-streams lose + redetect once per pass (detector in timed region).
    chunks = max(1, n_ticks // scan_len)
    reps = scan_len // pool_len
    seq = jnp.concatenate([pool] * reps) if reps > 1 else pool
    ticks = chunks * int(seq.shape[0])  # derive from the actual dispatch shape
    out = bt.run_scan(seq)  # rotate once pre-timing (first losses/relocks)
    np.asarray(out.mode_after[-1])
    outs = []
    t0 = time.time()
    for _ in range(chunks):
        outs.append(bt.run_scan(seq))
    np.asarray(outs[-1].mode_after[-1])  # true sync (block_until_ready
    dt = time.time() - t0               # returns at enqueue on axon)
    fps = N * ticks / dt

    status = np.concatenate([np.asarray(o.status) for o in outs])  # (ticks, N)
    redetects = int((status & ft.STATUS_REDETECTING != 0).sum())
    relocks = int((status & ft.STATUS_FOUND != 0).sum())
    tracking = (bt.modes == ft.MODE_CS).mean()
    esc = np.concatenate([np.asarray(o.escaped) for o in outs])  # (ticks, N)
    print(f"#{tag} steady state: {ticks} ticks x {N} streams in {dt:.2f}s "
          f"({1000 * dt / ticks:.2f} ms/tick); {redetects} losses, "
          f"{relocks} relocks in timed region; {100 * tracking:.0f}% "
          f"tracking at end", file=sys.stderr)
    print(f"#{tag} full-frame fallback (band escape / sparse overflow): "
          f"{esc.sum(1).mean():.2f} streams/tick mean, "
          f"{int(esc.sum(1).max())} max, {int(esc.sum())} stream-ticks "
          f"total", file=sys.stderr)
    return fps, lock_fps, {"ticks": ticks, "tracking": float(tracking)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--pool", type=int, default=16,
                    help="staged frame batches; also ticks per run_scan dispatch")
    ap.add_argument("--scan", type=int, default=None,
                    help="ticks per dispatch (default: --pool)")
    ap.add_argument("--loss-streams", type=int, default=4,
                    help="streams losing track once per pool pass")
    ap.add_argument("--bucket", type=int, default=8,
                    help="redetect bucket capacity (device scheduler falls "
                         "back to a full-batch detect tick when more streams "
                         "are pending; sized 2x the workload's simultaneous "
                         "loss rate — the detector's cost on a redetect tick "
                         "scales with this, measured 28.0k fps at 32 vs "
                         "34.7k at 8)")
    ap.add_argument("--band", type=str, default="96x128",
                    help="camshift band-local tracking: 'auto' "
                         "(models/camshift.DEFAULT_BAND), 'none' "
                         "(full-frame), or HxW. A band is a capacity knob "
                         "like --bucket: it must hold the workload's search "
                         "windows (escaped windows are recomputed "
                         "full-frame, cost-bounded but slower). Default is "
                         "sized for THIS workload's <=60 px windows by the "
                         "band_for rule (window+24, models/camshift.band_for)"
                         " and pre-qualified escape-free on it "
                         "(tools/exp_band_escape.py: 0 escapes, windows "
                         "bit-match full-frame)")
    ap.add_argument("--sparse-hist", type=int, default=None,
                    help="sparse-model camshift histogram K "
                         "(TrackerConfig.sparseHist): count only the model's "
                         "top-K bins instead of all 4096.  Measured r4 "
                         "(tools/exp_sparse_ab.py): K=64 wins ~12%% on "
                         "sparse 2-3-bin models, but LOSES 1.3x at K=128 on "
                         "realistic ~94-bin webcam palettes even with zero "
                         "overflow, and an overflowed K pays sparse+dense "
                         "(2x) — hence OFF by default; plan_serving "
                         "recommends 64 only for <=49-bin models.  The "
                         "bench prints overflow and per-tick fallback "
                         "telemetry; --face-noise 20 is the realistic "
                         "palette arm")
    ap.add_argument("--face-noise", type=int, default=0,
                    help="static per-stream chroma texture on the face "
                         "pixels (luma-preserving, so VJ detection is "
                         "untouched): the realistic-palette arm.  k=20 "
                         "puts the camshift model crop at ~90-100 distinct "
                         "bins like a webcam face; 0 = the ~2-bin "
                         "synthetic face (see build_pool)")
    ap.add_argument("--size", type=str, default="320x240",
                    help="frame size WxH (320x240 default; 640x480 is the "
                         "chip-qualified second size). --band is "
                         "window-sized, not frame-sized, so it usually "
                         "stays put across sizes")
    ap.add_argument("--overload", type=str, default="full",
                    choices=["full", "rotate"],
                    help="device-scheduler mass-pending policy "
                         "(BatchedTracker overload): 'full' relocks "
                         "everyone in one slow tick (fastest cold start, "
                         "measured — tools/exp_coldstart_ab.py); 'rotate' "
                         "bounds per-tick cost (latency-sensitive serving)")
    ap.add_argument("--band-hist", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="TrackerConfig.bandHist: count the current camshift "
                         "histogram over the band instead of the full frame "
                         "(~6x less histogram work; APPROXIMATE when "
                         "model-colored pixels exist outside the band — "
                         "docs/PARITY.md deviation 13; bit-equal on this "
                         "workload, measured: 4096/4096 windows vs the "
                         "full-frame path, and the on-chip conformance "
                         "gate passes with the mode on).  Default ON "
                         "(the serving mode, 73.4k vs 49.6k fps r4); "
                         "--no-band-hist is the reference-exact "
                         "full-frame-histogram arm.  A/B: "
                         "tools/exp_bandhist_ab.py")
    ap.add_argument("--k1", type=int, default=2048,
                    help="TrackerConfig.survivorsStage2: deep-stage window "
                         "capacity.  BENCH default 2048 (13 tiles) — the "
                         "r5-qualified single-face serving configuration: "
                         "detect tick 47->38 ms at N=256 "
                         "(tools/exp_detect_split.py --k1), final "
                         "candidate SET measured identical on this "
                         "workload and the conformance clips (evicted "
                         "weak survivors die in deep stages anyway), FULL "
                         "verify_chip gate PASS at --k1 2048 (incl. the "
                         "clutter reduced-caps arm).  The PACKAGE serving "
                         "default stays 4096 (26 tiles) because CROWD "
                         "capacity halves at 2048 (PARITY deviation 5 — "
                         "22 true tiles on the 16-face clutter fixture "
                         "need 26); pass --k1 4096 to bench that.  Gate "
                         "any non-default with verify_chip --k1")
    ap.add_argument("--k2", type=int, default=None,
                    help="TrackerConfig.survivorsDeep: stage-6+ window "
                         "capacity (None = 512 default).  256 measured "
                         "43.4 vs 46.6 ms/tick on the full detect tick "
                         "(r5); deep-bucket overflow is ZERO on all "
                         "conformance content even at 512 (decomposed r5) "
                         "and the overflow telemetry reports any hit")
    ap.add_argument("--deep-dtype", type=str, default=None,
                    choices=["bf16", "int8"],
                    help="detector.DEEP_DTYPE override (None = the package "
                         "default, int8 since its r5 qualification: chip "
                         "A/B win + full gate PASS).  int8 runs the "
                         "chunk-B/C selection dots as i8 MXU matmuls on a "
                         "-128-shifted patch matrix — bit-exact by "
                         "construction; --deep-dtype bf16 restores the "
                         "r1-r5 formulation for A/B")
    ap.add_argument("--hist-kernel", type=str, default=None,
                    choices=["pallas"],
                    help="TrackerConfig.histKernel: run the dense camshift "
                         "hist/pdf scans as the Mosaic kernels (A/B knob; "
                         "XLA default is the measured production path)")
    ap.add_argument("--exact-arm", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="when --band-hist is on, ALSO measure the "
                         "reference-exact full-frame-histogram arm (same "
                         "protocol, second compiled program) and emit it as "
                         "exact_value in the JSON line, so BENCH_r*.json "
                         "self-documents approximate vs exact (VERDICT r4 "
                         "item 5).  --no-exact-arm skips the second "
                         "compile+phase")
    ap.add_argument("--latency-ticks", type=int, default=50)
    ap.add_argument("--h2d", action="store_true",
                    help="also measure true end-to-end ingest (fresh host "
                         "frames every tick) on min(streams, 8) streams")
    args = ap.parse_args()
    scan_len = args.scan or args.pool
    if scan_len % args.pool:
        # run_scan repeats whole pool passes; a non-multiple scan length
        # would run reps*pool ticks while counting scan_len (overstating
        # throughput) and compile an unplanned K — round down instead.
        scan_len = max(args.pool, (scan_len // args.pool) * args.pool)
        print(f"# --scan rounded to {scan_len} (multiple of --pool)",
              file=sys.stderr)

    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht

    # Persistent compilation cache (works with the axon TPU backend);
    # opt out with HEADTRACKR_JAX_CACHE=off.
    cache_dir = os.environ.get("HEADTRACKR_JAX_CACHE",
                               "/root/.cache/headtrackr_jax")
    ht.enable_compilation_cache(None if cache_dir == "off" else cache_dir)
    from headtrackr_tpu.models import facetracker as ft

    try:
        W, H = (int(v) for v in args.size.split("x"))
    except ValueError:
        raise SystemExit(f"--size must be WxH (e.g. 320x240); got "
                         f"{args.size!r}")
    N = args.streams
    rng = np.random.default_rng(0)
    pool_np = build_pool(N, H, W, args.pool, args.loss_streams, rng,
                         face_noise=args.face_noise)

    from headtrackr_tpu.models.camshift import parse_band
    band = parse_band(args.band)
    extra_cfg = {}
    if args.k1:
        extra_cfg["survivorsStage2"] = args.k1
    if args.k2:
        extra_cfg["survivorsDeep"] = args.k2
    if args.deep_dtype:
        from headtrackr_tpu.models import detector as _det
        _det.DEEP_DTYPE = args.deep_dtype
    bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                           bucket=args.bucket, band=band,
                           sparseHist=args.sparse_hist,
                           overload=args.overload,
                           histKernel=args.hist_kernel,
                           bandHist=args.band_hist, **extra_cfg)

    print("# compiling (device-scheduled step + scan program)...",
          file=sys.stderr)
    t_c0 = time.time()
    bt.warmup(scan_len=scan_len, host_sched=False)
    print(f"# compile: {time.time() - t_c0:.0f}s", file=sys.stderr)

    t_u0 = time.time()
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])
    print(f"# pool upload: {pool_np.nbytes / 1e6:.0f} MB in "
          f"{time.time() - t_u0:.1f}s (tunnel-limited; see --h2d)",
          file=sys.stderr)

    # Lock phase (WB stabilization + VJ detect + CS handoff) + timed steady
    # state, via the shared protocol.
    fps, lock_fps, _ = measure_serving(bt, pool, scan_len, args.ticks, ft,
                                       sparse_hist=args.sparse_hist)

    # Reference-exact arm: same protocol with full-frame current histograms
    # (bandHist off) so the JSON carries approximate AND exact numbers from
    # one run (VERDICT r4 item 5).  Fresh tracker = fresh lock, independent
    # program (the compile cache makes repeat runs cheap).
    exact_fps = None
    if args.band_hist and args.exact_arm:
        print("# compiling (reference-exact arm: bandHist off)...",
              file=sys.stderr)
        t_c1 = time.time()
        bt_x = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                                 bucket=args.bucket, band=band,
                                 sparseHist=args.sparse_hist,
                                 overload=args.overload,
                                 histKernel=args.hist_kernel,
                                 bandHist=False, **extra_cfg)
        bt_x.warmup(scan_len=scan_len, host_sched=False)
        print(f"# compile: {time.time() - t_c1:.0f}s", file=sys.stderr)
        exact_fps, _, _ = measure_serving(bt_x, pool, scan_len, args.ticks,
                                          ft, sparse_hist=args.sparse_hist,
                                          tag=" [exact]")
        del bt_x

    # Latency mode (plan_serving latency_sensitive: scan_len=1): per-tick
    # device-scheduled step, host-synced every tick.  On this rig every
    # host sync pays the axon relay RTT (~27 ms, an ENVIRONMENT cost: a
    # production host syncs over PCIe in ~us), so the relay floor is
    # measured separately (pure pull of a tiny resident array) and the
    # device-side tick latency is reported as total minus floor.
    # (frame batches pre-sliced on device so only step+sync is timed)
    slices = [pool[t] for t in range(args.pool)]
    np.asarray(slices[-1][0, 0, 0])
    # distinct resident (N,) arrays: jax caches the host copy of an array
    # after its first pull, so re-pulling ONE array measures ~0 — each probe
    # must be a fresh buffer's first device_get.
    n_rtt = max(10, args.latency_ticks // 2)
    tinies = [bt.state.mode + i for i in range(n_rtt + 1)]
    np.asarray(tinies[-1])  # all enqueued adds complete before probing
    rtt = []
    for a in tinies[:-1]:
        t1 = time.time()
        np.asarray(a)
        rtt.append(time.time() - t1)
    rtt_ms = 1000 * np.asarray(rtt)
    lat = []
    for i in range(args.latency_ticks):
        f = slices[i % args.pool]
        t1 = time.time()
        o = bt.step_auto(f)
        np.asarray(o.mode_after)
        lat.append(time.time() - t1)
    lat_ms = 1000 * np.asarray(lat)
    p50, p99 = np.percentile(lat_ms, 50), np.percentile(lat_ms, 99)
    r50 = np.percentile(rtt_ms, 50)
    print(f"# latency mode (step_auto + sync every tick, {N} streams): "
          f"p50 {p50:.1f} ms, p99 {p99:.1f} ms over {len(lat)} ticks; "
          f"tunnel sync floor p50 {r50:.1f} ms (env, not framework) -> "
          f"device-side tick ~{max(p50 - r50, 0.0):.1f} ms", file=sys.stderr)

    if args.h2d:
        n2 = min(N, 8)
        bt2 = ht.BatchedTracker(n2, frame_shape=(H, W), ui=False)
        bt2.warmup(host_sched=False)
        fresh = [np.ascontiguousarray(pool_np[t % args.pool, :n2])
                 for t in range(args.pool)]
        for t in range(16):
            bt2.step_auto(jnp.asarray(fresh[0]))
        nt = 30
        t2 = time.time()
        for t in range(nt):
            o = bt2.step_auto(jnp.asarray(fresh[t % len(fresh)]))
        np.asarray(o.mode_after)
        dt2 = time.time() - t2
        mbps = n2 * H * W * 3 * nt / dt2 / 1e6
        print(f"# end-to-end incl. H2D: {n2 * nt / dt2:.0f} frames/s on {n2} "
              f"streams ({mbps:.0f} MB/s vs ~40 MB/s wire ceiling — "
              f"tunnel-bound, not compute-bound)", file=sys.stderr)

    bh_tag = ", band-local hist" if args.band_hist else ""
    record = {
        "metric": f"{W}x{H} detect+track frames/sec/chip ({N}-stream serving; "
                  "fresh frame content every tick, losses+redetects in timed "
                  f"region, device-scheduled{bh_tag})",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 20000.0, 4),
    }
    if exact_fps is not None:
        # Reference-exact semantics (full-frame current histograms), same
        # protocol — the headline value uses the bandHist serving mode
        # (docs/PARITY.md deviation 13).
        record["exact_value"] = round(exact_fps, 1)
        record["exact_vs_baseline"] = round(exact_fps / 20000.0, 4)
    # Cold start (WB lock + full-batch VJ detect + CS handoff over 16 ticks,
    # overload policy applied): the detect-tick-bound phase, machine-readable
    # so BENCH_r*.json carries the relock economics alongside steady state.
    record["cold_start_value"] = round(lock_fps, 1)
    record["cold_start_unit"] = "frames/sec/chip (16-tick lock phase)"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
