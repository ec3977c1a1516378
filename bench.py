"""Benchmark: batched detect+track serving throughput on one chip.

Headline metric (BASELINE.md): 320x240 frames/sec/chip through the full
pipeline on 256 concurrent streams.  The workload mirrors real serving:
every stream locks onto a synthesized face (REAL frontal-face cascade ->
camshift handoff), then tracks; steady-state ticks use the camshift fast path
(detection re-enters only on track loss, as in the reference's state machine).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 20000 (the driver's v5e target; the JS reference
publishes no numbers and its loop is capped at ~50 fps/stream).

Run on the real chip:  python bench.py          (axon TPU by default)
CPU smoke:             PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench.py --streams 8 --ticks 5
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def synth_frames(n_streams, H, W, rng):
    """Frames with the synthesized cascade-detectable face at per-stream offsets."""
    data = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "headtrackr_tpu", "data", "synthface.npz"))
    rgb = data["rgb"]
    frames = np.full((n_streams, H, W, 3), (120, 100, 90), np.uint8)
    pos = []
    for i in range(n_streams):
        px = 4 * int(rng.integers(2, (W - 32) // 4))
        py = 4 * int(rng.integers(2, (H - 32) // 4))
        frames[i, py:py + 24, px:px + 24] = rgb
        pos.append((px, py))
    return frames, pos


def shift_frames(frames, pos, dx, H, W):
    """Move each face by dx px (camshift follows)."""
    out = np.full_like(frames, 0)
    out[...] = (120, 100, 90)
    data = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "headtrackr_tpu", "data", "synthface.npz"))
    rgb = data["rgb"]
    newpos = []
    for i, (px, py) in enumerate(pos):
        px = (px + dx) % (W - 32)
        out[i, py:py + 24, px:px + 24] = rgb
        newpos.append((px, py))
    return out, newpos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--sync-interval", type=int, default=16)
    ap.add_argument("--detect-bench", action="store_true",
                    help="also print detect-only throughput (stderr)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ft

    H, W = 240, 320
    rng = np.random.default_rng(0)
    frames_np, pos = synth_frames(args.streams, H, W, rng)

    bt = ht.BatchedTracker(args.streams, frame_shape=(H, W), ui=False,
                           sync_interval=args.sync_interval)
    frames = jnp.asarray(frames_np)

    print("# warming up (compiling 3 step programs)...", file=sys.stderr)
    t_c0 = time.time()
    bt.warmup()
    print(f"# compile: {time.time() - t_c0:.0f}s", file=sys.stderr)

    # Lock phase: WB stabilization (15 ticks) + VJ detect + CS handoff.
    # Per-tick sync: locking is latency-critical, throughput irrelevant here.
    t_lock0 = time.time()
    for _ in range(16):
        bt.step(frames, sync=True)
    locked = (bt.modes == ft.MODE_CS).mean()
    t_lock = time.time() - t_lock0
    print(f"# lock phase: {16 * args.streams} frames in {t_lock:.1f}s, "
          f"{100 * locked:.1f}% streams locked", file=sys.stderr)
    if locked < 0.99:
        print(f"# WARNING: only {100 * locked:.1f}% locked", file=sys.stderr)

    # Steady state: camshift fast path on-device; frames move between ticks.
    frames2_np, _ = shift_frames(frames_np, pos, 2, H, W)
    frames2 = jnp.asarray(frames2_np)
    for _ in range(args.warmup):
        bt.step(frames)
    jax.block_until_ready(bt.state)
    t0 = time.time()
    for i in range(args.ticks):
        out = bt.step(frames if i % 2 == 0 else frames2)
    _ = np.asarray(out.mode_after)  # true sync: block_until_ready does not
    dt = time.time() - t0           # actually block on the axon backend
    fps = args.streams * args.ticks / dt
    still_locked = (bt.modes == ft.MODE_CS).mean()
    print(f"# steady state: {args.ticks} ticks x {args.streams} streams in "
          f"{dt:.2f}s; {100 * still_locked:.0f}% still tracking",
          file=sys.stderr)

    if args.detect_bench:
        # detect-every-frame throughput (the pure VJ path, batch 32)
        from headtrackr_tpu.models import detector as jd
        from headtrackr_tpu.ops import imageproc as ji
        nb = 32
        det = jax.jit(jax.vmap(lambda f: jd.detect_best(
            ji.grayscale(f), bt.cascade, 5, 1, 64, 1024, 128)))
        fsub = frames[:nb]
        out_d = det(fsub)
        _ = [np.asarray(o) for o in out_d]
        td0 = time.time()
        nd = 10
        for _ in range(nd):
            out_d = det(fsub)
        _ = [np.asarray(o) for o in out_d]
        dfps = nb * nd / (time.time() - td0)
        print(f"# detect-only: {dfps:.0f} frames/sec/chip "
              f"(batch {nb}, full cascade every frame)", file=sys.stderr)

    print(json.dumps({
        "metric": "320x240 detect+track frames/sec/chip (256-stream serving, "
                  "real cascade lock -> camshift steady state)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 20000.0, 4),
    }))


if __name__ == "__main__":
    main()
