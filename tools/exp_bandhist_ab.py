"""On-chip A/B: TrackerConfig.bandHist — current-histogram over the band vs
the full frame — inside the REAL serving scan program.

The full-frame histogram chain is the largest steady-tick cost (~2.6 of
5.16 ms at 256 streams, docs/PERFORMANCE.md "Where the time goes"); bandHist
counts it over the (96, 128) band instead (~6x fewer pixels).  It is the
one camshift knob that is APPROXIMATE by design (docs/PARITY.md deviation
13): ratio weights use band-local cur counts, exact whenever every
model-colored pixel lies in the band — true for the bench workload, so the
window-agreement check here should read equal-or-±1-px (the weights are
identical; fast-mode bf16 rounding can differ by dot shape).

Run on the chip:  python tools/exp_bandhist_ab.py [--face-noise 20]
"""

import os as _os
import sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _ROOT)

import argparse
import importlib.util
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--band", type=str, default="96x128")
    ap.add_argument("--face-noise", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ftm
    from headtrackr_tpu.models.camshift import parse_band

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    H, W = 240, 320
    N = args.streams
    band = parse_band(args.band)
    rng = np.random.default_rng(0)
    pool_np = bench.build_pool(N, H, W, args.pool, 4, rng,
                               face_noise=args.face_noise)
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])

    arms = [False, True]
    trackers = {}
    for bh in arms:
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False, bucket=8,
                               band=band, bandHist=bh)
        bt.warmup(scan_len=args.pool, host_sched=False)
        for _ in range(16):
            bt.step_auto(pool[0])
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# bandHist={bh}: compile+lock {time.time() - t0:.0f}s, "
              f"{100 * locked:.0f}% locked", file=_sys.stderr)
        bt.run_scan(pool)  # first losses/relocks outside timing
        np.asarray(bt.modes)
        trackers[bh] = bt

    times = {k: [] for k in arms}
    last = {}
    for rep in range(args.reps):
        for bh in arms:
            bt = trackers[bh]
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[bh].append(time.time() - t0)
            if rep == args.reps - 1:
                last[bh] = np.stack([np.asarray(out.face_x),
                                     np.asarray(out.face_y),
                                     np.asarray(out.face_w),
                                     np.asarray(out.face_h)])
    for bh in arms:
        ms = 1000 * np.asarray(times[bh]) / args.pool
        fps = N * args.pool / np.asarray(times[bh])
        print(f"bandHist={str(bh):>5}: {ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}, max {ms.max():.2f}) "
              f"-> {fps.mean():.0f} fps mean / {fps.max():.0f} best")
    neq = int((last[True] != last[False]).any(0).sum())
    tot = last[False].shape[1] * last[False].shape[2]
    dmax = float(np.abs(last[True] - last[False]).max())
    print(f"# windows bandHist vs full: {tot - neq}/{tot} equal on last rep, "
          f"max |delta| {dmax:.0f} px")


if __name__ == "__main__":
    main()
