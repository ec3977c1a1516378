"""On-chip A/B: TrackerConfig.histKernel — XLA one-hot-matmul scans vs the
Pallas hist/pdf kernels — inside the REAL serving scan program.

The r3 microbench (tools/bench_histpdf.py) measured the standalone kernels:
hist ties XLA, pdf loses badly.  But the kernels' motivation (their module
docstring) is that inside the big serving program XLA materializes the
one-hot dot operands to HBM — an effect a standalone microbench can't see.
VERDICT r3 item 2 asks for the end-to-end number: this runs the bench
workload's 16-tick run_scan with histKernel=None vs "pallas", single-process
interleaved reps (tunnel noise hits both arms), and reports ms/tick plus
window agreement (the kernel pdf is the exact-f32 lookup, so it can differ
from the fast XLA path only by the documented bf16-rounding deviation).

Run on the chip:  python tools/exp_histkernel_ab.py
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
    ap.add_argument("--band", type=str, default="96x128",
                    help="'none' A/Bs the FULL-FRAME pdf path (the kernels' "
                         "best case); the default A/Bs the production "
                         "band-local configuration")
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
    pool_np = bench.build_pool(N, H, W, args.pool, 4, rng)
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])

    arms = [None, "pallas"]
    trackers = {}
    for kern in arms:
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False, bucket=8,
                               band=band, histKernel=kern)
        bt.warmup(scan_len=args.pool, host_sched=False)
        for _ in range(16):
            bt.step_auto(pool[0])
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# histKernel={kern}: compile+lock {time.time() - t0:.0f}s, "
              f"{100 * locked:.0f}% locked", file=_sys.stderr)
        bt.run_scan(pool)  # first losses/relocks outside timing
        np.asarray(bt.modes)
        trackers[kern] = bt

    times = {k: [] for k in arms}
    last = {}
    for rep in range(args.reps):
        for kern in arms:
            bt = trackers[kern]
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[kern].append(time.time() - t0)
            if rep == args.reps - 1:
                last[kern] = np.stack([np.asarray(out.face_x),
                                       np.asarray(out.face_y),
                                       np.asarray(out.face_w),
                                       np.asarray(out.face_h)])
    for kern in arms:
        ms = 1000 * np.asarray(times[kern]) / args.pool
        fps = N * args.pool / np.asarray(times[kern])
        print(f"histKernel={str(kern):>6}: {ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}, max {ms.max():.2f}) "
              f"-> {fps.mean():.0f} fps mean / {fps.max():.0f} best")
    neq = int((last["pallas"] != last[None]).any(0).sum())
    tot = last[None].shape[1] * last[None].shape[2]
    dmax = float(np.abs(last["pallas"] - last[None]).max())
    print(f"# windows pallas vs XLA: {tot - neq}/{tot} equal on last rep, "
          f"max |delta| {dmax:.0f} px")


if __name__ == "__main__":
    main()
