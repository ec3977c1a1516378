"""Decisive A/B of serving-program variants on the REAL run_scan workload.

Single-process, interleaved-repetition timing of the exact bench.py steady
state (moving faces, losses+redetects, device-scheduled 16-tick scans) for
each histBlock config — tunnel/background noise hits all arms equally, so
the comparison is fair even when absolute numbers drift between runs
(bench-to-bench spread measured up to 11%).

Run on the chip: python tools/exp_scan_ab.py --blocks 15360,76800
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
    ap.add_argument("--blocks", type=str, default="15360,76800")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--pool", type=int, default=16)
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]

    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ftm

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    H, W = 240, 320
    N = args.streams
    rng = np.random.default_rng(0)
    pool_np = bench.build_pool(N, H, W, args.pool, 4, rng)
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])

    trackers = {}
    for blk in blocks:
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False, bucket=8,
                               histBlock=blk)
        bt.warmup(scan_len=args.pool, host_sched=False)
        for _ in range(16):
            bt.step_auto(pool[0])
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# blk={blk}: compile+lock {time.time() - t0:.0f}s, "
              f"{100 * locked:.0f}% locked", file=_sys.stderr)
        bt.run_scan(pool)  # first losses/relocks outside timing
        np.asarray(bt.modes)
        trackers[blk] = bt

    times = {blk: [] for blk in blocks}
    for rep in range(args.reps):
        for blk in blocks:
            bt = trackers[blk]
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[blk].append(time.time() - t0)
    for blk in blocks:
        ms = 1000 * np.asarray(times[blk]) / args.pool
        fps = N * args.pool / np.asarray(times[blk])
        print(f"histBlock={blk:6d}: {ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}, max {ms.max():.2f}) "
              f"-> {fps.mean():.0f} fps mean / {fps.max():.0f} best")


if __name__ == "__main__":
    main()
