"""A/B: mean-shift fori_loop vs full static unroll, on the real run_scan
workload (same interleaved-repetition method as exp_scan_ab.py — tunnel
noise hits both arms equally).

The 10-trip loop body is a serial chain of tiny dots/reductions per
iteration; unrolling removes per-iteration loop overhead and lets XLA fuse
across iteration boundaries.  Numerics are identical (the unroll is the
same computation, statically expanded).

Run on the chip: python tools/exp_unroll_ab.py
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
    args = ap.parse_args()

    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import camshift as csm
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
    for unroll in (False, True):
        csm.MEANSHIFT_UNROLL = unroll  # trace-time read in _mean_shift_core
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False, bucket=8)
        bt.warmup(scan_len=args.pool, host_sched=False)
        for _ in range(16):
            bt.step_auto(pool[0])
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# unroll={unroll}: compile+lock {time.time() - t0:.0f}s, "
              f"{100 * locked:.0f}% locked", file=_sys.stderr)
        bt.run_scan(pool)  # first losses/relocks outside timing
        np.asarray(bt.modes)
        trackers[unroll] = bt
    csm.MEANSHIFT_UNROLL = False

    times = {u: [] for u in trackers}
    for rep in range(args.reps):
        for u, bt in trackers.items():
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[u].append(time.time() - t0)
    for u in trackers:
        ms = 1000 * np.asarray(times[u]) / args.pool
        fps = N * args.pool / np.asarray(times[u])
        print(f"unroll={str(u):5s}: {ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}, max {ms.max():.2f}) "
              f"-> {fps.mean():.0f} fps mean / {fps.max():.0f} best")


if __name__ == "__main__":
    main()
