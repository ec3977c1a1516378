"""On-chip A/B of the sparse-model camshift histogram path (sparseHist).

Single-process, interleaved-repetition timing of the bench.py steady state
(same protocol as exp_scan_ab.py — tunnel noise hits all arms equally) for
sparseHist arms.  The bench workload's models are low-entropy (synthface +
flat background: a handful of distinct bins), so this measures the BEST-case
sparse win; rich-palette models overflow K and fall back full-frame
(tests/test_sparse_hist.py pins that path's exactness).  Also reports
per-arm window agreement on the last rep as a live correctness signal
(fast-mode bf16 rounding differs by dot shape, so occasional ±1 px drift
between arms is the documented deviation class, not a bug).

Run on the chip: python tools/exp_sparse_ab.py --arms none,64,128
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
    ap.add_argument("--arms", type=str, default="none,64",
                    help="comma list: 'none' (dense) or K values")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--band", type=str, default="96x128")
    ap.add_argument("--face-noise", type=int, default=0,
                    help="static per-stream luma-preserving chroma face "
                         "texture (bench.py --face-noise): k=20 is the "
                         "webcam-realistic palette arm (~90-100 distinct "
                         "model bins — K=64 overflows, K=128 fits); 0 is "
                         "the ~2-bin synthetic best case")
    args = ap.parse_args()
    arms = [None if a == "none" else int(a) for a in args.arms.split(",")]

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

    trackers = {}
    for k in arms:
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False, bucket=8,
                               band=band, sparseHist=k)
        bt.warmup(scan_len=args.pool, host_sched=False)
        for _ in range(16):
            bt.step_auto(pool[0])
        locked = (bt.modes == ftm.MODE_CS).mean()
        nbins = (np.asarray(bt.state.cs.model_hist) != 0).sum(axis=-1)
        over = (int(np.asarray(bt.state.cs.model_overflow).sum())
                if k else 0)
        print(f"# sparseHist={k}: compile+lock {time.time() - t0:.0f}s, "
              f"{100 * locked:.0f}% locked; model bins "
              f"{nbins.min()}-{nbins.max()} (median {int(np.median(nbins))})"
              f"{f'; {over}/{N} overflow K' if k else ''}", file=_sys.stderr)
        bt.run_scan(pool)  # first losses/relocks outside timing
        np.asarray(bt.modes)
        trackers[k] = bt

    times = {k: [] for k in arms}
    last = {}
    for rep in range(args.reps):
        for k in arms:
            bt = trackers[k]
            t0 = time.time()
            out = bt.run_scan(pool)
            np.asarray(out.mode_after[-1])
            times[k].append(time.time() - t0)
            if rep == args.reps - 1:
                last[k] = np.stack([np.asarray(out.face_x),
                                    np.asarray(out.face_y),
                                    np.asarray(out.face_w),
                                    np.asarray(out.face_h)])
    for k in arms:
        ms = 1000 * np.asarray(times[k]) / args.pool
        fps = N * args.pool / np.asarray(times[k])
        print(f"sparseHist={str(k):>4}: {ms.mean():.2f} ms/tick "
              f"(min {ms.min():.2f}, max {ms.max():.2f}) "
              f"-> {fps.mean():.0f} fps mean / {fps.max():.0f} best")
    base = arms[0]
    for k in arms[1:]:
        neq = int((last[k] != last[base]).any(0).sum())
        tot = last[base].shape[1] * last[base].shape[2]
        dmax = float(np.abs(last[k] - last[base]).max())
        print(f"# windows vs {base}: {tot - neq}/{tot} equal on last rep, "
              f"max |delta| {dmax:.0f} px")


if __name__ == "__main__":
    main()
