"""On-chip A/B: cold-start lock phase under overload="full" vs "rotate".

The bench's cold start is the one place the device scheduler sees a MASS
pending burst: after ~15 all-WB wbtrack ticks every stream pends in VJ at
once, which routes through the overload policy — "full" pays ONE full-batch
detect tick (everyone locks together), "rotate" serves 4*bucket streams per
tick in FIFO order (bounded tick cost, ceil(N / 4*bucket) ticks to drain).
VERDICT r3 asked which policy the bench should use for the 4,096-frame lock
phase; this measures it the only trustworthy way on the shared tunnel —
single-process, interleaved repetitions (BatchedTracker.reset() restores a
fresh cold state without recompiling).

Run on the chip:  python tools/exp_coldstart_ab.py
CPU smoke:        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                  python tools/exp_coldstart_ab.py --streams 16 --reps 2
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
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--bucket", type=int, default=8)
    ap.add_argument("--band", type=str, default="96x128")
    ap.add_argument("--max-ticks", type=int, default=60,
                    help="safety cap on lock ticks per rep")
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
    pool_np = bench.build_pool(N, H, W, 16, 0, rng)
    frame0 = jnp.asarray(pool_np[0])
    np.asarray(frame0[0, 0, 0])

    arms = ["full", "rotate"]
    trackers = {}
    for arm in arms:
        t0 = time.time()
        bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                               bucket=args.bucket, band=band, overload=arm)
        bt.warmup(host_sched=False)
        # one throwaway lock to absorb first-execution overhead
        for _ in range(18):
            bt.step_auto(frame0)
        locked = (bt.modes == ftm.MODE_CS).mean()
        print(f"# overload={arm}: compile+first lock {time.time() - t0:.0f}s,"
              f" {100 * locked:.0f}% locked", file=_sys.stderr)
        trackers[arm] = bt

    times = {a: [] for a in arms}
    ticks_used = {a: [] for a in arms}
    for rep in range(args.reps):
        for arm in arms:
            bt = trackers[arm]
            bt.reset()
            np.asarray(bt.state.mode)  # state install complete before timing
            t0 = time.time()
            n_ticks = 0
            # poll modes every 4 ticks after the 15 WB ticks (each poll is a
            # host sync; identical cost in both arms)
            for _ in range(15):
                bt.step_auto(frame0)
                n_ticks += 1
            while n_ticks < args.max_ticks:
                for _ in range(4):
                    bt.step_auto(frame0)
                    n_ticks += 1
                if (bt.modes == ftm.MODE_CS).all():
                    break
            dt = time.time() - t0
            assert (bt.modes == ftm.MODE_CS).all(), \
                f"{arm}: not locked after {n_ticks} ticks"
            times[arm].append(dt)
            ticks_used[arm].append(n_ticks)

    for arm in arms:
        t = np.asarray(times[arm])
        fps = N * np.asarray(ticks_used[arm]) / t
        print(f"overload={arm:>6}: lock in {int(np.median(ticks_used[arm]))} "
              f"ticks, {t.mean():.2f}s mean ({t.min():.2f} best) -> "
              f"{fps.mean():.0f} fps cold-start mean / {fps.max():.0f} best")


if __name__ == "__main__":
    main()
