"""Replay one tick of the lock-flap oscillation through program variants.

r3 on-chip findings so far (exp_rotate_stuck): streams that relock via the
bucket scheduler get a model histogram with disjoint support from the
correct one (all mass in one bin — a uniform background patch), and the
next track tick collapses their window to 0x0.  Isolated repros are all
CORRECT on-chip: single-stream init->track, vmapped init (batch 8), gather
+vmap+cond init, and the vmapped full step at batch 8.  So the corruption
needs the real serving context.  This rig reaches the oscillation, copies
the live entry state, and replays the SAME tick through:

  auto    — the device-scheduled step (the oscillation's own path)
  bucket  — step_bucket directly with the scheduler's idx
  full    — full-batch full step (the b_full branch body)
  noband  — a fresh make_batched_steps(band=None) auto step

Run on the chip: python tools/exp_flap_replay.py --streams 256
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
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=8)
    ap.add_argument("--stream", type=int, default=226)
    ap.add_argument("--variants", type=str, default="auto,bucket,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ftm
    from headtrackr_tpu.models import camshift as mc
    from headtrackr_tpu.runtime.serving import make_batched_steps

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    N, H, W = args.streams, 240, 320
    s = args.stream
    rng = np.random.default_rng(0)
    pool_np = bench.build_pool(N, H, W, args.pool, 4, rng)
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])

    bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                           bucket=args.bucket, band="auto", overload="rotate")
    bt.warmup(scan_len=args.pool, host_sched=False)
    for _ in range(16):
        bt.step_auto(pool[0])
    for _ in range(3):
        bt.run_scan(pool)

    # step until stream s enters a tick in VJ (about to be bucket-served)
    t = 0
    while int(np.asarray(bt.state.mode)[s]) != ftm.MODE_VJ and t < 8:
        bt.step_auto(pool[t % args.pool])
        t += 1
    entry_mode = int(np.asarray(bt.state.mode)[s])
    if entry_mode != ftm.MODE_VJ:
        print(f"stream {s} never entered VJ; abort")
        return
    frames = pool[t % args.pool]
    state0 = jax.tree_util.tree_map(jnp.copy, bt.state)
    pend = np.flatnonzero(np.asarray(state0.mode) != ftm.MODE_CS)
    print(f"entry tick {t}: pend={pend.tolist()}")

    # reference: fresh init on (frame, rect-from-auto-replay window)
    def report(tag, st2):
        mh = np.asarray(st2.cs.model_hist)[s]
        win = np.asarray(st2.cs.window)[s].tolist()
        x, y, w, h = win
        ref = np.zeros(4096)
        if w > 0 and h > 0:
            patch = pool_np[t % args.pool, s, y:y + h, x:x + w].astype(np.int64)
            b = (256 * (patch[..., 0] >> 4) + 16 * (patch[..., 1] >> 4)
                 + (patch[..., 2] >> 4))
            np.add.at(ref, b.reshape(-1), 1)
        linf = np.abs(mh - ref).max()
        print(f"{tag:8s} win={win} mode={int(np.asarray(st2.mode)[s])} "
              f"hist sum={mh.sum():.0f} argmax={int(mh.argmax())} "
              f"({mh.max():.0f}) Linf-vs-fresh={linf:.0f}")

    variants = args.variants.split(",")
    if "auto" in variants:
        st2, _ = bt._step_auto(jax.tree_util.tree_map(jnp.copy, state0),
                               frames)
        report("auto", st2)
    if "bucket" in variants:
        key = np.zeros(N, np.int64)
        key[pend] = 1
        idx = np.argsort(-key, kind="stable")[:args.bucket].astype(np.int32)
        idx = np.where(key[idx] > 0, idx, N)
        t0 = time.time()
        st2, _ = bt._step_bucket(jax.tree_util.tree_map(jnp.copy, state0),
                                 frames, jnp.asarray(idx))
        report("bucket", st2)
        print(f"  (bucket idx={idx.tolist()}, {time.time() - t0:.0f}s)")
    if "full" in variants:
        st2, _ = bt._step_full(jax.tree_util.tree_map(jnp.copy, state0),
                               frames)
        report("full", st2)
    if "nodonate" in variants:
        t0 = time.time()
        _, _, _, auto_nd, _ = make_batched_steps(
            bt.cascade, bt.config, (H, W), donate=False, band="auto",
            bucket=args.bucket, overload="rotate")
        st2, _ = auto_nd(jax.tree_util.tree_map(jnp.copy, state0), frames)
        report("nodonate", st2)
        print(f"  (nodonate compile+run {time.time() - t0:.0f}s)")
    if "noband" in variants:
        t0 = time.time()
        _, _, _, auto_nb, _ = make_batched_steps(
            bt.cascade, bt.config, (H, W), donate=False, band=None,
            bucket=args.bucket, overload="rotate")
        st2, _ = auto_nb(jax.tree_util.tree_map(jnp.copy, state0), frames)
        report("noband", st2)
        print(f"  (noband compile+run {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
