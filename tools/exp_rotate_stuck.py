"""Diagnose streams that never lock under overload='rotate' (r3).

Observed on-chip: the rotate arm of tools/exp_streams_ab.py reaches only
~99% lock and then pays the b_bucket detector sub-batch EVERY tick
(5x steady cost).  The full-overload arm reaches 100% on the same pool.
This rig runs the rotate arm to steady state and dumps the stuck streams'
mode / wb ring / pend_age / detector confidence, then follows them
tick-by-tick to see why serving them does not lock them.

Run on the chip: python tools/exp_rotate_stuck.py --streams 256
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
    ap.add_argument("--scans", type=int, default=3)
    ap.add_argument("--ticks", type=int, default=8,
                    help="tick-by-tick follow-up steps after the scans")
    ap.add_argument("--overload", type=str, default="rotate")
    ap.add_argument("--bisect", type=int, default=-1,
                    help="stream index to bisect the lock collapse on")
    args = ap.parse_args()

    import jax.numpy as jnp
    import headtrackr_tpu as ht
    from headtrackr_tpu.models import facetracker as ftm

    ht.enable_compilation_cache(
        _os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    N, H, W = args.streams, 240, 320
    rng = np.random.default_rng(0)
    pool_np = bench.build_pool(N, H, W, args.pool, 4, rng)
    t0 = time.time()
    pool = jnp.asarray(pool_np)
    np.asarray(pool[0, 0, 0, 0])
    print(f"# pool upload {time.time() - t0:.0f}s", file=_sys.stderr)

    bt = ht.BatchedTracker(N, frame_shape=(H, W), ui=False,
                           bucket=args.bucket, band="auto",
                           overload=args.overload)
    bt.warmup(scan_len=args.pool, host_sched=False)
    for _ in range(16):
        bt.step_auto(pool[0])
    for s in range(args.scans):
        bt.run_scan(pool)
        m = np.asarray(bt.modes)
        print(f"scan {s}: locked {100 * (m == ftm.MODE_CS).mean():.1f}% "
              f"(WB {(m == ftm.MODE_WB).sum()}, VJ {(m == ftm.MODE_VJ).sum()})")

    def dump(tag):
        st = bt.state
        m = np.asarray(st.mode)
        stuck = np.flatnonzero(m != ftm.MODE_CS)
        ring = np.asarray(st.wb_ring)
        print(f"{tag}: stuck={stuck.tolist()}")
        for i in stuck[:8]:
            r = ring[i]
            print(f"  s{i}: mode={m[i]} wb_n={np.asarray(st.wb_n)[i]} "
                  f"age={np.asarray(st.pend_age)[i]} "
                  f"ring_spread={r.max() - r.min():.3f} "
                  f"ring[:4]={np.round(r[:4], 2).tolist()}")
        return stuck

    stuck = dump("after scans")
    for t in range(args.ticks):
        out = bt.step_auto(pool[t % args.pool])
        m = np.asarray(bt.modes)
        conf = np.asarray(out.face_conf)
        pend = np.flatnonzero(m != ftm.MODE_CS)
        win = np.asarray(bt.state.cs.window)
        row = {int(i): (int(m[i]), round(float(conf[i]), 2),
                        win[i].tolist())
               for i in stuck}
        print(f"tick {t}: pend={pend.tolist()[:20]} "
              f"stuck(mode,conf,cswin)={row}")
    dump("after ticks")

    # Bisect the collapse: the isolated init(rect)->track transition HOLDS
    # on-chip (r3 measured), so either the batch-locked stream's CS state
    # differs from a fresh init_tracker, or the batched track program
    # diverges from the single-stream one on identical state.
    if args.bisect >= 0:
        import jax
        import functools
        from headtrackr_tpu.models import camshift as mc

        s = args.bisect
        m = np.asarray(bt.modes)
        # step until stream s is CS (post-relock phase of the oscillation);
        # the main loop above last stepped pool[(ticks-1) % pool]
        last = args.ticks - 1
        for k in range(8):
            if m[s] == ftm.MODE_CS:
                break
            last = args.ticks + k
            bt.step_auto(pool[last % args.pool])
            m = np.asarray(bt.modes)
        if m[s] != ftm.MODE_CS:
            print(f"bisect: stream {s} never reached CS; abort")
            return
        nxt = jnp.asarray(pool[(last + 1) % args.pool, s])
        st_dev = jax.tree_util.tree_map(lambda a: a[s], bt.state.cs)
        win = np.asarray(st_dev.window)
        print(f"bisect: stream {s} CS after tick {last}, window={win.tolist()}")
        # reference init from the SAME frame/rect, locally
        prev = jnp.asarray(pool[last % args.pool, s])
        init_j = jax.jit(mc.init_tracker)
        st_ref = init_j(prev, jnp.asarray(win, jnp.int32))
        dh = np.abs(np.asarray(st_dev.model_hist) -
                    np.asarray(st_ref.model_hist))
        print(f"bisect: model_hist L_inf dev-vs-freshinit {dh.max():.6g} "
              f"(dev sum {np.asarray(st_dev.model_hist).sum():.1f}, "
              f"ref sum {np.asarray(st_ref.model_hist).sum():.1f})")
        for tag, st1 in (("devstate", st_dev), ("freshinit", st_ref)):
            tr = jax.jit(functools.partial(mc.track, calc_angles=True,
                                           exact=False))
            st2, _ = tr(st1, nxt)
            print(f"bisect single-stream track [{tag}]: "
                  f"{np.asarray(st2.window).tolist()}")


if __name__ == "__main__":
    main()
