"""Multi-host ingest demo: remote producer PROCESSES -> TCP -> IngestRing
-> BatchedSession, on one serving host.

This is the executable shape of the SURVEY §2d multi-host leg
(docs/PERFORMANCE.md "Scaling"): cameras live on other machines, frames
cross the network ONCE into the serving host's latest-frame-wins ring,
and everything from the ring down (batching, chips, events) is the
normal host-local path — no cross-host device state, no collectives.

Two modes:
  --ring-only   producers + server only; prints ingest throughput
                (no JAX — runs in seconds, the default)
  --track       additionally drives BatchedSession from the ring with the
                toy cascade and prints per-stream statuses (compiles the
                tracker; use the CPU env below)

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
               python examples/net_ingest_serving.py [--track]
"""

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 120, 160
N_STREAMS = 4
FRAMES_PER_STREAM = 120


def producer(address, stream, n_frames):
    """One remote camera: a bright blob panning right (spawned process —
    stands in for a producer on another host).

    Loads netingest.py STANDALONE by path: the client side needs only
    numpy + sockets, so a real producer host installs that one file, not
    the framework (and not JAX — importing the package here would put
    ~10 s of JAX import inside every camera process)."""
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "headtrackr_tpu", "runtime",
        "netingest.py")
    spec = importlib.util.spec_from_file_location("netingest", path)
    ni = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ni)
    s = ni.FrameSender(address)
    for k in range(n_frames):
        f = np.full((H, W, 3), 40, np.uint8)
        x = 20 + (stream * 7 + k) % (W - 60)
        y = 30 + stream * 12
        f[y:y + 36, x:x + 36] = 230
        s.send(stream, f)
    s.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", action="store_true",
                    help="drive BatchedSession from the ring (compiles)")
    args = ap.parse_args()

    from headtrackr_tpu.runtime.fanout import IngestRing
    from headtrackr_tpu.runtime.netingest import NetIngestServer

    ring = IngestRing(N_STREAMS, (H, W))
    srv = NetIngestServer(ring, host="127.0.0.1").start()
    print(f"ingest server on {srv.address}")

    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=producer,
                         args=(srv.address, i, FRAMES_PER_STREAM))
             for i in range(N_STREAMS)]
    t0 = time.time()
    for p in procs:
        p.start()

    if args.track:
        import headtrackr_tpu as ht
        from headtrackr_tpu.runtime.fanout import BatchedSession
        ses = BatchedSession(N_STREAMS, ring=ring, frame_shape=(H, W),
                             cascade=ht.toy_cascade(), sync_interval=1)
        for i in range(N_STREAMS):
            ses.fanout.add_event_listener(
                i, "headtrackrStatus",
                lambda e: print(f"  stream {e.stream}: {e.status}"))
        ticks = 0
        while any(p.is_alive() for p in procs) or ticks < 30:
            ses.step_once()
            ticks += 1
        ses.flush()
        print(f"served {ticks} ticks; final statuses: {ses.fanout.status}")

    for p in procs:
        p.join()
    dt = time.time() - t0
    total = srv.stats()["received"]
    mb = total * H * W * 3 / 1e6
    print(f"ingested {total} frames ({mb:.0f} MB) from {N_STREAMS} "
          f"producer processes in {dt:.2f}s "
          f"({total / dt:.0f} frames/s, {mb / dt:.0f} MB/s)")
    print(f"server stats: {srv.stats()}")
    srv.close()
    assert total == N_STREAMS * FRAMES_PER_STREAM, "lost frames"


if __name__ == "__main__":
    main()
