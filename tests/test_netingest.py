"""Network frame ingest (runtime/netingest.py): remote producers -> IngestRing
over TCP — the executable artifact for SURVEY §2d's multi-host ingest leg.
Pure sockets + numpy (no JAX), so these tests are fast."""

import threading
import time

import numpy as np
import pytest

from headtrackr_tpu.runtime.fanout import IngestRing
from headtrackr_tpu.runtime.netingest import NetIngestServer, FrameSender

SHAPE = (24, 32)


def _mk(v, shape=SHAPE):
    return np.full(shape + (3,), v, np.uint8)


def _wait(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


@pytest.fixture()
def served_ring():
    ring = IngestRing(4, SHAPE)
    srv = NetIngestServer(ring, host="127.0.0.1").start()
    yield ring, srv
    srv.close()


def test_frames_land_in_ring(served_ring):
    ring, srv = served_ring
    s = FrameSender(srv.address)
    s.send(0, _mk(10))
    s.send(2, _mk(20))
    s.send(0, _mk(11))  # latest-frame-wins over the first
    assert _wait(lambda: srv.stats()["received"] == 3)
    s.close()
    batch = ring.snapshot()
    assert (batch[0] == 11).all()
    assert (batch[2] == 20).all()
    assert (batch[1] == 0).all()  # untouched stream stays zero
    seq = ring.seq()
    assert seq[0] == 2 and seq[2] == 1 and seq[1] == 0


def test_concurrent_producers_different_streams(served_ring):
    ring, srv = served_ring
    N_FRAMES = 50

    def producer(stream, base):
        s = FrameSender(srv.address)
        for k in range(N_FRAMES):
            s.send(stream, _mk((base + k) % 256))
        s.close()

    ts = [threading.Thread(target=producer, args=(i, 100 + i))
          for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert _wait(lambda: srv.stats()["received"] == 4 * N_FRAMES)
    batch = ring.snapshot()
    for i in range(4):
        # each stream holds ITS producer's final frame
        assert (batch[i] == (100 + i + N_FRAMES - 1) % 256).all(), i


def test_bad_records_counted_not_fatal(served_ring):
    ring, srv = served_ring
    s = FrameSender(srv.address)
    s.send(0, _mk(1, (8, 8)))      # wrong dims -> dropped_shape
    s.send(99, _mk(2))             # unknown stream -> dropped_stream
    s.send(1, _mk(3))              # still accepted on the SAME connection
    assert _wait(lambda: srv.stats()["received"] == 1)
    st = srv.stats()
    assert st["dropped_shape"] == 1 and st["dropped_stream"] == 1
    assert (ring.snapshot()[1] == 3).all()
    s.close()


def test_stale_seq_dropped_on_failover(served_ring):
    """Two producers racing one stream id (failover): the ring keeps the
    newest seq, the stale writer is counted, nothing tears."""
    ring, srv = served_ring
    a = FrameSender(srv.address)
    b = FrameSender(srv.address)
    a.send(3, _mk(50))
    a.send(3, _mk(51))             # a's seq reaches 2
    assert _wait(lambda: srv.stats()["received"] == 2)
    b.send(3, _mk(60))             # b restarts seq at 1 -> stale, dropped
    assert _wait(lambda: srv.stats()["dropped_stale"] == 1)
    assert (ring.snapshot()[3] == 51).all()
    a.close(), b.close()


def test_garbage_closes_connection_only(served_ring):
    ring, srv = served_ring
    import socket
    raw = socket.create_connection(srv.address)
    raw.sendall(b"not a frame header at all........")
    raw.close()
    # server must still accept a healthy producer afterwards
    s = FrameSender(srv.address)
    s.send(0, _mk(7))
    assert _wait(lambda: srv.stats()["received"] == 1)
    assert (ring.snapshot()[0] == 7).all()
    s.close()


def test_cross_process_producer(served_ring):
    """The actual multi-host shape: a producer in ANOTHER PROCESS streams
    frames over TCP into the serving process's ring."""
    import multiprocessing as mp
    ring, srv = served_ring
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_remote_producer, args=(srv.address, 1, 42, 10))
    p.start()
    p.join(timeout=30)
    assert p.exitcode == 0
    assert _wait(lambda: srv.stats()["received"] == 10)
    assert (ring.snapshot()[1] == (42 + 9) % 256).all()


def _remote_producer(address, stream, base, n):
    from headtrackr_tpu.runtime.netingest import FrameSender
    import numpy as np
    s = FrameSender(address)
    for k in range(n):
        s.send(stream, np.full(SHAPE + (3,), (base + k) % 256, np.uint8))
    s.close()
