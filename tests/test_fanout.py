"""Per-stream event fanout + ingest for batched serving (runtime/fanout.py).

The contract: N clip sources driven through BatchedSession deliver each of the
N listeners the SAME reference-shaped event stream (payload fields per
src/facetrackr.js:112-125, src/headposition.js:183-188, src/main.js:70-77)
that a single-stream Tracker session produces for that clip.
"""

import threading

import numpy as np
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.runtime.fanout import BatchedSession, IngestRing, StreamFanout

H, W = 120, 160


def _fr(cx=None, cy=None, blue=False):
    if blue:
        f = np.zeros((H, W, 3), np.uint8)
        f[..., 2] = 250
        return f
    f = np.full((H, W, 3), 40, np.uint8)
    if cx is not None:
        f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    return f


def _clip(cx, cy, lose_at=None, n=34):
    frames = [_fr(cx, cy)] * 16 + [_fr(cx + t, cy) for t in range(n - 16)]
    if lose_at is not None:
        frames[lose_at:lose_at + 2] = [_fr(blue=True)] * 2
    return np.stack(frames)


def _listen(fanout, i, log):
    for ty in (ht.events.STATUS, ht.events.FACETRACKING, ht.events.HEADTRACKING):
        fanout.add_event_listener(i, ty, lambda e, ty=ty: log.append((ty, e)))


def _face_rows(log):
    return [(e.x, e.y, e.width, e.height, e.angle, e.confidence, e.detection)
            for ty, e in log if ty == ht.events.FACETRACKING]


def _head_rows(log):
    return [(e.x, e.y, e.z) for ty, e in log if ty == ht.events.HEADTRACKING]


def _statuses(log):
    s = [e.status for ty, e in log if ty == ht.events.STATUS]
    return [x for i, x in enumerate(s) if i == 0 or s[i - 1] != x]


def test_batched_session_matches_single_tracker_events():
    clips = [_clip(60, 50), _clip(70, 55, lose_at=24), _clip(50, 40)]
    n = len(clips)

    sess = BatchedSession(n, sources=[c.copy() for c in clips],
                          frame_shape=(H, W), cascade=ht.toy_cascade(),
                          ui=False)
    logs = [[] for _ in range(n)]
    for i in range(n):
        _listen(sess.fanout, i, logs[i])
    ticks = sess.run(sync=True)
    assert ticks == len(clips[0])

    for i, clip in enumerate(clips):
        bus = ht.events.EventBus()
        ref_log = []
        t = ht.Tracker(ui=False, bus=bus, cascade=ht.toy_cascade())
        for ty in (ht.events.STATUS, ht.events.FACETRACKING,
                   ht.events.HEADTRACKING):
            bus.add_event_listener(ty, lambda e, ty=ty: ref_log.append((ty, e)))
        assert t.init(ht.ClipSource(clip.copy()), canvas=(W, H))
        t.run_clip()

        # drop the session-only trailing "stopped" status (Tracker.stop)
        ref_status = [s for s in _statuses(ref_log) if s != "stopped"]
        assert _statuses(logs[i]) == ref_status, f"stream {i}"
        assert _face_rows(logs[i]) == _face_rows(ref_log), f"stream {i}"
        assert _head_rows(logs[i]) == _head_rows(ref_log), f"stream {i}"
        # every payload carries its stream id
        assert all(e.stream == i for ty, e in logs[i])
        # reference-shaped face payload: all fields present
        fe = next(e for ty, e in logs[i] if ty == ht.events.FACETRACKING)
        for field in ("x", "y", "width", "height", "angle", "confidence",
                      "detection", "time"):
            assert hasattr(fe, field)

    # the lost/redetect stream saw "redetecting"; the clean ones did not
    assert "redetecting" in _statuses(logs[1])
    assert "redetecting" not in _statuses(logs[0])


def test_stream_fanout_status_tracking_attribute():
    clips = [_clip(60, 50)] * 2
    sess = BatchedSession(2, sources=clips, frame_shape=(H, W),
                          cascade=ht.toy_cascade(), ui=False)
    sess.run(sync=True)
    assert sess.fanout.status == ["tracking", "tracking"]


def test_ingest_ring_latest_wins_and_torn_free():
    ring = IngestRing(3, frame_shape=(8, 8))
    f1 = np.full((8, 8, 3), 1, np.uint8)
    f2 = np.full((8, 8, 3), 2, np.uint8)
    ring.put(0, f1)
    ring.put(0, f2)           # overwrites: latest wins
    ring.put(2, f1)
    snap = ring.snapshot()
    assert (snap[0] == 2).all()
    assert (snap[1] == 0).all()  # never written: zeros
    assert (snap[2] == 1).all()
    assert ring.seq().tolist() == [2, 0, 1]
    # frames are never torn: each snapshot row is a single constant value
    stop = threading.Event()

    def writer():
        k = 0
        while not stop.is_set():
            ring.put(1, np.full((8, 8, 3), k % 251, np.uint8))
            k += 1

    th = threading.Thread(target=writer)
    th.start()
    try:
        for _ in range(200):
            row = ring.snapshot()[1]
            assert (row == row.flat[0]).all()
    finally:
        stop.set()
        th.join()


def test_push_mode_ring_session():
    """Push mode: producers feed an IngestRing; the session snapshots it."""
    clip = _clip(60, 50)
    ring = IngestRing(2, frame_shape=(H, W))
    sess = BatchedSession(2, ring=ring, frame_shape=(H, W),
                          cascade=ht.toy_cascade(), ui=False)
    log = []
    _listen(sess.fanout, 0, log)
    for f in clip:
        ring.put(0, f)
        ring.put(1, f)
        sess.step_once(sync=True)
    sess.flush()
    assert sess.fanout.status[0] == "tracking"
    assert len(_face_rows(log)) > 5
    assert _statuses(log)[:3] == ["whitebalance", "detecting", "found"]


def test_fanout_shared_buses_rejects_bad_length():
    with pytest.raises(ValueError):
        StreamFanout(3, buses=[ht.events.EventBus()])
    with pytest.raises(ValueError):
        BatchedSession(2, sources=[np.zeros((1, H, W, 3), np.uint8)])


def test_fanout_per_stream_hints(monkeypatch):
    """Per-stream 'hints' after 5 s of VJ without a lock (src/main.js:188-194)
    — one stream stalls in VJ, the other locks; clock injected."""
    from headtrackr_tpu.models.facetracker import StepOutput
    from headtrackr_tpu.runtime import fanout as fo

    def out(dets):
        z = np.zeros((2,), np.float32)
        return StepOutput(
            detection=np.asarray(dets, np.int32), wb=z,
            face_x=z, face_y=z, face_w=z, face_h=z, face_angle=z,
            face_conf=z, smooth_x=z, smooth_y=z, smooth_w=z, smooth_h=z,
            head_valid=np.zeros((2,), bool), head_x=z, head_y=z, head_z=z,
            status=np.zeros((2,), np.int32),
            event_face=np.zeros((2,), bool), fov_deg=z,
            mode_after=np.asarray(dets, np.int32))

    clock = [1000.0]
    monkeypatch.setattr(fo._time, "time", lambda: clock[0])
    f = fo.StreamFanout(2)
    logs = [[], []]
    for i in (0, 1):
        f.add_event_listener(i, ht.events.STATUS,
                             lambda e, i=i: logs[i].append(e.status))

    f.emit(out([1, 1]))            # both enter VJ: timers start
    clock[0] += 6.0
    f.emit(out([1, 2]))            # 6 s later: stream 0 still VJ, 1 locked
    assert logs[0] == ["hints"] and f.status[0] == "hints"
    assert "hints" not in logs[1] and f.status[1] == "tracking"
    f.emit(out([1, 2]))            # hints fires once
    assert logs[0] == ["hints"]
    # a lock resets: stream 0 locks, loses, stalls again -> hints again
    f.emit(out([2, 2]))
    f.emit(out([1, 2]))
    clock[0] += 6.0
    f.emit(out([1, 2]))
    assert logs[0] == ["hints", "hints"]


def test_batched_session_timer_thread():
    """start()/stop() timer-thread mode (the reference's setTimeout loop,
    src/main.js:328-345, batched): sources drain on the daemon thread and
    events flush on stop."""
    import time as _t

    clips = [_clip(60, 50), _clip(50, 40)]
    sess = BatchedSession(2, sources=clips, frame_shape=(H, W),
                          cascade=ht.toy_cascade(), ui=False)
    heads = []
    sess.fanout.add_event_listener(0, ht.events.HEADTRACKING, heads.append)
    sess.start(interval_ms=1)
    deadline = _t.time() + 120
    while sess.ticks < len(clips[0]) and _t.time() < deadline:
        _t.sleep(0.05)
    sess.stop()
    assert sess.ticks == len(clips[0])
    assert sess.fanout.status == ["tracking", "tracking"]
    assert heads and hasattr(heads[-1], "z")
    assert sess._thread is None  # joined


def _fake_out(n, status=0, det=2, face=False):
    import headtrackr_tpu.models.facetracker as ftm
    z = np.zeros((n,), np.float32)
    return ftm.StepOutput(
        detection=np.full((n,), det, np.int32), wb=z,
        face_x=z + 5, face_y=z + 6, face_w=z + 7, face_h=z + 8,
        face_angle=z, face_conf=z + 1,
        smooth_x=z, smooth_y=z, smooth_w=z, smooth_h=z,
        head_valid=np.zeros((n,), bool), head_x=z, head_y=z, head_z=z,
        status=np.full((n,), status, np.int32),
        event_face=np.full((n,), face, bool), fov_deg=z,
        mode_after=np.full((n,), det, np.int32))


def test_fanout_lost_stream_halts_emission():
    """STATUS_LOST halts a stream's emission (the single Tracker stops,
    src/main.js:245-248); reset_stream re-arms it."""
    import headtrackr_tpu.models.facetracker as ftm
    f = StreamFanout(2)
    log = []
    _listen(f, 0, log)
    n0 = f.emit(_fake_out(2, status=ftm.STATUS_LOST, face=True))
    assert _statuses(log) == ["lost"]
    assert f.stopped[0] and f.stopped[1]
    # subsequent ticks (retryDetection=False keeps stepping): silent
    before = len(log)
    assert f.emit(_fake_out(2, status=ftm.STATUS_LOST, face=True)) == 0
    assert len(log) == before
    f.reset_stream(0)
    assert f.emit(_fake_out(2, face=True)) == 1  # stream 0 only
    assert _face_rows(log)


def test_batched_session_resizes_pull_sources():
    """Pull-mode sources at a different resolution are normalized to the
    session frame_shape (same contract as Tracker._capture)."""
    big = np.stack([np.kron(f, np.ones((2, 2, 1))).astype(np.uint8)
                    for f in _clip(60, 50, n=20)])  # (20, 2H, 2W, 3)
    assert big.shape[1:] == (2 * H, 2 * W, 3)
    sess = BatchedSession(1, sources=[big], frame_shape=(H, W),
                          cascade=ht.toy_cascade(), ui=False)
    ticks = sess.run(sync=True)
    assert ticks == 20
    assert sess.fanout.status == ["tracking"]


def test_tracker_start_reentry_guard():
    """A second start() while running must not spawn a second loop thread
    racing the donated state."""
    clip = _clip(60, 50, n=60)
    t = ht.Tracker(ui=False, cascade=ht.toy_cascade(),
                   bus=ht.events.EventBus(), detectionInterval=5)
    assert t.init(ht.ClipSource(clip), canvas=(W, H))
    assert t.start()
    th1 = t._thread
    assert t.start()          # no-op: already running
    assert t._thread is th1
    t.stop()
