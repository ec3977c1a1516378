"""Runtime tests: Tracker session loop, events, Ui, BatchedTracker, video sources."""

import numpy as np
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.runtime.video import ClipSource, SyntheticFaceSource, normalize_size

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


def _clip():
    return np.stack([_fr(60, 50)] * 16 + [_fr(60 + t, 50) for t in range(15)]
                    + [_fr(blue=True)] * 2 + [_fr(80, 60)] * 6)


@pytest.fixture()
def session():
    bus = ht.events.EventBus()
    t = ht.Tracker(ui=True, bus=bus, cascade=ht.toy_cascade())
    log = []
    for ty in (ht.events.STATUS, ht.events.FACETRACKING, ht.events.HEADTRACKING):
        bus.add_event_listener(ty, lambda e, ty=ty: log.append((ty, e)))
    return t, bus, log


def test_tracker_lifecycle_events(session):
    t, bus, log = session
    assert t.init(ClipSource(_clip()))
    n = t.run_clip()
    assert n == len(_clip())
    statuses = [e.status for ty, e in log if ty == ht.events.STATUS]
    dedup = [s for i, s in enumerate(statuses) if i == 0 or statuses[i - 1] != s]
    assert dedup == ["whitebalance", "detecting", "found", "redetecting", "found"]
    face_evs = [e for ty, e in log if ty == ht.events.FACETRACKING]
    head_evs = [e for ty, e in log if ty == ht.events.HEADTRACKING]
    assert len(face_evs) > 10 and len(head_evs) > 5
    e = face_evs[5]
    assert e.detection == "CS" and e.confidence == 1.0 and e.width > 0
    assert hasattr(e, "time") and hasattr(e, "angle")
    he = head_evs[0]
    assert 50 < he.z < 70  # init distance assumption ~60 cm
    assert t.getFOV() > 0
    assert t.status == "tracking"
    # auto_fade now defaults on (src/ui.js:61-69 parity): the message is
    # either still showing or already cleared by the 3 s fade on a slow run.
    assert t._ui.message in ("Face found! Move your head!", "")


def test_tracker_threaded_start_stop():
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(),
                   cascade=ht.toy_cascade(), detectionInterval=5)
    t.init(ClipSource(_clip(), loop=True))
    import time
    assert t.start()
    time.sleep(1.5)
    t.stop()
    assert t.status == "stopped"


def test_tracker_rejects_unknown_params():
    with pytest.raises(TypeError):
        ht.Tracker(nonsense=True)


def test_run_clip_refuses_while_started():
    """run_clip() and the start() timer loop are mutually exclusive drivers
    of the same donated device state; racing them corrupts buffers, so the
    synchronous driver must refuse while the loop is live."""
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(),
                   cascade=ht.toy_cascade(), detectionInterval=5)
    t.init(ClipSource(_clip(), loop=True))
    assert t.start()
    try:
        with pytest.raises(RuntimeError, match="one driver"):
            t.run_clip(max_frames=3)
    finally:
        t.stop()
    assert t.status == "stopped"
    assert t.run_clip(max_frames=2) == 2  # fine once stopped


def test_device_scheduler_overload_policies():
    """Chunked redetect buckets + overload policy (VERDICT r2 items 2/4):
    a moderate loss burst (bucket < npend <= 4*bucket) relocks in ONE
    device-scheduled tick via the chunk loop; a mass burst (> 4*bucket)
    either full-batch-detects ("full") or FIFO-rotates with bounded wait
    ("rotate", pend_age ages)."""
    import headtrackr_tpu.models.facetracker as ftm
    N, bucket = 16, 2  # chunk_cap = 8
    good = np.stack([_fr(50 + 2 * (i % 5), 40 + 2 * (i % 5))
                     for i in range(N)])

    def lose(k):
        f = good.copy()
        f[:k] = _fr(blue=True)
        return f

    for overload in ("full", "rotate"):
        bt = ht.BatchedTracker(N, frame_shape=(H, W),
                               cascade=ht.toy_cascade(), bucket=bucket,
                               overload=overload)
        # cold start: "full" serves all 16 streams per tick (17 ticks to
        # WB-stabilize + detect + lock); "rotate" bounds each tick to
        # chunk_cap=8 streams, so the same progress takes ~2x the ticks
        for _ in range(17 if overload == "full" else 40):
            bt.step_auto(good)
        assert (bt.modes == ftm.MODE_CS).all(), overload
        # moderate burst: 5 pending -> chunked branch serves ALL in one tick
        bt.step_auto(lose(5))
        bt.step_auto(good)
        assert (bt.modes == ftm.MODE_CS).all(), overload
        # mass burst: 10 pending (> chunk_cap 8)
        bt.step_auto(lose(10))
        bt.step_auto(good)
        modes = bt.modes
        ages = np.asarray(bt.state.pend_age)
        if overload == "full":
            assert (modes == ftm.MODE_CS).all()
            assert ages.max() == 0
        else:
            # 8 oldest (= lowest-index on equal age) served; 2 wait one tick
            assert (modes == ftm.MODE_CS).sum() == N - 2
            assert (ages > 0).sum() == 2 and ages.max() == 1
            bt.step_auto(good)
            assert (bt.modes == ftm.MODE_CS).all()
            assert np.asarray(bt.state.pend_age).max() == 0


def test_device_vs_host_scheduler_equal():
    """The device scheduler (wbtrack/bucket/chunks branches) must produce
    exactly the host scheduler's per-stream results through cold start,
    lock, loss and redetect (PARITY.md deviation 11)."""
    N = 4
    mk = lambda: ht.BatchedTracker(N, frame_shape=(H, W),
                                   cascade=ht.toy_cascade(), bucket=2,
                                   sync_interval=1)
    bt_a, bt_h = mk(), mk()
    frames = np.stack([_fr(50 + 4 * i, 40 + 3 * i) for i in range(N)])
    blue = np.stack([_fr(blue=True)] * 2 + [frames[2], frames[3]])
    for t in range(22):
        f = blue if t == 18 else frames
        out_a = bt_a.step_auto(f)
        out_h = bt_h.step(f, sync=True)
        for name, a, b in zip(out_a._fields, out_a, out_h):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"tick {t} field {name}")
    assert bt_a.modes.tolist() == bt_h.modes.tolist() == [2] * N


def test_facetrackr_namespace_state_machine():
    """Public ht.facetrackr.Tracker (src/facetrackr.js:37-130): WB -> VJ ->
    CS transitions, facetrackingEvent emission, getTrackingObject clone."""
    bus = ht.events.EventBus()
    log = []
    bus.add_event_listener(ht.events.FACETRACKING, log.append)
    ftr = ht.facetrackr.Tracker(cascade=ht.toy_cascade(), bus=bus)
    ftr.init(ClipSource(_clip()))
    seen = []
    for _ in range(24):
        r = ftr.track()
        seen.append(r.detection)
    # 15-deep WB ring stabilizes -> one VJ frame -> CS thereafter
    assert seen[:15] == ["WB"] * 15
    assert "VJ" in seen and seen[-1] == "CS"
    first_vj = seen.index("VJ")
    assert seen[first_vj + 1] == "CS"  # handoff on first confident detect
    obj = ftr.getTrackingObject()
    assert obj.detection == "CS" and obj.confidence == 1
    assert obj.width > 0 and obj.height > 0
    assert obj is not ftr.getTrackingObject()  # clone semantics
    assert len(log) >= 1 and log[0].detection == "CS"
    assert hasattr(log[0], "time") and hasattr(log[0], "angle")
    # no sendEvents -> no events; explicit-frame API works
    ftr2 = ht.facetrackr.Tracker({"sendEvents": False, "whitebalancing": False},
                                 cascade=ht.toy_cascade(), bus=bus)
    ftr2.init()
    n0 = len(log)
    r = ftr2.track(_fr(60, 50))
    assert r.detection == "VJ" and len(log) == n0
    r = ftr2.track(_fr(60, 50))
    assert r.detection == "CS" and len(log) == n0
    assert ftr2.getBackProjectionImg().shape == (H, W, 3)


def test_facetrackr_rejects_unknown_params():
    with pytest.raises(TypeError):
        ht.facetrackr.Tracker(nonsense=True)


def test_batched_tracker_mixed_then_fast_path():
    bt = ht.BatchedTracker(4, frame_shape=(H, W), cascade=ht.toy_cascade())

    def fr(cx, cy):
        return _fr(cx, cy)

    frames = np.stack([fr(60, 50), fr(70, 60), fr(80, 70), fr(90, 80)])
    for _ in range(17):
        bt.step(frames)
    assert bt.modes.tolist() == [2, 2, 2, 2]
    out = bt.step(frames)  # all-CS fast path
    xs = np.asarray(out.face_x)
    assert len(set(xs.tolist())) == 4  # per-stream independence

    bt.reset_stream(2)
    assert bt.modes[2] == 0 and bt.modes[0] == 2


def test_debug_surface_vj_and_cs_overlays():
    """Tracker(debug=True) must expose the reference's debug canvas content:
    blue VJ rect on detection frames, green rotated CS rect + backprojection
    on tracking frames (src/main.js:199-219, src/facetrackr.js:194-196)."""
    from headtrackr_tpu.utils.debugdraw import VJ_COLOR, CS_COLOR
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(), cascade=ht.toy_cascade(),
                   debug=True, whitebalancing=False)
    t.init(ClipSource(np.stack([_fr(60, 50)] * 6)))
    vj_dbg = cs_dbg = None
    for _ in range(6):
        out = t.step_once()
        d = t.get_debug()
        if int(out.detection) == 1 and vj_dbg is None and out.face_w > 0:
            vj_dbg = d
        if int(out.detection) == 2:
            cs_dbg = d
    assert vj_dbg is not None and cs_dbg is not None
    # VJ: blue box pixels at the detection rect border
    ov = vj_dbg["overlay"]
    assert (ov == np.array(VJ_COLOR)).all(-1).any(), "no blue VJ rect drawn"
    assert vj_dbg["backprojection"] is None
    # CS: green rotated box + backprojection image present
    ov = cs_dbg["overlay"]
    assert (ov == np.array(CS_COLOR)).all(-1).any(), "no green CS rect drawn"
    bp = cs_dbg["backprojection"]
    cw, ch = t._canvas_size  # source is normalized to width 320 (main.js:144)
    assert bp is not None and bp.shape == (ch, cw, 3) and bp.max() > 0
    assert cs_dbg["tracking"]["detection"] == "CS"


def test_debug_requires_flag():
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(), cascade=ht.toy_cascade())
    t.init(ClipSource(_clip()))
    with pytest.raises(RuntimeError):
        t.get_debug()


def test_altvideo_fallback_on_camera_failure(monkeypatch):
    """Camera failure + altVideo => 'no camera' status, then the clip drives
    the pipeline (src/main.js:132-141)."""
    from headtrackr_tpu.runtime import tracker as rt

    def boom():
        raise RuntimeError("no camera")

    monkeypatch.setattr(rt, "CameraSource", boom)
    bus = ht.events.EventBus()
    statuses = []
    bus.add_event_listener(ht.events.STATUS, lambda e: statuses.append(e.status))
    t = ht.Tracker(ui=False, bus=bus, cascade=ht.toy_cascade(),
                   altVideo=_clip())
    assert t.init() is True          # fell back instead of failing
    assert statuses[:2] == ["getUserMedia", "no camera"]
    t.run_clip()
    assert t.status in ("tracking", "stopped")
    assert "found" in statuses


def test_no_altvideo_camera_failure_returns_false(monkeypatch):
    from headtrackr_tpu.runtime import tracker as rt
    monkeypatch.setattr(rt, "CameraSource",
                        lambda: (_ for _ in ()).throw(RuntimeError("no camera")))
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(), cascade=ht.toy_cascade())
    assert t.init() is False
    assert t.status == "no camera"


def test_fadevideo_hook_fires_on_first_cs_lock():
    faded = []

    class FadingClip(ClipSource):
        def fade(self):
            faded.append(True)

    t = ht.Tracker(ui=False, bus=ht.events.EventBus(), cascade=ht.toy_cascade(),
                   fadeVideo=True, whitebalancing=False)
    t.init(FadingClip(np.stack([_fr(60, 50)] * 8)))
    t.run_clip()
    assert faded == [True]  # exactly once (videoFaded latch, src/main.js:222)


def test_hints_status_after_5s_vj_stall(monkeypatch):
    """'hints' fires after 5 s of VJ without a lock (src/main.js:188-194)."""
    from headtrackr_tpu.runtime import tracker as rt
    clock = [1000.0]
    monkeypatch.setattr(rt._time, "time", lambda: clock[0])
    bus = ht.events.EventBus()
    statuses = []
    bus.add_event_listener(ht.events.STATUS, lambda e: statuses.append(e.status))
    # faceless frames: VJ never locks
    t = ht.Tracker(ui=False, bus=bus, cascade=ht.toy_cascade(),
                   whitebalancing=False)
    t.init(ClipSource(np.stack([_fr()] * 12)))
    for _ in range(3):
        t.step_once()
        clock[0] += 1.0
    assert "hints" not in statuses   # only 3 s elapsed
    clock[0] += 3.0                  # now > 5 s since first VJ frame
    t.step_once()
    assert "hints" in statuses
    assert statuses.count("hints") == 1
    t.step_once()
    assert statuses.count("hints") == 1  # sent once


def test_bucket_step_updates_last_stream_with_padding():
    """Regression: the detection-bucket scatter must not clamp padding slots
    (idx == N) onto stream N-1 — a clamped scatter creates duplicate index
    N-1 with conflicting values and JAX applies them in unspecified order,
    which can discard the last stream's WB/VJ update every tick."""
    bt = ht.BatchedTracker(4, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           sync_interval=1)
    frames = np.stack([_fr(60, 50), _fr(70, 60), _fr(80, 70), _fr(90, 80)])
    for _ in range(17):
        bt.step(frames, sync=True)
    assert bt.modes.tolist() == [2, 2, 2, 2]
    bt.reset_stream(3)  # only the LAST stream redetects; bucket is padded
    for _ in range(18):
        bt.step(frames, sync=True)
        if bt.modes[3] == 2:
            break
    assert bt.modes.tolist() == [2, 2, 2, 2], (
        "last stream stalled in detection — bucket scatter dropped its update")


def test_device_scheduler_matches_host_scheduler():
    """step_auto / run_scan (on-device top_k scheduling + lax.cond around the
    detector) must be bit-identical to the host scheduler at sync_interval=1,
    through lock, a mid-clip track loss, and redetection."""
    import jax

    N = 4
    base = np.stack([_fr(60, 50), _fr(70, 60), _fr(80, 70), _fr(90, 80)])
    seq = [base] * 17
    lost = base.copy()
    lost[1] = _fr(blue=True)
    seq += [lost] + [base] * 8
    seq = np.stack(seq)  # (26, N, H, W, 3)

    kw = dict(frame_shape=(H, W), cascade=ht.toy_cascade())
    bt_host = ht.BatchedTracker(N, sync_interval=1, **kw)
    bt_auto = ht.BatchedTracker(N, **kw)
    bt_scan = ht.BatchedTracker(N, **kw)

    outs_h, outs_a = [], []
    for f in seq:
        outs_h.append(bt_host.step(f, sync=True))
        outs_a.append(bt_auto.step_auto(f))
    out_s = bt_scan.run_scan(seq[:13])
    out_s2 = bt_scan.run_scan(seq[13:])

    def eq(a, b):
        ok = jax.tree_util.tree_map(
            lambda x, y: bool((np.asarray(x) == np.asarray(y)).all()), a, b)
        return all(jax.tree_util.tree_leaves(ok))

    for oh, oa in zip(outs_h, outs_a):
        assert eq(oh, oa)
    for k, oh in enumerate(outs_h):
        osk = jax.tree_util.tree_map(
            lambda x: x[k - 13] if k >= 13 else x[k],
            out_s2 if k >= 13 else out_s)
        assert eq(oh, osk), f"tick {k}"
    assert eq(bt_host.state, bt_auto.state) and eq(bt_host.state, bt_scan.state)
    # the loss tick emitted redetecting for stream 1 only
    st = np.asarray(out_s2.status)
    import headtrackr_tpu.models.facetracker as ftm
    assert st[17 - 13, 1] & ftm.STATUS_REDETECTING
    assert bt_auto.modes.tolist() == [2, 2, 2, 2]


def test_device_scheduler_full_branch_parity():
    """bucket < pending streams (cold start / mass loss): the device
    scheduler's 3-way switch must take the full-batch branch, exactly like
    the host scheduler's dispatch."""
    import jax

    N = 4
    frames = np.stack([_fr(60, 50), _fr(70, 60), _fr(80, 70), _fr(90, 80)])
    kw = dict(frame_shape=(H, W), cascade=ht.toy_cascade(), bucket=2)
    bt_host = ht.BatchedTracker(N, sync_interval=1, **kw)
    bt_auto = ht.BatchedTracker(N, **kw)
    for _ in range(17):  # all 4 pending with bucket=2 -> full branch
        o1 = bt_host.step(frames, sync=True)
        o2 = bt_auto.step_auto(frames)
        ok = jax.tree_util.tree_map(
            lambda x, y: bool((np.asarray(x) == np.asarray(y)).all()), o1, o2)
        assert all(jax.tree_util.tree_leaves(ok))
    assert bt_auto.modes.tolist() == [2, 2, 2, 2]


def test_clip_source_and_normalize():
    assert normalize_size(640, 480) == (320, 240)
    assert normalize_size(480, 640) == (180, 240)
    c = ClipSource(np.zeros((3, 10, 12, 3), np.uint8))
    assert c.read() is not None and c.read() is not None and c.read() is not None
    assert c.read() is None


def test_synthetic_source_drives_lifecycle():
    src = SyntheticFaceSource(width=W, height=H, size=24, n_frames=40)
    t = ht.Tracker(ui=False, bus=ht.events.EventBus(), cascade=ht.toy_cascade())
    t.init(src)
    t.run_clip()
    assert t.status in ("tracking",)


def test_clipsource_video_file_requires_cv2(tmp_path):
    """Video-file ClipSource (altVideo parity, src/main.js:79-97): without
    OpenCV the constructor maps to the same support status as CameraSource."""
    try:
        import cv2  # noqa: F401
        has_cv2 = True
    except ImportError:
        has_cv2 = False
    path = str(tmp_path / "clip.mp4")
    if not has_cv2:
        with pytest.raises(RuntimeError, match="no getUserMedia"):
            ClipSource(path)
    else:
        # Build a tiny clip with the toy face, round-trip it through the
        # codec, and check the source plays and loops.
        import cv2
        frames = _clip()[:8]
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (frames.shape[2], frames.shape[1]))
        for f in frames:
            wr.write(np.ascontiguousarray(f[..., ::-1]))
        wr.release()
        src = ClipSource(path, loop=True)
        assert src.frames.shape[0] == 8
        assert src.frames.shape[1:] == frames.shape[1:]
        for _ in range(10):  # loops past the end
            assert src.read() is not None


def test_ui_message_tables():
    from headtrackr_tpu.runtime.ui import STATUS_MESSAGES, SUPPORT_MESSAGES
    assert set(STATUS_MESSAGES) == {"whitebalance", "detecting", "hints",
                                    "redetecting", "lost", "found"}
    assert set(SUPPORT_MESSAGES) == {"no getUserMedia", "no camera"}


def test_ui_auto_fade(monkeypatch):
    """Reference parity: the overlay clears FADE_SECONDS after the last
    status message (src/ui.js:61-69).  auto_fade defaults on."""
    import time
    from headtrackr_tpu.runtime import ui as ui_mod
    monkeypatch.setattr(ui_mod, "FADE_SECONDS", 0.05)
    bus = ht.events.EventBus()
    u = ui_mod.Ui(bus=bus)
    assert u.auto_fade  # default matches the reference
    bus.dispatch_event(ht.events.STATUS, {"status": "found"})
    assert u.message == "Face found! Move your head!"
    deadline = time.monotonic() + 2.0
    while u.message and time.monotonic() < deadline:
        time.sleep(0.01)
    assert u.message == ""
    # support messages override and also fade (clearing the override latch)
    bus.dispatch_event(ht.events.STATUS, {"status": "no camera"})
    assert u.message == "no camera found :("
    bus.dispatch_event(ht.events.STATUS, {"status": "found"})
    assert u.message == "no camera found :("  # override holds until fade
    deadline = time.monotonic() + 2.0
    while u._override and time.monotonic() < deadline:
        time.sleep(0.01)
    bus.dispatch_event(ht.events.STATUS, {"status": "found"})
    assert u.message == "Face found! Move your head!"
    u.close()


def test_controllers_pose_math():
    from headtrackr_tpu.controllers import (realistic_absolute_camera_pose,
                                            realistic_relative_camera_offset)
    pose = realistic_absolute_camera_pose(
        dict(x=5.0, y=3.0, z=60.0), 1.0, (0, 0, 0), 4 / 3)
    assert pose.position == (5.0, 3.0, 60.0)
    # fov formula src/controllers.js:62
    import math
    wh = 20.0
    want = math.atan((wh / 2 + abs(3.0)) / 60.0) * 360 / math.pi
    assert abs(pose.fov - want) < 1e-9
    # x>0 -> no x offset; x<0 -> positive offset
    assert pose.view_offset[2] == 0.0
    pose2 = realistic_absolute_camera_pose(
        dict(x=-5.0, y=-3.0, z=60.0), 1.0, (0, 0, 0), 4 / 3)
    assert pose2.view_offset[2] == 10.0 and pose2.view_offset[3] == 0.0
    tr, vo, fov = realistic_relative_camera_offset(
        dict(x=2.0, y=1.0, z=60.0), 1.0, -5.0, 4 / 3)
    assert tr == (2.0, 1.0, 55.0)


def test_controller_subscription():
    bus = ht.events.EventBus()
    from headtrackr_tpu.controllers import RealisticAbsoluteCameraControl

    class Cam:
        aspect = 4 / 3
        applied = None

        def apply(self, pose):
            self.applied = pose

    cam = Cam()
    ctl = RealisticAbsoluteCameraControl(cam, 1.0, (0, 0, 0), bus=bus)
    bus.dispatch_event(ht.events.HEADTRACKING, dict(x=1.0, y=2.0, z=50.0))
    assert cam.applied is not None and cam.applied.position[2] == 50.0
    ctl.close()


def test_camshift_object_api():
    cs = ht.camshift.Tracker(calcAngles=True)
    cs.initTracker(_fr(60, 50), ht.camshift.Rectangle(48, 38, 24, 24))
    obj = cs.track(_fr(62, 52))
    assert obj.width > 0 and obj.height > 0
    assert cs.getBackProjectionImg().shape == (H, W, 3)
    assert cs.getSearchWindow().width > 0


def test_whitebalance_and_smoother_api():
    assert abs(ht.getWhitebalance(np.full((10, 10, 3), 100, np.uint8)) - 100) < 1e-3
    s = ht.Smoother(0.35, 35)
    assert not s.initialized
    s.init(dict(x=1.0, y=2.0, width=3.0, height=4.0))
    out = s.smooth(dict(x=2.0, y=2.0, width=3.0, height=4.0))
    assert abs(out["x"] - 1.35) < 1e-6  # device f32 EMA


def test_api_classes_are_device_backed():
    """VERDICT r1: the public headposition.Tracker / Smoother classes must run
    the jitted device ops, not the NumPy oracle."""
    import headtrackr_tpu.headposition as hpns
    import headtrackr_tpu.api as apins
    src = open(hpns.__file__).read() + open(apins.__file__).read()
    assert "oracle" not in src.replace("oracle/", "").replace(
        "oracle.", "").replace("the NumPy oracle", "").replace(
        "oracle is", ""), "API classes must not import from oracle"
    import inspect
    assert "from .oracle" not in inspect.getsource(hpns)
    assert "from .oracle" not in inspect.getsource(apins)


def test_headposition_api_matches_oracle():
    from headtrackr_tpu.oracle.headposition import HeadPositionTracker
    bus_events = []
    ht.events.default_bus.add_event_listener(
        ht.events.HEADTRACKING, bus_events.append)
    try:
        W_, H_ = 320, 240
        init = dict(x=160.0, y=120.0, width=60.0, height=60.0)
        t = ht.headposition.Tracker(init, W_, H_)
        o = HeadPositionTracker(init, W_, H_)
        assert abs(t.getFOV() - o.get_fov()) < 1e-3
        for face in (dict(x=160.0, y=120.0, width=60.0, height=60.0),
                     dict(x=33.0, y=28.0, width=60.0, height=60.0),
                     dict(x=300.0, y=225.0, width=60.0, height=60.0)):
            got = t.track(face)
            want = o.track(face)
            assert abs(got.x - want["x"]) < 1e-3
            assert abs(got.y - want["y"]) < 1e-3
            assert abs(got.z - want["z"]) < 1e-2
        assert len(bus_events) == 3 and hasattr(bus_events[0], "z")
    finally:
        ht.events.default_bus.remove_event_listener(
            ht.events.HEADTRACKING, bus_events.append)


def test_camera_source_with_stub_cv2(monkeypatch):
    """CameraSource against a stubbed cv2: open, BGR->RGB read, end-of-stream,
    release, and the open-failure -> 'no camera' contract
    (src/main.js:123-135 equivalent)."""
    import sys
    import types

    from headtrackr_tpu.runtime.video import CameraSource

    class FakeCap:
        def __init__(self, index):
            self.index = index
            self.released = False
            self._frames = [np.arange(6, dtype=np.uint8).reshape(1, 2, 3)]

        def isOpened(self):
            return self.index == 0

        def get(self, prop):
            return {3: 2.0, 4: 1.0}[prop]  # width, height

        def read(self):
            if self._frames:
                return True, self._frames.pop()
            return False, None

        def release(self):
            self.released = True

    fake = types.SimpleNamespace(VideoCapture=FakeCap,
                                 CAP_PROP_FRAME_WIDTH=3,
                                 CAP_PROP_FRAME_HEIGHT=4)
    monkeypatch.setitem(sys.modules, "cv2", fake)

    src = CameraSource()
    assert (src.width, src.height) == (2, 1)
    frame = src.read()                      # BGR (b,g,r)=(0,1,2) -> RGB
    assert frame.shape == (1, 2, 3)
    assert frame[0, 0].tolist() == [2, 1, 0]
    assert src.read() is None               # stream end
    src.stop()
    assert src._cap.released

    with pytest.raises(RuntimeError, match="no camera"):
        CameraSource(index=7)               # device open failure


def test_camera_source_without_cv2(monkeypatch):
    """Missing OpenCV -> RuntimeError('no getUserMedia'), the status the
    session maps to the reference's no-getUserMedia branch
    (src/main.js:136-141)."""
    import builtins
    import sys

    from headtrackr_tpu.runtime.video import CameraSource

    monkeypatch.delitem(sys.modules, "cv2", raising=False)
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("No module named 'cv2'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    with pytest.raises(RuntimeError, match="no getUserMedia"):
        CameraSource()


def test_plan_serving_rules():
    """ht.plan_serving codifies the measured sizing rules: band via
    band_for(1.3x face), bucket = 2x simultaneous losses (default 2% of
    streams), overload/scan by latency preference — and its kwargs
    construct a working BatchedTracker."""
    from headtrackr_tpu.models.camshift import band_for

    p = ht.plan_serving(256, max_face_px=40)
    assert p["band"] == band_for((52, 52))         # ceil(1.3*40) = 52
    assert p["bucket"] == 2 * max(1, round(0.02 * 256))
    assert p["overload"] == "full" and p["scan_len"] == 16

    p2 = ht.plan_serving(64, max_face_px=20, simultaneous_losses=3,
                         latency_sensitive=True)
    assert p2["bucket"] == 6
    assert p2["overload"] == "rotate" and p2["scan_len"] == 1

    # sparseHist sizing: K=64 with 1.3x headroom over the deployment's
    # measured model-palette bin count, else None — never 128 (r4 on-chip
    # A/B: K=128 runs 1.3x slower than dense even when every model fits;
    # K=64 wins ~12% on <=49-bin models; overflow pays sparse+dense).
    assert ht.plan_serving(256, model_bins=40)["sparse_hist"] == 64
    assert ht.plan_serving(256, model_bins=90)["sparse_hist"] is None
    assert ht.plan_serving(256, model_bins=200)["sparse_hist"] is None
    assert p["sparse_hist"] is None  # no palette measured -> no sparse
    # bandHist is planned ON now that the handoff audit guards its content
    # condition at runtime (r5; PARITY deviation 13 safety net)
    assert p["bandHist"] is True

    # bucket never exceeds the stream count; band never exceeds the frame
    p3 = ht.plan_serving(2, frame_shape=(60, 80), max_face_px=500,
                         simultaneous_losses=99)
    assert p3["bucket"] == 2 and p3["band"] == (60, 80)

    bt = ht.BatchedTracker(4, frame_shape=(60, 80), band=p3["band"],
                           bucket=p3["bucket"], overload=p3["overload"])
    assert bt.bucket == 2
