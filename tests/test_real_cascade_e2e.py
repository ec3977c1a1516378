"""End-to-end with the REAL frontal-face cascade via the synthesized face fixture.

headtrackr_tpu/data/synthface.npz is a 24x24 patch optimized (offline, see
tools/make_synthetic_face.py) so the bundled 16-stage model detects it — this
drives detection -> camshift handoff -> tracking without real imagery.
"""

import os

import numpy as np
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.runtime.video import ClipSource

FIXTURE = os.path.join(os.path.dirname(ht.__file__), "data", "synthface.npz")

H, W = 240, 320
BG = (120, 100, 90)


@pytest.fixture(scope="module")
def face_rgb():
    return np.load(FIXTURE)["rgb"]


def _frame(face, px, py):
    f = np.full((H, W, 3), BG, np.uint8)
    if px is not None:
        f[py:py + 24, px:px + 24] = face
    return f


def test_real_cascade_detects_fixture(face_rgb):
    f = _frame(face_rgb, 148, 108)
    dets = ht.ccv.detect_objects(ht.ccv.grayscale(f), ht.cascade(), 5, 1)
    assert len(dets) >= 1
    best = max(dets, key=lambda d: d["confidence"])
    assert best["confidence"] > -10
    assert abs(best["x"] - 148) < 12 and abs(best["y"] - 108) < 12


def test_real_cascade_full_lifecycle(face_rgb):
    clip = np.stack(
        [_frame(face_rgb, 148, 108)] * 16      # WB stabilize + VJ lock
        + [_frame(face_rgb, 148 + 2 * t, 108) for t in range(10)])  # track
    bus = ht.events.EventBus()
    t = ht.Tracker(ui=False, bus=bus)  # default = real cascade
    log = []
    bus.add_event_listener(ht.events.STATUS,
                           lambda e: log.append(e.status))
    face_xs = []
    bus.add_event_listener(ht.events.FACETRACKING,
                           lambda e: face_xs.append(e.x))
    assert t.init(ClipSource(clip))
    t.run_clip()
    dedup = [s for i, s in enumerate(log) if i == 0 or log[i - 1] != s]
    assert dedup[:3] == ["whitebalance", "detecting", "found"]
    assert t.status == "tracking"
    assert len(face_xs) >= 8
    # camshift follows the face moving right
    assert face_xs[-1] > face_xs[0]


def test_multiface_set_parity_and_serving(face_rgb):
    """VERDICT r2 item 6: frames with two synthface instances at different
    scales through the REAL cascade — grouped-detection SET parity with the
    oracle including the containment filter (src/ccv.js:305-331), and a
    serving batch whose streams lock onto different faces."""
    from headtrackr_tpu.oracle.detector import detect_objects as oracle_detect
    from headtrackr_tpu.oracle.imageproc import grayscale as ogray
    from headtrackr_tpu.models import facetracker as ftm

    face2 = np.repeat(np.repeat(face_rgb, 2, 0), 2, 1)  # 48 px instance
    f_multi = np.full((H, W, 3), BG, np.uint8)
    f_multi[40:64, 60:84] = face_rgb
    f_multi[120:168, 200:248] = face2
    f_small = _frame(face_rgb, 60, 150)

    for f in (f_multi, f_small):
        dets_o = oracle_detect(ogray(f), ht.cascade(), 5, 1)
        dets_j = ht.ccv.detect_objects(ht.ccv.grayscale(f), ht.cascade(), 5, 1)
        assert len(dets_o) == len(dets_j)
        if f is f_multi:
            assert len(dets_o) >= 2  # both instances survive grouping
        key = lambda d: (d["x"], d["y"])
        for o, j in zip(sorted(dets_o, key=key), sorted(dets_j, key=key)):
            assert int(o["neighbors"]) == int(j["neighbors"])
            for fld in ("x", "y", "width", "height"):
                assert abs(o[fld] - j[fld]) < 5e-2, (fld, o, j)
            assert abs(o["confidence"] - j["confidence"]) < 5e-3

    # serving: two streams lock onto DIFFERENT faces (multi-face frame vs
    # single-face frame), camshift tracks both independently
    bt = ht.BatchedTracker(2, frame_shape=(H, W), sync_interval=1)
    frames = np.stack([f_multi, f_small])
    for _ in range(18):
        out = bt.step(frames)
    assert (bt.modes == ftm.MODE_CS).all()
    xs = np.asarray(out.face_x)
    ys = np.asarray(out.face_y)
    assert abs(xs[1] - 72) < 16 and abs(ys[1] - 162) < 16   # small face
    # stream 0 locks its own max-confidence face (the 24 px instance at
    # (60, 40) outscores the upsampled 48 px one) — a different face
    assert abs(xs[0] - 72) < 16 and abs(ys[0] - 52) < 16
    assert abs(ys[0] - ys[1]) > 20


def test_resampler_sensitivity_proxy(face_rgb):
    """SURVEY §7 resampler-parity check (no browser trace available): the
    oracle detector's best box must be stable across plausible browser
    resamplers (area / nearest vs the bilinear spec) at a face size that
    hits the RESAMPLED pyramid levels."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(ht.__file__), "..",
                                    "tools"))
    import resampler_sensitivity as rs
    res = rs.run(frame=rs.synthface_frame(scale=3), verbose=False)
    for name, (det, v) in res.items():
        assert det is not None, name
        assert v >= 0.9, (name, v)


def test_detection_iou_vs_oracle(face_rgb):
    """BASELINE accuracy gate: face-rect IoU >= 0.99 vs the oracle detector."""
    from headtrackr_tpu.oracle.detector import detect_objects as oracle_detect
    from headtrackr_tpu.oracle.imageproc import grayscale as ogray
    f = _frame(face_rgb, 100, 60)
    dets_o = oracle_detect(ogray(f), ht.cascade(), 5, 1)
    dets_j = ht.ccv.detect_objects(ht.ccv.grayscale(f), ht.cascade(), 5, 1)
    assert len(dets_o) == len(dets_j) >= 1
    bo = max(dets_o, key=lambda d: d["confidence"])
    bj = max(dets_j, key=lambda d: d["confidence"])

    def iou(a, b):
        ax0, ay0, ax1, ay1 = a["x"], a["y"], a["x"] + a["width"], a["y"] + a["height"]
        bx0, by0, bx1, by1 = b["x"], b["y"], b["x"] + b["width"], b["y"] + b["height"]
        ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
        iy = max(0.0, min(ay1, by1) - max(ay0, by0))
        inter = ix * iy
        union = ((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter)
        return inter / union

    assert iou(bo, bj) >= 0.99
