"""Tests mirroring the driver's BASELINE.json configs (functional versions).

1. Single-frame VJ detect parity (test_detector.py covers exhaustively)
2. camshift tracking over a 100-frame clip from a given init rect
3. full facetrackr loop on a clip (test_pipeline.py covers)
4. 640x480 multi-scale detection with whitebalance gating + headtrackingEvent
5. 256-stream serving (bench.py on hardware; test_runtime.py covers the logic)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.oracle.camshift import CamshiftTracker
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.runtime.video import ClipSource


def test_config2_camshift_100_frame_clip(rng):
    """100-frame tracking parity from a given init rect (BASELINE config 2)."""
    H, W = 60, 80

    def frame(t):
        f = rng.integers(0, 50, (H, W, 3), dtype=np.uint8)
        cx = 20 + int(0.4 * t)
        cy = 25 + int(6 * np.sin(t / 9))
        f[max(0, cy - 8):cy + 8, max(0, cx - 6):cx + 6] = (210, 90, 60)
        return f

    frames = [frame(t) for t in range(100)]
    rect = (14, 17, 12, 16)
    o = CamshiftTracker(calc_angles=True)
    o.init_tracker(frames[0], rect)
    st = mc.init_tracker(jnp.asarray(frames[0]), jnp.asarray(rect, jnp.int32))
    step = jax.jit(lambda s, f: mc.track(s, f, True))
    mismatches = 0
    for t, f in enumerate(frames[1:], 1):
        ro = o.track(f)
        st, _ = step(st, jnp.asarray(f))
        if not (int(st.track_x) == ro["x"] and int(st.track_y) == ro["y"]
                and int(st.track_w) == ro["width"]
                and int(st.track_h) == ro["height"]):
            mismatches += 1
    assert mismatches == 0


def test_camshift_640x480_moment_precision(rng):
    """Golden camshift parity at 640x480 (ADVICE r1): first-moment planes in
    absolute coordinates reached ~2e8 in f32 at this size and flipped window
    shifts by +-1 px vs the f64 oracle; the window-relative marginal
    formulation must track the oracle exactly."""
    H, W = 480, 640

    def frame(t):
        f = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
        cx = 150 + 3 * t
        cy = 200 + int(40 * np.sin(t / 7))
        f[max(0, cy - 40):cy + 40, max(0, cx - 30):cx + 30] = (205, 95, 65)
        return f

    frames = [frame(t) for t in range(40)]
    rect = (118, 158, 62, 82)
    o = CamshiftTracker(calc_angles=True)
    o.init_tracker(frames[0], rect)
    st = mc.init_tracker(jnp.asarray(frames[0]), jnp.asarray(rect, jnp.int32))
    step = jax.jit(lambda s, f: mc.track(s, f, True))
    for t, f in enumerate(frames[1:], 1):
        ro = o.track(f)
        st, _ = step(st, jnp.asarray(f))
        assert (int(st.track_x), int(st.track_y),
                int(st.track_w), int(st.track_h)) == (
            ro["x"], ro["y"], ro["width"], ro["height"]), f"frame {t}"


def test_config4_640x480_detection_and_head_events():
    """640x480 frames: multi-scale detection locks on the synthetic face,
    whitebalance gating runs, headtrackingEvents flow (BASELINE config 4)."""
    import os
    d = np.load(os.path.join(os.path.dirname(ht.__file__), "data",
                             "synthface.npz"))
    face = d["rgb"]
    H, W = 480, 640
    # place at a 4-aligned position; also scale the face 2x (nearest) so the
    # detector finds it at a later scale step too
    face2 = np.repeat(np.repeat(face, 2, axis=0), 2, axis=1)
    clip = np.full((30, H, W, 3), (120, 100, 90), np.uint8)
    for t in range(30):
        px = 296 + 2 * max(0, t - 16)
        clip[t, 216:264, px:px + 48] = face2

    bus = ht.events.EventBus()
    t = ht.Tracker(ui=False, bus=bus)
    heads = []
    statuses = []
    bus.add_event_listener(ht.events.HEADTRACKING, lambda e: heads.append(e))
    bus.add_event_listener(ht.events.STATUS, lambda e: statuses.append(e.status))
    assert t.init(ClipSource(clip), canvas=(W, H))
    t.run_clip()
    dedup = [s for i, s in enumerate(statuses) if i == 0 or statuses[i - 1] != s]
    assert dedup[:2] == ["whitebalance", "detecting"]
    assert "found" in dedup
    assert len(heads) >= 5
    assert 30 < heads[0].z < 120


def test_config4_detection_at_640x480_finds_2x_face():
    import os
    d = np.load(os.path.join(os.path.dirname(ht.__file__), "data",
                             "synthface.npz"))
    face2 = np.repeat(np.repeat(d["rgb"], 2, axis=0), 2, axis=1)
    f = np.full((480, 640, 3), (120, 100, 90), np.uint8)
    f[216:264, 296:344] = face2
    dets = ht.ccv.detect_objects(ht.ccv.grayscale(f), ht.cascade(), 5, 1)
    best = max(dets, key=lambda r: r["confidence"])
    assert best["confidence"] > -10
    assert abs(best["x"] - 296) < 25 and abs(best["y"] - 216) < 25
    assert 35 < best["width"] < 65  # ~2x scale
