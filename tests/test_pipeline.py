"""End-to-end state machine tests: jitted step vs pipeline oracle on clips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headtrackr_tpu.cascade import toy_cascade
from headtrackr_tpu.config import TrackerConfig
from headtrackr_tpu.oracle.pipeline import HeadTracker
from headtrackr_tpu.models import facetracker as ft

H, W = 120, 160
MODES = {"WB": 0, "VJ": 1, "CS": 2}
BITS = [(1, "whitebalance"), (2, "detecting"), (4, "found"),
        (8, "redetecting"), (16, "lost")]


def _frame(cx=None, cy=None, blue=False):
    if blue:
        f = np.zeros((H, W, 3), np.uint8)
        f[..., 2] = 250
        return f
    f = np.full((H, W, 3), 40, np.uint8)
    if cx is not None:
        f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    return f


def _clip_track_lose_refind():
    clip = [_frame(60, 50)] * 16
    clip += [_frame(60 + t, 50) for t in range(15)]
    clip += [_frame(blue=True)] * 3
    clip += [_frame(80, 60)] * 10
    return clip


def _run_both(clip, cfg):
    oracle = HeadTracker(toy_cascade(), W, H,
                         smoothing=cfg.smoothing,
                         retry_detection=cfg.retryDetection,
                         camera_offset=cfg.cameraOffset,
                         head_position=cfg.headPosition)
    step = jax.jit(ft.make_step(toy_cascade(), cfg, (H, W)))
    st = ft.init_state(cfg.whitebalancing)
    stat_j = []
    rows = []
    for f in clip:
        ro = oracle.step(f)
        st, out = step(st, jnp.asarray(f))
        for bit, name in BITS:
            if int(out.status) & bit:
                stat_j.append(name)
        rows.append((ro, out, int(st.mode)))
        if oracle.stopped:
            break
    return oracle, stat_j, rows


def test_full_lifecycle_parity():
    oracle, stat_j, rows = _run_both(_clip_track_lose_refind(), TrackerConfig())
    assert oracle.statuses == stat_j
    for t, (ro, out, mode_j) in enumerate(rows):
        assert MODES[ro["face"]["detection"]] == int(out.detection), t
        assert MODES[oracle.facetracker.mode] if t == len(rows) - 1 else True
        hp_o = ro["headpos"]
        assert (hp_o is None) == (not bool(out.head_valid)), t
        if hp_o is not None:
            assert abs(hp_o["x"] - float(out.head_x)) < 0.05, t
            assert abs(hp_o["y"] - float(out.head_y)) < 0.05, t
            assert abs(hp_o["z"] - float(out.head_z)) < 0.05, t


def test_lifecycle_includes_redetect():
    oracle, stat_j, _ = _run_both(_clip_track_lose_refind(), TrackerConfig())
    dedup = [s for i, s in enumerate(stat_j) if i == 0 or stat_j[i - 1] != s]
    assert dedup == ["whitebalance", "detecting", "found", "redetecting", "found"]


def test_retry_false_stops():
    cfg = TrackerConfig(retryDetection=False)
    oracle, stat_j, rows = _run_both(_clip_track_lose_refind(), cfg)
    assert "lost" in stat_j
    assert oracle.statuses == stat_j
    # jitted state reports stopped
    step = jax.jit(ft.make_step(toy_cascade(), cfg, (H, W)))
    st = ft.init_state()
    for f in _clip_track_lose_refind():
        st, out = step(st, jnp.asarray(f))
        if bool(st.stopped):
            break
    assert bool(st.stopped)


def test_smoothing_off_matches_oracle():
    cfg = TrackerConfig(smoothing=False)
    oracle, stat_j, rows = _run_both(_clip_track_lose_refind(), cfg)
    assert oracle.statuses == stat_j
    for t, (ro, out, _) in enumerate(rows):
        if ro["face"]["detection"] == "CS" and ro["face"]["width"] > 0:
            assert abs(ro["face"]["x"] - float(out.smooth_x)) < 0.2, t
            assert abs(ro["face"]["width"] - float(out.smooth_w)) < 0.2, t


def test_fov_param_respected():
    cfg = TrackerConfig(fov=60.0)
    step = jax.jit(ft.make_step(toy_cascade(), cfg, (H, W)))
    st = ft.init_state()
    for f in _clip_track_lose_refind()[:31]:
        st, out = step(st, jnp.asarray(f))
    assert abs(float(out.fov_deg) - 60.0) < 1e-3


def test_event_payload_matches_oracle_raw():
    """facetrackingEvent carries the RAW CS result, pre-smoothing
    (src/facetrackr.js:112-125 dispatches before main.js smoothing)."""
    clip = _clip_track_lose_refind()[:25]
    cfg = TrackerConfig()
    oracle = HeadTracker(toy_cascade(), W, H)
    step = jax.jit(ft.make_step(toy_cascade(), cfg, (H, W)))
    st = ft.init_state()
    ev_j = []
    for f in clip:
        oracle.step(f)
        st, out = step(st, jnp.asarray(f))
        if bool(out.event_face):
            ev_j.append((float(out.face_x), float(out.face_y),
                         float(out.face_w), float(out.face_h)))
    ev_o = [(e[1]["x"], e[1]["y"], e[1]["width"], e[1]["height"])
            for e in oracle.facetracker.events]
    assert len(ev_j) == len(ev_o) > 0
    for a, b in zip(ev_j, ev_o):
        assert all(abs(x - y) <= 1 for x, y in zip(a, b))


def test_vmap_batch_independence():
    """N identical streams => N identical outputs; mixed streams independent."""
    cfg = TrackerConfig()
    step = jax.jit(jax.vmap(ft.make_step(toy_cascade(), cfg, (H, W))))
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x] * 3), ft.init_state())
    fa = _frame(60, 50)
    fb = _frame(90, 70)
    for t in range(20):
        frames = jnp.stack([jnp.asarray(fa), jnp.asarray(fa), jnp.asarray(fb)])
        st, out = step(st, frames)
    modes = np.asarray(st.mode).tolist()
    assert modes == [2, 2, 2]
    # streams 0 and 1 identical, stream 2 different position
    assert float(out.face_x[0]) == float(out.face_x[1])
    assert float(out.face_x[2]) != float(out.face_x[0])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_random_clips_match_oracle(seed):
    """Seeded fuzz: random noise frames with a toy face appearing, moving,
    vanishing at random — the full state machine (mode, statuses, face box,
    head events) must track the oracle exactly on every frame."""
    rng = np.random.default_rng(seed)
    clip = []
    face_on = False
    cx, cy = 60, 50
    for t in range(60):
        # flat background, noise only inside the face: whole-frame noise
        # makes the toy cascade emit equal-confidence NOISE candidates whose
        # best-pick is a tie — ordering there is a documented deviation
        # (docs/PARITY.md deviation 4), not a fuzz target
        f = np.full((H, W, 3), 40, np.uint8)
        if t == 12:
            face_on = True            # appear after WB stabilizes
        if face_on and rng.random() < 0.05:
            face_on = False           # vanish (track loss)
        elif not face_on and t > 14 and rng.random() < 0.3:
            face_on = True
            cx = int(rng.integers(25, W - 25))
            cy = int(rng.integers(25, H - 25))
        if face_on:
            cx = int(np.clip(cx + rng.integers(-2, 3), 14, W - 14))
            cy = int(np.clip(cy + rng.integers(-2, 3), 14, H - 14))
            patch = np.asarray((230, 80, 60), np.int16) + \
                rng.integers(-12, 13, (24, 24, 3))
            f[cy - 12:cy + 12, cx - 12:cx + 12] = \
                np.clip(patch, 0, 255).astype(np.uint8)
        clip.append(f)

    oracle, stat_j, rows = _run_both(clip, TrackerConfig())
    assert oracle.statuses == stat_j
    for t, (ro, out, _mode) in enumerate(rows):
        assert MODES[ro["face"]["detection"]] == int(out.detection), (seed, t)
        if ro["face"]["detection"] == "CS":
            # oracle rows are post-smoothing (f64 EMA) -> compare the
            # smoothed outputs with f32 tolerance
            for k, v in zip(("x", "y", "width", "height"),
                            (out.smooth_x, out.smooth_y,
                             out.smooth_w, out.smooth_h)):
                assert abs(float(ro["face"][k]) - float(v)) < 0.05, \
                    (seed, t, k)
        hp_o = ro["headpos"]
        assert (hp_o is None) == (not bool(out.head_valid)), (seed, t)
        if hp_o is not None:
            assert abs(hp_o["z"] - float(out.head_z)) < 0.05, (seed, t)
