"""Structured-degradation clips: lighting drift, occlusion sweep, scale change.

The seeded fuzz in test_pipeline covers chaotic appear/vanish dynamics; these
clips exercise the *gradual* failure modes a real webcam produces — global
gain drift crossing the 4-bit histogram-bin boundaries (src/camshift.js:62-67),
partial-then-total occlusion degrading backprojection mass toward the
zero-mass loss semantics (src/camshift.js:230 -> src/main.js:230), and the
1.1x adaptive-window growth chasing a scaling subject
(src/camshift.js:257-258).  Every frame must track the oracle exactly through
the full WB->VJ->CS->loss->redetect state machine, on both the single-step
path and the production serving scan (device scheduler + band-local camshift).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import test_pipeline as tp
from headtrackr_tpu.cascade import toy_cascade
from headtrackr_tpu.config import TrackerConfig
from headtrackr_tpu.models import facetracker as ft
from headtrackr_tpu.oracle.pipeline import HeadTracker
from headtrackr_tpu.runtime.serving import make_batched_steps

H, W = tp.H, tp.W


def _blob_frame(cx, cy, side=24, gain=1.0):
    f = np.full((H, W, 3), 40, np.uint8)
    h = side // 2
    f[cy - h:cy + h, cx - h:cx + h] = (230, 80, 60)
    if gain != 1.0:
        f = np.clip(f.astype(np.float32) * gain, 0, 255).astype(np.uint8)
    return f


def _sensor_noise(clip, k=2, seed=11):
    """Deterministic ±k LSB noise: pixel-identical (noise-free) frames park
    the camshift centroid exactly on JS >>0 truncation boundaries, where
    f32-vs-f64 summation rounding decides the result (docs/PARITY.md
    deviation 10) — real camera input is never boundary-degenerate, and the
    structured degradations under test are unaffected."""
    arr = np.stack(clip)
    rng = np.random.default_rng(seed)
    d = rng.integers(-k, k + 1, arr.shape, dtype=np.int16)
    return list(np.clip(arr.astype(np.int16) + d, 0, 255).astype(np.uint8))


def clip_lighting_ramp():
    """Slow-panning subject, global gain 1.0 -> 0.70 -> 1.30 -> 1.0 over 48
    ticks.

    The ramp walks every channel across r>>4 quantization boundaries, so the
    frame histogram drifts away from the locked model histogram tick by tick
    (ratio weights min(model/cur, 1), src/camshift.js:314-330).  The ±2 px
    pan keeps the centroid off the stationary-subject truncation knife edge
    (docs/PARITY.md deviation 10 — a STATIC blob parks m01/m00 on a JS >>0
    boundary for the whole ramp, where f32-vs-f64 rounding races decide)."""
    clip = [_blob_frame(60, 50)] * 16
    gains = np.concatenate([np.linspace(1.0, 0.70, 16),
                            np.linspace(0.70, 1.30, 16),
                            np.linspace(1.30, 1.0, 16)])
    pan = [60 + (2, 1, 0, 1)[t % 4] for t in range(len(gains))]
    clip += [_blob_frame(x, 50, gain=g) for x, g in zip(pan, gains)]
    return _sensor_noise(clip, k=3)


def clip_occlusion_sweep():
    """A 28 px zero-weight (blue) bar sweeps across the tracked blob.

    Partial cover shrinks the backprojection mass (window adapts down);
    total cover zeroes it (width/height -> 0 -> loss -> redetect); the bar
    moves on and the tracker must re-lock the same blob."""
    cx, cy = 80, 50
    clip = [_blob_frame(cx, cy)] * 16
    clip += [_blob_frame(cx, cy)] * 4
    for bar_x in range(36, 120, 4):
        f = _blob_frame(cx, cy)
        f[:, bar_x:bar_x + 28] = (0, 0, 250)
        clip.append(f)
    clip += [_blob_frame(cx, cy)] * 12
    return _sensor_noise(clip)


def clip_scale_change():
    """Subject grows 16 -> 44 px then shrinks back; the 1.1x adaptive search
    window must chase it both ways without losing the lock."""
    cx, cy = 70, 60
    clip = [_blob_frame(cx, cy, side=16)] * 16
    sides = list(range(16, 45, 2)) + list(range(44, 15, -2))
    clip += [_blob_frame(cx, cy, side=s) for s in np.repeat(sides, 2)]
    return _sensor_noise(clip)


@pytest.mark.parametrize("make_clip", [clip_lighting_ramp,
                                       clip_occlusion_sweep,
                                       clip_scale_change],
                         ids=["lighting", "occlusion", "scale"])
def test_hard_clip_matches_oracle(make_clip):
    clip = make_clip()
    oracle, stat_j, rows = tp._run_both(clip, TrackerConfig())
    assert oracle.statuses == stat_j
    for t, (ro, out, _mode) in enumerate(rows):
        assert tp.MODES[ro["face"]["detection"]] == int(out.detection), t
        if ro["face"]["detection"] == "CS":
            for k, v in zip(("x", "y", "width", "height"),
                            (out.smooth_x, out.smooth_y,
                             out.smooth_w, out.smooth_h)):
                assert abs(float(ro["face"][k]) - float(v)) < 0.05, (t, k)


@pytest.mark.parametrize("make_clip", [clip_lighting_ramp,
                                       clip_occlusion_sweep,
                                       clip_scale_change],
                         ids=["lighting", "occlusion", "scale"])
def test_hard_clip_serving_scan_matches_oracle(make_clip):
    """The production path (step_scan: device scheduler, wbtrack cold start,
    bucket redetect, band-local camshift) must stay per-tick identical to the
    oracle through degradation-induced losses and window collapse."""
    clip = np.stack(make_clip())
    cfg = TrackerConfig(smoothing=False, headPosition=False)

    oracle = HeadTracker(toy_cascade(), W, H, smoothing=False,
                         head_position=False)
    orows = []
    for f in clip:
        oracle.step(f)
        tr = dict(oracle.facetracker.cur_tracked)
        orows.append((tr["detection"], tr["x"], tr["y"],
                      tr["width"], tr["height"]))

    _, _, _, _, step_scan = make_batched_steps(
        toy_cascade(), cfg, (H, W), bucket=1, donate=False)
    state1 = ft.init_state(cfg.whitebalancing)
    state = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state1)
    _, out = step_scan(state, jnp.asarray(clip)[:, None])

    det = np.asarray(out.detection)[:, 0]
    dev = np.stack([np.asarray(out.face_x)[:, 0],
                    np.asarray(out.face_y)[:, 0],
                    np.asarray(out.face_w)[:, 0],
                    np.asarray(out.face_h)[:, 0]], axis=1)
    n_cs = 0
    for t, (om, ox, oy, ow, oh) in enumerate(orows):
        if om not in tp.MODES:
            continue  # loss tick: cur_tracked reads the just-rebuilt tracker
        assert tp.MODES[om] == int(det[t]), (t, om, det[t])
        if om == "CS":
            n_cs += 1
            np.testing.assert_allclose(
                dev[t], [ox, oy, ow, oh], atol=1e-4, err_msg=f"tick {t}")
