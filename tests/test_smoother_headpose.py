"""Smoother EMA semantics + head-position geometry vs oracle."""

import numpy as np

from headtrackr_tpu.oracle.smoother import Smoother
from headtrackr_tpu.oracle.headposition import HeadPositionTracker
from headtrackr_tpu.models import headpose as hp

import jax
import jax.numpy as jnp


def test_smoother_is_ema():
    """The reference's aliasing bug degrades DESP to plain EMA (SURVEY Numerics.1)."""
    s = Smoother(0.35, 35)
    s.init(dict(x=10.0, y=20.0, width=30.0, height=40.0))
    out = s.smooth(dict(x=10.0, y=20.0, width=30.0, height=40.0))
    assert out["x"] == 10.0  # first smooth of same value is identity
    out = s.smooth(dict(x=20.0, y=20.0, width=30.0, height=40.0))
    assert abs(out["x"] - (0.35 * 20 + 0.65 * 10)) < 1e-12


def test_smoother_predict_parity_and_desp():
    """predict (src/smoother.js:61-88): with the reference's aliasing bug
    (mode='ema') it returns the current smoothed position for ANY time;
    mode='desp' extrapolates the trend."""
    import headtrackr_tpu as ht
    s = ht.Smoother(0.35, 35)
    assert s.predict() is False  # uninitialized, like smooth()
    s.init(dict(x=10.0, y=0.0, width=0.0, height=0.0))
    s.smooth(dict(x=20.0, y=0.0, width=0.0, height=0.0))
    cur = float(np.asarray(s._sp)[0])
    for t in (0, 35, 200):
        assert abs(s.predict(t)["x"] - cur) < 1e-6  # sp2 === sp => returns sp
    d = ht.Smoother(0.35, 35, mode="desp")
    d.init(dict(x=0.0, y=0.0, width=0.0, height=0.0))
    for v in (10.0, 20.0, 30.0):
        d.smooth(dict(x=v, y=0.0, width=0.0, height=0.0))
    p0, p1 = d.predict(0)["x"], d.predict(70)["x"]
    sp, sp2 = float(np.asarray(d._sp)[0]), float(np.asarray(d._sp2)[0])
    assert abs(p0 - (2 * sp - sp2)) < 1e-6
    ratio = 0.35 * 2 / 0.65  # step = 70/35 >> 0 = 2
    assert abs(p1 - ((2 + ratio) * sp - (1 + ratio) * sp2)) < 1e-6
    assert p1 > p0  # rising trend extrapolates upward


def test_smoother_desp_mode_differs():
    s = Smoother(0.35, 35, mode="desp")
    s.init(dict(x=0.0, y=0.0, width=0.0, height=0.0))
    for v in [10.0, 20.0, 30.0]:
        out = s.smooth(dict(x=v, y=0.0, width=0.0, height=0.0))
    e = Smoother(0.35, 35)
    e.init(dict(x=0.0, y=0.0, width=0.0, height=0.0))
    for v in [10.0, 20.0, 30.0]:
        out_e = e.smooth(dict(x=v, y=0.0, width=0.0, height=0.0))
    assert out["x"] != out_e["x"]  # trend term reacts faster


def _jax_track(face, hdc, tanfov, W, H, off=11.5, edge=True):
    f = jax.jit(lambda a, b, c, d, e: hp.track_head(
        a, b, c, d, e, jnp.float32(tanfov), jnp.float32(W), jnp.float32(H),
        off, edge))
    x, y, z, nd = f(jnp.float32(face["x"]), jnp.float32(face["y"]),
                    jnp.float32(face["width"]), jnp.float32(face["height"]),
                    jnp.float32(hdc))
    return float(x), float(y), float(z), float(nd)


def test_headpose_center_and_edges():
    W, H = 320, 240
    init = dict(x=160.0, y=120.0, width=60.0, height=60.0)
    o = HeadPositionTracker(init, W, H)
    tanfov = o.tan_fov_width
    cases = [
        dict(x=160.0, y=120.0, width=60.0, height=60.0),   # center
        dict(x=40.0, y=120.0, width=60.0, height=60.0),    # left-ish
        dict(x=33.0, y=120.0, width=60.0, height=60.0),    # on left edge margin
        dict(x=160.0, y=28.0, width=60.0, height=60.0),    # top edge
        dict(x=33.0, y=28.0, width=60.0, height=60.0),     # corner
        dict(x=300.0, y=225.0, width=60.0, height=60.0),   # bottom-right corner
    ]
    hdc = o.head_diag_cam
    for face in cases:
        want = o.track(face)
        got = _jax_track(face, hdc, tanfov, W, H)
        assert abs(got[0] - want["x"]) < 1e-3, face
        assert abs(got[1] - want["y"]) < 1e-3, face
        assert abs(got[2] - want["z"]) < 1e-2, face
        hdc = got[3]
        assert abs(hdc - o.head_diag_cam) < 1e-3, face


def test_fov_estimate_matches_oracle():
    W, H = 320, 240
    face = dict(x=160.0, y=120.0, width=60.0, height=80.0)
    o = HeadPositionTracker(face, W, H)
    est = float(jax.jit(lambda w, h: hp.estimate_fov_width(
        w, h, jnp.float32(W)))(jnp.float32(60.0), jnp.float32(80.0)))
    assert abs(est - o.fov_width) < 1e-5
    assert abs(est * 180 / np.pi - o.get_fov()) < 1e-3


def test_edgecorrection_off():
    W, H = 320, 240
    face = dict(x=33.0, y=28.0, width=60.0, height=60.0)
    o = HeadPositionTracker(face, W, H, edgecorrection=False)
    want = o.track(face)
    got = _jax_track(face, o.head_diag_cam, o.tan_fov_width, W, H, edge=False)
    assert abs(got[0] - want["x"]) < 1e-3
    assert abs(got[2] - want["z"]) < 1e-2
