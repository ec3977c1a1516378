"""API-parity namespace: headtrackr_tpu.headposition (mirrors headtrackr.headposition).

Stateful object API over the pure jitted geometry in models/headpose.py — the
same device code the pipeline runs in-step (models/facetracker.py); the NumPy
transcription in oracle/headposition.py is used only as a test reference.
Spec: src/headposition.js:35-201.  Emits headtrackingEvent on the process-local
event bus like the reference dispatches on document.
"""

import functools
import math

import jax
import jax.numpy as jnp

from .models import headpose as _hp
from .runtime import events as _events

__all__ = ["Tracker", "TrackObj"]


class TrackObj:
    """src/headposition.js:206-218: head position in cm rel. to screen center."""

    def __init__(self, x=None, y=None, z=None):
        self.x = x
        self.y = y
        self.z = z

    def clone(self):
        return TrackObj(self.x, self.y, self.z)

    def __repr__(self):
        return f"TrackObj(x={self.x}, y={self.y}, z={self.z})"


@functools.lru_cache(maxsize=None)
def _fov_fn():
    return jax.jit(lambda w, h, cw, dts: _hp.estimate_fov_width(w, h, cw, dts))


@functools.lru_cache(maxsize=None)
def _track_fn(edgecorrection):
    def f(fx, fy, fw, fh, hdc, tanfov, cw, ch, off):
        return _hp.track_head(fx, fy, fw, fh, hdc, tanfov, cw, ch, off,
                              edgecorrection)
    return jax.jit(f)


class Tracker:
    def __init__(self, facetrackrObj, camwidth, camheight, params=None,
                 send_events=True):
        params = params or {}
        face = _as_dict(facetrackrObj)
        self._camw = float(camwidth)
        self._camh = float(camheight)
        self._edge = bool(params.get("edgecorrection", True))
        self._offset = float(params.get(
            "distance_from_camera_to_screen", 11.5))
        w, h = float(face["width"]), float(face["height"])
        self._head_diag_cam = jnp.float32(math.sqrt(w * w + h * h))
        if params.get("fov") is not None:
            self._fov_width = float(params["fov"]) * math.pi / 180.0
        else:
            dts = float(params.get("distance_to_screen") or 60.0)
            self._fov_width = float(_fov_fn()(
                jnp.float32(w), jnp.float32(h), jnp.float32(self._camw),
                jnp.float32(dts)))
        self._tan_fov = 2.0 * math.tan(self._fov_width / 2.0)
        self._send_events = send_events
        self.x = self.y = self.z = None

    def track(self, facetrackrObj):
        face = _as_dict(facetrackrObj)
        x, y, z, hdc = _track_fn(self._edge)(
            jnp.float32(face["x"]), jnp.float32(face["y"]),
            jnp.float32(face["width"]), jnp.float32(face["height"]),
            self._head_diag_cam, jnp.float32(self._tan_fov),
            jnp.float32(self._camw), jnp.float32(self._camh),
            jnp.float32(self._offset))
        self._head_diag_cam = hdc
        self.x, self.y, self.z = float(x), float(y), float(z)
        out = dict(x=self.x, y=self.y, z=self.z)
        if self._send_events:
            _events.dispatch_event("headtrackingEvent", out)
        return TrackObj(self.x, self.y, self.z)

    def getTrackerObj(self):
        return TrackObj(self.x, self.y, self.z)

    def getFOV(self):
        return self._fov_width * 180.0 / math.pi


def _as_dict(pos):
    if isinstance(pos, dict):
        return pos
    return dict(x=pos.x, y=pos.y, width=pos.width, height=pos.height,
                angle=getattr(pos, "angle", 0.0))
