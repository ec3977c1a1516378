"""API-parity namespace: headtrackr_tpu.headposition (mirrors headtrackr.headposition).

Stateful object API over the pure jitted geometry in models/headpose.py.
Spec: src/headposition.js:35-201.  Emits headtrackingEvent on the process-local
event bus like the reference dispatches on document.
"""

import numpy as np

from .oracle.headposition import HeadPositionTracker as _Oracle
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


class Tracker:
    def __init__(self, facetrackrObj, camwidth, camheight, params=None,
                 send_events=True):
        params = params or {}
        face = _as_dict(facetrackrObj)
        self._o = _Oracle(
            face, camwidth, camheight,
            fov=params.get("fov"),
            distance_to_screen=params.get("distance_to_screen"),
            edgecorrection=params.get("edgecorrection", True),
            distance_from_camera_to_screen=params.get(
                "distance_from_camera_to_screen", 11.5))
        self._send_events = send_events

    def track(self, facetrackrObj):
        out = self._o.track(_as_dict(facetrackrObj))
        if self._send_events:
            _events.dispatch_event("headtrackingEvent", out)
        return TrackObj(out["x"], out["y"], out["z"])

    def getTrackerObj(self):
        return TrackObj(self._o.x, self._o.y, self._o.z)

    def getFOV(self):
        return self._o.get_fov()


def _as_dict(pos):
    if isinstance(pos, dict):
        return pos
    return dict(x=pos.x, y=pos.y, width=pos.width, height=pos.height,
                angle=getattr(pos, "angle", 0.0))
