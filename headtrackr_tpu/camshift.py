"""API-parity namespace: headtrackr_tpu.camshift (mirrors headtrackr.camshift).

Canvas-free port of the reference interface (src/camshift.js:148-354): frames
are (H, W, 3) u8 arrays.  The heavy lifting runs on-device via
headtrackr_tpu.models.camshift; this wrapper provides the stateful object API
(initTracker / track / getTrackObj / getBackProjectionImg).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .models import camshift as mc
from .ops.histogram import (backprojection_pdf, backprojection_weights,
                            histogram_4096, rgb_bins)

__all__ = ["Tracker", "Rectangle", "TrackObj", "Histogram"]


class Rectangle:
    """src/camshift.js:127-141."""

    def __init__(self, x=0, y=0, w=0, h=0):
        self.x = x
        self.y = y
        self.width = w
        self.height = h

    def clone(self):
        return Rectangle(self.x, self.y, self.width, self.height)

    def __repr__(self):
        return f"Rectangle({self.x}, {self.y}, {self.width}, {self.height})"


class TrackObj:
    """src/camshift.js:362-378: x/y = center of tracked object."""

    def __init__(self, x=0, y=0, width=0, height=0, angle=0.0):
        self.x = x
        self.y = y
        self.width = width
        self.height = height
        self.angle = angle

    def clone(self):
        return TrackObj(self.x, self.y, self.width, self.height, self.angle)

    def __repr__(self):
        return (f"TrackObj(x={self.x}, y={self.y}, w={self.width}, "
                f"h={self.height}, angle={self.angle})")


def Histogram(image):
    """4096-bin RGB histogram of an (H, W, 3) u8 image (src/camshift.js:49-72)."""
    return np.asarray(histogram_4096(rgb_bins(jnp.asarray(image))))


class Tracker:
    """Stateful camshift tracker over array frames."""

    def __init__(self, params=None, calcAngles=None):
        params = params or {}
        if calcAngles is None:
            calcAngles = params.get("calcAngles", True)  # src/camshift.js:151
        self.calc_angles = bool(calcAngles)
        self._state = None
        self._pdf = None
        # conformance-facing API: bit-faithful f32 math on every backend
        # (serving uses TrackerConfig.exactCamshift to choose)
        self._step = jax.jit(
            lambda s, f: mc.track(s, f, self.calc_angles, exact=True))

    def initTracker(self, image, rect):
        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        r = jnp.asarray([int(rect.x), int(rect.y),
                         int(rect.width), int(rect.height)], jnp.int32)
        self._state = mc.init_tracker(jnp.asarray(image), r)
        self._pdf = None

    def track(self, image):
        assert self._state is not None, "initTracker first"
        h, w = np.asarray(image).shape[:2]
        if w == 0 or h == 0:  # src/camshift.js:219
            return self.getTrackObj()
        self._state, self._pdf = self._step(self._state, jnp.asarray(image))
        return self.getTrackObj()

    def getTrackObj(self):
        s = self._state
        return TrackObj(int(s.track_x), int(s.track_y), int(s.track_w),
                        int(s.track_h), float(s.track_angle))

    def getSearchWindow(self):
        x, y, w, h = np.asarray(self._state.window).tolist()
        return Rectangle(x, y, w, h)

    def getPdf(self):
        return np.asarray(self._pdf) if self._pdf is not None else None

    def getBackProjectionImg(self):
        """Grayscale (H, W, 3) u8 rendering of the pdf (src/camshift.js:177-196)."""
        pdf = self.getPdf()
        if pdf is None:
            return None
        val = np.floor(255 * pdf).astype(np.uint8)
        return np.stack([val, val, val], axis=-1)
