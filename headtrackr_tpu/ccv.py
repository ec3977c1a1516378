"""API-parity namespace for the detector: headtrackr_tpu.ccv.

Mirrors headtrackr.ccv (src/ccv.js) with arrays in place of canvases:
  - grayscale(rgb)                          src/ccv.js:22-32
  - detect_objects(gray, cascade, interval, min_neighbors)   src/ccv.js:109-333

detect_objects returns a list of dicts (x, y, width, height, neighbors,
confidence) like the JS, computed on-device by the batched dense detector and
materialized to host.  For the jit-able array-native interface use
headtrackr_tpu.models.detector directly.
"""

import jax.numpy as jnp
import numpy as np

from .models.detector import detect_objects_padded, detect_candidates
from .ops.imageproc import grayscale as _grayscale

__all__ = ["grayscale", "detect_objects"]


def grayscale(image):
    """RGB (H, W, 3) u8 -> gray (H, W) u8 (defined integer spec)."""
    return _grayscale(jnp.asarray(image))


def detect_objects(gray, cascade, interval=5, min_neighbors=1):
    """Grouped face detections on a grayscale u8 image, host-materialized."""
    gray = jnp.asarray(gray)
    if gray.ndim == 3:
        gray = _grayscale(gray)
    if not min_neighbors > 0:
        out = detect_candidates(gray, cascade, interval)
        valid = np.asarray(out["valid"])
        return [dict(x=float(out["x"][i]), y=float(out["y"][i]),
                     width=float(out["width"][i]), height=float(out["height"][i]),
                     neighbor=1, confidence=float(out["confidence"][i]))
                for i in np.nonzero(valid)[0]]
    g = detect_objects_padded(gray, cascade, interval, min_neighbors)
    kept = np.asarray(g["kept"])
    return [dict(x=float(g["x"][i]), y=float(g["y"][i]),
                 width=float(g["width"][i]), height=float(g["height"][i]),
                 neighbors=int(g["neighbors"][i]),
                 confidence=float(g["confidence"][i]))
            for i in np.nonzero(kept)[0]]
