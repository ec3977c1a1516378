"""Host-side convenience API mirroring the reference's top-level helpers.

  - getWhitebalance(image)   (src/whitebalance.js:5-29)
  - Smoother(alpha, interval) (src/smoother.js:13-89; observable behavior = EMA,
    see oracle/smoother.py; mode="desp" gives the intended double-exponential
    smoothing behind a flag)
"""

import jax.numpy as jnp
import numpy as np

from .ops.imageproc import whitebalance as _wb
from .oracle.smoother import Smoother as _OracleSmoother

__all__ = ["getWhitebalance", "Smoother"]


def getWhitebalance(image):
    """Mean gray value of an RGB (H, W, 3) u8 frame."""
    return float(_wb(jnp.asarray(image)))


class Smoother:
    """Positional smoother over {x, y, z, width, height} dicts.

    Parity target is EMA (the reference's latent aliasing bug); pass
    mode="desp" for correct LaViola double-exponential smoothing.
    """

    def __init__(self, alpha=0.35, interval=35, mode="ema"):
        self._s = _OracleSmoother(alpha, interval, mode)

    @property
    def initialized(self):
        return self._s.initialized

    def init(self, pos):
        self._s.init(_as_dict(pos))

    def smooth(self, pos):
        return self._s.smooth(_as_dict(pos))


def _as_dict(pos):
    if isinstance(pos, dict):
        return pos
    return dict(x=pos.x, y=pos.y, z=getattr(pos, "z", 0.0),
                width=pos.width, height=pos.height)
