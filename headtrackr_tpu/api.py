"""Host-side convenience API mirroring the reference's top-level helpers.

  - getWhitebalance(image)   (src/whitebalance.js:5-29)
  - Smoother(alpha, interval) (src/smoother.js:13-89; observable behavior = EMA
    because of the reference's sp2-aliasing and msDiff bugs — see
    oracle/smoother.py for the analysis; mode="desp" gives the intended
    double-exponential smoothing behind a flag)

Both run the jitted device ops; the NumPy transcriptions in oracle/ are test
references only.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ops.imageproc import whitebalance as _wb

__all__ = ["getWhitebalance", "Smoother"]


def getWhitebalance(image):
    """Mean gray value of an RGB (H, W, 3) u8 frame."""
    return float(jax.jit(_wb)(jnp.asarray(image)))


@functools.lru_cache(maxsize=None)
def _smooth_fn(mode):
    def f(sp, sp2, cur, alpha):
        a = alpha
        nsp = a * cur + (1 - a) * sp
        if mode == "desp":
            nsp2 = a * nsp + (1 - a) * sp2
            out = 2 * nsp - nsp2
        else:  # parity: the reference's aliasing bug makes sp2 === sp
            nsp2 = nsp
            out = nsp
        return nsp, nsp2, out
    return jax.jit(f)


class Smoother:
    """Positional smoother over {x, y, z, width, height} dicts.

    Parity target is EMA (the reference's latent aliasing bug,
    src/smoother.js:27-28,44-46); pass mode="desp" for correct LaViola
    double-exponential smoothing.  State lives on device; one jitted call
    per smooth().
    """

    def __init__(self, alpha=0.35, interval=35, mode="ema"):
        self.alpha = float(alpha)
        self.interval = float(interval)
        self.mode = mode
        self.initialized = False
        self._sp = None
        self._sp2 = None

    def init(self, pos):
        """pos: dict/obj with x, y, width, height (z optional, default 0)."""
        v = _as_vec(pos)
        self._sp = jnp.asarray(v, jnp.float32)
        self._sp2 = jnp.asarray(v, jnp.float32)
        self.initialized = True

    def smooth(self, pos):
        if not self.initialized:
            return False
        cur = jnp.asarray(_as_vec(pos), jnp.float32)
        self._sp, self._sp2, out = _smooth_fn(self.mode)(
            self._sp, self._sp2, cur, jnp.float32(self.alpha))
        x, y, z, w, h = np.asarray(out).tolist()
        pos = dict(_as_dict(pos))
        pos.update(x=x, y=y, z=z, width=w, height=h)
        return pos

    def predict(self, time=0):
        """Extrapolated position (src/smoother.js:61-88).

        Parity note: in the reference, ``sp2`` aliases ``sp`` and the
        interpolation branch is dead code (wrong ``this``,
        src/smoother.js:23,65), so ``predict(t)`` observably returns the
        current smoothed position for any ``t`` — which is exactly what
        mode="ema" reproduces here.  mode="desp" implements the live
        (non-interpolating) branch faithfully: step = ``t/interval >> 0``,
        ratio = alpha*step/(1-alpha), 2+ratio times sp minus 1+ratio times
        sp2 (src/smoother.js:78-85)."""
        if not self.initialized:
            return False
        sp = np.asarray(self._sp, np.float64)
        sp2 = np.asarray(self._sp2, np.float64)
        step = int(time / self.interval)  # JS ``>> 0`` truncation
        ratio = (self.alpha * step) / (1.0 - self.alpha)
        out = (2.0 + ratio) * sp - (1.0 + ratio) * sp2
        x, y, z, w, h = out.tolist()
        return dict(x=x, y=y, z=z, width=w, height=h)


def _as_dict(pos):
    if isinstance(pos, dict):
        return pos
    return dict(x=pos.x, y=pos.y, z=getattr(pos, "z", 0.0),
                width=pos.width, height=pos.height)


def _as_vec(pos):
    d = _as_dict(pos)
    return [d["x"], d["y"], d.get("z", 0.0) or 0.0, d["width"], d["height"]]
