"""Jitted image primitives: grayscale, whitebalance, defined bilinear resize, pyramid.

These implement the same *defined spec* as the NumPy oracle
(headtrackr_tpu/oracle/imageproc.py) so golden tests can demand exact equality:
integer grayscale, float32 bilinear with half-pixel centers, round-half-even u8.

All shapes are static: the pyramid geometry is computed at trace time from the
input shape (mirroring src/ccv.js:113-147), so everything fuses under one jit.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grayscale", "whitebalance", "resize_bilinear", "build_pyramid",
           "PyramidSpec", "pyramid_spec"]

# How resize_bilinear fetches the 4 neighbor grids (A/B knob,
# tools/exp_detect_split.py --pyr-gather):
#   "onehot"  two constant one-hot matmuls on the MXU — (2dh, sh) @ src @
#             (sw, 2dw).  BIT-EXACT vs the take form: a one-hot row selects
#             exactly one u8 value (integers <= 255 are bf16-exact, single
#             product, f32 accumulator), and the f32 lerp chain downstream
#             is untouched.  Motivation: under vmap the batched take
#             lowers to gathers; the detect-tick split (r5) priced the
#             pyramid at ~34 of 82 ms/tick at 256 streams.
#   "take"    jnp.take with constant indices (the r1-r4 form).
PYRAMID_GATHER = "onehot"


def grayscale(rgb):
    """(..., H, W, 3) u8 -> (..., H, W) u8.  Spec: (30 r + 59 g + 11 b + 50) // 100."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    return ((30 * r + 59 * g + 11 * b + 50) // 100).astype(jnp.uint8)


def whitebalance(rgb):
    """Mean gray value (avgR + avgG + avgB) / 3.  src/whitebalance.js:17-28."""
    m = jnp.mean(rgb.astype(jnp.float32), axis=(-3, -2))
    return (m[..., 0] + m[..., 1] + m[..., 2]) / 3.0


def resize_bilinear(src, sx, sy, sw, sh, dw, dh, out_w, out_h):
    """Defined drawImage replacement; mirrors oracle.draw_image exactly.

    src: (H, W) u8.  All geometry args are Python ints (static).  Returns
    (out_h, out_w) u8 with [0:dh, 0:dw] filled and the rest zero.
    """
    if dw <= 0 or dh <= 0 or sw <= 0 or sh <= 0:
        return jnp.zeros((out_h, out_w), jnp.uint8)

    # Precompute sampling grids in NumPy float32 (identical arithmetic to oracle).
    rx = np.float32(sw) / np.float32(dw)
    ry = np.float32(sh) / np.float32(dh)
    u = np.arange(dw, dtype=np.float32)
    v = np.arange(dh, dtype=np.float32)
    xs = np.clip(np.float32(sx) + (u + np.float32(0.5)) * rx - np.float32(0.5),
                 sx, sx + sw - 1)
    ys = np.clip(np.float32(sy) + (v + np.float32(0.5)) * ry - np.float32(0.5),
                 sy, sy + sh - 1)
    x0 = np.floor(xs).astype(np.int32)
    y0 = np.floor(ys).astype(np.int32)
    x1 = np.minimum(x0 + 1, sx + sw - 1)
    y1 = np.minimum(y0 + 1, sy + sh - 1)
    fx = (xs - x0.astype(np.float32)).astype(np.float32)
    fy = (ys - y0.astype(np.float32)).astype(np.float32)

    s = src.astype(jnp.float32)
    if PYRAMID_GATHER == "onehot":
        # Constant one-hot selection matmuls (see PYRAMID_GATHER): grid
        # holds the four neighbor planes [y0x0 y0x1; y1x0 y1x1].  Exact:
        # each output element is ONE u8 value (<= 255, bf16-exact) times
        # 1.0 into an f32 accumulator.
        sh_, sw_ = src.shape
        sel_y = np.zeros((2 * dh, sh_), np.float32)
        sel_y[np.arange(dh), y0] = 1.0
        sel_y[dh + np.arange(dh), y1] = 1.0
        sel_x = np.zeros((sw_, 2 * dw), np.float32)
        sel_x[x0, np.arange(dw)] = 1.0
        sel_x[x1, dw + np.arange(dw)] = 1.0
        rows = jnp.dot(jnp.asarray(sel_y), s,
                       preferred_element_type=jnp.float32)   # (2dh, sw)
        grid = jnp.dot(rows, jnp.asarray(sel_x),
                       preferred_element_type=jnp.float32)   # (2dh, 2dw)
        top = (grid[:dh, :dw] * (1 - fx)[None, :]
               + grid[:dh, dw:] * fx[None, :])
        bot = (grid[dh:, :dw] * (1 - fx)[None, :]
               + grid[dh:, dw:] * fx[None, :])
    else:
        # Static gathers along rows/cols (take with constant indices).
        rows0 = jnp.take(s, y0, axis=0)
        rows1 = jnp.take(s, y1, axis=0)
        top = (jnp.take(rows0, x0, axis=1) * (1 - fx)[None, :]
               + jnp.take(rows0, x1, axis=1) * fx[None, :])
        bot = (jnp.take(rows1, x0, axis=1) * (1 - fx)[None, :]
               + jnp.take(rows1, x1, axis=1) * fx[None, :])
    val = top * (1 - fy)[:, None] + bot * fy[:, None]
    out = jnp.rint(jnp.clip(val, 0, 255)).astype(jnp.uint8)
    if out_w != dw or out_h != dh:
        out = jnp.zeros((out_h, out_w), jnp.uint8).at[:dh, :dw].set(out)
    return out


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static pyramid geometry for a given input size (src/ccv.js:110-147)."""
    w0: int
    h0: int
    interval: int
    scale: float
    scale_upto: int
    next: int
    dims: tuple  # dims[i] = (w, h) for level i

    def plane_key(self, i, q=0):
        return i * 4 + q


@functools.lru_cache(maxsize=32)
def pyramid_spec(w0, h0, interval=5):
    scale = 2.0 ** (1.0 / (interval + 1))
    next_ = interval + 1
    scale_upto = int(math.floor(math.log(24.0) / math.log(scale)))
    dims = {0: (w0, h0)}
    for i in range(1, interval + 1):
        dims[i] = (max(1, int(math.floor(w0 / scale ** i))),
                   max(1, int(math.floor(h0 / scale ** i))))
    for i in range(next_, scale_upto + next_ * 2):
        pw, ph = dims[i - next_]
        dims[i] = (max(1, pw // 2), max(1, ph // 2))
    return PyramidSpec(w0, h0, interval, scale, scale_upto, next_,
                       tuple(sorted(dims.items())))


def build_pyramid(gray, interval=5):
    """gray: (H, W) u8 -> (dict plane_key -> u8 array, PyramidSpec).

    Plane keys follow the JS ``pyr`` indexing: ``i*4 + q``; q in {1,2,3} are the
    shifted half-scale variants built for i >= 2*(interval+1) (src/ccv.js:131-147).
    """
    h0, w0 = gray.shape
    spec = pyramid_spec(w0, h0, interval)
    dims = dict(spec.dims)
    next_ = spec.next

    pyr = {0: gray}
    for i in range(1, interval + 1):
        w, h = dims[i]
        pyr[i * 4] = resize_bilinear(gray, 0, 0, w0, h0, w, h, w, h)
    for i in range(next_, spec.scale_upto + next_ * 2):
        src = pyr[(i - next_) * 4]
        sh_, sw_ = src.shape
        w, h = dims[i]
        pyr[i * 4] = resize_bilinear(src, 0, 0, sw_, sh_, w, h, w, h)
    for i in range(next_ * 2, spec.scale_upto + next_ * 2):
        src = pyr[(i - next_) * 4]
        sh_, sw_ = src.shape
        w, h = dims[i]
        pyr[i * 4 + 1] = resize_bilinear(src, 1, 0, sw_ - 1, sh_, w - 2, h, w, h)
        pyr[i * 4 + 2] = resize_bilinear(src, 0, 1, sw_, sh_ - 1, w, h - 2, w, h)
        pyr[i * 4 + 3] = resize_bilinear(src, 1, 1, sw_ - 1, sh_ - 1, w - 2, h - 2, w, h)
    return pyr, spec
