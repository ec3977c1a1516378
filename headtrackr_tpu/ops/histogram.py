"""Histogram / backprojection ops for the camshift tracker.

Reference math:
  - 4096-bin RGB histogram, bin = 256*(r>>4) + 16*(g>>4) + (b>>4)  (src/camshift.js:62-66)
  - ratio weights  min(model/cur, 1), 0 where cur == 0              (src/camshift.js:314-330)
  - backprojection pdf[p] = weights[bin(p)]                          (src/camshift.js:332-353)
"""

import jax
import jax.numpy as jnp

__all__ = ["rgb_bins", "histogram_4096", "histogram_rect", "backprojection_weights",
           "backprojection_pdf"]

NBINS = 4096


def rgb_bins(rgb):
    """(..., H, W, 3) u8 -> (..., H, W) i32 bin indices."""
    r = (rgb[..., 0].astype(jnp.int32) >> 4)
    g = (rgb[..., 1].astype(jnp.int32) >> 4)
    b = (rgb[..., 2].astype(jnp.int32) >> 4)
    return 256 * r + 16 * g + b


def histogram_4096(bins):
    """(H, W) i32 bin indices -> (4096,) f32 counts (scatter-add)."""
    flat = bins.reshape(-1)
    return jnp.zeros((NBINS,), jnp.float32).at[flat].add(1.0)


def histogram_rect(bins, x, y, w, h):
    """Histogram of the rect [x, x+w) x [y, y+h) only (traced rect).

    Equivalent of Histogram(getImageData(tax, tay, taw, tah)) at src/camshift.js:206-208.
    Out-of-rect pixels are scattered into a dead 4097th slot.
    """
    H, W = bins.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((rows >= y) & (rows < y + h) & (cols >= x) & (cols < x + w))
    tgt = jnp.where(inside, bins, NBINS)
    hist = jnp.zeros((NBINS + 1,), jnp.float32).at[tgt.reshape(-1)].add(1.0)
    return hist[:NBINS]


def backprojection_weights(model_hist, cur_hist):
    """min(model/cur, 1) with 0 where cur == 0."""
    safe = jnp.where(cur_hist != 0, cur_hist, 1.0)
    return jnp.where(cur_hist != 0, jnp.minimum(model_hist / safe, 1.0), 0.0)


def backprojection_pdf(bins, weights):
    """(H, W) i32, (4096,) f32 -> (H, W) f32 per-pixel probability."""
    return weights[bins]
