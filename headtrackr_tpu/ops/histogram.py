"""Histogram / backprojection ops for the camshift tracker — MXU formulation.

Reference math:
  - 4096-bin RGB histogram, bin = 256*(r>>4) + 16*(g>>4) + (b>>4)  (src/camshift.js:62-66)
  - ratio weights  min(model/cur, 1), 0 where cur == 0              (src/camshift.js:314-330)
  - backprojection pdf[p] = weights[bin(p)]                          (src/camshift.js:332-353)

TPU-first design: scatter/gather are slow on TPU, but the 4096-bin space
factorizes as 64*hi + lo, so

    hist(64, 64) = OneHot(hi)^T  @  OneHot(lo)        -- one MXU matmul
    pdf          = rowsum( (OneHot(hi) @ W) * OneHot(lo) ),  W = weights(64, 64)

Counts are exact (f32 accumulation of 0/1 products up to 2^24); pdf is computed
in f32 so weights keep full precision.  Exactness vs the NumPy oracle is
asserted in tests/test_camshift.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_bins", "histogram_4096", "histogram_rect",
           "backprojection_weights", "backprojection_pdf",
           "histogram_and_pdf"]

NBINS = 4096
_HI = 64
_LO = 64


def rgb_bins(rgb):
    """(..., H, W, 3) u8 -> (..., H, W) i32 bin indices."""
    r = (rgb[..., 0].astype(jnp.int32) >> 4)
    g = (rgb[..., 1].astype(jnp.int32) >> 4)
    b = (rgb[..., 2].astype(jnp.int32) >> 4)
    return 256 * r + 16 * g + b


def _one_hots(bins, mask=None, dtype=jnp.float32):
    """(P,) i32 -> two (P, 64) one-hot factors (optionally row-masked)."""
    flat = bins.reshape(-1)
    hi = (flat >> 6)[:, None]
    lo = (flat & 63)[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, _HI), 1)
    oh_hi = (hi == iota)
    oh_lo = (lo == iota)
    if mask is not None:
        m = mask.reshape(-1)[:, None]
        oh_hi = oh_hi & m
    return oh_hi.astype(dtype), oh_lo.astype(dtype)


def histogram_4096(bins, mask=None):
    """(H, W) i32 bin indices -> (4096,) f32 counts (exact)."""
    oh_hi, oh_lo = _one_hots(bins, mask, dtype=jnp.int8)
    hist = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # (64, 64)
    return hist.reshape(NBINS).astype(jnp.float32)


def histogram_rect(bins, x, y, w, h):
    """Histogram of the rect [x, x+w) x [y, y+h) only (traced rect).

    Equivalent of Histogram(getImageData(tax, tay, taw, tah)) at
    src/camshift.js:206-208."""
    H, W = bins.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((rows >= y) & (rows < y + h) & (cols >= x) & (cols < x + w))
    return histogram_4096(bins, inside)


def backprojection_weights(model_hist, cur_hist):
    """min(model/cur, 1) with 0 where cur == 0."""
    safe = jnp.where(cur_hist != 0, cur_hist, 1.0)
    return jnp.where(cur_hist != 0, jnp.minimum(model_hist / safe, 1.0), 0.0)


def backprojection_pdf(bins, weights):
    """(H, W) i32, (4096,) f32 -> (H, W) f32 per-pixel probability (MXU)."""
    oh_hi, oh_lo = _one_hots(bins)
    Wm = weights.reshape(_HI, _LO)
    rows = jnp.dot(oh_hi, Wm, preferred_element_type=jnp.float32)  # (P, 64)
    pdf = jnp.sum(rows * oh_lo, axis=1)
    return pdf.reshape(bins.shape)


def histogram_and_pdf(bins, model_hist, block=8192):
    """Fused current-histogram + ratio weights + backprojection.

    Pixel axis is scanned in blocks so the transient one-hot factors stay
    ~block x 64 (a full-frame one-hot is ~40 MB/stream and OOMs HBM at serving
    batch sizes).  Returns (cur_hist (4096,), pdf (H, W))."""
    shape = bins.shape
    flat = bins.reshape(-1)
    P = flat.shape[0]
    nb = -(-P // block)
    pad = nb * block - P
    flat_p = jnp.pad(flat, (0, pad), constant_values=-1)  # -1 never matches iota
    blocks = flat_p.reshape(nb, block)

    def hist_body(acc, blk):
        # int8 one-hots -> int32 MXU accumulation: exact counts, 2x bf16 rate
        oh_hi, oh_lo = _one_hots(blk, dtype=jnp.int8)
        h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + h, None

    hist64, _ = jax.lax.scan(hist_body, jnp.zeros((_HI, _LO), jnp.int32),
                             blocks)
    cur = hist64.reshape(NBINS).astype(jnp.float32)
    weights = backprojection_weights(model_hist, cur)
    Wm = weights.reshape(_HI, _LO)

    def pdf_body(_, blk):
        oh_hi, oh_lo = _one_hots(blk)
        rows = jnp.dot(oh_hi, Wm, preferred_element_type=jnp.float32)
        return None, jnp.sum(rows * oh_lo, axis=1)

    _, pdf = jax.lax.scan(pdf_body, None, blocks)
    return cur, pdf.reshape(-1)[:P].reshape(shape)
