"""Pallas TPU kernels for the camshift hot path: histogram + backprojection.

Reference math (spec): 4096-bin RGB histogram and ratio-weight backprojection,
src/camshift.js:49-72, 314-353.  The XLA formulation (ops/histogram.py) is a
scan of one-hot factor matmuls; the hypothesis motivating these kernels was
that XLA materializes the (block, 64) one-hot operands to HBM for every dot,
making the pixel scans HBM-bound.  These kernels keep the one-hot factors
in VMEM registers only: per grid step a (BLK, 128) compare builds BOTH factors
(cols 0-63: hi, cols 64-127: lo), the MXU contracts them, and only bins/pdf
ever touch HBM.

MEASURED VERDICT (r4, end-to-end): the hypothesis is REFUTED.  Inside the
real 256-stream serving scan program (TrackerConfig.histKernel="pallas",
tools/exp_histkernel_ab.py, interleaved reps) the kernels run 27.0 ms/tick
vs 6.8 for the XLA formulation — 4x slower, dominated by the pdf kernel's
2,560 serial 64-lane grid steps (same shape as the r3 standalone result:
hist ties, pdf loses).  XLA's compare-into-dot fusion keeps the production
path from being HBM-bound in context, so the one-hot materialization cost
the kernels avoid does not actually dominate.  Windows remain bit-identical
in both paths.  The kernels stay as a tested correctness alternative and as
the reference implementation of the exact bf16x3 weight-split trick below.

Exactness contract (the golden tests' invariant):
  - hist: bf16 one-hots are exact 0/1; the MXU accumulates in f32, and counts
    <= 2^24, so counts are EXACT integers — identical to the XLA path.
  - pdf[p] = weights[bin p] must be the exact f32 weight.  A 1-pass bf16
    matmul would round the weights to 8 mantissa bits, so the weight matrix is
    split into three bf16 planes w = w1 + w2 + w3 (8+8+8 >= 24 mantissa bits,
    exact for normal f32 — weights are count ratios in [2^-17, 1], always
    normal) and the one-hot selection sums the three f32 partial products —
    bit-identical to an f32 table lookup.  Verified in tests/test_kernels.py.

Padding: the pixel axis is padded to a block multiple with bin = -64
(hi = -1 matches no one-hot column, so padded pixels contribute nothing to the
histogram and produce pdf = 0; the wrapper slices them off anyway).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..ops.histogram import split_bf16_3

__all__ = ["hist_pallas", "pdf_pallas", "split_bf16_3", "DEFAULT_BLOCK"]

_HI = 64
_LO = 64
DEFAULT_BLOCK = 60 * 128  # 7680 pixels/step: oh is (7680, 128) bf16 ~ 2 MB VMEM
_PAD_BIN = -64            # hi = -1: matches no column


def _onehots(bins_blk, blk):
    """(BLK,) i32 -> (BLK, 128) bf16: [one_hot(hi) | one_hot(lo)]."""
    v = bins_blk.reshape(blk, 1)
    hi = v >> 6
    lo = v & 63
    iota = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    sel = jnp.where(iota < _HI, hi, lo + _HI)
    return (sel == iota).astype(jnp.bfloat16)


def _hist_kernel(bins_ref, out_ref, *, blk):
    j = pl.program_id(0)
    oh = _onehots(bins_ref[0, :], blk)
    h = jax.lax.dot_general(
        oh[:, :_HI], oh[:, _HI:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (64, 64) exact counts

    @pl.when(j == 0)
    def _():
        out_ref[...] = h

    @pl.when(j > 0)
    def _():
        out_ref[...] += h


def _pdf_kernel(bins_ref, w1_ref, w2_ref, w3_ref, out_ref, *, blk):
    oh = _onehots(bins_ref[0, :], blk)
    oh_hi = oh[:, :_HI]
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # exact f32 row selection: sum of three bf16 one-hot selections
    rows = dot(oh_hi, w1_ref[...]) + dot(oh_hi, w2_ref[...]) \
        + dot(oh_hi, w3_ref[...])                      # (BLK, 64) f32
    pdf = jnp.sum(rows * oh[:, _HI:].astype(jnp.float32), axis=1)
    out_ref[...] = pdf.reshape(1, blk)


def _interpret():
    # compiled Mosaic on TPU; interpreter elsewhere (CPU tests)
    return jax.default_backend() != "tpu"


def _pad_blocks(bins, block):
    flat = bins.reshape(-1)
    P = flat.shape[0]
    nb = -(-P // block)
    pad = nb * block - P
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=_PAD_BIN)
    return flat.reshape(1, nb * block), nb, P


def hist_pallas(bins, block=DEFAULT_BLOCK):
    """(H, W) i32 bin indices -> (4096,) f32 exact counts (vmap-able)."""
    flat, nb, _ = _pad_blocks(bins, block)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, blk=block),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, block), lambda j: (0, j))],
        out_specs=pl.BlockSpec((_HI, _LO), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_HI, _LO), jnp.float32),
        interpret=_interpret(),
    )(flat)
    return hist.reshape(_HI * _LO)


def pdf_pallas(bins, weights, block=DEFAULT_BLOCK):
    """(H, W) i32, (4096,) f32 -> (H, W) f32 exact weight lookup (vmap-able)."""
    flat, nb, P = _pad_blocks(bins, block)
    w1, w2, w3 = split_bf16_3(weights.reshape(_HI, _LO))
    wspec = pl.BlockSpec((_HI, _LO), lambda j: (0, 0))
    pdf = pl.pallas_call(
        functools.partial(_pdf_kernel, blk=block),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, block), lambda j: (0, j)),
                  wspec, wspec, wspec],
        out_specs=pl.BlockSpec((1, block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, nb * block), jnp.float32),
        interpret=_interpret(),
    )(flat, w1, w2, w3)
    return pdf.reshape(-1)[:P].reshape(bins.shape)
