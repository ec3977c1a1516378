"""Pallas hist/pdf kernels (kernels/histpdf.py): exactness vs the XLA path
and the NumPy oracle.  On CPU these run through the Pallas interpreter — the
same kernel algorithm the chip compiles via Mosaic (on-chip exactness was
verified separately; see the module docstring and docs/PERFORMANCE.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from headtrackr_tpu.kernels.histpdf import (hist_pallas, pdf_pallas,
                                            split_bf16_3)
from headtrackr_tpu.ops import histogram as hg


@pytest.mark.parametrize("shape", [(240, 320), (120, 160), (57, 99)])
def test_hist_kernel_exact_counts(shape, rng):
    rgb = rng.integers(0, 256, shape + (3,), np.uint8)
    bins = hg.rgb_bins(jnp.asarray(rgb))
    got = np.asarray(hist_pallas(bins))
    ref = np.bincount(np.asarray(bins).ravel(), minlength=4096)
    assert (got == ref).all()


def test_pdf_kernel_exact_f32_lookup(rng):
    bins = jnp.asarray(rng.integers(0, 4096, (120, 160), np.int32))
    w = jnp.asarray(rng.random((4096,)).astype(np.float32))
    got = np.asarray(pdf_pallas(bins, w))
    ref = np.asarray(w)[np.asarray(bins).ravel()].reshape(120, 160)
    assert (got == ref).all()


def test_split_bf16_3_reconstructs_exactly(rng):
    # weights are count ratios in (0, 1]; cover the full normal range used
    w = rng.random((1 << 16,)).astype(np.float32)
    w[:100] = np.float32(1.0)
    w[100:200] = (1.0 / rng.integers(1, 76800, 100)).astype(np.float32)
    w1, w2, w3 = jax.jit(split_bf16_3)(jnp.asarray(w))
    rec = (np.asarray(w1, np.float32) + np.asarray(w2, np.float32)
           + np.asarray(w3, np.float32))
    assert (rec == w).all()


def test_kernels_match_xla_path_bitwise(rng):
    """The kernels must be drop-in replacements for ops/histogram.py's
    histogram_and_pdf: same counts, same f32 pdf, under vmap (serving)."""
    N = 3
    rgb = rng.integers(0, 256, (N, 120, 160, 3), np.uint8)
    bins = jax.vmap(hg.rgb_bins)(jnp.asarray(rgb))
    model = jnp.asarray(rng.integers(0, 500, (N, 4096)).astype(np.float32))
    cur_x, pdf_x = jax.vmap(hg.histogram_and_pdf)(bins, model)
    cur_p = jax.vmap(hist_pallas)(bins)
    w = hg.backprojection_weights(model, cur_p)
    pdf_p = jax.vmap(pdf_pallas)(bins, w)
    assert (np.asarray(cur_p) == np.asarray(cur_x)).all()
    assert (np.asarray(pdf_p) == np.asarray(pdf_x)).all()
