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


def test_histkernel_serving_equals_xla(rng):
    """TrackerConfig.histKernel='pallas' through the REAL serving scan
    (band-local camshift + escape fallback + bucket scheduler) must be
    output- and state-identical to the XLA path on CPU (both paths are
    full-f32 there; on TPU they differ only by the documented fast-mode
    bf16 rounding, and are bit-equal in exactCamshift mode)."""
    from headtrackr_tpu.cascade import toy_cascade
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import make_batched_steps

    H, W = 120, 160

    def fr(cx, cy):
        f = np.full((H, W, 3), 40, np.uint8)
        f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
        return f

    clip = np.stack([np.stack([fr(60 + (t % 5), 50), fr(100, 70)])
                     for t in range(24)])  # (T, 2, H, W, 3)
    results = {}
    for kern in (None, "pallas"):
        cfg = TrackerConfig(smoothing=False, headPosition=False,
                            histKernel=kern)
        _, _, _, _, step_scan = make_batched_steps(
            toy_cascade(), cfg, (H, W), bucket=1, band=(64, 96),
            donate=False)
        s1 = ft.init_state(cfg.whitebalancing)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(), s1)
        results[kern] = step_scan(state, jnp.asarray(clip))

    (st_x, out_x), (st_p, out_p) = results[None], results["pallas"]
    assert (np.asarray(st_p.mode) == 2).all()  # both streams locked
    for name, a, b in zip(out_x._fields, out_x, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"output {name}")
    for a, b in zip(jax.tree_util.tree_leaves(st_x),
                    jax.tree_util.tree_leaves(st_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
