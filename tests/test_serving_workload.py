"""Pins the bench workload's realistic-palette arm (bench.py --face-noise).

The synthetic face is a cascade PREIMAGE with a tight detection margin:
uniform +-6 RGB noise already breaks VJ detection (measured r4), so the
realistic-palette texture must be chroma-only — built from integer lattice
vectors nearly orthogonal to the grayscale weighting (30r+59g+11b)/100
(ops/imageproc.grayscale; src/ccv.js:22-32) — leaving detection untouched
while spreading the 4-bit RGB bins that camshift models (and sparseHist)
actually see.  These tests pin that design so a noise change cannot
silently break the bench's lock phase again (the r4 chip session lost a
compile cycle to exactly that: full-RGB +-12 noise -> 0% locked).
"""

import importlib.util
import os

import numpy as np
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.oracle.imageproc import grayscale as oracle_gray

import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_chroma_noise_preserves_grayscale():
    """Noisy-face pixels must stay inside the VJ detection margin in
    grayscale.  Measured over the FACE RECT only — the background carries no
    noise, so a full-frame fraction would dilute ~20x and mask a partial
    regression (advisor r4).  Honest face-rect numbers at k=20: max drift 5
    gray levels (luma +-6 breaks detection — measured r4), mean ~1.5,
    drift>4 only on clip-saturated pixels (~2%)."""
    bench = _bench()
    rng = np.random.default_rng(0)
    pool = bench.build_pool(4, 240, 320, 2, 0, rng, face_noise=20)
    clean = bench.build_pool(4, 240, 320, 2, 0,
                             np.random.default_rng(0), face_noise=0)
    # Same seed => same position draws; the noised pixels are exactly where
    # the two frames differ.  Recover the face rect as their bounding box.
    diff = np.any(pool[0, 0] != clean[0, 0], axis=-1)
    ys, xs = np.nonzero(diff)
    assert len(ys) > 500  # the texture touches nearly every face pixel
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    g_noisy = oracle_gray(pool[0, 0]).astype(int)[y0:y1, x0:x1]
    g_clean = oracle_gray(clean[0, 0]).astype(int)[y0:y1, x0:x1]
    drift = np.abs(g_noisy - g_clean)
    assert drift.max() <= 5          # strictly inside the +-6 break margin
    assert drift.mean() < 2.0        # lattice bound ~0.15 gray/unit holds
    assert (drift > 4).mean() < 0.05  # >4 only from clip saturation


@pytest.mark.parametrize("k", [0, 20])
def test_detection_and_model_bins_with_face_noise(k):
    """The full-res VJ detector must find every noisy face, and the camshift
    model initialized from the detected rect must land in the target palette
    range: ~2 bins clean, ~90-100 bins at k=20 (webcam-realistic — K=64
    sparse models overflow, K=128 fit)."""
    bench = _bench()
    rng = np.random.default_rng(1)
    n = 3
    pool = bench.build_pool(n, 240, 320, 2, 0, rng, face_noise=k)
    gray = np.asarray(ht.ccv.grayscale(jnp.asarray(pool[0])))
    nbins = []
    for i in range(n):
        dets = ht.ccv.detect_objects(gray[i], ht.cascade(), 5, 1)
        best = max(dets, key=lambda r: r["confidence"])
        st = mc.init_tracker(
            jnp.asarray(pool[0, i]),
            jnp.asarray([best["x"], best["y"],
                         best["width"], best["height"]], jnp.int32))
        nbins.append(int((np.asarray(st.model_hist) != 0).sum()))
    if k == 0:
        assert max(nbins) <= 10
    else:
        assert all(60 <= b <= 140 for b in nbins), nbins
