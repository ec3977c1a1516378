"""Detector golden tests: dense cascade + compaction + grouping vs the oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headtrackr_tpu.cascade import frontalface, toy_cascade
from headtrackr_tpu.oracle import detector as od
from headtrackr_tpu.models import detector as jd


def _raw_sets(cand, seq_o):
    v = np.asarray(cand["valid"])
    bj = sorted((round(float(cand["x"][i]), 3), round(float(cand["y"][i]), 3),
                 round(float(cand["width"][i]), 3),
                 round(float(cand["confidence"][i]), 3))
                for i in np.nonzero(v)[0])
    bo = sorted((round(s["x"], 3), round(s["y"], 3), round(s["width"], 3),
                 round(s["confidence"], 3)) for s in seq_o)
    return bj, bo


def _assert_box_lists_close(bj, bo, tol_pos=1e-2, tol_conf=5e-3):
    assert len(bj) == len(bo)
    for a, b in zip(bj, bo):
        assert abs(a[0] - b[0]) < tol_pos and abs(a[1] - b[1]) < tol_pos
        assert abs(a[2] - b[2]) < tol_pos
        assert abs(a[3] - b[3]) < tol_conf


def test_toy_cascade_raw_windows_exact():
    img = np.full((48, 64), 40, np.uint8)
    img[10:34, 16:40] = 230
    toy = toy_cascade()
    seq_o = od.dense_scores(img, toy)
    assert len(seq_o) > 0
    cand = jax.jit(lambda x: jd.detect_candidates(x, toy, k_cand=256))(
        jnp.asarray(img))
    bj, bo = _raw_sets(jax.tree_util.tree_map(np.asarray, cand), seq_o)
    _assert_box_lists_close(bj, bo)


@pytest.mark.parametrize("frac", [0.0, 0.01, 0.03])
def test_full_cascade_survivors_match_oracle(rng, frac):
    """Per-stage thresholds at (all-fail floor + frac*range) exercise every
    stage chunk and both compactions with controlled selectivity."""
    base = frontalface()
    cum = np.concatenate([[0], np.cumsum(base.stage_counts)])
    a0 = np.array([base.alpha[cum[s]:cum[s + 1], 0].sum() for s in range(16)])
    a1 = np.array([base.alpha[cum[s]:cum[s + 1], 1].sum() for s in range(16)])
    thr = (a0 + frac * (a1 - a0) - 1e-3).astype(np.float32)
    casc = dataclasses.replace(base, stage_thresh=thr)

    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    seq_o = od.dense_scores(img, casc)
    cand = jax.jit(lambda x: jd.detect_candidates(x, casc, k_cand=512))(
        jnp.asarray(img))
    bj, bo = _raw_sets(jax.tree_util.tree_map(np.asarray, cand), seq_o)
    _assert_box_lists_close(bj, bo)


def test_grouping_matches_oracle(rng):
    base = frontalface()
    cum = np.concatenate([[0], np.cumsum(base.stage_counts)])
    a0 = np.array([base.alpha[cum[s]:cum[s + 1], 0].sum() for s in range(16)])
    casc = dataclasses.replace(base,
                               stage_thresh=(a0 - 1e-3).astype(np.float32))
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    res_o = od.detect_objects(img, casc, 5, 1)
    g = jax.jit(lambda x: jd.detect_objects_padded(x, casc, k_cand=512))(
        jnp.asarray(img))
    g = jax.tree_util.tree_map(np.asarray, g)
    kept = np.nonzero(g["kept"])[0]
    go = sorted((round(r["x"], 2), round(r["y"], 2), round(r["width"], 2),
                 int(r["neighbors"]), round(r["confidence"], 2))
                for r in res_o)
    gj = sorted((round(float(g["x"][i]), 2), round(float(g["y"][i]), 2),
                 round(float(g["width"][i]), 2), int(g["neighbors"][i]),
                 round(float(g["confidence"][i]), 2)) for i in kept)
    assert go == gj


def test_detect_best_picks_max_confidence():
    img = np.full((48, 64), 40, np.uint8)
    img[10:34, 16:40] = 230
    toy = toy_cascade()
    found, x, y, w, h, conf = jax.jit(
        lambda a: jd.detect_best(a, toy))(jnp.asarray(img))
    assert bool(found)
    res_o = od.detect_objects(img, toy, 5, 1)
    best_o = max(res_o, key=lambda r: r["confidence"])
    assert abs(float(x) - best_o["x"]) < 1e-2
    assert abs(float(w) - best_o["width"]) < 1e-2


def test_empty_and_tiny_images():
    toy = toy_cascade()
    blank = jnp.zeros((48, 64), jnp.uint8)
    found, *_ = jax.jit(lambda a: jd.detect_best(a, toy))(blank)
    assert not bool(found)
    tiny = jnp.zeros((8, 8), jnp.uint8)
    out = jd.detect_candidates(tiny, toy)
    assert not bool(np.asarray(out["valid"]).any())


def test_compact_indices_basic():
    mask = jnp.asarray([0, 1, 1, 0, 1, 0, 0, 1], bool)
    idx, n = jd.compact_indices(mask, 3)
    assert np.asarray(idx).tolist() == [1, 2, 4]  # overflow (7) dropped
    assert int(n) == 3
    idx, n = jd.compact_indices(mask, 6)
    assert np.asarray(idx).tolist() == [1, 2, 4, 7, 8, 8]
    assert int(n) == 4


def test_vmap_detect():
    img1 = np.full((48, 64), 40, np.uint8); img1[10:34, 16:40] = 230
    img2 = np.full((48, 64), 40, np.uint8)  # no square
    toy = toy_cascade()
    f = jax.jit(jax.vmap(lambda a: jd.detect_best(a, toy)))
    found, x, y, w, h, conf = f(jnp.stack([jnp.asarray(img1), jnp.asarray(img2)]))
    assert np.asarray(found).tolist() == [True, False]


@pytest.mark.parametrize("shape", [(76, 100), (57, 99), (120, 160)])
def test_odd_geometry_parity(rng, shape):
    """Detector parity at non-round frame sizes (the 640x480 bug class):
    with controlled per-stage selectivity, the survivor SET must equal the
    oracle's exactly when capacity suffices."""
    base = frontalface()
    cum = np.concatenate([[0], np.cumsum(base.stage_counts)])
    a0 = np.array([base.alpha[cum[s]:cum[s + 1], 0].sum() for s in range(16)])
    a1 = np.array([base.alpha[cum[s]:cum[s + 1], 1].sum() for s in range(16)])
    thr = (a0 + 0.02 * (a1 - a0) - 1e-3).astype(np.float32)
    casc = dataclasses.replace(base, stage_thresh=thr)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    seq_o = od.dense_scores(img, casc)
    # k1 large enough that every tile survives compaction (uniform noise
    # spreads stage-0/1 survivors over all tiles; the capacity cap is a
    # separate, documented behavior)
    cand = jax.jit(lambda x: jd.detect_candidates(
        x, casc, 5, k1=80000, k2=1024, k_cand=1024))(jnp.asarray(img))
    cand = jax.tree_util.tree_map(np.asarray, cand)
    v = cand["valid"]
    bj = sorted((round(float(cand["x"][i]), 2), round(float(cand["y"][i]), 2),
                 round(float(cand["width"][i]), 2)) for i in np.nonzero(v)[0])
    bo = sorted((round(s["x"], 2), round(s["y"], 2), round(s["width"], 2))
                for s in seq_o)
    assert len(bo) <= 1024, "test setup: capacity must fit the oracle set"
    assert len(bj) == len(bo)
    for a, b in zip(bj, bo):
        assert all(abs(x - y) < 0.05 for x, y in zip(a, b))
