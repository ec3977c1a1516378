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


def _truncate_cascade(base, n_stages):
    cum = int(np.asarray(base.stage_counts)[:n_stages].sum())
    return dataclasses.replace(
        base, count=n_stages,
        stage_counts=np.asarray(base.stage_counts)[:n_stages],
        stage_thresh=np.asarray(base.stage_thresh)[:n_stages],
        alpha=np.asarray(base.alpha)[:cum], size=np.asarray(base.size)[:cum],
        px=np.asarray(base.px)[:cum], py=np.asarray(base.py)[:cum],
        pz=np.asarray(base.pz)[:cum], nx=np.asarray(base.nx)[:cum],
        ny=np.asarray(base.ny)[:cum], nz=np.asarray(base.nz)[:cum],
        stage_of=np.asarray(base.stage_of)[:cum])


def test_dead_window_conf_is_last_evaluated_stage(rng):
    """VERDICT r1 (weak #6): _dense_chunk must report, for windows that die
    mid-chunk, the sum of the stage they died at (oracle/detector.py:81,
    src/ccv.js:227-233) — not the chunk's final stage sum."""
    from headtrackr_tpu.ops.imageproc import build_pyramid
    base = frontalface()
    n_st = jd.CHUNK_A_END
    # mid-range thresholds so deaths happen at both stages
    cum = np.concatenate([[0], np.cumsum(base.stage_counts)])
    a0 = np.array([base.alpha[cum[s]:cum[s + 1], 0].sum() for s in range(16)])
    a1 = np.array([base.alpha[cum[s]:cum[s + 1], 1].sum() for s in range(16)])
    thr = (a0 + 0.5 * (a1 - a0)).astype(np.float32)
    casc = dataclasses.replace(base, stage_thresh=thr)
    trunc = _truncate_cascade(casc, n_st)

    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    tables = jd.detector_tables(64, 48, casc, 5)
    c = jd._cascade_np(casc)
    ccum = np.concatenate([[0], np.cumsum(c["stage_counts"])])
    pyr, spec = build_pyramid(jnp.asarray(img), 5)
    next_ = spec.next

    from headtrackr_tpu.oracle.imageproc import build_pyramid as o_pyr
    opyr, _oscale, _oupto, _onext = o_pyr(img, 5)
    dxs, dys = [0, 1, 0, 1], [0, 0, 1, 1]

    qh2m = max(g.qh2 for g in tables.geoms)
    qw2m = max(g.qw2 for g in tables.geoms)
    stacks = jd._tile_stacks(pyr, tables)
    alive_s, conf_s = jax.jit(
        lambda s: jd._dense_chunk_stacked(
            s, c, qh2m, qw2m, 0, int(ccum[n_st]),
            jd._stage_ranges(casc, 0, n_st)))(stacks)
    alive_s = np.asarray(alive_s)
    conf_s = np.asarray(conf_s)

    checked_dead = 0
    for s_idx, g in enumerate(tables.geoms[:3]):
        i = g.level
        alive = alive_s[s_idx, :g.qh2, :g.qw2]
        conf = conf_s[s_idx, :g.qh2, :g.qw2]
        for q in range(4):
            oa, oc = od.detect_at_scale(
                opyr[i * 4], opyr[(i + next_) * 4],
                opyr[(i + 2 * next_) * 4 + q], trunc, dxs[q], dys[q])
            for wy in range(oa.shape[0]):
                for wx in range(oa.shape[1]):
                    y2, x2 = 2 * wy + dys[q], 2 * wx + dxs[q]
                    if y2 >= g.qh2 or x2 >= g.qw2:
                        continue
                    assert bool(alive[y2, x2]) == bool(oa[wy, wx])
                    assert abs(conf[y2, x2] - oc[wy, wx]) < 5e-3, (
                        q, wy, wx, conf[y2, x2], oc[wy, wx])
                    if not oa[wy, wx]:
                        checked_dead += 1
    assert checked_dead > 50  # the dead-window contract was actually exercised


def test_overflow_reports_dropped_survivors():
    """ADVICE r1: the documented capacity caps must be observable at runtime."""
    img = np.full((48, 64), 40, np.uint8)
    img[10:34, 16:40] = 230
    toy = toy_cascade()
    big = jax.jit(lambda x: jd.detect_candidates(x, toy, k_cand=256))(
        jnp.asarray(img))
    n_surv = int(np.asarray(big["valid"]).sum())
    assert n_surv > 4 and int(big["overflow"]) == 0
    small = jax.jit(lambda x: jd.detect_candidates(x, toy, k_cand=4))(
        jnp.asarray(img))
    assert int(np.asarray(small["valid"]).sum()) == 4
    assert int(small["overflow"]) == n_surv - 4
    # grouped API propagates it
    g = jd.detect_objects_padded(jnp.asarray(img), toy, k_cand=4)
    assert int(g["overflow"]) == n_surv - 4


def test_detect_best_min_neighbors_zero():
    """min_neighbors=0 skips grouping (src/ccv.js:245-246) but must keep the
    grouped output schema: every valid candidate is its own kept group, and
    detect_best still picks the max-confidence window."""
    img = np.full((48, 64), 40, np.uint8)
    img[10:34, 16:40] = 230
    toy = toy_cascade()
    g = jd.detect_objects_padded(jnp.asarray(img), toy, min_neighbors=0)
    kept = np.asarray(g["kept"])
    assert kept.any()
    assert np.asarray(g["neighbors"])[kept].min() == 1.0
    found, x, y, w, h, conf = jax.jit(
        lambda a: jd.detect_best(a, toy, min_neighbors=0))(jnp.asarray(img))
    assert bool(found)
    raw = od.detect_objects(img, toy, 5, 0)
    assert float(conf) == max(r["confidence"] for r in raw)


def test_int8_deep_dtype_candidate_sets_exact(rng):
    """detector.DEEP_DTYPE="int8" (r5): the chunk-B/C selection dots run as
    i8 x i8 -> i32 MXU matmuls on a -128-shifted patch matrix.  Exact by
    construction — each selection column picks ONE pixel (integer dot, i32
    accumulation), and the BBF min(p) > max(n) compare is invariant under
    the common shift — so candidate sets must match the oracle AND the bf16
    path bit-for-bit on threshold-floored noise that exercises every chunk
    and both compactions (the test_full_cascade_survivors fixture)."""
    base = frontalface()
    cum = np.concatenate([[0], np.cumsum(base.stage_counts)])
    a0 = np.array([base.alpha[cum[s]:cum[s + 1], 0].sum() for s in range(16)])
    a1 = np.array([base.alpha[cum[s]:cum[s + 1], 1].sum() for s in range(16)])
    thr = (a0 + 0.01 * (a1 - a0) - 1e-3).astype(np.float32)
    casc = dataclasses.replace(base, stage_thresh=thr)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    seq_o = od.dense_scores(img, casc)

    def run():
        cand = jax.jit(lambda x: jd.detect_candidates(x, casc, k_cand=512))(
            jnp.asarray(img))
        return jax.tree_util.tree_map(np.asarray, cand)

    assert jd.DEEP_DTYPE == "int8"   # the r5-qualified package default
    c8 = run()
    old = jd.DEEP_DTYPE
    try:
        jd.DEEP_DTYPE = "bf16"       # the r1-r5 formulation as the ref arm
        ref = run()
    finally:
        jd.DEEP_DTYPE = old
    bj, bo = _raw_sets(c8, seq_o)
    _assert_box_lists_close(bj, bo)
    for k in ("x", "y", "width", "height", "confidence", "valid"):
        np.testing.assert_array_equal(c8[k], ref[k], err_msg=k)
