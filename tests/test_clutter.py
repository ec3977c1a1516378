"""Adversarial-clutter detector gate (VERDICT r5 item 6).

The serving bench's backgrounds never stress tile eviction (overflow
telemetry reads 0 every round), so nothing demonstrated the stage-chunked
compaction design under DENSE early-stage survivors.  The crowd fixture —
a grid of synthface instances (each a genuine cascade preimage) over the
uniform background — makes stage-1/2 survivors dense across tiles and
scales:

  * near capacity (generous k1/k2/k_cand, overflow == 0): the candidate
    SET must match the oracle exactly — tile top_k compaction, the chunk-C
    one-hot row select, and grouping under real multi-tile pressure
    (src/ccv.js:178-243 is the per-window economics being emulated).
  * past capacity (tiny k1 -> tile eviction, overflow > 0): sane behavior
    per docs/PARITY.md deviation 5 — every reported candidate is still a
    true oracle survivor (eviction drops, never fabricates), and the
    max-confidence tile ranking (detector.TILE_RANK, r5) keeps whole
    faces, so detection still succeeds.

tools/verify_chip.py --clips clutter runs the same fixture on the real
chip and gates it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import headtrackr_tpu as ht
from headtrackr_tpu.models import detector as jd
from headtrackr_tpu.oracle import detector as od
from headtrackr_tpu.oracle.imageproc import grayscale as ogray

H, W = 240, 320
BG = (120, 100, 90)
FIXTURE = os.path.join(os.path.dirname(ht.__file__), "data", "synthface.npz")


def build_crowd(rows=3, cols=5, size=(H, W), big=True):
    """Grid of 24 px synthface instances (plus one 48 px upsampled instance
    when it fits) over the uniform background — every face activates its
    tiles densely through ALL cascade stages, at two scales."""
    face = np.load(FIXTURE)["rgb"]
    h, w = size
    f = np.full((h, w, 3), BG, np.uint8)
    ys = np.linspace(8, h - 40, rows).astype(int) & ~1
    xs = np.linspace(8, w - 40, cols).astype(int) & ~1
    for y in ys:
        for x in xs:
            f[y:y + 24, x:x + 24] = face
    if big and h >= 160 and w >= 200:
        face2 = np.repeat(np.repeat(face, 2, 0), 2, 1)
        f[h - 80:h - 32, w - 88:w - 40] = face2
    return f


def _cand_set(cand):
    v = np.asarray(cand["valid"])
    return sorted(
        (round(float(cand["x"][i]), 3), round(float(cand["y"][i]), 3),
         round(float(cand["width"][i]), 3),
         round(float(cand["confidence"][i]), 3))
        for i in np.nonzero(v)[0])


def _oracle_set(seq):
    return sorted((round(s["x"], 3), round(s["y"], 3), round(s["width"], 3),
                   round(s["confidence"], 3)) for s in seq)


def _close(a, b, tol_pos=1e-2, tol_conf=5e-3):
    return (abs(a[0] - b[0]) < tol_pos and abs(a[1] - b[1]) < tol_pos
            and abs(a[2] - b[2]) < tol_pos and abs(a[3] - b[3]) < tol_conf)


def test_crowd_set_parity_near_capacity():
    """The crowd leaves ~209 surviving tiles / ~1,975 windows after the
    chunk-A dense pass (measured r5).  Two arms:
      * k_tiles=512 (the clip max): provably no tile eviction -> overflow
        telemetry must read 0 and the SET must match the oracle exactly.
      * k_tiles=256 (~1.2x the surviving-tile count — near capacity): still
        no eviction, same exact parity, with the top_k ranking under real
        multi-tile pressure."""
    frame = build_crowd()
    gray = np.asarray(ogray(frame), np.uint8)
    seq_o = od.dense_scores(gray, ht.cascade())
    bo = _oracle_set(seq_o)
    assert len(bo) >= 15, "fixture must be genuinely dense"
    for k1 in (81920, 40960):
        cand = jax.jit(lambda x: jd.detect_candidates(
            x, ht.cascade(), k1=k1, k2=2048, k_cand=1024))(jnp.asarray(gray))
        cand = jax.tree_util.tree_map(np.asarray, cand)
        assert int(cand["overflow"]) == 0, k1
        bj = _cand_set(cand)
        assert len(bj) == len(bo), k1
        for a, b in zip(bj, bo):
            assert _close(a, b), (k1, a, b)


def test_crowd_eviction_is_sane_past_capacity():
    """deviation 5's capacity-independent guarantees, at the capacity FLOOR
    (k1=640 -> 4 tiles, ~2% of the crowd's surviving windows): overflow
    telemetry fires and eviction DROPS, never fabricates.  At this floor
    the ranking may legally drop every candidate (stage-0/1 scores are
    weakly discriminative; measured r5: count-rank and confmass-rank both
    keep 0/22 at 4 tiles with CHUNK_A_END=2; maxconf-rank may keep a few)
    — the overflow telemetry is exactly how a caller detects that."""
    frame = build_crowd()
    gray = np.asarray(ogray(frame), np.uint8)
    seq_o = od.dense_scores(gray, ht.cascade())
    bo = _oracle_set(seq_o)
    cand = jax.jit(lambda x: jd.detect_candidates(
        x, ht.cascade(), k1=640, k2=512, k_cand=256))(jnp.asarray(gray))
    cand = jax.tree_util.tree_map(np.asarray, cand)
    assert int(cand["overflow"]) > 0, "fixture must actually overflow 4 tiles"
    bj = _cand_set(cand)
    assert len(bj) < len(bo)
    # eviction DROPS, never fabricates: every reported candidate is a true
    # oracle survivor
    for a in bj:
        assert any(_close(a, b) for b in bo), a


def test_crowd_detection_survives_serving_capacity():
    """At the SERVING capacities (k1=4096/k2=128/k_cand=64 — what
    BatchedTracker runs every redetect tick), the crowd must still yield a
    detection: the max-confidence tile ranking (detector.TILE_RANK, r5)
    keeps all 22 true-face tiles under eviction pressure, where the
    r1-r4 survivor-count rank kept NONE and the sum-of-confidence rank
    kept 1 (alive stage sums are negative, so summing inverts the
    intent).  Every reported candidate must still be a true oracle
    survivor."""
    frame = build_crowd()
    gray = np.asarray(ogray(frame), np.uint8)
    seq_o = od.dense_scores(gray, ht.cascade())
    bo = _oracle_set(seq_o)
    cand = jax.jit(lambda x: jd.detect_candidates(
        x, ht.cascade(), k1=4096, k2=128, k_cand=64))(jnp.asarray(gray))
    cand = jax.tree_util.tree_map(np.asarray, cand)
    assert int(cand["overflow"]) > 0  # the crowd genuinely over-subscribes
    bj = _cand_set(cand)
    assert len(bj) > 0
    for a in bj:
        assert any(_close(a, b) for b in bo), a
    found, x, y, w, h, conf = jax.jit(lambda a: jd.detect_best(
        a, ht.cascade(), k1=4096, k2=128, k_cand=64))(jnp.asarray(gray))
    assert bool(found)
    assert float(conf) > 0
