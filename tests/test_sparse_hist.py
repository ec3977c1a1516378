"""Sparse-model camshift histogram path (TrackerConfig.sparseHist).

The ratio weights min(model/cur, 1) are zero wherever the MODEL histogram is
zero (src/camshift.js:314-330), so a model with <= K distinct bins only needs
current-frame counts for those K bins.  These tests pin the exactness
contract: sparse ops equal the dense formulation bin-for-bin, models that
overflow K are flagged and served by the full-frame fallback, and the
serving path with sparseHist on is output-identical to sparseHist off —
including a mixed batch where one stream's model overflows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headtrackr_tpu.cascade import toy_cascade
from headtrackr_tpu.config import TrackerConfig
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.models import facetracker as ft
from headtrackr_tpu.ops import histogram as hg
from headtrackr_tpu.runtime.serving import make_batched_steps

H, W = 120, 160


def _rand_bins(seed, nvals=4096):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, nvals, (H, W)), jnp.int32)


def test_sparse_counts_match_dense():
    bins = _rand_bins(0, nvals=300)  # dense coverage of a 300-bin palette
    model = np.zeros(4096, np.float32)
    rng = np.random.default_rng(1)
    ids = rng.choice(300, 40, replace=False)
    model[ids] = rng.integers(1, 50, 40)
    sbins, scounts, overflow = jax.jit(
        lambda m: hg.sparse_model_topk(m, 64))(jnp.asarray(model))
    assert not bool(overflow)
    dense = np.asarray(jax.jit(hg.histogram_scan)(bins))
    counts = np.asarray(jax.jit(hg.sparse_hist_counts)(bins, sbins))
    np.testing.assert_array_equal(counts, dense[np.asarray(sbins)])
    # every nonzero model bin is present in the descriptor
    assert set(ids) <= set(np.asarray(sbins).tolist())
    np.testing.assert_array_equal(
        np.asarray(scounts), model[np.asarray(sbins)])


def test_sparse_pdf_matches_dense():
    bins = _rand_bins(2, nvals=200)
    model = np.zeros(4096, np.float32)
    rng = np.random.default_rng(3)
    ids = rng.choice(200, 30, replace=False)
    model[ids] = rng.uniform(1, 20, 30).astype(np.float32)
    model_j = jnp.asarray(model)

    cur = jax.jit(hg.histogram_scan)(bins)
    wdense = hg.backprojection_weights(model_j, cur)
    pdf_dense = np.asarray(jax.jit(hg.backprojection_pdf)(bins, wdense))

    sbins, scounts, _ = hg.sparse_model_topk(model_j, 64)
    cur_k = jax.jit(hg.sparse_hist_counts)(bins, sbins)
    wk = hg.backprojection_weights(scounts, cur_k)
    pdf_sparse = np.asarray(jax.jit(
        lambda b, s, w: hg.sparse_pdf_scan(b, s, w, exact=True))(
            bins, sbins, wk))
    np.testing.assert_array_equal(pdf_sparse, pdf_dense)


def test_overflow_flag():
    model = np.zeros(4096, np.float32)
    model[:70] = 1.0
    _, _, over = hg.sparse_model_topk(jnp.asarray(model), 64)
    assert bool(over)
    _, _, under = hg.sparse_model_topk(jnp.asarray(model), 128)
    assert not bool(under)


def test_track_band_overflow_reports_escaped():
    rng = np.random.default_rng(4)
    frame = np.full((H, W, 3), 40, np.uint8)
    frame[40:64, 60:84] = rng.integers(0, 256, (24, 24, 3))  # rich palette
    rect = jnp.asarray([60, 40, 24, 24], jnp.int32)
    st = mc.init_tracker(jnp.asarray(frame), rect, sparse_k=16)
    assert bool(st.model_overflow)
    _, escaped = jax.jit(
        lambda s, f: mc.track_band(s, f, band=(64, 96)))(st,
                                                         jnp.asarray(frame))
    assert bool(escaped)


def _blob_frame(cx, cy, noise_rng=None):
    f = np.full((H, W, 3), 40, np.uint8)
    patch = np.full((24, 24, 3), (230, 80, 60), np.int16)
    if noise_rng is not None:
        patch = patch + noise_rng.integers(-12, 13, (24, 24, 3))
    f[cy - 12:cy + 12, cx - 12:cx + 12] = np.clip(patch, 0, 255)
    return f


@pytest.mark.parametrize("sparse_k", [64, 4],
                         ids=["fits", "overflows"])
def test_serving_sparse_equals_dense(sparse_k):
    """step_scan with sparseHist must be output- and state-identical to the
    dense path on CPU.  sparse_k=4 makes the noisy stream's model overflow
    (>= ~13 distinct bins), exercising the full-frame fallback every tick,
    while the clean stream (2-bin model) stays on the sparse path."""
    rng = np.random.default_rng(5)
    clip = np.stack([
        np.stack([_blob_frame(60 + (t % 5), 50),
                  _blob_frame(100, 70, noise_rng=rng)])
        for t in range(28)])  # (T, 2, H, W, 3)

    outs = {}
    finals = {}
    for k in (None, sparse_k):
        cfg = TrackerConfig(smoothing=False, headPosition=False,
                            sparseHist=k)
        _, _, _, _, step_scan = make_batched_steps(
            toy_cascade(), cfg, (H, W), bucket=1, band=(64, 96),
            donate=False)
        s1 = ft.init_state(cfg.whitebalancing, k or 0)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(), s1)
        st, out = step_scan(state, jnp.asarray(clip))
        outs[k] = out
        finals[k] = st

    for name, a, b in zip(outs[None]._fields, outs[None], outs[sparse_k]):
        if name == "escaped":
            continue  # telemetry: sparse-overflow fallback differs by design
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"output {name}")
    # the telemetry itself: an overflowed model is on the fallback every
    # tick once tracking; a fitting model never is (blob locks at tick 17)
    esc = np.asarray(outs[sparse_k].escaped)
    if sparse_k == 4:
        assert esc[20:, 1].all() and not esc[20:, 0].any()
    else:
        assert not esc.any()
    # states equal on the shared (non-descriptor) leaves
    for name, a, b in zip(finals[None].cs._fields, finals[None].cs,
                          finals[sparse_k].cs):
        if name in ("model_bins", "model_counts", "model_overflow"):
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"state cs.{name}")
    assert (np.asarray(finals[sparse_k].mode)
            == np.asarray(finals[None].mode)).all()


def test_mesh_serving_with_sparse_matches_single_device():
    """Sparse descriptors shard with the stream axis: 8 streams on the
    8-virtual-device mesh, device-scheduled, sparseHist on — equal to the
    single-device sparse run (the (0,)-leaf sharding bug this feature
    originally hit is exactly this path)."""
    import headtrackr_tpu as ht
    from headtrackr_tpu.parallel import stream_mesh

    def fr(cx, cy):
        f = np.full((H, W, 3), 40, np.uint8)
        f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
        return f

    frames = np.stack([fr(50 + 4 * i, 40 + 2 * i) for i in range(8)])
    kw = dict(frame_shape=(H, W), cascade=toy_cascade(), ui=False,
              band=(64, 96), sparseHist=64, bucket=1)
    bt_mesh = ht.BatchedTracker(8, mesh=stream_mesh(), **kw)
    bt_one = ht.BatchedTracker(8, **kw)
    for _ in range(18):
        out_m = bt_mesh.step_auto(frames)
        out_1 = bt_one.step_auto(frames)
    assert bt_mesh.modes.tolist() == bt_one.modes.tolist() == [ft.MODE_CS] * 8
    np.testing.assert_array_equal(np.asarray(out_m.face_x),
                                  np.asarray(out_1.face_x))
    np.testing.assert_array_equal(np.asarray(out_m.face_w),
                                  np.asarray(out_1.face_w))
    assert len(bt_mesh.state.cs.model_bins.sharding.device_set) == 8


def test_checkpoint_roundtrip_with_sparse(tmp_path):
    from headtrackr_tpu.runtime import checkpoint as ckpt
    st = ft.init_state(True, 64)
    st = st._replace(cs=st.cs._replace(
        model_bins=jnp.arange(64, dtype=jnp.int32),
        model_counts=jnp.ones((64,), jnp.float32),
        model_overflow=jnp.bool_(True)))
    p = str(tmp_path / "sparse.npz")
    ckpt.save_state(p, st)
    st2 = ckpt.load_state(p, like=ft.init_state(True, 64))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
