"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import pytest

import headtrackr_tpu as ht
from headtrackr_tpu.models import facetracker as ft
from headtrackr_tpu.parallel import stream_mesh, shard_streams

H, W = 120, 160


def _fr(cx, cy):
    f = np.full((H, W, 3), 40, np.uint8)
    f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    return f


def test_mesh_has_8_devices():
    mesh = stream_mesh()
    assert mesh.devices.size == 8


def test_batched_tracker_on_mesh_matches_single_device():
    mesh = stream_mesh()
    frames = np.stack([_fr(50 + 4 * i, 40 + 2 * i) for i in range(8)])

    bt_mesh = ht.BatchedTracker(8, frame_shape=(H, W), cascade=ht.toy_cascade(),
                                mesh=mesh, sync_interval=1)
    bt_one = ht.BatchedTracker(8, frame_shape=(H, W), cascade=ht.toy_cascade(),
                               sync_interval=1)
    for _ in range(18):
        out_m = bt_mesh.step(frames)
        out_1 = bt_one.step(frames)
    assert bt_mesh.modes.tolist() == bt_one.modes.tolist() == [ft.MODE_CS] * 8
    np.testing.assert_allclose(np.asarray(out_m.face_x), np.asarray(out_1.face_x))
    np.testing.assert_allclose(np.asarray(out_m.head_z), np.asarray(out_1.head_z),
                               rtol=1e-6)
    # state actually sharded over the mesh
    shardings = {str(d) for d in bt_mesh.state.mode.sharding.device_set}
    assert len(shardings) == 8


def _fr_blue():
    f = np.zeros((H, W, 3), np.uint8)
    f[..., 2] = 250
    return f


def test_mesh_serving_shape_multi_stream_per_device():
    """The real multi-chip serving shape (VERDICT r1 item 8): 32 streams on 8
    devices (4 per device), device-scheduled scan with mid-run track losses
    (bucket path under sharding) and a mid-run reset_stream — exactly equal
    to the single-device run."""
    mesh = stream_mesh()
    N = 32
    base = [_fr(50 + (3 * i) % 60, 40 + (2 * i) % 40) for i in range(N)]

    def tick(t):
        fs = list(base)
        if t == 20:            # two streams on different shards lose track
            fs[5] = _fr_blue()
            fs[29] = _fr_blue()
        return np.stack(fs)

    seq = np.stack([tick(t) for t in range(30)])  # (30, N, H, W, 3)

    bt_mesh = ht.BatchedTracker(N, frame_shape=(H, W),
                                cascade=ht.toy_cascade(), mesh=mesh)
    bt_one = ht.BatchedTracker(N, frame_shape=(H, W),
                               cascade=ht.toy_cascade())
    out_m = bt_mesh.run_scan(seq)
    out_1 = bt_one.run_scan(seq)

    # mid-run stream reset (new camera connects on stream 11), then continue
    bt_mesh.reset_stream(11)
    bt_one.reset_stream(11)
    out_m2 = bt_mesh.run_scan(seq[-16:])
    out_12 = bt_one.run_scan(seq[-16:])

    for a, b in ((out_m, out_1), (out_m2, out_12)):
        eq = jax.tree_util.tree_map(
            lambda x, y: bool((np.asarray(x) == np.asarray(y)).all()), a, b)
        assert all(jax.tree_util.tree_leaves(eq))
    eq = jax.tree_util.tree_map(
        lambda x, y: bool((np.asarray(x) == np.asarray(y)).all()),
        bt_mesh.state, bt_one.state)
    assert all(jax.tree_util.tree_leaves(eq))

    # the loss tick actually exercised the redetect path under sharding
    st = np.asarray(out_m.status)
    assert (st[20, [5, 29]] & ft.STATUS_REDETECTING).all()
    assert bt_mesh.modes.tolist() == [ft.MODE_CS] * N
    # 4 streams per device: state sharded over all 8 devices
    assert len(bt_mesh.state.mode.sharding.device_set) == 8


def test_mesh_rejects_undivisible_batch():
    with pytest.raises(ValueError):
        ht.BatchedTracker(9, frame_shape=(H, W), cascade=ht.toy_cascade(),
                          mesh=stream_mesh())


def test_shard_streams_places_leading_axis():
    mesh = stream_mesh()
    x = np.zeros((8, 4), np.float32)
    y = shard_streams(x, mesh)
    assert len(y.sharding.device_set) == 8


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out is not None
