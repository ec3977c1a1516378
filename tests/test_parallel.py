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
