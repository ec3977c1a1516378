"""Multi-chip serving: shard N camera streams over a device mesh.

The algorithm has NO cross-stream communication, so multi-chip scaling is
pure data parallelism (SURVEY §2): `BatchedTracker(N, mesh=...)` shards the
stream axis over a 1-D `jax.sharding.Mesh`, XLA partitions every step SPMD
over ICI with zero hot-path collectives, and the device scheduler runs under
`shard_map` so each chip top_k-schedules its OWN stream shard (a redetect
bucket per device).  The code below is byte-identical to single-chip serving
except for the `mesh=` argument — capacity knobs come from `plan_serving`.

This example runs on 8 VIRTUAL CPU devices so it works anywhere (the env
vars below force that before JAX initializes); on a real v5e pod slice,
delete them and build the mesh from `jax.devices()`.

Run:  python examples/mesh_serving.py        (~2 min warm-cache on CPU)
"""

import os
import sys

# 8 virtual CPU devices — the env must be right BEFORE the interpreter's
# sitecustomize initializes JAX (a tunnelled-TPU sandbox does that at
# startup when PALLAS_AXON_POOL_IPS is set), so a dirty environment is
# fixed by re-exec'ing, not by assignment.  On real multi-chip hardware,
# delete this block and build the mesh from `jax.devices()`.
if os.environ.get("PALLAS_AXON_POOL_IPS") or \
        os.environ.get("JAX_PLATFORMS", "cpu") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import headtrackr_tpu as ht
from headtrackr_tpu.parallel import stream_mesh

H, W = 120, 160
N = 32  # 4 streams per device


def main():
    ht.enable_compilation_cache(
        os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    mesh = stream_mesh()  # 1-D ('streams',) mesh over all devices
    print(f"mesh: {mesh.devices.size} devices, axis 'streams'")

    # capacity knobs sized from the workload by the measured v5e rules
    plan = ht.plan_serving(N, frame_shape=(H, W), max_face_px=24)
    print(f"plan_serving: {plan}")

    bt = ht.BatchedTracker(N, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           mesh=mesh, band=plan["band"],
                           bucket=plan["bucket"],
                           overload=plan["overload"], ui=False)

    def fr(cx, cy, blue=False):
        f = np.full((H, W, 3), 40, np.uint8)
        if blue:
            f[:] = (0, 0, 250)
        else:
            f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
        return f

    base = [fr(40 + (3 * i) % 80, 40 + (2 * i) % 60) for i in range(N)]

    # lock phase: WB stabilization + per-device VJ detect + CS handoff
    batch0 = np.stack(base)
    for _ in range(17):
        bt.step_auto(batch0)
    modes = bt.modes
    print(f"lock: {int((modes == 2).sum())}/{N} streams tracking "
          f"(state sharded over "
          f"{len(bt.state.mode.sharding.device_set)} devices)")

    # throughput serving: 16 ticks per dispatch; two streams on different
    # shards lose track mid-scan and relock via their device's own bucket
    seq = np.stack([np.stack(base)] * 16)
    seq[8, 3] = fr(0, 0, blue=True)       # shard 0
    seq[8, N - 1] = fr(0, 0, blue=True)   # shard 7
    out = bt.run_scan(seq)
    st = np.asarray(out.status)
    lost = np.nonzero(st[8] & 8)[0].tolist()     # STATUS_REDETECTING
    print(f"run_scan: 16 ticks/dispatch; streams {lost} lost track at tick 8 "
          f"and relocked per-device; end modes all CS: "
          f"{(bt.modes == 2).all()}")
    # per-stream fallback telemetry (band escape / sparse overflow)
    esc = np.asarray(out.escaped)
    print(f"full-frame fallback: {int(esc.sum())} stream-ticks "
          f"(band {plan['band']} sized escape-free for this workload)")


if __name__ == "__main__":
    main()
