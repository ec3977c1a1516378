"""Host-side event-emission microbenchmark (VERDICT r2 weak #5).

Times StreamFanout.emit for a steady-state 256-stream tick (every stream
tracking: one facetrackingEvent + one headtrackingEvent per stream, one
listener per bus) and for a worst-case tick (every status bit + hints
machinery active).  Pure host work — run anywhere:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_emit.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def fake_out(n, ft, steady=True):
    """A host-side StepOutput batch shaped like a serving tick."""
    from headtrackr_tpu.models.facetracker import StepOutput
    f = np.float32
    z = np.zeros(n, f)
    return StepOutput(
        detection=np.full(n, ft.MODE_CS, np.int32),
        wb=z, face_x=z + 100, face_y=z + 80, face_w=z + 40, face_h=z + 44,
        face_angle=z + 1.5, face_conf=z + 1,
        smooth_x=z + 100, smooth_y=z + 80, smooth_w=z + 40, smooth_h=z + 44,
        head_valid=np.ones(n, bool),
        head_x=z, head_y=z + 11.5, head_z=z + 60,
        status=(np.zeros(n, np.int32) if steady
                else np.full(n, ft.STATUS_FOUND | ft.STATUS_REDETECTING,
                             np.int32)),
        event_face=np.ones(n, bool),
        fov_deg=z + 40,
        mode_after=np.full(n, ft.MODE_CS, np.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.fanout import StreamFanout

    n = args.streams
    sink = []
    fan = StreamFanout(n)
    for i in range(n):
        fan.add_event_listener(i, "facetrackingEvent",
                               lambda e: sink.append(e.x))
        fan.add_event_listener(i, "headtrackingEvent",
                               lambda e: sink.append(e.z))

    for name, steady in (("steady(face+head)", True),
                         ("worst(+2 status)", False)):
        out = fake_out(n, ft, steady)
        fan.emit(out)  # warm
        t0 = time.time()
        for _ in range(args.iters):
            cnt = fan.emit(out, time_ms=6)
        dt = (time.time() - t0) / args.iters
        print(f"emit {name:18s} {n} streams: {1000 * dt:.3f} ms/tick "
              f"({cnt} events)")


if __name__ == "__main__":
    main()
