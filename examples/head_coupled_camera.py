"""Equivalent of the reference's three.js head-coupled-perspective demos.

Subscribes a RealisticAbsoluteCameraControl to headtrackingEvent and prints the
computed camera poses (position / asymmetric view offset / fov) — the exact
values the reference feeds THREE.PerspectiveCamera (src/controllers.js:48-67).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/head_coupled_camera.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import headtrackr_tpu as ht
from headtrackr_tpu.controllers import RealisticAbsoluteCameraControl
from headtrackr_tpu.runtime.video import ClipSource
from facetracking import synthetic_clip


class PrintCamera:
    aspect = 4 / 3

    def apply(self, pose):
        px, py, pz = pose.position
        print(f"[camera] pos=({px:+6.2f},{py:+6.2f},{pz:6.2f}) "
              f"fov={pose.fov:5.2f} view_offset={tuple(round(v, 1) for v in pose.view_offset)}")


def main():
    bus = ht.events.EventBus()
    tracker = ht.Tracker(ui=False, bus=bus)
    ctl = RealisticAbsoluteCameraControl(
        PrintCamera(), scaling=1.0, fixed_position=(0, 0, 0), bus=bus)
    tracker.init(ClipSource(synthetic_clip(50)))
    tracker.run_clip()
    ctl.close()
    print("final status:", tracker.status)


if __name__ == "__main__":
    main()
