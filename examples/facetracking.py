"""Equivalent of the reference's facetracking.html demo, headless.

Drives a Tracker session over a synthetic clip (or a real .npy clip / webcam
if available), printing status transitions and a live line per
head-tracking event.  Mirrors the wiring in the reference README
(/root/reference/README.md:20-47): create tracker, init, listen, start.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/facetracking.py
      python examples/facetracking.py --clip myclip.npy      # (N,H,W,3) u8
      python examples/facetracking.py --camera               # needs OpenCV
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import headtrackr_tpu as ht
from headtrackr_tpu.runtime.video import ClipSource, CameraSource


def synthetic_clip(n=60):
    """A clip with the synthesized real-cascade-detectable face moving around."""
    d = np.load(os.path.join(os.path.dirname(ht.__file__), "data",
                             "synthface.npz"))
    face = d["rgb"]
    H, W = 240, 320
    frames = np.full((n, H, W, 3), (120, 100, 90), np.uint8)
    for t in range(n):
        px = 148 + (0 if t < 16 else (t - 16) * 2) % 80
        py = 108
        frames[t, py:py + 24, px:px + 24] = face
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", help=".npy/.npz clip file")
    ap.add_argument("--camera", action="store_true")
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    if args.camera:
        source = CameraSource()
    elif args.clip:
        source = ClipSource(args.clip)
    else:
        source = ClipSource(synthetic_clip(args.frames))

    bus = ht.events.EventBus()
    tracker = ht.Tracker(ui=True, bus=bus)

    bus.add_event_listener("headtrackrStatus",
                           lambda e: print(f"[status] {e.status}"))
    bus.add_event_listener(
        "facetrackingEvent",
        lambda e: print(f"[face] x={e.x:6.1f} y={e.y:6.1f} "
                        f"w={e.width:5.1f} h={e.height:5.1f} ({e.time} ms)"))
    bus.add_event_listener(
        "headtrackingEvent",
        lambda e: print(f"[head] x={e.x:+6.2f} y={e.y:+6.2f} z={e.z:6.2f} cm"))

    assert tracker.init(source)
    n = tracker.run_clip()
    print(f"processed {n} frames; final status: {tracker.status}; "
          f"fov={tracker.getFOV():.1f} deg")


if __name__ == "__main__":
    main()
