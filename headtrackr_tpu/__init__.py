"""headtrackr_tpu — a TPU-native face & head tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of auduno/headtrackr
(browser JS): real-time face detection (BBF cascade), camshift color tracking,
smoothing, and pinhole head-position estimation — redesigned as a batched,
shardable video-inference pipeline:

  frames (N, H, W, 3) u8
    -> [whitebalance-stability gate]
    -> dense multi-scale cascade detection (all windows scored in parallel)
    -> camshift tracking (histogram / backprojection / moment kernels)
    -> EMA smoothing -> head position (x, y, z cm)
    -> facetrackingEvent / headtrackingEvent / headtrackrStatus callbacks

Everything per-frame is a pure, jit- and vmap-able function over an explicit
state pytree; N independent streams batch on one chip and shard over a device
mesh (pure data parallelism — the algorithm has no cross-stream communication).
"""

__version__ = "0.1.0"
rev = 2  # API-parity counterpart of headtrackr.rev (src/main.js:30)

from . import cascade as _cascade_mod
from .cascade import Cascade, frontalface, toy_cascade
from .config import TrackerConfig

# Reference-parity API surface (populated by submodules):
#   headtrackr_tpu.ccv.detect_objects / grayscale
#   headtrackr_tpu.camshift.Tracker / Rectangle
#   headtrackr_tpu.Smoother, headtrackr_tpu.getWhitebalance
#   headtrackr_tpu.headposition.Tracker
#   headtrackr_tpu.Tracker (session runtime), headtrackr_tpu.Ui
#   headtrackr_tpu.controllers
from . import ccv            # noqa: E402
from . import camshift       # noqa: E402
from . import facetrackr     # noqa: E402
from . import headposition   # noqa: E402
from . import controllers    # noqa: E402
from .api import Smoother, getWhitebalance  # noqa: E402
from .runtime import events                 # noqa: E402
from .runtime.tracker import Tracker        # noqa: E402
from .runtime.ui import Ui                  # noqa: E402
from .runtime.serving import BatchedTracker, plan_serving  # noqa: E402
from .runtime.fanout import (StreamFanout, IngestRing,  # noqa: E402
                             BatchedSession)
from .runtime.video import (ClipSource, SyntheticFaceSource,  # noqa: E402
                            CameraSource)
from .utils.profiling import enable_compilation_cache  # noqa: E402

# The bundled model, like headtrackr.cascade (src/cascade.js:19).
cascade = frontalface

__all__ = [
    "Cascade", "frontalface", "toy_cascade", "TrackerConfig",
    "ccv", "camshift", "facetrackr", "headposition", "controllers",
    "Smoother", "getWhitebalance", "Tracker", "Ui", "BatchedTracker",
    "plan_serving",
    "StreamFanout", "IngestRing", "BatchedSession",
    "ClipSource", "SyntheticFaceSource", "CameraSource",
    "events", "cascade", "rev",
]
