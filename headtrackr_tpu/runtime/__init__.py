from . import events
from .video import ClipSource, SyntheticFaceSource, CameraSource, VideoSource
from .tracker import Tracker
from .ui import Ui
from .serving import BatchedTracker
from .fanout import StreamFanout, IngestRing, BatchedSession

__all__ = ["events", "ClipSource", "SyntheticFaceSource", "CameraSource",
           "VideoSource", "Tracker", "Ui", "BatchedTracker",
           "StreamFanout", "IngestRing", "BatchedSession"]
