"""Per-stream event fanout + async frame ingest for batched serving.

The reference's entire output surface is three DOM events per tracker
(headtrackrStatus src/main.js:70-77, facetrackingEvent src/facetrackr.js:112-125,
headtrackingEvent src/headposition.js:183-188).  ``BatchedTracker.step`` returns
raw device arrays; this module closes the loop for the N-stream product:

  StreamFanout   — one EventBus per stream; ``emit(out)`` pulls the batch
                   StepOutput to host once and dispatches the reference-shaped
                   events per stream (payloads gain a ``stream`` id field —
                   documented extension, docs/PARITY.md).
  IngestRing     — latest-frame-wins host buffer N producers write into and the
                   serving loop snapshots batches from (the <video> element
                   equivalent: a camera overwrites its frame whether or not
                   the consumer kept up).
  BatchedSession — glue: sources/ring -> BatchedTracker -> fanout, with the
                   host pull of tick t-1's outputs overlapped with tick t's
                   device dispatch (one-tick emission latency, zero added
                   device stalls).
"""

import threading
import time as _time

import numpy as np

import jax

from ..models import facetracker as ft
from . import events as ev
from .serving import BatchedTracker
from .video import VideoSource, ClipSource, resize_rgb

__all__ = ["StreamFanout", "IngestRing", "BatchedSession"]

_STATUS_BITS = ft.STATUS_BITS  # one shared table (models/facetracker)


class StreamFanout:
    """N per-stream event buses fed from one batched StepOutput.

    Payloads mirror Tracker._emit (runtime/tracker.py) field-for-field:
      facetrackingEvent: x, y, width, height, angle, confidence, detection,
                         time        (src/facetrackr.js:112-125)
      headtrackingEvent: x, y, z     (src/headposition.js:183-188)
      headtrackrStatus:  status      (src/main.js:70-77)
    plus a ``stream`` int field on every payload (batch extension).
    """

    def __init__(self, n_streams, buses=None, hints_after_s=5.0):
        """hints_after_s: per-stream 'hints' status after that many seconds
        of VJ without a lock (src/main.js:188-194; None disables)."""
        if buses is not None and len(buses) != n_streams:
            raise ValueError("need one bus per stream")
        self.n = n_streams
        self.buses = list(buses) if buses is not None else \
            [ev.EventBus() for _ in range(n_streams)]
        self.status = [""] * n_streams  # last status string per stream
        self.hints_after_s = hints_after_s
        self._vj_since = [None] * n_streams
        self._hints_sent = [False] * n_streams
        # "lost" halts a stream's emission (the single Tracker stops on
        # STATUS_LOST, src/main.js:245-248; with retryDetection=False the
        # batched step would otherwise re-emit lost + zero-size face events
        # every tick forever).  reset_stream() re-arms.
        self.stopped = [False] * n_streams

    def bus(self, i):
        return self.buses[i]

    def reset_stream(self, i):
        """Re-arm stream i's emission (pair with BatchedTracker.reset_stream
        after a "lost" halt, or when a new camera takes the slot)."""
        self.stopped[i] = False
        self.status[i] = ""
        self._vj_since[i] = None
        self._hints_sent[i] = False

    def add_event_listener(self, i, type_, callback):
        return self.buses[i].add_event_listener(type_, callback)

    def emit(self, out, time_ms=0, stream_ids=None):
        """Dispatch per-stream events from a batched StepOutput.

        out: StepOutput of (N,) leaves (device or host).  time_ms: the tick's
        wall-clock duration, forwarded as the facetrackingEvent ``time`` field
        (the reference stamps per-frame detection time, src/facetrackr.js:123).
        stream_ids: optional subset to emit for.  Returns #events dispatched.
        """
        # one device_get for the whole tree: per-leaf np.asarray would pay
        # one synchronous host round trip PER LEAF (~27 ms each through the
        # axon relay; ~20 leaves = ~0.5 s/tick)
        host = jax.device_get(out)
        ids = range(self.n) if stream_ids is None else stream_ids
        count = 0
        now = _time.time()
        # One C-speed list conversion per field: per-element np scalar ->
        # float() in the stream loop measurably dominates emit at 256
        # streams (tools/bench_emit.py; docs/PERFORMANCE.md).
        status_l = host.status.tolist()
        det_l = host.detection.tolist()
        event_face_l = host.event_face.tolist()
        head_valid_l = host.head_valid.tolist()
        face = (host.face_h.tolist(), host.face_w.tolist(),
                host.face_angle.tolist(), host.face_x.tolist(),
                host.face_y.tolist(), host.face_conf.tolist())
        head = (host.head_x.tolist(), host.head_y.tolist(),
                host.head_z.tolist())
        for i in ids:
            if self.stopped[i]:
                continue
            b = self.buses[i]
            status = status_l[i]
            det = det_l[i]
            if det == ft.MODE_CS:
                self.status[i] = "tracking"  # attribute only (src/main.js:227)
                self._vj_since[i] = None
                self._hints_sent[i] = False
            elif det == ft.MODE_VJ and self.hints_after_s is not None:
                # per-stream hints after 5 s of VJ without a lock
                # (src/main.js:188-194; Tracker._emit equivalent)
                if self._vj_since[i] is None:
                    self._vj_since[i] = now
                elif (not self._hints_sent[i]
                      and now - self._vj_since[i] > self.hints_after_s):
                    self._hints_sent[i] = True
                    self.status[i] = "hints"
                    b.dispatch_event(ev.STATUS, {"status": "hints",
                                                 "stream": i})
                    count += 1
            for bit, name in _STATUS_BITS:
                if status & bit:
                    self.status[i] = name
                    b.dispatch_event(ev.STATUS, {"status": name, "stream": i})
                    count += 1
            if status & ft.STATUS_LOST:
                self.stopped[i] = True  # halt this stream's emission
                continue
            if event_face_l[i]:
                b.dispatch_event(ev.FACETRACKING, {
                    "height": face[0][i], "width": face[1][i],
                    "angle": face[2][i],
                    "x": face[3][i], "y": face[4][i],
                    "confidence": face[5][i],
                    "detection": "CS", "time": time_ms, "stream": i,
                })
                count += 1
            if head_valid_l[i]:
                b.dispatch_event(ev.HEADTRACKING, {
                    "x": head[0][i], "y": head[1][i],
                    "z": head[2][i], "stream": i,
                })
                count += 1
        return count


class IngestRing:
    """Latest-frame-wins ingest buffer: N producers, one batch consumer.

    Per stream a 2-deep double buffer: ``put`` writes the back slot then flips
    it front, so ``snapshot`` never reads a torn frame and slow consumers see
    the newest complete frame (video-element semantics, src/main.js:168-171 —
    the reference samples whatever the <video> currently shows).
    """

    def __init__(self, n_streams, frame_shape=(240, 320)):
        H, W = frame_shape
        self.n = n_streams
        self._buf = np.zeros((2, n_streams, H, W, 3), np.uint8)
        self._front = np.zeros((n_streams,), np.int8)
        self._seq = np.zeros((n_streams,), np.int64)
        self._locks = [threading.Lock() for _ in range(n_streams)]

    def put(self, i, frame):
        """Publish stream i's newest frame (copies; any thread)."""
        with self._locks[i]:
            back = 1 - self._front[i]
            np.copyto(self._buf[back, i], frame, casting="no")
            self._front[i] = back
            self._seq[i] += 1

    def seq(self):
        """Per-stream publish counters (monotonic; for staleness checks)."""
        return self._seq.copy()

    def snapshot(self, out=None):
        """Assemble the newest complete frame of every stream into one
        (N, H, W, 3) batch (copy; ``out`` reused if given)."""
        if out is None:
            out = np.empty(self._buf.shape[1:], np.uint8)
        for i in range(self.n):
            with self._locks[i]:
                np.copyto(out[i], self._buf[self._front[i], i])
        return out


class BatchedSession:
    """N sources -> BatchedTracker -> per-stream events, pipelined.

    sources: list of VideoSource (or arrays -> ClipSource) — pull mode: each
    tick reads one frame per source into the batch (a finished clip holds its
    last frame).  Pass ``sources=None`` and feed an IngestRing for push mode.

    The host pull that event emission requires (np.asarray of the StepOutput)
    synchronizes on that tick's device work, so the session emits tick t-1's
    events after dispatching tick t: the pull overlaps device compute instead
    of stalling it.  ``flush()`` drains the final pending tick.
    """

    def __init__(self, n_streams, sources=None, ring=None,
                 frame_shape=(240, 320), tracker=None, fanout=None, **kw):
        if sources is not None and len(sources) != n_streams:
            raise ValueError("need one source per stream")
        self.n = n_streams
        self.frame_shape = frame_shape
        self.tracker = tracker if tracker is not None else \
            BatchedTracker(n_streams, frame_shape=frame_shape, **kw)
        self.fanout = fanout if fanout is not None else StreamFanout(n_streams)
        self.sources = None
        if sources is not None:
            self.sources = [s if isinstance(s, VideoSource) else ClipSource(s)
                            for s in sources]
        self.ring = ring
        if self.sources is None and self.ring is None:
            self.ring = IngestRing(n_streams, frame_shape)
        self._batch = np.zeros((n_streams,) + frame_shape + (3,), np.uint8)
        self._ended = np.zeros((n_streams,), bool)
        self._pending = None  # (StepOutput, t0) awaiting emission
        self._idle_since = None  # end of the last step_once (sleep excluded
        # from the emitted per-tick `time`: PARITY deviation 7 wants the
        # step's wall clock, not the timer interval)
        self._run = False
        self._thread = None
        self.ticks = 0

    def _fill_batch(self):
        """One frame per source into the preallocated batch (last frame held
        after end-of-clip).  Returns False when every source has ended."""
        if self.sources is None:
            self.ring.snapshot(out=self._batch)
            return True
        for i, src in enumerate(self.sources):
            if self._ended[i]:
                continue
            f = src.read()
            if f is None:
                self._ended[i] = True
            else:
                if f.shape[:2] != self.frame_shape:
                    # same source->canvas normalization as Tracker._capture
                    f = resize_rgb(f, self.frame_shape[1],
                                   self.frame_shape[0])
                self._batch[i] = f
        return not self._ended.all()

    def step_once(self, sync=False):
        """One tick: ingest -> device step -> emit previous tick's events.
        Returns False once all pull-mode sources are exhausted."""
        now = _time.time()
        idle = 0.0 if self._idle_since is None else now - self._idle_since
        if not self._fill_batch():
            return False
        t0 = _time.time()
        out = self.tracker.step(self._batch, sync=sync)
        prev = self._pending
        self._pending = (out, t0)
        if prev is not None:
            p_out, p_t0 = prev
            elapsed = _time.time() - p_t0 - idle  # tick t-1's window minus
            # the timer sleep between the two step_once calls
            self.fanout.emit(p_out, time_ms=max(0, int(elapsed * 1000)))
        self.ticks += 1
        self._idle_since = _time.time()
        return True

    def flush(self):
        """Emit the last pending tick's events (forces a device sync)."""
        if self._pending is not None:
            p_out, p_t0 = self._pending
            self._pending = None
            now = _time.time()
            idle = 0.0 if self._idle_since is None else now - self._idle_since
            self.fanout.emit(p_out,
                             time_ms=max(0, int((now - p_t0 - idle) * 1000)))

    def run(self, max_ticks=None, sync=False):
        """Drive synchronously until sources end (or max_ticks); flushes."""
        n = 0
        while (max_ticks is None or n < max_ticks) and self.step_once(sync):
            n += 1
        self.flush()
        return n

    def start(self, interval_ms=None):
        """Timer-thread mode, like Tracker.start (src/main.js:328-345).
        Refuses (returns None) while a stop()-orphaned loop thread is still
        finishing an in-flight step — a second loop would race it on the
        donated tracker state."""
        if self._run:
            return self
        if self._thread is not None and self._thread.is_alive():
            return None
        self._run = True
        interval = (self.tracker.config.detectionInterval if interval_ms is None
                    else interval_ms) / 1000.0

        def loop():
            while self._run:
                t0 = _time.time()
                if not self.step_once():
                    break
                sleep = interval - (_time.time() - t0)
                if sleep > 0:
                    _time.sleep(sleep)
            self.flush()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._run = False
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            if self._thread.is_alive():
                # join timed out: the loop thread may still be inside
                # step_once/flush — a host-side flush here would race on
                # _pending and could double- or tear-emit events.  The
                # (daemon) thread flushes itself when it exits.
                self._thread = None
                return self
            self._thread = None
        self.flush()
        return self
