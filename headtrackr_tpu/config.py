"""Typed configuration mirroring the reference's option objects.

Names and defaults follow the reference exactly:
  - Tracker params:     src/main.js:12-24,37-55
  - facetrackr params:  src/facetrackr.js:28-53
  - camshift params:    src/camshift.js:150-151
  - headposition params: src/headposition.js:22-48,69-84
"""

import dataclasses
from typing import Optional

__all__ = ["TrackerConfig"]


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    # headtrackr.Tracker params (src/main.js:37-55)
    ui: bool = True
    smoothing: bool = True
    debug: bool = False
    altVideo: Optional[object] = None  # fallback source when camera fails
                                       # (src/main.js:10-15,132-141)
    detectionInterval: int = 20        # ms between frame steps
    retryDetection: bool = True
    fov: Optional[float] = None        # horizontal FOV degrees; None = estimate
    fadeVideo: bool = False
    cameraOffset: float = 11.5         # cm camera -> screen center
    calcAngles: bool = False
    headPosition: bool = True

    # facetrackr params (src/facetrackr.js:28-53)
    sendEvents: bool = True
    whitebalancing: bool = True

    # headposition params (src/headposition.js:22-48)
    distance_to_screen: float = 60.0
    edgecorrection: bool = True

    # detector work shape (src/facetrackr.js:147-149: interval=5, min_neighbors=1)
    detectorInterval: int = 5
    minNeighbors: int = 1

    # smoother (src/main.js:163: Smoother(0.35, detectionInterval + 15))
    smoothingAlpha: float = 0.35

    # framework-only knobs (no reference counterpart)
    maxCandidates: int = 256           # device-side grouping capacity
    survivorsStage2: int = 4096        # compaction width after stages 0-1
    survivorsDeep: int = 512           # compaction width after stages 2-5
    histBlock: Optional[int] = None    # FULL-FRAME camshift histogram/pdf
                                       # scan block size (None = auto
                                       # _pick_block; the A/B knob behind the
                                       # r3 block-cap measurements,
                                       # tools/exp_scan_ab.py).  The
                                       # band-local pdf always auto-sizes to
                                       # the band's own pixel count — a
                                       # full-frame block value would not
                                       # divide it.
    sparseHist: Optional[int] = None   # K: sparse-model camshift histogram.
                                       # Ratio weights min(model/cur, 1) are
                                       # zero wherever the MODEL histogram is
                                       # zero (src/camshift.js:314-330), so a
                                       # stream whose model has <= K distinct
                                       # bins only needs current-frame counts
                                       # for those K bins — a K-lane compare
                                       # scan instead of the 128-lane
                                       # two-factor one-hot formulation.
                                       # EXACT: streams whose model overflows
                                       # K bins are flagged at handoff and
                                       # served by the full-frame fallback
                                       # every tick (the band-escape path) —
                                       # correct but slow, so size K to your
                                       # content (a 26x26 face crop has
                                       # <= 676, typically 30-150 distinct
                                       # bins; K is lane-sized: 64 or 128).
                                       # None = off.  Serving/band path only.
    bandHist: bool = False             # True: the band-local serving path
                                       # also counts the CURRENT histogram
                                       # over the band instead of the full
                                       # frame (src/camshift.js:268 counts
                                       # full-frame).  ~6x less histogram
                                       # work at the default 96x128 band —
                                       # the full-frame chain is the largest
                                       # steady-tick cost.  APPROXIMATE by
                                       # design (docs/PARITY.md deviation
                                       # 13): ratio weights min(model/cur,1)
                                       # use band-local cur counts, which
                                       # equal full-frame counts EXACTLY
                                       # whenever every model-colored pixel
                                       # lies inside the band (true for all
                                       # conformance clips + the bench
                                       # workload); when background shares
                                       # model bins, weights inflate toward
                                       # 1 (for every bin the band pdf
                                       # reads, never below the reference
                                       # value).  Zero-mass LOSS semantics
                                       # are unchanged (bins absent from the
                                       # band are never read by the band
                                       # pdf).  Escape-fallback ticks still
                                       # use the reference-exact full-frame
                                       # weights.  Band/serving path only;
                                       # off = reference-exact.
    bandHistAudit: bool = True         # bandHist's production safety net
                                       # (PARITY deviation 13): at every
                                       # VJ->CS handoff, audit ON DEVICE
                                       # whether any model-colored pixel
                                       # lies outside the serving band —
                                       # the content condition under which
                                       # bandHist can become approximate
                                       # (NECESSARY, not sufficient: the
                                       # r5 bench pool trips it on 85/256
                                       # streams whose windows are
                                       # nevertheless bit-equal).  Dirty
                                       # streams carry a per-stream
                                       # band_dirty flag (state.cs,
                                       # BatchedTracker.stream_info);
                                       # what is DONE about them is
                                       # bandHistAuditAction.  Costs one
                                       # extra full-frame lookup on handoff
                                       # ticks only.  Effective only with
                                       # bandHist on a band path; the
                                       # periodic cross-check
                                       # (BatchedTracker.
                                       # band_hist_divergence) is the
                                       # complementary QUANTITATIVE
                                       # monitor.
    bandHistAuditAction: str = "flag"  # what a dirty band_dirty flag does:
                                       # "flag"   — telemetry only (state +
                                       #   stream_info); serving stays on
                                       #   the band-local path.  Pair with
                                       #   band_hist_divergence sampling.
                                       # "escape" — dirty streams are served
                                       #   by the full-frame escape fallback
                                       #   (reference-exact) every tick
                                       #   until a clean relock, surfacing
                                       #   in StepOutput.escaped.  Only
                                       #   sensible when dirty streams are
                                       #   RARE: the fallback is sized for
                                       #   transient escapes (escape_bucket
                                       #   streams/tick) — more PERMANENT
                                       #   dirty streams than that force the
                                       #   full-batch recompute every tick,
                                       #   which costs MORE than
                                       #   bandHist=False (measured r5:
                                       #   85/256 dirty -> 9.60 ms/tick vs
                                       #   3.49 flag / 5.2 bandHist-off).
    histKernel: Optional[str] = None   # "pallas": run the DENSE camshift
                                       # histogram/backprojection pixel scans
                                       # as the Mosaic kernels in
                                       # kernels/histpdf.py (one-hot factors
                                       # stay in VMEM; pdf lookup exact-f32
                                       # via the triple-bf16 weight split)
                                       # instead of the XLA one-hot-matmul
                                       # scan.  Identical values in exact
                                       # mode (the kernel pdf is always the
                                       # exact f32 lookup — it can only
                                       # DIFFER from the fast/default XLA
                                       # path, which bf16-rounds weights
                                       # inside the dot; docs/PARITY.md
                                       # deviation 10).  Ignored on the
                                       # sparse path (sparseHist wins — no
                                       # sparse kernel).  None = XLA (the
                                       # measured production default; see
                                       # docs/PERFORMANCE.md "Pallas
                                       # hist+pdf kernels" for the A/B).
    exactCamshift: bool = False        # True: bit-faithful f32 camshift math
                                       # on TPU (backprojection lookup + moment
                                       # prefix sums at Precision.HIGHEST,
                                       # ~35% camshift cost); False: weights
                                       # bf16-rounded inside the MXU dot —
                                       # docs/PARITY.md deviation 10.  CPU is
                                       # identical either way.

    @property
    def smoothingInterval(self) -> int:
        return self.detectionInterval + 15
