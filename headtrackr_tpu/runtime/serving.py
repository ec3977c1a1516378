"""Batched multi-stream serving: N cameras on one chip (or a mesh of chips).

The reference runs one Tracker per camera in one JS thread.  Here per-stream
state is a pytree, so N streams are a stacked state and a vmapped step — no
cross-stream communication exists in the algorithm, so scaling is pure data
parallelism over a 1-D device mesh (SURVEY §2 checklist).

Two schedulers:

Host scheduler (BatchedTracker.step):
  - any stream in WB or VJ mode  -> vmapped "full" step (pays the detector)
  - <= bucket streams non-CS     -> "bucket" step (camshift for all + full
                                    machinery for just those streams)
  - every stream tracking (CS)   -> vmapped "track" fast path
Modes live on device; the host reads back a tiny mode vector every
``sync_interval`` ticks to pick the next step function (stale view = up to
that many ticks of detection latency for a freshly lost stream).

Device scheduler (BatchedTracker.step_auto / run_scan):
  One program per tick: camshift for all streams, then an ON-DEVICE top_k over
  the entry modes picks the <= bucket (re)detecting streams and a lax.cond
  skips the whole detector when there are none.  No host mode reads, so
  scheduling latency is zero ticks and run_scan can fuse K ticks into one
  dispatch (lax.scan) for throughput serving — dispatch overhead measured at
  ~1.3 ms/call on the axon tunnel, ~16% of a steady-state tick.  With a mesh,
  the device scheduler runs under shard_map: each device top_k-schedules its
  OWN stream shard (bucket per device, zero cross-chip collectives), which is
  the sharding-native form of the reference's one-tracker-per-page loop.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cascade import frontalface
from ..config import TrackerConfig
from ..models import camshift as cs_mod
from ..models import facetracker as ft

__all__ = ["BatchedTracker", "make_batched_steps", "plan_serving",
           "resolve_band", "wants_band_audit"]


def resolve_band(band, frame_shape):
    """Normalize a band knob to a concrete value: "auto" -> DEFAULT_BAND;
    a band covering the whole frame -> None (identical math, skip the cond).
    The ONE resolution rule shared by make_batched_steps and
    BatchedTracker (the audit/divergence machinery must see the same band
    the step programs use)."""
    if band == "auto":
        band = cs_mod.DEFAULT_BAND
    if band is not None and (band[0] >= frame_shape[0]
                             and band[1] >= frame_shape[1]):
        band = None
    return band


def wants_band_audit(config, band):
    """True iff step programs built from this (config, resolved band) carry
    the bandHist handoff-audit flag — the ONE schema rule shared by
    make_batched_steps, BatchedTracker, and EXTERNAL state builders: any
    state fed to those steps must be created with
    ``ft.init_state(..., band_audit=wants_band_audit(cfg, band))``, or the
    VJ->CS handoff's tree_map hits a None/array leaf mismatch at trace
    time (the r5 verify_chip serving-gate failure).  ``band`` must already
    be resolve_band()-normalized."""
    return band is not None and config.bandHist and config.bandHistAudit


def plan_serving(n_streams, frame_shape=(240, 320), max_face_px=100,
                 simultaneous_losses=None, latency_sensitive=False,
                 model_bins=None):
    """Capacity planner: BatchedTracker kwargs (+ a run_scan length) sized
    to a deployment's workload by the rules measured on v5e
    (docs/PERFORMANCE.md "Scaling" / "Round 2").

    Validity: every sizing constant below was measured at 320x240 and
    re-validated at 640x480 on-chip (r4); the band and bucket rules are
    window- and loss-count-based (not frame-size-based), so they transfer,
    but frame sizes far outside that range deserve their own
    tools/exp_*-style qualification run.

    Rules:

    - ``band``: camshift search windows run ~1.3x the tracked face, and an
      escape-free band needs +24 px slack per dimension
      (models/camshift.band_for; tools/exp_band_rule.py).  Undersized is
      safe — escapes recompute full-frame (correct, slower).
    - ``bucket``: ~2x the expected simultaneous-loss count.  A redetect
      tick's detector cost scales with bucket whether or not the slots are
      real (28.0k fps at bucket=32 vs 34.7k at 8 on the bench's 4-loss
      workload); overflow between bucket and 4*bucket is served in chunks.
      Default loss assumption: 2% of streams.
    - ``overload``: "rotate" bounds per-tick cost under mass loss (FIFO by
      pend_age, max wait ceil(npend/(4*bucket)) ticks) for
      latency-sensitive serving; "full" relocks everyone in one slow tick.
    - ``scan_len``: 16 ticks per run_scan dispatch amortizes the ~1.3 ms
      host dispatch to ~0.1 ms/tick; latency-sensitive callers should
      drive step_auto tick-by-tick instead (scan_len 1 — measured p50/p99
      in docs/PERFORMANCE.md "Latency mode").
    - ``sparse_hist``: pass ``model_bins`` (the distinct 4-bit-RGB bin
      count of your face crops — webcam faces run ~90-300; measure yours
      with ``(model_hist != 0).sum()`` after a lock).  The planner
      recommends K=64 only when 1.3x model_bins fits it, else None —
      NEVER 128: the r4 end-to-end A/B (tools/exp_sparse_ab.py, 256
      streams, interleaved reps) measured K=64 at 5.95 vs 6.75 ms/tick
      dense on 2-3-bin models (the win case), but K=128 at 9.43 vs 7.28
      dense on realistic ~94-bin models even with zero overflow, and an
      overflowed K pays sparse+dense (14.2 ms/tick).  Windows bit-match
      dense in every arm.  So sparse is a special-case knob (uniform
      markers, synthetic blobs), not the webcam-face path.

    Returns a dict: band/bucket/overload/sparse_hist/bandHist are
    BatchedTracker kwargs (sparse_hist maps to the ``sparseHist`` config
    field); scan_len is for warmup(scan_len=...)/run_scan.

    - ``bandHist``: planned True (band-local current histograms — the
      measured +48% throughput serving mode, 73.4k vs 49.6k fps/chip at
      256 streams, r4) BECAUSE the default handoff audit
      (TrackerConfig.bandHistAudit) surfaces its content condition at
      runtime: a stream whose handoff model carries out-of-band bins is
      flagged band_dirty (stream_info; PARITY deviation 13 safety net),
      so the mode no longer needs an offline content judgement.  Pair
      with periodic BatchedTracker.band_hist_divergence sampling in
      production.  The audit condition is NECESSARY, not sufficient (r5:
      85/256 bench streams flag dirty with bit-equal windows), so the
      default action is telemetry; deployments that require hard
      exactness on RARE dirty content can set
      bandHistAuditAction="escape" (reference-exact fallback until a
      clean relock — see config.py for the cost cliff when dirty streams
      exceed escape_bucket).

    >>> p = plan_serving(256, max_face_px=40)
    >>> bt = BatchedTracker(256, band=p["band"], bucket=p["bucket"],
    ...                     overload=p["overload"], bandHist=p["bandHist"])
    """
    win = int(np.ceil(1.3 * max_face_px))
    band = cs_mod.band_for((win, win), frame_shape)
    if simultaneous_losses is None:
        simultaneous_losses = max(1, round(0.02 * n_streams))
    bucket = max(1, min(2 * int(simultaneous_losses), n_streams))
    sparse = None
    if model_bins is not None:
        need = 1.3 * int(model_bins)
        sparse = 64 if need <= 64 else None
    return {
        "band": band,
        "bucket": bucket,
        "overload": "rotate" if latency_sensitive else "full",
        "scan_len": 1 if latency_sensitive else 16,
        "sparse_hist": sparse,
        "bandHist": True,
    }


def make_batched_steps(cascade, config, frame_shape, mesh=None, donate=True,
                       bucket=32, band="auto", overload="full",
                       escape_bucket=8):
    """Returns (step_full, step_track, step_bucket, step_auto, step_scan).

    overload: device-scheduler policy when more than 4*bucket streams pend
    on one tick — "full" (default) runs the full step for the whole batch
    (one slow tick, every stream served: fastest cold start); "rotate"
    serves the 4*bucket OLDEST pending streams (bounded tick cost for
    latency-sensitive serving; pend_age makes the rotation FIFO, max wait
    ceil(npend / (4*bucket)) ticks).

    step_bucket(state, frames, idx) runs the camshift fast path for ALL
    streams plus the full WB/VJ machinery for the <= ``bucket`` streams named
    by idx (padded with N): the common serving tick where a handful of streams
    are (re)detecting while everyone else tracks.  Detector cost scales with
    the bucket, not the batch.

    step_auto(state, frames) is the same tick with the scheduling ON DEVICE
    (top_k over entry modes + lax.cond around the detector) — no host mode
    vector, zero scheduling staleness.  step_scan(state, frames_seq) scans
    step_auto over a (K, N, H, W, 3) tick sequence in one dispatch.

    band: camshift band-local tracking (models/camshift.track_band) — the pdf
    lookup + moment reductions run on a (bh, bw) band around each stream's
    search window instead of the full frame (the histogram stays full-frame
    for parity).  "auto" = DEFAULT_BAND when smaller than the frame, else
    full-frame; None disables.  Escaped streams (window left its band —
    rare) are recomputed with the full-frame track program (exactly the
    full-frame result).  Non-escaped streams' pdf values equal the
    full-frame values exactly; their moment reductions sum the same pixels
    in a different f32 association — the same accuracy class as the
    full-frame step (docs/PARITY.md "First-moment accuracy"; equal on
    every integer window path in the CPU suite).

    With a mesh, state and frames are sharded over the leading (stream) axis on
    mesh axis 'streams'; XLA partitions full/track/bucket SPMD over ICI with no
    collectives in the hot path, and auto/scan run under shard_map with
    per-device scheduling (bucket per device, per-shard escape cond).
    """
    band = resolve_band(band, frame_shape)
    # bandHist handoff audit (deviation 13 safety net): the full step's
    # VJ->CS handoff stamps band_dirty.  What dirty means downstream is
    # config.bandHistAuditAction: "flag" (default) = telemetry only
    # (stream_info / band_hist_divergence); "escape" = dirty streams
    # escape to the full-frame fallback every band tick
    # (camshift.track_band) — rare-dirty content only (see config.py).
    audit_band = band if wants_band_audit(config, band) else None
    full1 = ft.make_step(cascade, config, frame_shape, "full",
                         audit_band=audit_band)
    full = jax.vmap(full1)

    def _scatter_subbatch(tree, sub_tree, idx, safe, valid):
        """Merge a top_k-compacted sub-batch back into the full batch.

        Scatter with the UNCLAMPED idx so padding slots (idx == N) are
        dropped instead of aliasing stream N-1: a clamped scatter makes
        duplicate index N-1 with conflicting values, and JAX applies
        duplicate scatter-set updates in unspecified order — stream N-1's
        update could be silently discarded every tick."""
        def scatter(buf, sub):
            cur = buf[safe]
            vshape = (valid.shape[0],) + (1,) * (buf.ndim - 1)
            merged = jnp.where(valid.reshape(vshape), sub, cur)
            return buf.at[idx].set(merged, mode="drop")
        return jax.tree_util.tree_map(scatter, tree, sub_tree)

    def _escape_checked(banded, plain):
        """Band-local step with a COST-BOUNDED full-frame fallback for
        escaped streams (window left the band — rare).

        Scaling hazard (measured, docs/PERFORMANCE.md): a batch-level
        ``any(esc) -> recompute everyone full-frame`` cond fires with
        probability 1-(1-p)^N, so at a constant per-stream escape rate p the
        fallback frequency GROWS with the batch — the r2 512-stream
        regression.  Instead, <= ESCAPE_BUCKET escaped streams are top_k
        compacted and recomputed from the PRE-step state as a small
        sub-batch (cost O(bucket), not O(N)); only >bucket simultaneous
        escapes (vanishingly rare) pay the full-batch recompute.  Escaped
        streams get exactly the full-frame result; non-escaped streams are
        the same accuracy class as full-frame (see make_batched_steps)."""
        ebucket = max(1, int(escape_bucket))

        def fn(state, frames):
            st1, out1, esc = banded(state, frames)
            N = frames.shape[0]
            nesc = esc.sum()

            def none_(_):
                return st1, out1

            def few(_):
                vals, idx = jax.lax.top_k(esc.astype(jnp.int32), ebucket)
                idx = jnp.where(vals > 0, idx, N)
                safe = jnp.minimum(idx, N - 1)
                sub_state = jax.tree_util.tree_map(lambda a: a[safe], state)
                # ``plain`` is a vmapped step: shape-polymorphic over the
                # leading axis, so it serves the small sub-batch directly.
                # optimization_barrier: same multi-consumer u8-gather
                # miscompile hazard as _apply_bucket (see there).
                st2, out2 = plain(sub_state,
                                  jax.lax.optimization_barrier(frames[safe]))
                valid = idx < N
                return (_scatter_subbatch(st1, st2, idx, safe, valid),
                        _scatter_subbatch(out1, out2, idx, safe, valid))

            def many(_):
                st2, out2 = plain(state, frames)

                def pick(a, b):
                    e = esc.reshape(esc.shape + (1,) * (a.ndim - 1))
                    return jnp.where(e, a, b)

                return (jax.tree_util.tree_map(pick, st2, st1),
                        jax.tree_util.tree_map(pick, out2, out1))

            if ebucket >= N:
                st, out = jax.lax.cond(nesc == 0, none_, many, None)
            else:
                sel = jnp.where(nesc == 0, 0,
                                jnp.where(nesc <= ebucket, 1, 2))
                st, out = jax.lax.switch(sel, [none_, few, many], None)
            # telemetry AFTER the merge (the sub-batch scatter would clear
            # it): which streams this tick recomputed full-frame — band
            # escape or sparse-model overflow (StepOutput.escaped).  Exact
            # results either way; a sustained rate means the band /
            # sparseHist capacity knobs are undersized for the workload.
            return st, out._replace(escaped=esc)
        return fn

    def _fast_path(variant):
        plain = jax.vmap(ft.make_step(cascade, config, frame_shape, variant))
        if band is None:
            return plain
        banded = jax.vmap(
            ft.make_step(cascade, config, frame_shape, variant, band=band))
        return _escape_checked(banded, plain)

    track = _fast_path("track")
    wbtrack = _fast_path("wbtrack")

    def _apply_bucket(state1, out, frames, idx):
        """Run the full WB/VJ/CS machinery for the streams named by idx
        (padded with N) and merge the results into the post-track batch."""
        N = frames.shape[0]
        safe = jnp.minimum(idx, N - 1)
        sub_state = jax.tree_util.tree_map(lambda a: a[safe], state1)
        # optimization_barrier: when the u8 frames buffer ALSO feeds the
        # full-batch track pass, XLA:TPU fuses this gather into the
        # sub-step's channel slices and miscompiles the size-3 minor axis —
        # every channel read returns channel 0 (R), so the camshift init
        # histogram lands in the r-replicated bin with ZERO backprojection
        # mass and the lock collapses next tick (measured r3: relocked
        # streams flapped VJ<->CS every tick, 5x steady cost; the isolated
        # unfused gather is correct).  The barrier materializes the
        # gathered sub-frames so consumers read a fresh dense buffer.
        sub_frames = jax.lax.optimization_barrier(frames[safe])
        sub_state2, sub_out = full(sub_state, sub_frames)
        # apply only to valid, still-non-CS streams (a stream that re-locked
        # between mode syncs already advanced via the track pass above)
        valid = (idx < N) & (sub_state.mode != ft.MODE_CS)
        return (_scatter_subbatch(state1, sub_state2, idx, safe, valid),
                _scatter_subbatch(out, sub_out, idx, safe, valid))

    def bucket_step(state, frames, idx):
        state1, out = track(state, frames)          # CS streams advance
        return _apply_bucket(state1, out, frames, idx)

    def auto_step(state, frames):
        """Device-scheduled tick: no host mode vector.  Streams whose ENTRY
        mode is WB/VJ (same per-frame semantics as the reference: a stream
        that loses track this tick redetects on the NEXT frame,
        src/main.js:230-248) pick the branch from an on-device count:
          0 pending                  -> camshift fast path only
          pending but none in VJ     -> wbtrack fast path (whitebalance +
                                        camshift, NO detector — the first
                                        ~15 cold-start ticks are all-WB and
                                        cost a track tick instead of a
                                        full-batch detect tick)
          1..bucket pending          -> fast path + ONE top_k bucket
          bucket..chunk_cap pending  -> fast path + a while-loop of bucket
                                        chunks (detector cost scales with the
                                        ACTUAL pending count — a moderate
                                        loss burst no longer pays the
                                        full-batch detect tick)
          > chunk_cap pending        -> overload policy: "full" = full step
                                        for the whole batch (one slow tick,
                                        everyone served — cold start); or
                                        "rotate" = serve the chunk_cap
                                        OLDEST pending streams (bounded tick
                                        cost; pend_age makes the top_k FIFO,
                                        so max wait is ceil(npend/chunk_cap)
                                        ticks — no starvation)
        lax.switch executes exactly one branch per tick."""
        N = frames.shape[0]
        # trace-time clamp: make_batched_steps is batch-size-polymorphic,
        # so a caller-supplied bucket > N (e.g. the default 32 on a small
        # batch) must not reach top_k(k=bucket) or the chunk sizing
        kb = max(1, min(bucket, N))
        entry_non_cs = state.mode != ft.MODE_CS
        age = state.pend_age
        npend = entry_non_cs.sum()
        npend_vj = (state.mode == ft.MODE_VJ).sum()
        # a bucket multiple, so chunk slices never clamp (a clamped
        # dynamic_slice would re-serve streams: same frame stepped twice)
        chunk_cap = max(kb, (min(N, 4 * kb) // kb) * kb)
        nchunks_max = chunk_cap // kb
        # oldest-first bucket key; ties -> lowest stream index (top_k stable)
        sched_key = jnp.where(entry_non_cs, 1 + age, 0)

        def _aged(state2, served):
            new_age = jnp.where(entry_non_cs & ~served, age + 1,
                                jnp.zeros_like(age))
            return state2._replace(pend_age=new_age)

        def b_track(state, frames):
            st, out = track(state, frames)
            return st._replace(pend_age=jnp.zeros_like(age)), out

        def b_bucket(state, frames):
            state1, out = track(state, frames)
            vals, idx = jax.lax.top_k(sched_key, kb)
            idx = jnp.where(vals > 0, idx, N)  # padding slots dropped
            state2, out2 = _apply_bucket(state1, out, frames, idx)
            served = jnp.zeros((N,), bool).at[idx].set(True, mode="drop")
            return _aged(state2, served), out2

        def b_chunks(state, frames):
            state1, out = track(state, frames)
            vals, idxs = jax.lax.top_k(sched_key, chunk_cap)
            idxs = jnp.where(vals > 0, idxs, N)
            nchunks = jnp.minimum((npend + kb - 1) // kb, nchunks_max)

            def body(c, carry):
                st, o = carry
                idx = jax.lax.dynamic_slice(idxs, (c * kb,), (kb,))
                return _apply_bucket(st, o, frames, idx)

            state2, out2 = jax.lax.fori_loop(0, nchunks, body, (state1, out))
            served = jnp.zeros((N,), bool).at[idxs].set(True, mode="drop")
            return _aged(state2, served), out2

        def b_full(state, frames):
            st, out = full(state, frames)
            return st._replace(pend_age=jnp.zeros_like(age)), out

        def b_wbtrack(state, frames):
            st, out = wbtrack(state, frames)
            return st._replace(pend_age=jnp.zeros_like(age)), out

        if overload == "rotate":
            # overflow routes to the SAME b_chunks branch index (nchunks
            # saturates at nchunks_max): listing b_chunks twice would trace
            # the chunk machinery into the switch twice, doubling program
            # size for an identical branch body
            branches = [b_track, b_bucket, b_chunks, b_wbtrack]
            sel = jnp.where(npend == 0, 0,
                            jnp.where(npend_vj == 0, 3,
                                      jnp.where(npend <= kb, 1, 2)))
        else:
            branches = [b_track, b_bucket, b_chunks, b_full, b_wbtrack]
            sel = jnp.where(npend == 0, 0,
                            jnp.where(npend_vj == 0, 4,
                                      jnp.where(npend <= kb, 1,
                                                jnp.where(npend <= chunk_cap,
                                                          2, 3))))
        return jax.lax.switch(sel, branches, state, frames)

    def scan_steps(state, frames_seq):
        """K ticks in one dispatch: lax.scan of auto_step over the leading
        tick axis of frames_seq (K, N, H, W, 3).  Returns (state, StepOutput
        with (K, N) leaves)."""
        return jax.lax.scan(auto_step, state, frames_seq)

    kw = dict(donate_argnums=0) if donate else {}
    if mesh is None:
        return (jax.jit(full, **kw), jax.jit(track, **kw),
                jax.jit(bucket_step, **kw), jax.jit(auto_step, **kw),
                jax.jit(scan_steps, **kw))
    # Device scheduling under a mesh: shard_map so each device runs top_k /
    # cond / bucket on its OWN shard — per-device buckets, no collectives.
    spec = P("streams")
    seq_spec = P(None, "streams")  # leading tick axis replicated
    # check_vma=False: shards are fully independent (no collectives), so the
    # varying-axis bookkeeping adds nothing and trips on scan carries.
    auto_sm = jax.shard_map(auto_step, mesh=mesh,
                            in_specs=(spec, spec), out_specs=(spec, spec),
                            check_vma=False)
    # out leaves gain a leading K axis in scan; stream axis stays sharded
    scan_sm = jax.shard_map(scan_steps, mesh=mesh,
                            in_specs=(spec, seq_spec),
                            out_specs=(spec, seq_spec),
                            check_vma=False)
    shard = NamedSharding(mesh, P("streams"))
    seq_shard = NamedSharding(mesh, P(None, "streams"))
    rep = NamedSharding(mesh, P())
    return (jax.jit(full, in_shardings=(shard, shard), **kw),
            jax.jit(track, in_shardings=(shard, shard), **kw),
            jax.jit(bucket_step, in_shardings=(shard, shard, rep), **kw),
            jax.jit(auto_sm, in_shardings=(shard, shard), **kw),
            jax.jit(scan_sm, in_shardings=(shard, seq_shard), **kw))


class BatchedTracker:
    """Serve N independent streams with one device program per tick."""

    def __init__(self, n_streams, frame_shape=(240, 320), params=None,
                 cascade=None, mesh=None, sync_interval=8, bucket=32,
                 band="auto", overload="full", escape_bucket=8, **kw):
        """band: camshift band-local tracking (see make_batched_steps);
        "auto" enables it when the default band is smaller than the frame.

        escape_bucket: max streams whose band-escape is recomputed as a
        compacted sub-batch per tick (cost-bounding; more simultaneous
        escapes fall back to one full-batch full-frame tick).

        overload: mass-pending policy for the device scheduler — "full"
        (one full-batch detect tick) or "rotate" (bounded-cost FIFO
        rotation; see make_batched_steps).

        sync_interval: ticks between host reads of the device mode vector.
        Between syncs the scheduler dispatches with a stale mode view — safe
        (the track variant freezes non-CS streams), at the cost of up to
        sync_interval ticks of detection latency for a stream that just lost
        track.  Each host read costs a host<->device round trip, so this
        directly trades tail latency for throughput."""
        merged = dict(params or {})
        merged.update(kw)
        # batched detection: bound per-stream candidate buffers (the detect
        # path cost scales with these x streams); survivorsStage2/160 = tile
        # capacity — keep >= ~25 tiles or crowded scenes can evict face tiles
        if n_streams >= 32:
            merged.setdefault("survivorsStage2", 4096)
            merged.setdefault("survivorsDeep", 128)
            merged.setdefault("maxCandidates", 64)
        self.config = TrackerConfig(**merged)
        self.n = n_streams
        self.frame_shape = frame_shape
        self.cascade = cascade if cascade is not None else frontalface()
        self.mesh = mesh
        self.band = resolve_band(band, frame_shape)
        self._band_audit = wants_band_audit(self.config, self.band)
        self._divergence_fn = None
        self.bucket = max(1, min(int(bucket), n_streams))
        if mesh is not None:
            n_dev = mesh.devices.size
            if n_streams % n_dev:
                raise ValueError(f"n_streams={n_streams} not divisible by "
                                 f"mesh size {n_dev}")
            # device scheduling is per shard: bucket must fit one shard
            self.bucket = min(self.bucket, n_streams // n_dev)
        (self._step_full, self._step_track, self._step_bucket,
         self._step_auto, self._step_scan) = \
            make_batched_steps(self.cascade, self.config, frame_shape, mesh,
                               bucket=self.bucket, band=self.band,
                               overload=overload,
                               escape_bucket=escape_bucket)
        state1 = ft.init_state(self.config.whitebalancing,
                               self.config.sparseHist or 0,
                               band_audit=self._band_audit)
        self.state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), state1)
        if mesh is not None:
            shard = NamedSharding(mesh, P("streams"))
            self.state = jax.device_put(self.state, shard)
        self._modes = np.full((n_streams,), ft.MODE_WB if
                              self.config.whitebalancing else ft.MODE_VJ,
                              np.int32)
        self._pending_modes = None  # device array from a previous tick
        self.sync_interval = max(1, int(sync_interval))
        self._tick = 0

    def warmup(self, scan_len=None, host_sched=True, device_sched=True):
        """Compile the step programs up front (the bucket program would
        otherwise compile lazily on the first track-loss tick — a multi-minute
        stall in the middle of serving).

        host_sched=True also compiles the host-scheduler trio (full/track/
        bucket); device_sched=True compiles step_auto (the 3-way lax.switch —
        the slowest compile in the repo; pass False for host-scheduler-only
        deployments).  scan_len=K additionally compiles the K-tick run_scan
        program for that static K."""
        frames = jnp.zeros((self.n,) + self.frame_shape + (3,), jnp.uint8)
        idx = jnp.full((self.bucket,), self.n, jnp.int32)
        plan = [(self._step_auto, (frames,))] if device_sched else []
        if host_sched:
            plan += [(self._step_track, (frames,)),
                     (self._step_bucket, (frames, idx)),
                     (self._step_full, (frames,))]
        if scan_len:
            seq = jnp.zeros((scan_len,) + frames.shape, jnp.uint8)
            plan.append((self._step_scan, (seq,)))
        for fn, args in plan:
            state = jax.tree_util.tree_map(jnp.copy, self.state)
            st, out = fn(state, *args)
            np.asarray(out.mode_after)  # force completion
        return self

    def reset(self):
        """Re-initialize EVERY stream (fresh cold start; keeps the compiled
        programs).  The per-stream form is reset_stream."""
        s1 = ft.init_state(self.config.whitebalancing,
                           self.config.sparseHist or 0,
                           band_audit=self._band_audit)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.n,) + x.shape).copy(), s1)
        if self.mesh is not None:
            state = jax.device_put(
                state, NamedSharding(self.mesh, P("streams")))
        self.state = state
        self._modes = np.full((self.n,), int(s1.mode), np.int32)
        self._pending_modes = None

    def reset_stream(self, i):
        """Re-initialize one stream (new camera connects)."""
        if self._pending_modes is not None:  # drain before overwriting
            self._modes = np.array(self._pending_modes)
            self._pending_modes = None
        s1 = ft.init_state(self.config.whitebalancing,
                           self.config.sparseHist or 0,
                           band_audit=self._band_audit)
        self.state = jax.tree_util.tree_map(
            lambda buf, v: buf.at[i].set(v), self.state, s1)
        self._modes[i] = int(s1.mode)

    def step(self, frames, sync=False):
        """frames: (N, H, W, 3) u8.  Returns StepOutput batch (device arrays).

        Picks the camshift fast path when every stream is tracking.  The mode
        vector used for dispatch is one tick stale (pipelined: reading it only
        synchronizes on the PREVIOUS tick, which has already finished) — safe
        because the track variant freezes non-CS streams until the next full
        step.  Pass sync=True to block on this tick's modes instead.
        """
        frames = jnp.asarray(frames)
        self._tick += 1
        due = sync or (self._tick % self.sync_interval == 0)
        if due and self._pending_modes is not None:
            self._modes = np.array(self._pending_modes)
            self._pending_modes = None
        non_cs = np.nonzero(self._modes != ft.MODE_CS)[0]
        if non_cs.size == 0:
            self.state, out = self._step_track(self.state, frames)
        elif non_cs.size <= self.bucket:
            idx = np.full((self.bucket,), self.n, np.int32)
            idx[:non_cs.size] = non_cs
            self.state, out = self._step_bucket(self.state, frames,
                                                jnp.asarray(idx))
        else:
            self.state, out = self._step_full(self.state, frames)
        if sync:
            self._modes = np.array(self.state.mode)
            self._pending_modes = None
        else:
            # out.mode_after is an output buffer (not donated next tick)
            self._pending_modes = out.mode_after
        return out

    def step_auto(self, frames):
        """One device-scheduled tick (no host mode vector; zero scheduling
        staleness).  Interchangeable with step(sync_interval=1) semantics."""
        self._tick += 1
        self.state, out = self._step_auto(self.state, jnp.asarray(frames))
        self._pending_modes = out.mode_after
        return out

    def run_scan(self, frames_seq):
        """K device-scheduled ticks in ONE dispatch (throughput mode: adds K
        ticks of result latency).  frames_seq: (K, N, H, W, 3) u8.  Returns a
        StepOutput batch with (K, N) leaves.  Each distinct K compiles its own
        program — pass scan_len=K to warmup() first for serving."""
        frames_seq = jnp.asarray(frames_seq)
        if frames_seq.shape[0] == 0:
            raise ValueError("run_scan needs at least one tick "
                             "(frames_seq has leading length 0)")
        self._tick += int(frames_seq.shape[0])
        self.state, out = self._step_scan(self.state, frames_seq)
        self._pending_modes = out.mode_after[-1]
        return out

    def stream_info(self, stream):
        """Per-stream observability snapshot (host pulls — NOT for the
        per-tick hot path; poll it on demand or on a rotating sample).

          mode          "wb" | "vj" | "cs" (the device mode vector's last
                        synced view — up to sync_interval ticks stale)
          window        [x, y, w, h] camshift search window (i32 list)
          model_bins    distinct nonzero model-histogram bins (palette
                        size; 0 before the first VJ->CS handoff)
          band_dirty    the bandHist handoff-audit flag (PARITY deviation
                        13; None when the audit is off) — under the
                        default bandHistAuditAction="flag" this is HOW a
                        deployment sees which streams run the band-local
                        approximation on contaminated content
        """
        s = int(stream)
        mode = {ft.MODE_WB: "wb", ft.MODE_VJ: "vj",
                ft.MODE_CS: "cs"}[int(self.modes[s])]
        dirty = self.state.cs.band_dirty
        return {
            "stream": s,
            "mode": mode,
            "window": np.asarray(self.state.cs.window[s]).tolist(),
            "model_bins": int((np.asarray(self.state.cs.model_hist[s])
                               != 0).sum()),
            "band_dirty": (bool(np.asarray(dirty[s]))
                           if dirty is not None else None),
        }

    def band_hist_divergence(self, frames, stream=0):
        """Periodic bandHist cross-check (deviation 13 safety net, part b):
        recompute ONE stream's current histogram both full-frame
        (reference-exact) and band-local (the serving approximation) at its
        current search window, and report the weight divergence the band pdf
        would actually see.

        frames: this tick's (N, H, W, 3) batch (or any representative
        batch).  Returns a dict:
          max_inflation     largest (band_weight - full_weight) over bins
                            PRESENT in the band (0.0 = bit-exact tick)
          contaminated_bins model bins whose band count undercounts the
                            full-frame count (the deviation's trigger)
          model_bins        distinct nonzero model bins (palette size)
          band_dirty        the stream's handoff-audit flag (None when the
                            audit is off)
        Intended use: call every M ticks on a rotating stream sample and
        alarm on max_inflation > tolerance — the runtime complement to the
        handoff audit (TrackerConfig.bandHistAudit).  Cost: one small
        single-stream program + one host pull; NOT for the per-tick hot
        path."""
        if self.band is None or not self.config.bandHist:
            raise ValueError("band_hist_divergence needs an active band "
                             "path with bandHist=True")
        if self._divergence_fn is None:
            band = self.band
            H, W = self.frame_shape

            @jax.jit
            def fn(frame, model_hist, window):
                from ..ops.histogram import (backprojection_weights,
                                             histogram_scan, rgb_bins)
                bins = rgb_bins(frame)
                ry, rx, bh, bw = cs_mod.band_rect(window, band, (H, W))
                band_bins = jax.lax.dynamic_slice(bins, (ry, rx), (bh, bw))
                cur_full = histogram_scan(bins)
                cur_band = histogram_scan(band_bins)
                w_full = backprojection_weights(model_hist, cur_full)
                w_band = backprojection_weights(model_hist, cur_band)
                present = cur_band > 0  # bins the band pdf can read
                infl = jnp.where(present, w_band - w_full, 0.0)
                contaminated = ((model_hist > 0) & (cur_band < cur_full)
                                & present)
                return (infl.max(), contaminated.sum(),
                        (model_hist > 0).sum())

            self._divergence_fn = fn
        frames = jnp.asarray(frames)
        model = self.state.cs.model_hist[stream]
        window = self.state.cs.window[stream]
        mx, nc, nm = self._divergence_fn(frames[stream], model, window)
        dirty = self.state.cs.band_dirty
        return {
            "max_inflation": float(np.asarray(mx)),
            "contaminated_bins": int(np.asarray(nc)),
            "model_bins": int(np.asarray(nm)),
            "band_dirty": (bool(np.asarray(dirty[stream]))
                           if dirty is not None else None),
            "stream": int(stream),
        }

    @property
    def modes(self):
        if self._pending_modes is not None:
            self._modes = np.array(self._pending_modes)
            self._pending_modes = None
        return self._modes.copy()
