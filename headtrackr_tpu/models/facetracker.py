"""The per-frame WB -> VJ -> CS state machine as one pure, jit/vmap-able step.

Spec: src/facetrackr.js:37-228 (mode dispatch, handoff) + src/main.js:168-305
(supervision: loss/retry, smoothing, head-diagonal stability gate, FOV caching,
head position).  All state is an explicit pytree (TrackerState); a batch of N
streams is a stacked state and vmap(step) — the key enabler of batched serving
(the reference keeps all of this in JS closures, src/facetrackr.js:49-59,
src/main.js:57-65).

Status side effects become a bitmask in the step output; the host runtime
translates them to headtrackrStatus events (src/main.js:70-77).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from ..ops.imageproc import grayscale, whitebalance
from . import camshift as cs
from . import headpose as hp
from .detector import detect_best

__all__ = ["TrackerState", "StepOutput", "init_state", "make_step",
           "MODE_WB", "MODE_VJ", "MODE_CS",
           "STATUS_WHITEBALANCE", "STATUS_DETECTING", "STATUS_FOUND",
           "STATUS_REDETECTING", "STATUS_LOST", "STATUS_BITS"]

MODE_WB, MODE_VJ, MODE_CS = 0, 1, 2

STATUS_WHITEBALANCE = 1
STATUS_DETECTING = 2
STATUS_FOUND = 4
STATUS_REDETECTING = 8
STATUS_LOST = 16
# bit -> status-event name (src/main.js:70-77); the ONE table shared by
# Tracker._emit and StreamFanout.emit so the two surfaces cannot drift
STATUS_BITS = [
    (STATUS_WHITEBALANCE, "whitebalance"),
    (STATUS_DETECTING, "detecting"),
    (STATUS_FOUND, "found"),
    (STATUS_REDETECTING, "redetecting"),
    (STATUS_LOST, "lost"),
]

PWB_LENGTH = 15                # src/facetrackr.js:59
CONFIDENCE_THRESHOLD = -10.0   # src/facetrackr.js:57
DIAG_LENGTH = 6                # src/main.js:271


class TrackerState(NamedTuple):
    mode: jnp.ndarray            # i32: 0 WB, 1 VJ, 2 CS
    wb_ring: jnp.ndarray         # f32[15], most recent first (JS unshift)
    wb_n: jnp.ndarray            # i32
    cs: cs.CamshiftState
    # main-loop supervision (src/main.js:57-65)
    sm_sp: jnp.ndarray           # f32[5] smoother state [x, y, z, w, h]
    sm_init: jnp.ndarray         # bool
    face_found: jnp.ndarray      # bool
    first_run: jnp.ndarray       # bool
    diag_ring: jnp.ndarray       # f32[6]
    diag_n: jnp.ndarray          # i32
    headpose_active: jnp.ndarray  # bool
    tan_fov: jnp.ndarray         # f32 (2*tan(fov/2); 0 = unset)
    fov_width: jnp.ndarray       # f32 radians (cached across re-inits)
    head_diag_cam: jnp.ndarray   # f32 (stateful edge-correction diagonal)
    stopped: jnp.ndarray         # bool
    pend_age: jnp.ndarray        # i32 scheduler wait counter: ticks this
                                 # stream has pended (non-CS) without being
                                 # served by the device scheduler's bucket
                                 # (runtime/serving.py auto_step; always 0
                                 # outside overload="rotate" operation)


class StepOutput(NamedTuple):
    detection: jnp.ndarray       # i32 mode of this frame's result
    wb: jnp.ndarray              # f32 (WB frames)
    face_x: jnp.ndarray          # raw result fields (facetrackingEvent payload)
    face_y: jnp.ndarray
    face_w: jnp.ndarray
    face_h: jnp.ndarray
    face_angle: jnp.ndarray
    face_conf: jnp.ndarray
    smooth_x: jnp.ndarray        # main's faceObj after optional smoothing
    smooth_y: jnp.ndarray
    smooth_w: jnp.ndarray
    smooth_h: jnp.ndarray
    head_valid: jnp.ndarray      # bool: headtrackingEvent fired
    head_x: jnp.ndarray
    head_y: jnp.ndarray
    head_z: jnp.ndarray
    status: jnp.ndarray          # i32 bitmask of STATUS_*
    event_face: jnp.ndarray      # bool: facetrackingEvent fired
    fov_deg: jnp.ndarray         # f32 current FOV estimate in degrees
    mode_after: jnp.ndarray      # i32 mode for the NEXT frame (scheduler use)
    # Serving telemetry (no reference counterpart): True when this stream's
    # band-local camshift tick was recomputed by the FULL-FRAME fallback —
    # band escape or sparse-model overflow (runtime/serving._escape_checked
    # fills it; always False outside the band-local serving paths).  Results
    # are exact either way; a high rate means the band/sparseHist capacity
    # knobs are undersized for the workload (docs/PERFORMANCE.md).
    escaped: jnp.ndarray = False


def init_state(whitebalancing=True, sparse_k=0, band_audit=False):
    """sparse_k: size of the sparse-model camshift descriptor carried in
    state — MUST equal the step's TrackerConfig.sparseHist (or 0 when unset)
    so handoff-produced and initial states have matching leaf shapes.
    band_audit: carry the bandHist handoff-audit flag (MUST match the step's
    audit_band presence — same schema rule as sparse_k)."""
    f32 = jnp.float32
    return TrackerState(
        mode=jnp.int32(MODE_WB if whitebalancing else MODE_VJ),
        wb_ring=jnp.zeros((PWB_LENGTH,), f32), wb_n=jnp.int32(0),
        cs=cs.init_state(sparse_k, band_audit),
        sm_sp=jnp.zeros((5,), f32), sm_init=jnp.bool_(False),
        face_found=jnp.bool_(False), first_run=jnp.bool_(True),
        diag_ring=jnp.zeros((DIAG_LENGTH,), f32), diag_n=jnp.int32(0),
        headpose_active=jnp.bool_(False),
        tan_fov=f32(0.0), fov_width=f32(0.0), head_diag_cam=f32(0.0),
        stopped=jnp.bool_(False), pend_age=jnp.int32(0),
    )


class _Result(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    angle: jnp.ndarray
    conf: jnp.ndarray
    wb: jnp.ndarray


def _empty_result():
    f32 = jnp.float32
    return _Result(f32(0), f32(0), f32(0), f32(0), f32(0), f32(-10000.0), f32(0))


def make_step(cascade, config: TrackerConfig, frame_shape, variant="full",
              with_pdf=False, band=None, audit_band=None):
    """Build the per-frame step fn for a static (cascade, config, H, W).

    step(state, frame_rgb_u8) -> (state', StepOutput).  jit/vmap-able.

    variant="full":  the complete WB/VJ/CS mode dispatch.
    variant="track": camshift-only fast path — valid ONLY when every stream in
        the batch is in CS mode (the serving runtime guarantees this; under
        vmap the full variant pays for the detector in every branch, so
        steady-state serving uses this one).
    variant="wbtrack": camshift for CS streams + whitebalance stabilization
        for WB streams; VJ streams freeze.  The cold-start fast path: a
        fresh batch spends ~15 ticks with EVERY stream in WB mode, where the
        full step would pay the (useless) detector for the whole batch —
        this variant costs a track tick (runtime/serving.py auto_step picks
        it whenever nothing pends in VJ mode).
    with_pdf=True: step also returns the camshift backprojection image
        ((H, W) f32; zeros on non-CS frames) as a third output — the debug
        surface (src/facetrackr.js:194-196).  Costs one extra (H, W) buffer;
        used by Tracker(debug=True), not by serving.
    band=(bh, bw): band-local camshift (models/camshift.track_band) — with
        variant="track" or "wbtrack", and with_pdf=False.  The step then returns
        (state', StepOutput, escaped) where escaped marks streams whose
        results are invalid (window left the band); the serving scheduler
        recomputes those with the full-frame track program.
    audit_band=(bh, bw): run the bandHist handoff audit at every VJ -> CS
        handoff (camshift.handoff_band_audit) and carry the per-stream
        band_dirty flag in state.  Set on the "full" variant whenever the
        serving band path has bandHist + bandHistAudit on; states produced
        with it require init_state(band_audit=True) (schema rule).
    """
    if band is not None and (variant not in ("track", "wbtrack") or with_pdf):
        raise ValueError("band requires variant='track'/'wbtrack' "
                         "without with_pdf")
    if config.bandHistAuditAction not in ("flag", "escape"):
        raise ValueError("bandHistAuditAction must be 'flag' or 'escape', "
                         f"got {config.bandHistAuditAction!r}")
    H, W = frame_shape
    f32 = jnp.float32

    def no_pdf():
        return jnp.zeros((H, W), f32)

    def wb_branch(state, frame):
        wb = whitebalance(frame).astype(f32)
        # 15-deep stability ring, switch when max - min < 2 (src/facetrackr.js:79-95)
        ring = jnp.roll(state.wb_ring, 1).at[0].set(wb)
        n = jnp.minimum(state.wb_n + 1, PWB_LENGTH)
        full = n == PWB_LENGTH
        stable = full & ((jnp.max(ring) - jnp.min(ring)) < 2.0)
        new_mode = jnp.where(stable, MODE_VJ, MODE_WB).astype(jnp.int32)
        res = _empty_result()._replace(wb=wb)
        return state._replace(mode=new_mode, wb_ring=ring, wb_n=n), res

    def vj_branch(state, frame):
        gray = grayscale(frame)
        found, x, y, w, h, conf = detect_best(
            gray, cascade, config.detectorInterval, config.minNeighbors,
            config.maxCandidates, config.survivorsStage2, config.survivorsDeep)
        conf = jnp.where(found, conf, f32(-10000.0))
        res = _Result(x=jnp.where(found, x, 0.0).astype(f32),
                      y=jnp.where(found, y, 0.0).astype(f32),
                      w=jnp.where(found, w, 0.0).astype(f32),
                      h=jnp.where(found, h, 0.0).astype(f32),
                      angle=f32(0.0), conf=conf.astype(f32), wb=f32(0))
        # VJ -> CS handoff (src/facetrackr.js:97-108)
        switch = conf > CONFIDENCE_THRESHOLD
        rect = jnp.floor(jnp.stack([res.x, res.y, res.w, res.h])).astype(jnp.int32)
        new_cs = cs.init_tracker(frame, rect, config.sparseHist or 0,
                                 audit_band)
        cs_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(switch, a, b), new_cs, state.cs)
        new_mode = jnp.where(switch, MODE_CS, MODE_VJ).astype(jnp.int32)
        return state._replace(mode=new_mode, cs=cs_state), res

    def cs_branch(state, frame):
        new_cs, pdf = cs.track(state.cs, frame, config.calcAngles,
                               config.exactCamshift, config.histBlock,
                               kernel=config.histKernel)
        res = _Result(x=new_cs.track_x.astype(f32), y=new_cs.track_y.astype(f32),
                      w=new_cs.track_w.astype(f32), h=new_cs.track_h.astype(f32),
                      angle=new_cs.track_angle.astype(f32), conf=f32(1.0),
                      wb=f32(0))
        return state._replace(cs=new_cs), res, pdf

    def cs_branch_nopdf(state, frame):
        st, res, _ = cs_branch(state, frame)
        return st, res

    def cs_branch_band(state, frame):
        new_cs, escaped = cs.track_band(
            state.cs, frame, config.calcAngles,
            config.exactCamshift, band, config.histBlock,
            kernel=config.histKernel, band_hist=config.bandHist,
            audit_escape=(config.bandHistAuditAction == "escape"))
        res = _Result(x=new_cs.track_x.astype(f32), y=new_cs.track_y.astype(f32),
                      w=new_cs.track_w.astype(f32), h=new_cs.track_h.astype(f32),
                      angle=new_cs.track_angle.astype(f32), conf=f32(1.0),
                      wb=f32(0))
        return state._replace(cs=new_cs), res, escaped

    def full_step(state, frame):
        entry_mode = state.mode
        pdf = None
        escaped = None
        if variant in ("track", "wbtrack"):
            # camshift for CS streams; freeze (no-op) for WB/VJ streams so the
            # serving scheduler may dispatch this with a one-tick-stale mode
            # vector (a non-CS stream just stalls until the full step runs).
            # wbtrack additionally runs the whitebalance branch for WB
            # streams (cold-start fast path; only VJ streams freeze).
            is_cs = entry_mode == MODE_CS
            if band is not None:
                new_state, res, escaped = cs_branch_band(state, frame)
                escaped = escaped & is_cs  # frozen streams can't escape
            else:
                new_state, res, pdf = cs_branch(state, frame)
            if variant == "wbtrack":
                is_wb = entry_mode == MODE_WB
                wb_state, wb_res = wb_branch(state, frame)
                new_state = jax.tree_util.tree_map(
                    lambda c, w: jnp.where(is_cs, c, w), new_state, wb_state)
                res = jax.tree_util.tree_map(
                    lambda c, w: jnp.where(is_cs, c, w), res, wb_res)
                active = is_cs | is_wb
            else:
                active = is_cs
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active, new, old), new_state, state)
            # frozen streams report conf 0; active WB streams keep the WB
            # branch's conf so wbtrack outputs equal the full step's
            res = res._replace(conf=jnp.where(active, res.conf, f32(0.0)))
            if with_pdf:
                pdf = jnp.where(is_cs, pdf, 0.0)
        elif with_pdf:
            state, res, pdf = jax.lax.switch(
                entry_mode,
                [lambda s, f: wb_branch(s, f) + (no_pdf(),),
                 lambda s, f: vj_branch(s, f) + (no_pdf(),),
                 cs_branch],
                state, frame)
        else:
            state, res = jax.lax.switch(
                entry_mode, [wb_branch, vj_branch, cs_branch_nopdf],
                state, frame)
        detection = entry_mode  # the result's detection type

        status = jnp.int32(0)
        status = status | jnp.where(detection == MODE_WB, STATUS_WHITEBALANCE, 0)
        status = status | jnp.where(
            state.first_run & (detection == MODE_VJ), STATUS_DETECTING, 0)
        if variant == "track":  # stalled non-CS streams emit nothing
            status = jnp.where(entry_mode == MODE_CS, status, 0)
        elif variant == "wbtrack":  # only frozen VJ streams emit nothing
            status = jnp.where(entry_mode != MODE_VJ, status, 0)

        is_cs = detection == MODE_CS
        conf_gate = res.conf != 0  # src/main.js:186
        lost = is_cs & conf_gate & ((res.w == 0) | (res.h == 0))
        tracking = is_cs & conf_gate & ~lost

        # --- loss / retry (src/main.js:230-248)
        if config.retryDetection:
            status = status | jnp.where(lost, STATUS_REDETECTING, 0)
            mode_after = jnp.where(lost, MODE_VJ, state.mode).astype(jnp.int32)
            stopped = state.stopped
        else:
            status = status | jnp.where(lost, STATUS_LOST, 0)
            mode_after = state.mode
            stopped = state.stopped | lost
        face_found = jnp.where(lost, False, state.face_found)
        headpose_active = jnp.where(lost, False, state.headpose_active)

        # --- found + smoothing (src/main.js:250-261)
        status = status | jnp.where(tracking & ~state.face_found, STATUS_FOUND, 0)
        face_found = jnp.where(tracking, True, face_found)

        cur = jnp.stack([res.x, res.y, f32(0.0), res.w, res.h])
        if config.smoothing:
            sp0 = jnp.where(state.sm_init, state.sm_sp, cur)
            a = f32(config.smoothingAlpha)
            sp1 = a * cur + (1 - a) * sp0
            sm_sp = jnp.where(tracking, sp1, state.sm_sp)
            sm_init = state.sm_init | tracking
            smoothed = jnp.where(tracking, sp1, cur)
        else:
            sm_sp = state.sm_sp
            sm_init = state.sm_init
            smoothed = cur
        sx, sy, sw, sh = smoothed[0], smoothed[1], smoothed[3], smoothed[4]

        # --- head-diagonal stability gate + FOV (src/main.js:263-297)
        diag = jnp.sqrt(sw * sw + sh * sh)
        gate = tracking & ~headpose_active & config.headPosition
        ring_full = state.diag_n >= DIAG_LENGTH
        pushed = jnp.where(
            ring_full,
            jnp.roll(state.diag_ring, -1).at[DIAG_LENGTH - 1].set(diag),
            state.diag_ring.at[jnp.minimum(state.diag_n, DIAG_LENGTH - 1)].set(diag))
        diag_ring = jnp.where(gate, pushed, state.diag_ring)
        diag_n = jnp.where(gate, jnp.minimum(state.diag_n + 1, DIAG_LENGTH),
                           state.diag_n)
        stable = gate & ring_full & (
            (jnp.max(pushed) - jnp.min(pushed)) < 5.0)

        if config.fov is not None:
            fov_est = f32(config.fov * jnp.pi / 180.0)
        else:
            fov_est = hp.estimate_fov_width(sw, sh, f32(W),
                                            config.distance_to_screen)
        activate = stable
        fov_width = jnp.where(activate & state.first_run, fov_est,
                              state.fov_width)
        tan_fov = jnp.where(activate & state.first_run,
                            2 * jnp.tan(fov_est / 2), state.tan_fov)
        first_run = state.first_run & ~activate
        # constructor resets head_diag_cam from the activation faceObj
        # (src/headposition.js:66-68)
        head_diag_cam = jnp.where(
            activate, jnp.sqrt(sw * sw + sh * sh), state.head_diag_cam)
        headpose_active = headpose_active | activate

        run_head = (activate | (tracking & headpose_active & config.headPosition))
        hx, hy, hz, new_diag_cam = hp.track_head(
            sx, sy, sw, sh, head_diag_cam,
            jnp.where(tan_fov > 0, tan_fov, 1.0),  # guard; masked by run_head
            f32(W), f32(H), config.cameraOffset, config.edgecorrection)
        head_diag_cam = jnp.where(run_head, new_diag_cam, head_diag_cam)

        out = StepOutput(
            detection=detection, wb=res.wb,
            face_x=res.x, face_y=res.y, face_w=res.w, face_h=res.h,
            face_angle=res.angle, face_conf=res.conf,
            smooth_x=sx, smooth_y=sy, smooth_w=sw, smooth_h=sh,
            head_valid=run_head,
            head_x=jnp.where(run_head, hx, 0.0).astype(f32),
            head_y=jnp.where(run_head, hy, 0.0).astype(f32),
            head_z=jnp.where(run_head, hz, 0.0).astype(f32),
            status=status,
            event_face=is_cs & config.sendEvents,
            fov_deg=fov_width * f32(180.0 / jnp.pi),
            mode_after=mode_after,
            escaped=jnp.bool_(False),
        )
        new_state = state._replace(
            mode=mode_after, sm_sp=sm_sp, sm_init=sm_init,
            face_found=face_found, first_run=first_run,
            diag_ring=diag_ring, diag_n=diag_n,
            headpose_active=headpose_active, tan_fov=tan_fov,
            fov_width=fov_width, head_diag_cam=head_diag_cam, stopped=stopped)
        if with_pdf:
            return new_state, out, pdf
        if band is not None:
            return new_state, out, escaped
        return new_state, out

    return full_step
