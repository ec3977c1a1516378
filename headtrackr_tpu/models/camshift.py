"""TPU-native camshift tracker: histogram / backprojection / masked-moment kernels.

Behavior spec: src/camshift.js (see oracle/camshift.py).  Design notes:

* All state is an explicit pytree (CamshiftState) so N streams batch with vmap.
* The <=10 mean-shift iterations with early fixed-point stop become a fixed-trip
  fori_loop with a ``done`` freeze mask — identical results, static control flow.
* First moments over the (dynamic) search window come from 1-D marginal
  prefix sums (window-relative — error scales with the window's own mass, see
  docs/PARITY.md); second moments are one masked full-frame reduction.
  Rectangular masks instead of dynamic slicing, so shapes stay static.
* The JS NaN-mediated loss semantics (zero backprojection mass => 0-size box,
  src/camshift.js:109,240-241) are reproduced as explicit zero-mass logic.
* JS ``(v) >> 0`` int coercion (truncate toward zero, NaN -> 0) is _js_shift.
"""

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.histogram import (backprojection_weights, histogram_and_pdf,
                             histogram_rect, histogram_scan, pdf_scan,
                             rgb_bins, sparse_hist_counts, sparse_model_topk,
                             sparse_pdf_scan)

__all__ = ["CamshiftState", "init_state", "init_tracker", "track",
           "track_band", "mean_shift", "camshift_step", "DEFAULT_BAND",
           "BAND_SLACK", "band_for", "parse_band", "band_rect",
           "handoff_band_audit"]

MEANSHIFT_ITERS = 10  # src/camshift.js:277
# Trace-time knob: fully unroll the 10-trip mean-shift loop (the body is a
# serial chain of tiny dots/reductions — unrolling removes per-iteration
# loop overhead and lets XLA fuse across iterations).  A/B on the chip with
# tools/exp_unroll_ab.py; identical numerics either way.
MEANSHIFT_UNROLL = False
# Trace-time A/B knob (tools/exp_step_split.py --bins-arm): with bandHist
# nothing reads full-frame bins, so slicing the FRAME before binning looked
# like the obvious 640x480 lever (VERDICT r4 item 3).  MEASURED THE OTHER
# WAY on chip (r5): slice-first is 31.4 ms/tick vs bin-first 2.9 ms/tick at
# 256 streams / 320x240 — the vmapped dynamic_slice of the (bh, bw, 3) u8
# frame hits the trailing-3 lane-padding + gather trap, while in the
# bin-first form XLA fuses the (bh, bw) i32 slice into the elementwise
# producer and only ever computes the band's bins (verified by the 640x480
# scaling run).  Identical results bit-for-bit either way (rgb_bins is
# elementwise); keep False.
BANDHIST_SLICE_FIRST = False


class CamshiftState(NamedTuple):
    model_hist: jnp.ndarray     # (4096,) f32
    window: jnp.ndarray         # (4,) i32: x, y, width, height (JS ints)
    track_x: jnp.ndarray        # i32 center x (JS Math.floor result)
    track_y: jnp.ndarray        # i32
    track_w: jnp.ndarray        # i32 (JS << 2 result)
    track_h: jnp.ndarray        # i32
    track_angle: jnp.ndarray    # f32 radians
    # sparse-model descriptor (TrackerConfig.sparseHist): the model's top-K
    # bin ids + counts and whether any nonzero bin overflowed K (such
    # streams must be served by the full-frame path).  All three are None
    # when the sparse path is off — None is an EMPTY pytree node, so the
    # state is then leaf-identical to the pre-sparse schema (same
    # checkpoints, same shardings; a (0,)-shaped leaf instead would
    # canonicalize to a replicated sharding and break mesh serving).
    model_bins: object          # (K,) i32 | None
    model_counts: object        # (K,) f32 | None
    model_overflow: object      # bool | None
    # bandHist handoff audit (TrackerConfig.bandHistAudit; deviation 13's
    # safety net): True when, AT HANDOFF, some pixel outside the serving
    # band carried a model-colored bin — the content condition under which
    # band-local current histograms become approximate.  Dirty streams are
    # reported escaped every band tick, so the serving fallback keeps them
    # reference-exact (full-frame) until a clean relock.  None when the
    # audit is off (empty pytree node — same schema-compat trick as the
    # sparse trio above).
    band_dirty: object = None   # bool | None


def init_state(sparse_k=0, band_audit=False):
    return CamshiftState(
        model_hist=jnp.zeros((4096,), jnp.float32),
        window=jnp.zeros((4,), jnp.int32),
        track_x=jnp.int32(0), track_y=jnp.int32(0),
        track_w=jnp.int32(0), track_h=jnp.int32(0),
        track_angle=jnp.float32(0.0),
        model_bins=jnp.zeros((sparse_k,), jnp.int32) if sparse_k else None,
        model_counts=(jnp.zeros((sparse_k,), jnp.float32)
                      if sparse_k else None),
        model_overflow=jnp.bool_(False) if sparse_k else None,
        # False pre-handoff: the flag is only read on CS ticks, and the
        # handoff always overwrites it
        band_dirty=jnp.bool_(False) if band_audit else None,
    )


def band_rect(window, band, frame_shape):
    """The serving band's frame rect (ry, rx, bh, bw) for a search window —
    the ONE band-placement rule (8-aligned starts, centered on the clamped
    window, clipped to the frame) shared by track_band, the handoff audit,
    and the periodic divergence cross-check."""
    H, W = frame_shape
    bh = min(band[0], H)
    bw = min(band[1], W)
    cx = jnp.clip(window[0], 0, W) + window[2] // 2
    cy = jnp.clip(window[1], 0, H) + window[3] // 2
    rx = jnp.clip((cx - bw // 2) & ~7, 0, W - bw)
    ry = jnp.clip((cy - bh // 2) & ~7, 0, H - bh)
    return ry, rx, bh, bw


def handoff_band_audit(bins, model_hist, rect, band):
    """True iff some pixel OUTSIDE the band (placed for the handoff window
    ``rect``) carries a bin with nonzero model count — the content condition
    under which bandHist stops being exact (docs/PARITY.md deviation 13:
    band cur counts then undercount, inflating ratio weights toward 1).

    One full-frame 0/1-weight lookup (pdf_scan of the model-bin indicator —
    0/1 weights are bf16-exact, so DEFAULT precision is bit-safe) masked to
    the band's complement.  Runs on the handoff tick only, which already
    pays the detector."""
    H, W = bins.shape
    ry, rx, bh, bw = band_rect(rect, band, (H, W))
    is_model = pdf_scan(bins, (model_hist > 0).astype(jnp.float32))
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    outside = ((rows < ry) | (rows >= ry + bh) |
               (cols < rx) | (cols >= rx + bw))
    return jnp.any((is_model > 0.5) & outside)


def init_tracker(frame_rgb, rect, sparse_k=0, audit_band=None):
    """VJ -> CS handoff (src/camshift.js:198-211): model histogram of the crop.

    rect: (4,) i32 [x, y, w, h] (already floored by the caller,
    src/facetrackr.js:101-106).  sparse_k > 0 additionally derives the
    sparse-model descriptor (top-K bins + overflow flag) consumed by the
    band path when TrackerConfig.sparseHist is set.  audit_band=(bh, bw)
    additionally runs the bandHist handoff audit (see handoff_band_audit)
    and stores the per-stream band_dirty flag."""
    bins = rgb_bins(frame_rgb)
    hist = histogram_rect(bins, rect[0], rect[1], rect[2], rect[3])
    if sparse_k:
        sbins, scounts, overflow = sparse_model_topk(hist, sparse_k)
    else:
        sbins = scounts = overflow = None
    if audit_band is not None:
        dirty = handoff_band_audit(bins, hist, rect.astype(jnp.int32),
                                   audit_band)
    else:
        dirty = None
    return CamshiftState(
        model_hist=hist, window=rect.astype(jnp.int32),
        track_x=jnp.int32(0), track_y=jnp.int32(0),
        track_w=jnp.int32(0), track_h=jnp.int32(0),
        track_angle=jnp.float32(0.0),
        model_bins=sbins, model_counts=scounts, model_overflow=overflow,
        band_dirty=dirty,
    )


def _js_shift(v):
    """JS ``v >> 0``: truncate toward zero; NaN/Inf -> 0."""
    return jnp.where(jnp.isfinite(v), jnp.trunc(v), 0.0).astype(jnp.int32)


def _marginal_planes(pdf, exact=False):
    """1-D prefix sums feeding the per-iteration window marginals:

      col_cum (H+1, W): col_cum[y, x] = sum_{y' < y} pdf[y', x]
      row_cum (H, W+1): row_cum[y, x] = sum_{x' < x} pdf[y, x']

    Precision rationale (docs/PARITY.md): the previous design kept full 2-D
    integrals of x*pdf / y*pdf in ABSOLUTE coordinates, whose corner values
    reach ~1e7 f32 at 320x240 (~2e8 at 640x480), so corner differencing lost
    units of m10/m01 regardless of the window's own mass.  Marginal prefix
    sums are bounded by a single column/row mass (<= H or W), and the moment
    reductions below are window-relative, so the error scales with the
    window's own sums like the f64 oracle's.  Also 3x fewer matmul FLOPs
    than three 2-D integrals."""
    H, W = pdf.shape
    tri_r = jnp.asarray(np.tril(np.ones((H, H), np.float32)))
    tri_c = jnp.asarray(np.triu(np.ones((W, W), np.float32)))
    # TPU numerics: a DEFAULT-precision dot rounds the pdf operand to bf16
    # inside the matmul (~0.4% moment error — enough to flip the JS
    # truncations occasionally).  exact=True (TrackerConfig.exactCamshift)
    # raises these prefix sums to Precision.HIGHEST (bf16x6: f32-faithful
    # for the 0/1 triangular lhs) — measured +1.7 ms/tick at 256 streams.
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    col_cum = jnp.pad(jnp.dot(tri_r, pdf, precision=prec,
                              preferred_element_type=jnp.float32),
                      ((1, 0), (0, 0)))
    row_cum = jnp.pad(jnp.dot(pdf, tri_c, precision=prec,
                              preferred_element_type=jnp.float32),
                      ((0, 0), (1, 0)))
    return col_cum, row_cum


def _select_lines(plane, i0, i1, axis, exact=False):
    """Rows (axis=0) or columns (axis=1) i0/i1 of ``plane`` via a one-hot
    matmul (one nonzero per row) — no gather, vmap-friendly.

    exact: Precision.HIGHEST makes the selection return the full-f32 plane
    value on TPU (bf16x6 keeps the a1*b3 term; DEFAULT bf16-rounds it).
    Costs +1.7 ms/tick at 256 streams — these 40 tiny dots sit inside the
    sequential mean-shift loop, so extra passes serialize (measured)."""
    n = plane.shape[axis]
    iota = jax.lax.broadcasted_iota(jnp.int32, (2, n), 1)
    sel = (iota == jnp.stack([i0, i1])[:, None]).astype(jnp.float32)
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    if axis == 0:
        two = jnp.dot(sel, plane, precision=prec,
                      preferred_element_type=jnp.float32)
        return two[0], two[1]
    two = jnp.dot(plane, sel.T, precision=prec,
                  preferred_element_type=jnp.float32)
    return two[:, 0], two[:, 1]


def _first_moments_marginal(planes, wadx, wady, wadw, wadh, exact=False):
    """m00/m10/m01 with vx/vy relative to the window origin
    (src/camshift.js:79-107: w/h args are exclusive upper bounds)."""
    col_cum, row_cum = planes
    H = row_cum.shape[0]
    W = col_cum.shape[1]
    empty = (wadw <= wadx) | (wadh <= wady)
    top, bot = _select_lines(col_cum, jnp.clip(wady, 0, H),
                             jnp.clip(wadh, 0, H), axis=0, exact=exact)
    lef, rig = _select_lines(row_cum, jnp.clip(wadx, 0, W),
                             jnp.clip(wadw, 0, W), axis=1, exact=exact)
    colmass = bot - top                     # (W,) mass of rows [wady, wadh)
    rowmass = rig - lef                     # (H,)
    xs = jax.lax.iota(jnp.int32, W)
    ys = jax.lax.iota(jnp.int32, H)
    in_x = ((xs >= wadx) & (xs < wadw)).astype(jnp.float32)
    in_y = ((ys >= wady) & (ys < wadh)).astype(jnp.float32)
    m00 = jnp.sum(colmass * in_x)
    m10 = jnp.sum((xs - wadx).astype(jnp.float32) * colmass * in_x)
    m01 = jnp.sum((ys - wady).astype(jnp.float32) * rowmass * in_y)
    z = jnp.float32(0.0)
    return (jnp.where(empty, z, m00), jnp.where(empty, z, m10),
            jnp.where(empty, z, m01))


def _second_moments(pdf, wadx, wady, wadw, wadh):
    """One masked full-frame pass for m11/m20/m02 of the final window (the JS
    computes second moments only at the stopping iteration,
    src/camshift.js:291,300)."""
    H, W = pdf.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((rows >= wady) & (rows < wadh) & (cols >= wadx) & (cols < wadw))
    w = jnp.where(inside, pdf, 0.0)
    vx = (cols - wadx).astype(jnp.float32)
    vy = (rows - wady).astype(jnp.float32)
    m11 = (vx * vy * w).sum()
    m20 = (vx * vx * w).sum()
    m02 = (vy * vy * w).sum()
    return m11, m20, m02


def _mean_shift_core(pdf, window, exact, ry, rx, H, W):
    """<=10 mean-shift iterations (src/camshift.js:261-312) over a pdf that
    covers frame rows [ry, ry+bh) x cols [rx, rx+bw) (full frame when
    ry = rx = 0 and pdf.shape == (H, W)).

    All window arithmetic stays in FRAME coordinates (identical truncation
    semantics); only the moment reductions translate into band coordinates.
    Returns (window', moments, zero_mass, escaped) where escaped means some
    iteration's clamped window left the band (band results invalid — the
    caller must recompute full-frame; never True for a full-frame pdf)."""
    bh, bw = pdf.shape
    planes = _marginal_planes(pdf, exact)

    def body(i, carry):
        win, prevx, prevy, done, esc, m, wad = carry
        wadx = jnp.maximum(win[0], 0)
        wady = jnp.maximum(win[1], 0)
        wadw = jnp.minimum(wadx + win[2], W)
        wadh = jnp.minimum(wady + win[3], H)
        # band containment (trivially true for the full-frame pdf)
        esc_now = ((wadx < rx) | (wady < ry) |
                   (wadw > rx + bw) | (wadh > ry + bh))
        # band-coordinate bounds; (xs - bx0) == (xs_frame - wadx), so the
        # moment values are the window-relative ones of the frame formulation
        bx0 = jnp.clip(wadx - rx, 0, bw)
        by0 = jnp.clip(wady - ry, 0, bh)
        bx1 = jnp.clip(wadw - rx, 0, bw)
        by1 = jnp.clip(wadh - ry, 0, bh)
        m00, m10, m01 = _first_moments_marginal(planes, bx0, by0, bx1, by1,
                                                exact)
        nonzero = m00 > 0
        xc = jnp.where(nonzero, m10 / jnp.maximum(m00, 1e-30), jnp.nan)
        yc = jnp.where(nonzero, m01 / jnp.maximum(m00, 1e-30), jnp.nan)
        dx = _js_shift(xc - win[2].astype(jnp.float32) / 2)
        dy = _js_shift(yc - win[3].astype(jnp.float32) / 2)
        newx = win[0] + dx
        newy = win[1] + dy
        fixed = (newx == prevx) & (newy == prevy)
        new_m = (m00, m10, m01)
        new_wad = (bx0, by0, bx1, by1)
        # Freeze after done: keep previous window, moments and bounds.
        m_out = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), m, new_m)
        wad_out = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), wad, new_wad)
        win_out = jnp.where(done, win, win.at[0].set(newx).at[1].set(newy))
        prevx_out = jnp.where(done, prevx, newx)
        prevy_out = jnp.where(done, prevy, newy)
        return (win_out, prevx_out, prevy_out, done | fixed,
                esc | (esc_now & ~done), m_out, wad_out)

    # Static 10-trip fori_loop with a ``done`` freeze mask, NOT a dynamic
    # while_loop early exit: identical results (frozen iterations are
    # no-ops, src/camshift.js:298-305 stops at the same point), but the
    # dynamic trip count costs more than it saves — an early-exit
    # while_loop measured ~10% SLOWER end-to-end (bench r3: 5.81 -> 6.44
    # ms/tick regression; forced unroll=True did not recover it).
    zeros3 = tuple(jnp.float32(0.0) for _ in range(3))
    zi = jnp.int32(0)
    init = (window, window[0], window[1], jnp.bool_(False),
            jnp.bool_(False), zeros3, (zi, zi, zi, zi))
    win, _, _, _, esc, m, wad = jax.lax.fori_loop(
        0, MEANSHIFT_ITERS, body, init,
        unroll=MEANSHIFT_ITERS if MEANSHIFT_UNROLL else 1)

    win = win.at[0].set(jnp.clip(win[0], 0, W)).at[1].set(jnp.clip(win[1], 0, H))
    m00, m10, m01 = m
    # Second moments: one masked pass over the stopping iteration's bounds
    # (the JS computes them only there, src/camshift.js:291,300).
    m11, m20, m02 = _second_moments(pdf, *wad)
    nonzero = m00 > 0
    inv = jnp.where(nonzero, 1.0 / jnp.maximum(m00, 1e-30), jnp.inf)
    xc = m10 * inv
    yc = m01 * inv
    mom = dict(m00=m00, m10=m10, m01=m01, m11=m11, m20=m20, m02=m02,
               invM00=inv, xc=xc, yc=yc,
               mu20=m20 - m10 * xc, mu02=m02 - m01 * yc,
               mu11=m11 - m01 * xc)  # JS quirk: m01 * xc (src/camshift.js:118)
    return win, mom, ~nonzero, esc


def mean_shift(pdf, window, exact=False):
    """Full-frame mean-shift (src/camshift.js:261-312).

    Returns (window', moments dict at the stopping iteration, zero_mass flag).
    exact: full-f32 moment prefix sums on TPU (TrackerConfig.exactCamshift)."""
    H, W = pdf.shape
    zi = jnp.int32(0)
    win, mom, zero_mass, _ = _mean_shift_core(pdf, window, exact, zi, zi, H, W)
    return win, mom, zero_mass


def _sqrt_shl2(v, bad):
    """JS ``Math.sqrt(v) << 2``: trunc(sqrt(v)) * 4; NaN (v<0 or zero-mass) -> 0."""
    ok = (~bad) & (v >= 0) & jnp.isfinite(v)
    r = jnp.sqrt(jnp.maximum(v, 0.0))
    return jnp.where(ok, jnp.trunc(r) * 4, 0.0).astype(jnp.int32)


def _finish(state, win, m, zero_mass, calc_angles, H, W):
    """Size/orientation from central moments + output box + 1.1x window
    growth (src/camshift.js:230-258) — shared by the full-frame and
    band-local track paths."""
    a = m["mu20"] * m["invM00"]
    c = m["mu02"] * m["invM00"]
    if calc_angles:
        b = m["mu11"] * m["invM00"]
        d = a + c
        e = jnp.sqrt((4 * b * b) + ((a - c) * (a - c)))
        tw = _sqrt_shl2((d - e) * 0.5, zero_mass)
        th = _sqrt_shl2((d + e) * 0.5, zero_mass)
        ang = jnp.arctan2(2 * b, a - c + e)
        ang = jnp.where(ang < 0, ang + jnp.pi, ang)
        ang = jnp.where(zero_mass, jnp.nan, ang)
    else:
        tw = _sqrt_shl2(a, zero_mass)
        th = _sqrt_shl2(c, zero_mass)
        ang = jnp.float32(jnp.pi / 2)

    fw = win[2].astype(jnp.float32)
    fh = win[3].astype(jnp.float32)
    tx = jnp.floor(jnp.clip(win[0].astype(jnp.float32) + fw / 2, 0, W)).astype(jnp.int32)
    ty = jnp.floor(jnp.clip(win[1].astype(jnp.float32) + fh / 2, 0, H)).astype(jnp.int32)

    new_w = jnp.floor(1.1 * tw.astype(jnp.float32)).astype(jnp.int32)
    new_h = jnp.floor(1.1 * th.astype(jnp.float32)).astype(jnp.int32)
    win = win.at[2].set(new_w).at[3].set(new_h)

    return state._replace(window=win, track_x=tx, track_y=ty,
                          track_w=tw, track_h=th,
                          track_angle=ang.astype(jnp.float32))


def _kernel_blocks(n_px):
    """Pallas scan block for ``n_px`` pixels: largest exact-divisor
    128-multiple within the kernels' VMEM budget (kernels/histpdf
    DEFAULT_BLOCK sizing) — padding-free for every frame/band size whose
    pixel count divides by 128 (all 8-aligned bands and standard frames)."""
    from ..ops.histogram import _pick_block
    from ..kernels.histpdf import DEFAULT_BLOCK
    return _pick_block(n_px, cap=DEFAULT_BLOCK)


def track(state, frame_rgb, calc_angles=True, exact=False, block=None,
          kernel=None):
    """One camshift frame step (src/camshift.js:213-259).

    Returns (new state, full-frame pdf — the debug/backprojection surface).
    exact: bit-faithful f32 camshift math on TPU (conformance mode; on CPU
    both modes are identical) — see TrackerConfig.exactCamshift.
    kernel="pallas": the hist/pdf pixel scans run as the Mosaic kernels
    (TrackerConfig.histKernel) — the kernel pdf is ALWAYS the exact-f32
    lookup, so it equals the exact mode bit-for-bit and can only differ
    from fast mode by the documented bf16-rounding deviation."""
    H, W = frame_rgb.shape[0], frame_rgb.shape[1]
    bins = rgb_bins(frame_rgb)
    if kernel == "pallas":
        from ..kernels.histpdf import hist_pallas, pdf_pallas
        kblk = _kernel_blocks(H * W)
        cur = hist_pallas(bins, block=kblk)
        weights = backprojection_weights(state.model_hist, cur)
        pdf = pdf_pallas(bins, weights, block=kblk)
    else:
        _, pdf = histogram_and_pdf(bins, state.model_hist, exact=exact,
                                   block=block)
    win, m, zero_mass = mean_shift(pdf, state.window, exact)
    return _finish(state, win, m, zero_mass, calc_angles, H, W), pdf


# Default band (rows, cols) for the band-local serving path at 240x320+:
# covers search windows up to ~(112, 176) px with drift margin; bigger
# windows (or trajectories reaching the band edge) raise ``escaped`` and the
# serving scheduler recomputes those ticks full-frame (runtime/serving.py).
DEFAULT_BAND = (128, 192)

# Empirical escape-free slack per band dimension (tools/exp_band_rule.py):
# up to 8 px of 8-aligned band re-centering + the per-tick mean-shift
# trajectory + the 1.1x window growth (src/camshift.js:257-258).
BAND_SLACK = 24


def band_for(max_window, frame_shape=(240, 320)):
    """Smallest escape-free band (rows, cols) for search windows up to
    ``max_window`` = (h, w) px — the sizing rule behind
    ``BatchedTracker(band=...)``.

    Each band dimension is the window dimension plus BAND_SLACK, rounded up
    to the 8-px dynamic_slice alignment and clipped to the frame.  Search
    windows run ~1.3x the tracked face size (the camshift window is the
    1.1x-grown moment box, src/camshift.js:257-258), so size from the
    largest face you expect, not the VJ handoff rect.  Undersized bands are
    safe — escapes recompute full-frame (slower, never wrong).

    TPU note: the band's minor (cols) axis is lane-tiled in multiples of
    128, so widths in (0, 128] cost the same vector work — the on-chip
    sweep arms in tools/exp_streams_ab.py measure the real cost steps.
    """
    wh, ww = int(max_window[0]), int(max_window[1])
    H, W = int(frame_shape[0]), int(frame_shape[1])
    bh = min(-(-(wh + BAND_SLACK) // 8) * 8, H)
    bw = min(-(-(ww + BAND_SLACK) // 8) * 8, W)
    return (bh, bw)


def parse_band(tok):
    """CLI band token -> serving band value (the one parser shared by
    bench.py / tools/verify_chip.py / tools/exp_streams_ab.py):
    "auto" -> "auto" (DEFAULT_BAND upstream), "none" -> None (full-frame),
    "HxW" -> (H, W)."""
    if tok == "auto":
        return "auto"
    if tok == "none":
        return None
    try:
        h, w = tok.split("x")
        return (int(h), int(w))
    except ValueError:
        raise ValueError(
            f"band must be 'auto', 'none', or HxW (e.g. 96x128); got "
            f"{tok!r}") from None


def track_band(state, frame_rgb, calc_angles=True, exact=False,
               band=DEFAULT_BAND, block=None, kernel=None, band_hist=False,
               audit_escape=True):
    """Band-local camshift step: same math as ``track`` with the pdf lookup
    and moment reductions restricted to an 8-aligned band around the search
    window (the big steady-state cost cut — the full-frame pdf pass is most
    of a serving tick, yet the moments only ever read the window).

    Parity: the HISTOGRAM stays full-frame (the ratio weights depend on it,
    src/camshift.js:268); the pdf is a pure per-pixel lookup, so band values
    equal the full-frame values exactly.  Moment sums reduce over the same
    pixels in a different f32 association — same accuracy class as the
    full-frame marginals (docs/PARITY.md "first-moment accuracy").

    Returns (new_state, escaped).  When ``escaped`` is True the window's
    mean-shift trajectory left the band and new_state is INVALID — the
    caller must rerun the full-frame ``track`` on the old state.

    block applies to the FULL-FRAME histogram scan only
    (TrackerConfig.histBlock); the band pdf auto-sizes its scan block to
    the band's own pixel count (a full-frame block would not divide it).

    Sparse-model path (state carries a (K,) descriptor — see
    TrackerConfig.sparseHist): the full-frame scan counts only the model's
    K bins and the band pdf looks up a (K,) weight table; identical values
    (absent bins have zero weight).  A stream whose model overflowed K is
    reported escaped every tick, so the caller's full-frame fallback keeps
    it exact.

    band_hist=True (TrackerConfig.bandHist): the CURRENT histogram is also
    counted over the band instead of the full frame — ~6x less scan work at
    the default band, but APPROXIMATE when model-colored pixels exist
    outside the band (band cur counts <= full-frame counts, so ratio
    weights can only inflate toward 1; bins absent from the band are never
    read by the band pdf, and a zero-mass loss stays zero-mass).  Exact
    whenever the band contains every model-colored pixel — docs/PARITY.md
    deviation 13.

    audit_escape (static; TrackerConfig.bandHistAuditAction == "escape"):
    when the state carries a handoff-audit band_dirty flag AND
    band_hist=True, OR the flag into ``escaped`` so the caller's
    full-frame fallback serves dirty streams reference-exact.  False (the
    "flag" action) leaves the flag as telemetry only.
    """
    H, W = frame_rgb.shape[0], frame_rgb.shape[1]
    # band placement: 8-aligned starts centered on the clamped search
    # window, clipped to the frame (the shared band_rect rule)
    ry, rx, bh, bw = band_rect(state.window, band, (H, W))
    if band_hist and BANDHIST_SLICE_FIRST:
        # With band-local current histograms NOTHING reads full-frame bins,
        # so slice the FRAME first and bin only the band: at 640x480 the
        # full-frame rgb_bins pass was ~25x the band's pixel work.
        # rgb_bins is elementwise, so slice-then-bin == bin-then-slice
        # bit-for-bit.
        band_rgb = jax.lax.dynamic_slice(
            frame_rgb, (ry, rx, jnp.int32(0)), (bh, bw, 3))
        bins = None
        band_bins = rgb_bins(band_rgb)
    elif band_hist:
        # r4 formulation (the A/B baseline): bin the full frame, slice the
        # result — correctness-identical; exists to measure whether XLA
        # dead-codes the unused full-frame pass
        bins = None
        band_bins = jax.lax.dynamic_slice(rgb_bins(frame_rgb), (ry, rx),
                                          (bh, bw))
    else:
        bins = rgb_bins(frame_rgb)
        band_bins = jax.lax.dynamic_slice(bins, (ry, rx), (bh, bw))

    # current-histogram source: full frame (reference semantics) or the band
    # (bandHist approximation).  A full-frame ``block`` cannot divide the
    # band's pixel count, so the band scans auto-size their block.
    hist_bins = band_bins if band_hist else bins
    hist_block = None if band_hist else block
    sparse = state.model_bins is not None  # static (TrackerConfig.sparseHist)
    if sparse:
        # K-lane current counts of the model's bins only: weights are zero
        # wherever the model count is zero (src/camshift.js:314-330), so the
        # full 4096-bin scan is unnecessary for a <= K-bin model.  Streams
        # whose model overflowed K are flagged escaped below — the serving
        # fallback recomputes them full-frame (exact, slower).
        cur_k = sparse_hist_counts(hist_bins, state.model_bins,
                                   block=hist_block)
        weights_k = backprojection_weights(state.model_counts, cur_k)
    elif kernel == "pallas":  # dense Mosaic scans (TrackerConfig.histKernel)
        from ..kernels.histpdf import hist_pallas
        cur = hist_pallas(hist_bins, block=_kernel_blocks(hist_bins.size))
        weights = backprojection_weights(state.model_hist, cur)
    else:
        cur = histogram_scan(hist_bins, block=hist_block)
        weights = backprojection_weights(state.model_hist, cur)
    if sparse:
        pdf_band = sparse_pdf_scan(band_bins, state.model_bins, weights_k,
                                   exact=exact)
    elif kernel == "pallas":
        from ..kernels.histpdf import pdf_pallas
        pdf_band = pdf_pallas(band_bins, weights,
                              block=_kernel_blocks(bh * bw))
    else:
        pdf_band = pdf_scan(band_bins, weights, exact=exact)
    win2, m, zero_mass, escaped = _mean_shift_core(
        pdf_band, state.window, exact, ry, rx, H, W)
    if sparse:
        escaped = escaped | state.model_overflow
    if band_hist and audit_escape and state.band_dirty is not None:
        # bandHist handoff audit, "escape" action (deviation 13 safety
        # net, TrackerConfig.bandHistAuditAction): a stream whose handoff
        # found model-colored pixels outside the band is served by the
        # full-frame fallback every tick — reference-exact results at the
        # escape path's bounded cost — until a clean relock clears it.
        # Under the default "flag" action the band_dirty flag is telemetry
        # only (the audit condition is conservative; see config.py).
        escaped = escaped | state.band_dirty
    new_state = _finish(state, win2, m, zero_mass, calc_angles, H, W)
    return new_state, escaped


def camshift_step(state, frame_rgb, calc_angles=True, exact=False):
    new_state, _ = track(state, frame_rgb, calc_angles, exact)
    return new_state
