"""TPU-native BBF cascade detector: every window at every scale scored in parallel.

Reference behavior: src/ccv.js:109-333 (see oracle/detector.py for the spec).
The design is TPU-first, not a translation of the JS scan:

* The 4 detection phases (dx, dy in {0,1}^2, src/ccv.js:151-152,178-180) fold into
  ONE window grid of shape (2*qh, 2*qw) per scale step: a window (y2, x2) reads
  feature pixel (px, py, z) at
      z=0: plane0[2*y2 + py, 2*x2 + px]          (stride-2 slice)
      z=1: plane1[y2 + py, x2 + px]              (stride-1 slice)
      z=2: interleaved quarter plane I[y2 + 2*py, x2 + 2*px]
  where I pixel-interleaves the 4 shifted quarter variants
  (I[2a+dy, 2b+dx] = quarter_q[a, b], q = 2*dy + dx).  Every feature-pixel map is
  then a *static slice* — pure VPU work, no gathers — and all windows of all
  phases evaluate simultaneously.

* The JS per-window early exit becomes *stage-chunked compaction*: cheap stages
  run densely for all windows; surviving 8x20-window TILES are compacted
  on-device (top-k by survivor count; XLA:TPU serializes gathers/scatters, so
  compaction is top_k and tile blocks are ~100 large aligned dynamic slices),
  and deep stages evaluate tile im2col patch matrices against static one-hot
  selection matrices — MXU matmuls, not gathers.

* Grouping (union-find at src/ccv.js:34-107) becomes connected components via
  log-step transitive closure on a KxK adjacency matrix — a few small MXU
  matmuls — followed by masked aggregation; no host round-trip.

The whole detector is one jit-able, vmap-able function of (gray u8 frame).
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.imageproc import build_pyramid, pyramid_spec

__all__ = ["detector_tables", "DetectorTables", "detect_candidates",
           "detect_best", "detect_objects_padded", "group_candidates",
           "compact_indices"]

# Stage-chunk boundaries: stages [0, A) dense, [A, B) on first compaction,
# [B, S) on second compaction.
CHUNK_A_END = 2
CHUNK_B_END = 6
# Tile-eviction ranking under overcapacity (PARITY deviation 5):
# "maxconf" = MAX over alive windows of the last-evaluated stage sum,
# "confmass" = SUM of alive windows' stage sums, "count" = alive-window
# count (the r1-r4 rule).  Measured at the serving capacity (26 tiles,
# CHUNK_A_END=2) on the two adversarial fixtures (tests/test_clutter.py,
# tests/test_real_cascade_e2e.py): maxconf keeps 22/22 true tiles on the
# 16-face crowd AND 4/4 on the flat-background multiface frame; count
# keeps 0/22 + 4/4; confmass keeps 1/22 + 0/4.  confmass inverts the
# intent because alive windows carry NEGATIVE stage sums (they pass
# negative thresholds), so many-barely-alive tiles outrank few-strong
# ones; the strongest-single-window statistic is the discriminative one.
# Irrelevant whenever k_tiles >= surviving tiles (every surviving tile
# is selected under any rule).
TILE_RANK = "maxconf"

# Deep stages are compacted at TILE granularity: a tile is a TY x TX block of
# the window grid.  Tiles keep the plane reads aligned and few (batched
# dynamic_slice of ~100 large blocks instead of ~30k tiny windows — XLA:TPU
# serializes those into while loops).
TILE_Y = 8
TILE_X = 20
TILE_WINDOWS = TILE_Y * TILE_X

# Deep-stage (chunk B/C) selection-matmul operand dtype.  "int8" shifts the
# u8 patch matrix by -128 into int8 and runs the one-hot selection dots as
# int8 x int8 -> int32 MXU matmuls — EXACT by construction: each selection
# column picks exactly ONE pixel (integer dot, int32 accumulation is always
# exact), and the BBF compare min(p_i) > max(n_j) is invariant under the
# common -128 shift, so the shift never needs undoing (invalid-slot fills
# become the shifted range extremes 127 / -128).  Halves the HBM bytes of
# the patch operand re-read per selection slot and runs the MXU at int8
# rate.  "bf16" is the r1-r5 formulation (u8 values are bf16-exact).
# int8 became the default after the r5 qualification: chip A/B 44.0 vs
# 45.9 ms/tick (exp_detect_split, min-of-4, N=256) and the FULL on-chip
# conformance gate PASS with it on (verify_chip --deep-dtype int8 --k1
# 2048 --band-hist --clips all — realistic exact arm bit-perfect,
# clutter/hard/occlusion/relock green); values are bit-equal to bf16 by
# the construction above, so goldens are dtype-invariant.
DEEP_DTYPE = "int8"
# Tile block shapes read from the three planes (window (dy,dx) + feature extent):
B0_SHAPE = (2 * TILE_Y + 24, 2 * TILE_X + 24)    # (40, 64)
B1_SHAPE = (TILE_Y + 12, TILE_X + 12)            # (20, 32)
BI_SHAPE = (TILE_Y + 16, TILE_X + 12)            # (24, 32)


# --------------------------------------------------------------------------
# Static tables
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ScaleGeom:
    level: int        # scale step i
    qh2: int          # window grid height (2*qh)
    qw2: int          # window grid width  (2*qw)
    scale_x: float
    scale_y: float


@dataclasses.dataclass(frozen=True)
class DetectorTables:
    """Static, shape-dependent tables for one (W, H, interval, cascade) config."""
    spec: object                 # PyramidSpec
    geoms: tuple                 # tuple[ScaleGeom]
    M: int                       # total number of windows across scales
    # Per-window metadata (NumPy, become jnp constants on use):
    out_x: np.ndarray            # (M,) f32 detection-space box corner
    out_y: np.ndarray            # (M,) f32
    out_w: np.ndarray            # (M,) f32
    out_h: np.ndarray            # (M,) f32
    # Tile-compaction metadata (uniform per-scale grid):
    n_tiles: int                 # total tiles = n_scales * ntymax * ntxmax
    ntymax: int                  # tile-grid rows (max over scales)
    ntxmax: int                  # tile-grid cols
    tile_scale: np.ndarray       # (T,) i32
    tile_ty: np.ndarray          # (T,) i32 tile row in its scale's grid
    tile_tx: np.ndarray          # (T,) i32
    geom_qh2: np.ndarray         # (n_scales,) i32
    geom_qw2: np.ndarray         # (n_scales,) i32
    geom_scale_x: np.ndarray     # (n_scales,) f32
    geom_scale_y: np.ndarray     # (n_scales,) f32


def _cascade_np(cascade):
    return {k: np.asarray(cascade[k]) for k in
            ("stage_counts", "stage_thresh", "alpha", "size",
             "px", "py", "pz", "nx", "ny", "nz")}


@functools.lru_cache(maxsize=16)
def _tables_cached(w0, h0, interval, cascade_key):
    cascade = _TABLE_CASCADES[cascade_key]
    spec = pyramid_spec(w0, h0, interval)
    dims = dict(spec.dims)
    next_ = spec.next
    c = _cascade_np(cascade)
    K = c["alpha"].shape[0]

    geoms = []
    meta = {k: [] for k in ("ox", "oy", "ow", "oh")}
    scale_x = 1.0
    scale_y = 1.0
    for i in range(spec.scale_upto):
        W2, H2 = dims[i + next_ * 2]
        qh, qw = H2 - 6, W2 - 6
        if qh > 0 and qw > 0:
            g = ScaleGeom(
                level=i, qh2=2 * qh, qw2=2 * qw,
                scale_x=scale_x, scale_y=scale_y)
            geoms.append(g)
            y2, x2 = np.meshgrid(np.arange(2 * qh), np.arange(2 * qw), indexing="ij")
            y2 = y2.ravel()
            x2 = x2.ravel()
            meta["ox"].append((2 * x2 * scale_x).astype(np.float32))
            meta["oy"].append((2 * y2 * scale_y).astype(np.float32))
            meta["ow"].append(np.full(y2.size, 24 * scale_x, np.float32))
            meta["oh"].append(np.full(y2.size, 24 * scale_y, np.float32))
        scale_x *= spec.scale
        scale_y *= spec.scale

    cat = {k: (np.concatenate(v) if v else np.zeros((0,), np.float32))
           for k, v in meta.items()}
    M = cat["ox"].size

    # Tile grid metadata: a UNIFORM (ntymax, ntxmax) grid per scale, so the
    # stacked dense pass flattens to tile-major with one reshape/transpose.
    # Out-of-grid tiles have zero surviving windows (in-grid mask) and never
    # rank in the survivor-count top_k.
    if geoms:
        ntymax = max(-(-g.qh2 // TILE_Y) for g in geoms)
        ntxmax = max(-(-g.qw2 // TILE_X) for g in geoms)
        s_idx_g, ty, tx = np.meshgrid(np.arange(len(geoms)),
                                      np.arange(ntymax), np.arange(ntxmax),
                                      indexing="ij")
        t_scale = s_idx_g.ravel().astype(np.int32)
        t_ty = ty.ravel().astype(np.int32)
        t_tx = tx.ravel().astype(np.int32)
    else:
        ntymax = ntxmax = 0
        t_scale = np.zeros((0,), np.int32)
        t_ty = np.zeros((0,), np.int32)
        t_tx = np.zeros((0,), np.int32)

    return DetectorTables(
        spec=spec, geoms=tuple(geoms), M=M,
        out_x=cat["ox"], out_y=cat["oy"],
        out_w=cat["ow"], out_h=cat["oh"],
        n_tiles=int(t_scale.size), ntymax=int(ntymax), ntxmax=int(ntxmax),
        tile_scale=t_scale, tile_ty=t_ty, tile_tx=t_tx,
        geom_qh2=np.asarray([g.qh2 for g in geoms], np.int32),
        geom_qw2=np.asarray([g.qw2 for g in geoms], np.int32),
        geom_scale_x=np.asarray([g.scale_x for g in geoms], np.float32),
        geom_scale_y=np.asarray([g.scale_y for g in geoms], np.float32),
    )


# Digest -> cascade arrays, consulted by the lru-cached table/selection-mat
# builders (lru keys must be hashable; the arrays are not).  Bounded FIFO:
# unlike the lru_caches above, a plain dict would pin every cascade ever
# seen (e.g. toy-cascade parameter sweeps) forever.  The bound is far above
# the lru sizes, so an entry is never evicted while a cached builder that
# needs it can still miss within the same detector_tables call flow.
_TABLE_CASCADES = {}
_TABLE_CASCADES_MAX = 64


def _cascade_digest(cascade):
    import hashlib
    h = hashlib.sha1()
    for k in ("stage_counts", "stage_thresh", "alpha", "size",
              "px", "py", "pz", "nx", "ny", "nz"):
        h.update(np.ascontiguousarray(np.asarray(cascade[k])).tobytes())
    return h.hexdigest()


def detector_tables(w0, h0, cascade, interval=5):
    key = _cascade_digest(cascade)
    _TABLE_CASCADES.pop(key, None)  # re-insert last (FIFO freshness)
    _TABLE_CASCADES[key] = cascade
    while len(_TABLE_CASCADES) > _TABLE_CASCADES_MAX:
        _TABLE_CASCADES.pop(next(iter(_TABLE_CASCADES)))
    return _tables_cached(w0, h0, interval, key)


# --------------------------------------------------------------------------
# Dense chunk-A evaluation (static slices, all windows)
# --------------------------------------------------------------------------

def _interleave_quarters(q0, q1, q2, q3):
    """I[2a+dy, 2b+dx] = quarter_{2*dy+dx}[a, b] -> (2*H2, 2*W2)."""
    H2, W2 = q0.shape
    A = jnp.stack([q0, q1, q2, q3]).reshape(2, 2, H2, W2)  # [dy, dx, a, b]
    return A.transpose(2, 0, 3, 1).reshape(2 * H2, 2 * W2)


def _slot_map_stacked(P0s, P1s, Is, z, x, y, qh2m, qw2m):
    """Feature pixel (x, y, z) for EVERY window of EVERY scale at once:
    one (S, qh2m, qw2m) strided slice of the padded plane stacks.  Feature
    offsets are window-relative (scale-independent, src/ccv.js:161-177), so
    stacking scales turns the per-scale Python loop of ~1,700 small slice
    ops into ~80 large ones — the cold-start detect cost was op-dispatch
    bound, not FLOP bound (out-of-grid padding is masked by the caller)."""
    S = P0s.shape[0]
    if z == 0:
        return jax.lax.slice(P0s, (0, y, x),
                             (S, y + 2 * qh2m - 1, x + 2 * qw2m - 1),
                             (1, 2, 2))
    if z == 1:
        return jax.lax.slice(P1s, (0, y, x), (S, y + qh2m, x + qw2m))
    return jax.lax.slice(Is, (0, 2 * y, 2 * x),
                         (S, 2 * y + qh2m, 2 * x + qw2m))


def _dense_chunk_stacked(stacks, cascade_np, qh2m, qw2m, k_lo, k_hi, stages):
    """Evaluate weak classifiers [k_lo, k_hi) densely over the scale stacks;
    returns (alive, conf) of shape (S, qh2m, qw2m) — garbage in out-of-grid
    padding, callers apply the per-scale in-grid mask.

    stages: list of (k0, k1, threshold) covering the range, applied in order.
    """
    P0s, P1s, Is = stacks
    c = cascade_np
    S = P0s.shape[0]
    votes = []
    for k in range(k_lo, k_hi):
        pmin = None
        nmax = None
        for f in range(5):
            if c["pz"][k, f] >= 0:
                v = _slot_map_stacked(P0s, P1s, Is, int(c["pz"][k, f]),
                                      int(c["px"][k, f]), int(c["py"][k, f]),
                                      qh2m, qw2m)
                pmin = v if pmin is None else jnp.minimum(pmin, v)
            if c["nz"][k, f] >= 0:
                v = _slot_map_stacked(P0s, P1s, Is, int(c["nz"][k, f]),
                                      int(c["nx"][k, f]), int(c["ny"][k, f]),
                                      qh2m, qw2m)
                nmax = v if nmax is None else jnp.maximum(nmax, v)
        passed = pmin > nmax
        votes.append(jnp.where(passed, np.float32(c["alpha"][k, 1]),
                               np.float32(c["alpha"][k, 0])))
    alive = jnp.ones((S, qh2m, qw2m), bool)
    conf = jnp.zeros((S, qh2m, qw2m), jnp.float32)
    for (k0, k1, thr) in stages:
        ssum = jnp.zeros((S, qh2m, qw2m), jnp.float32)
        for k in range(k0, k1):
            ssum = ssum + votes[k - k_lo]
        # conf = the LAST-EVALUATED stage's sum: a window dead after stage s
        # keeps stage s's sum (oracle/detector.py:81, src/ccv.js:227-233) —
        # not the chunk's final stage sum.
        conf = jnp.where(alive, ssum, conf)
        alive = alive & (ssum >= np.float32(thr))
    return alive, conf


def _tile_flatten_stacked(arr, ntymax, ntxmax, fill):
    """(S, qh2m, qw2m) stacked window-grid array -> (S*ntymax*ntxmax,
    TILE_WINDOWS) tile-major (scale, tile-row, tile-col ordering — matches
    tables.tile_scale/tile_ty/tile_tx)."""
    S, qh2m, qw2m = arr.shape
    a = jnp.pad(arr, ((0, 0), (0, ntymax * TILE_Y - qh2m),
                      (0, ntxmax * TILE_X - qw2m)), constant_values=fill)
    a = a.reshape(S, ntymax, TILE_Y, ntxmax, TILE_X).transpose(0, 1, 3, 2, 4)
    return a.reshape(S * ntymax * ntxmax, TILE_WINDOWS)


# --------------------------------------------------------------------------
# Survivor patches + MXU selection matmuls (the deep-stage fast path)
# --------------------------------------------------------------------------
#
# A window's feature pixels live in a 756-value patch: 24x24 from plane0 at
# (2*y2, 2*x2), 12x12 from plane1 at (y2, x2), and 6x6 from the interleaved
# quarter plane at (y2, x2) stride 2.  Deep-stage evaluation for compacted
# survivors becomes  values_f = Patch(S, 768) @ OneHot_f(768, Kc)  — one MXU
# matmul per feature-pixel slot/side instead of millions of scalar gathers
# (XLA TPU gathers measured ~100x slower than this formulation).

PATCH_LEN = 768  # 576 + 144 + 36, padded to a lane multiple


def _patch_index(z, x, y):
    if z == 0:
        return y * 24 + x
    if z == 1:
        return 576 + y * 12 + x
    return 720 + y * 6 + x


@functools.lru_cache(maxsize=64)
def _selection_mats(cascade_key, k_lo, k_hi):
    """Static one-hot selection matrices: per slot f and side, (768, Kc) f32 +
    (Kc,) validity mask."""
    c = _cascade_np(_TABLE_CASCADES[cascade_key])
    Kc = k_hi - k_lo
    out = {}
    for side, (xx, yy, zz) in (("p", (c["px"], c["py"], c["pz"])),
                               ("n", (c["nx"], c["ny"], c["nz"]))):
        mats = []
        for f in range(xx.shape[1]):
            G = np.zeros((PATCH_LEN, Kc), np.float32)
            valid = np.zeros((Kc,), bool)
            for k in range(k_lo, k_hi):
                z = int(zz[k, f])
                if z >= 0:
                    G[_patch_index(z, int(xx[k, f]), int(yy[k, f])), k - k_lo] = 1.0
                    valid[k - k_lo] = True
            if valid.any():
                mats.append((G, valid))
        out[side] = mats
    return out


def _tile_stacks(pyr, tables):
    """Pad each active scale's (plane0, plane1, interleaved-quarter) into three
    uniform stacks with tile-block margins so tile blocks extract with one
    aligned dynamic_slice each.  The same stacks back the stacked dense
    chunk-A pass (_dense_chunk_stacked): one strided slice over the stack
    reads a feature pixel for EVERY window of EVERY scale (feature offsets
    are scale-independent)."""
    next_ = tables.spec.next
    nty = tables.ntymax
    ntx = tables.ntxmax
    h0m = 2 * TILE_Y * nty + B0_SHAPE[0]
    w0m = 2 * TILE_X * ntx + B0_SHAPE[1]
    h1m = TILE_Y * nty + B1_SHAPE[0]
    w1m = TILE_X * ntx + B1_SHAPE[1]
    hIm = TILE_Y * nty + BI_SHAPE[0]
    wIm = TILE_X * ntx + BI_SHAPE[1]

    def pad_to(a, h, w):
        return jnp.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])))

    p0s, p1s, iis = [], [], []
    for g in tables.geoms:
        i = g.level
        p0s.append(pad_to(pyr[i * 4], h0m, w0m))
        p1s.append(pad_to(pyr[(i + next_) * 4], h1m, w1m))
        iis.append(pad_to(_interleave_quarters(
            pyr[(i + 2 * next_) * 4 + 0], pyr[(i + 2 * next_) * 4 + 1],
            pyr[(i + 2 * next_) * 4 + 2], pyr[(i + 2 * next_) * 4 + 3]),
            hIm, wIm))
    return jnp.stack(p0s), jnp.stack(p1s), jnp.stack(iis)


def _extract_tile_blocks(stacks, tscale, ty, tx):
    """(T,) tile coords -> three (T, bh, bw) u8 block batches.

    vmap(dynamic_slice) lowers to a serial while loop on XLA:TPU, but at tile
    granularity that is ~100 iterations of large aligned blocks — cheap."""
    P0s, P1s, Is = stacks

    def one(s, y, x):
        b0 = jax.lax.dynamic_slice(P0s, (s, 2 * TILE_Y * y, 2 * TILE_X * x),
                                   (1, *B0_SHAPE))[0]
        b1 = jax.lax.dynamic_slice(P1s, (s, TILE_Y * y, TILE_X * x),
                                   (1, *B1_SHAPE))[0]
        bi = jax.lax.dynamic_slice(Is, (s, TILE_Y * y, TILE_X * x),
                                   (1, *BI_SHAPE))[0]
        return b0, b1, bi

    return jax.vmap(one)(tscale, ty, tx)


def _tile_patches(b0, b1, bi):
    """Tile blocks -> TRANSPOSED (768, T*160) bf16 patch matrix.

    Window (dy,dx) in a tile reads block0[2dy+py, 2dx+px], block1[dy+py,
    dx+px], blockI[dy+2py, dx+2px] — i.e. im2col.  Implemented with
    conv_general_dilated_patches (native, MXU-friendly); an equivalent stack
    of 756 static slices OOMs at serving batch (XLA pads each concat operand
    ~128x under vmap)."""
    T = b0.shape[0]

    def patches(block, fhw, strides, dil):
        x = block[:, None].astype(jnp.bfloat16)          # (T, 1, H, W)
        p = jax.lax.conv_general_dilated_patches(
            x, filter_shape=fhw, window_strides=strides,
            padding="VALID", rhs_dilation=dil)           # (T, prod(fhw), oh, ow)
        return p[:, :, :TILE_Y, :TILE_X]

    p0 = patches(b0, (24, 24), (2, 2), (1, 1))           # (T, 576, 8, 20)
    p1 = patches(b1, (12, 12), (1, 1), (1, 1))           # (T, 144, 8, 20)
    pq = patches(bi, (6, 6), (1, 1), (2, 2))             # (T, 36, 8, 20)
    cat = jnp.concatenate([p0, p1, pq], axis=1)          # (T, 756, 8, 20)
    patches_t = cat.transpose(1, 0, 2, 3).reshape(756, T * TILE_WINDOWS)
    if DEEP_DTYPE == "int8":
        # u8 values are exact integers in bf16; shifting by -128 lands them
        # in [-128, 127], so the int8 cast is lossless (see the DEEP_DTYPE
        # note — the shift is never undone)
        patches_t = (patches_t.astype(jnp.int16) - 128).astype(jnp.int8)
    return jnp.pad(patches_t, ((0, PATCH_LEN - 756), (0, 0)))


def _patch_chunk(patches_t, cascade_key, k_lo, k_hi, stages, valid, conf_in,
                 cascade_np):
    """Evaluate weak [k_lo, k_hi) for survivor patches via selection matmuls.

    patches_t: TRANSPOSED patch matrix (768, W_); all intermediates are
    (Kc, W_) so the patch assembly never pays a minor-dim relayout."""
    mats = _selection_mats(cascade_key, k_lo, k_hi)
    i8 = patches_t.dtype == jnp.int8

    def side_minmax(side, reduce_min):
        acc = None
        for G, vmask in mats[side]:
            if i8:
                # int8 x int8 -> int32: exact (one selected pixel per
                # column); values carry the -128 patch shift, which the
                # min>max compare is invariant under, so fills are the
                # shifted range extremes
                vals = jnp.dot(jnp.asarray(G.T, jnp.int8), patches_t,
                               preferred_element_type=jnp.int32)  # (Kc, W_)
                fill = np.int32(127) if reduce_min else np.int32(-128)
            else:
                vals = jnp.dot(jnp.asarray(G.T, jnp.bfloat16), patches_t,
                               preferred_element_type=jnp.float32)  # (Kc, W_)
                fill = np.float32(255.0) if reduce_min else np.float32(0.0)
            vals = jnp.where(jnp.asarray(vmask)[:, None], vals, fill)
            if acc is None:
                acc = vals
            else:
                acc = jnp.minimum(acc, vals) if reduce_min else jnp.maximum(acc, vals)
        return acc

    pmin = side_minmax("p", True)
    nmax = side_minmax("n", False)
    passed = pmin > nmax                                    # (Kc, W_)
    alpha = np.asarray(cascade_np["alpha"][k_lo:k_hi])
    votes = jnp.where(passed, alpha[:, 1][:, None], alpha[:, 0][:, None])

    alive = valid
    conf = conf_in
    for (k0, k1_, thr) in stages:
        ssum = votes[k0 - k_lo:k1_ - k_lo].sum(axis=0)      # (W_,)
        # last-evaluated-stage confidence: stop updating once a window dies
        # within this chunk (oracle/detector.py:81, src/ccv.js:227-233)
        conf = jnp.where(alive, ssum, conf)
        alive = alive & (ssum >= np.float32(thr))
    return alive, conf


# --------------------------------------------------------------------------
# Compaction + gather-based deep chunks
# --------------------------------------------------------------------------

def compact_indices(mask, size):
    """Indices of True entries of a flat bool mask, ascending, padded with
    ``mask.size`` (an out-of-range sentinel).  Implemented with top_k (XLA TPU
    scatter lowers to a serial per-element loop; top_k is parallel), vmap-safe.
    Overflow beyond ``size`` is dropped (documented capacity limit)."""
    m = mask.reshape(-1)
    M = m.shape[0]
    if M == 0:
        return jnp.full((size,), 0, jnp.int32), jnp.int32(0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).reshape(-1)
    key = jnp.where(m, idx, M)          # survivors keep their index, losers M
    k = min(size, M)
    neg_vals, _ = jax.lax.top_k(-key, k)  # k smallest keys, ascending after neg
    out = -neg_vals
    if k < size:
        out = jnp.concatenate([out, jnp.full((size - k,), M, jnp.int32)])
    n = jnp.minimum(m.sum().astype(jnp.int32), size)
    return out, n


# --------------------------------------------------------------------------
# Grouping (connected components on device)
# --------------------------------------------------------------------------

def group_candidates(x, y, w, h, conf, valid, min_neighbors=1):
    """src/ccv.js:249-331 as masked array ops over K fixed candidate slots.

    Returns dict of (K,)-arrays: kept mask + grouped x/y/width/height/neighbors/
    confidence at component-representative slots, ascending-index ordered like the
    JS seq2.
    """
    K = x.shape[0]
    f32 = jnp.float32
    dist = jnp.floor(w * f32(0.25) + f32(0.5))
    wide = jnp.floor(w * f32(1.5) + f32(0.5))
    # pred[i, j] = gfunc(r1=i, r2=j)  (src/ccv.js:252-261)
    pred = ((x[None, :] <= x[:, None] + dist[:, None]) &
            (x[None, :] >= x[:, None] - dist[:, None]) &
            (y[None, :] <= y[:, None] + dist[:, None]) &
            (y[None, :] >= y[:, None] - dist[:, None]) &
            (w[None, :] <= wide[:, None]) &
            (wide[None, :] >= w[:, None]))
    vv = valid[:, None] & valid[None, :]
    adj = (pred | pred.T) & vv
    adj = adj | (jnp.eye(K, dtype=bool) & valid[:, None])
    # Transitive closure by repeated squaring (MXU boolean matmul).
    for _ in range(max(1, math.ceil(math.log2(max(K, 2))))):
        a = adj.astype(f32)
        adj = adj | (jnp.dot(a, a, preferred_element_type=f32) > 0)
    idxv = jnp.arange(K, dtype=jnp.int32)
    label = jnp.min(jnp.where(adj, idxv[None, :], K), axis=1).astype(jnp.int32)

    member = (label[None, :] == idxv[:, None]) & valid[None, :]  # row i: members
    mf = member.astype(f32)
    n = mf.sum(axis=1)
    # Precision.HIGH (bf16x3): exact f32 selection for the 0/1 lhs — the
    # coordinates are FRACTIONAL f32 (x4*scale_x), so a DEFAULT-precision
    # dot would bf16-round each member coordinate (~1 px at x>=256) before
    # summing, shifting grouped boxes / the VJ->CS handoff rect on TPU
    # (CLAUDE.md precision rule; CPU dots are full f32, so only the chip
    # sees it).  These dots run on <= K=256 slots on detect ticks only.
    hi = jax.lax.Precision.HIGH
    sx = jnp.dot(mf, x, precision=hi)
    sy = jnp.dot(mf, y, precision=hi)
    sw = jnp.dot(mf, w, precision=hi)
    sh = jnp.dot(mf, h, precision=hi)
    mconf = jnp.max(jnp.where(member, conf[None, :], -jnp.inf), axis=1)

    rep = valid & (label == idxv) & (n >= min_neighbors)
    n_safe = jnp.maximum(n, 1.0)
    gx = (sx * 2 + n) / (2 * n_safe)
    gy = (sy * 2 + n) / (2 * n_safe)
    gw = (sw * 2 + n) / (2 * n_safe)
    gh = (sh * 2 + n) / (2 * n_safe)

    # Containment filter (src/ccv.js:305-331): drop r1 contained (+-dist) in a
    # kept r2 with more neighbors.
    dist2 = jnp.floor(gw * f32(0.25) + f32(0.5))
    nb = n
    inside = ((gx[:, None] >= gx[None, :] - dist2[None, :]) &
              (gy[:, None] >= gy[None, :] - dist2[None, :]) &
              (gx[:, None] + gw[:, None] <= gx[None, :] + gw[None, :] + dist2[None, :]) &
              (gy[:, None] + gh[:, None] <= gy[None, :] + gh[None, :] + dist2[None, :]) &
              ((nb[None, :] > jnp.maximum(3.0, nb[:, None])) | (nb[:, None] < 3.0)) &
              rep[None, :] & (~jnp.eye(K, dtype=bool)))
    kept = rep & ~jnp.any(inside, axis=1)
    return dict(kept=kept, x=gx, y=gy, width=gw, height=gh,
                neighbors=n, confidence=mconf)


# --------------------------------------------------------------------------
# Full detector
# --------------------------------------------------------------------------

def _stage_ranges(cascade, lo_stage, hi_stage):
    counts = np.asarray(cascade["stage_counts"])
    thresh = np.asarray(cascade["stage_thresh"])
    cum = np.concatenate([[0], np.cumsum(counts)])
    return [(int(cum[s]), int(cum[s + 1]), float(thresh[s]))
            for s in range(lo_stage, hi_stage)]


def detect_candidates(gray, cascade, interval=5, k1=4096, k2=512, k_cand=256):
    """Run the full cascade; returns per-candidate-slot arrays (pre-grouping).

    gray: (H, W) u8.  Output dict of (k_cand,) arrays x, y, width, height,
    confidence + valid mask.  Ordering within the candidate list is
    (scale, tile, window) — the same set as the JS seq, order differing only in
    enumeration (documented deviation; affects exact-confidence ties only).

    k1: deep-stage window capacity, realized as ceil(k1/160) surviving tiles
    (each tile = 8x20 windows); k2: stage-6+ window capacity.
    """
    h0, w0 = gray.shape
    tables = detector_tables(w0, h0, cascade, interval)
    c = _cascade_np(cascade)
    S = len(np.asarray(cascade["stage_counts"]))
    a_end = min(CHUNK_A_END, S)
    b_end = min(CHUNK_B_END, S)
    cum = np.concatenate([[0], np.cumsum(c["stage_counts"])])

    if not tables.geoms:  # image too small for any window
        z = jnp.zeros((k_cand,), jnp.float32)
        return dict(x=z, y=z, width=z, height=z, confidence=z,
                    valid=jnp.zeros((k_cand,), bool), overflow=jnp.int32(0))

    pyr, spec = build_pyramid(gray, interval)
    key = _cascade_digest(cascade)

    # ---- chunk A: stages [0, a_end) densely for ALL scales at once ------
    stacks = _tile_stacks(pyr, tables)
    qh2m = max(g.qh2 for g in tables.geoms)
    qw2m = max(g.qw2 for g in tables.geoms)
    alive_s, conf_s = _dense_chunk_stacked(stacks, c, qh2m, qw2m,
                                           0, int(cum[a_end]),
                                           _stage_ranges(cascade, 0, a_end))
    S_n = len(tables.geoms)
    iy = jax.lax.broadcasted_iota(jnp.int32, (S_n, qh2m, qw2m), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (S_n, qh2m, qw2m), 2)
    in_grid_s = ((iy < jnp.asarray(tables.geom_qh2)[:, None, None]) &
                 (ix < jnp.asarray(tables.geom_qw2)[:, None, None]))
    alive_s = alive_s & in_grid_s

    if a_end < S:
        # ---- tile compaction --------------------------------------------
        talive = _tile_flatten_stacked(alive_s, tables.ntymax,
                                       tables.ntxmax, False)  # (T_all, 160)
        tconf = _tile_flatten_stacked(conf_s, tables.ntymax,
                                      tables.ntxmax, 0.0)
        k_tiles = int(np.clip(-(-k1 // TILE_WINDOWS), 8, 512))
        k_tiles = min(k_tiles, tables.n_tiles)
        # Rank tiles by their STRONGEST alive window's last-evaluated stage
        # sum (see the TILE_RANK comment above for the measured three-way
        # comparison): under eviction pressure the survivor-count rank
        # prefers tiles where many windows barely pass stages 0-1 over the
        # tiles holding true faces, and the sum-of-conf rank inverts (alive
        # stage sums are negative), while the max statistic keeps every
        # true-face tile on both adversarial fixtures.  Ties (incl.
        # all-dead tiles at -inf) resolve ascending-index — top_k is
        # stable — matching the JS seq's enumeration order.  When
        # k_tiles >= surviving-tile count the rank is irrelevant: every
        # surviving tile is selected (set parity).
        tcount = talive.sum(axis=1).astype(jnp.int32)          # (T_all,) <= 160
        if TILE_RANK == "maxconf":
            tile_rank = jnp.where(talive, tconf, -jnp.inf).max(axis=1)
            _, tidx = jax.lax.top_k(tile_rank, k_tiles)
        elif TILE_RANK == "confmass":
            confmass = jnp.where(talive, tconf, 0.0).sum(axis=1)
            tile_rank = jnp.where(tcount > 0, confmass, -jnp.inf)
            _, tidx = jax.lax.top_k(tile_rank, k_tiles)
        else:  # "count" (the r1-r4 rule; kept as an A/B knob)
            T_all = tables.n_tiles
            tie = jax.lax.broadcasted_iota(jnp.int32, (T_all, 1), 0).reshape(-1)
            tile_rank = tcount * (T_all + 1) + (T_all - tie)
            _, tidx = jax.lax.top_k(tile_rank, k_tiles)
        counts = tcount[tidx]
        tvalid = counts > 0
        # survivors dropped by tile-capacity eviction (PARITY.md deviation 5)
        kept_windows = jnp.where(tvalid, counts, 0).sum()
        overflow = (tcount.sum() - kept_windows).astype(jnp.int32)

        tscale = jnp.asarray(tables.tile_scale)[tidx]
        ty = jnp.asarray(tables.tile_ty)[tidx]
        tx = jnp.asarray(tables.tile_tx)[tidx]

        b0, b1, bi = _extract_tile_blocks(stacks, tscale, ty, tx)
        patches_t = _tile_patches(b0, b1, bi)     # (768, k_tiles*160) bf16
        W_ = k_tiles * TILE_WINDOWS

        # per-window metadata within surviving tiles
        dy = jnp.arange(TILE_WINDOWS, dtype=jnp.int32) // TILE_X
        dx = jnp.arange(TILE_WINDOWS, dtype=jnp.int32) % TILE_X
        wy2 = (ty[:, None] * TILE_Y + dy[None, :]).reshape(W_)
        wx2 = (tx[:, None] * TILE_X + dx[None, :]).reshape(W_)
        wscale = jnp.repeat(tscale, TILE_WINDOWS)
        qh2_s = jnp.asarray(tables.geom_qh2)[wscale]
        qw2_s = jnp.asarray(tables.geom_qw2)[wscale]
        in_grid = (wy2 < qh2_s) & (wx2 < qw2_s)

        alive0 = (talive[tidx].reshape(W_) & in_grid
                  & jnp.repeat(tvalid, TILE_WINDOWS))
        conf0 = tconf[tidx].reshape(W_)

        # ---- chunk B: stages [a_end, b_end) on all tile windows ----------
        alive1, conf1 = _patch_chunk(patches_t, key,
                                     int(cum[a_end]), int(cum[b_end]),
                                     _stage_ranges(cascade, a_end, b_end),
                                     alive0, conf0, c)
        if b_end < S:
            # ---- chunk C: window compaction via one-hot row select -------
            idx2, _n2 = compact_indices(alive1, k2)
            overflow = overflow + jnp.maximum(
                alive1.sum().astype(jnp.int32) - k2, 0)
            valid2 = idx2 < W_
            safe2 = jnp.minimum(idx2, W_ - 1)
            onehot = (idx2[None, :] ==
                      jax.lax.broadcasted_iota(jnp.int32, (W_, 1), 0))
            if patches_t.dtype == jnp.int8:
                # int8 column re-select: int32 accumulation exact, values
                # stay in [-128, 127] so the int8 round-trip is lossless
                patches2_t = jnp.dot(patches_t, onehot.astype(jnp.int8),
                                     preferred_element_type=jnp.int32
                                     ).astype(jnp.int8)   # (768, k2)
            else:
                patches2_t = jnp.dot(patches_t, onehot.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16)   # (768, k2)
            conf2 = conf1[safe2]
            alive2, conf2 = _patch_chunk(patches2_t, key,
                                         int(cum[b_end]), int(cum[S]),
                                         _stage_ranges(cascade, b_end, S),
                                         valid2, conf2, c)
            fin_alive, fin_conf = alive2, conf2
            fin_wy2, fin_wx2, fin_ws = wy2[safe2], wx2[safe2], wscale[safe2]
        else:
            fin_alive, fin_conf = alive1, conf1
            fin_wy2, fin_wx2, fin_ws = wy2, wx2, wscale

        slot_idx, _nc = compact_indices(fin_alive, k_cand)
        overflow = overflow + jnp.maximum(
            fin_alive.sum().astype(jnp.int32) - k_cand, 0)
        cvalid = slot_idx < fin_alive.shape[0]
        sel = jnp.minimum(slot_idx, fin_alive.shape[0] - 1)
        sx = jnp.asarray(tables.geom_scale_x)[fin_ws[sel]]
        sy = jnp.asarray(tables.geom_scale_y)[fin_ws[sel]]
        return dict(
            x=2 * fin_wx2[sel].astype(jnp.float32) * sx,
            y=2 * fin_wy2[sel].astype(jnp.float32) * sy,
            width=24 * sx,
            height=24 * sy,
            confidence=fin_conf[sel],
            valid=cvalid,
            overflow=overflow,
        )

    # ---- single-chunk cascades (e.g. toy models): no deep stages ---------
    # unpack the stacked grids back to the per-window table ordering
    # (scale-major, then row-major within each scale's real grid)
    alive_all = jnp.concatenate([alive_s[s, :g.qh2, :g.qw2].reshape(-1)
                                 for s, g in enumerate(tables.geoms)])
    conf_all = jnp.concatenate([conf_s[s, :g.qh2, :g.qw2].reshape(-1)
                                for s, g in enumerate(tables.geoms)])
    idx1, n1 = compact_indices(alive_all, k_cand)
    cvalid = idx1 < tables.M
    wsafe = jnp.minimum(idx1, tables.M - 1)
    return dict(
        x=jnp.asarray(tables.out_x)[wsafe],
        y=jnp.asarray(tables.out_y)[wsafe],
        width=jnp.asarray(tables.out_w)[wsafe],
        height=jnp.asarray(tables.out_h)[wsafe],
        confidence=conf_all[wsafe],
        valid=cvalid,
        overflow=jnp.maximum(alive_all.sum().astype(jnp.int32) - k_cand, 0),
    )


def detect_objects_padded(gray, cascade, interval=5, min_neighbors=1, k_cand=256,
                          k1=4096, k2=512):
    """Grouped detections (the equivalent of ccv.detect_objects with
    min_neighbors > 0).  Returns dict of (k_cand,) arrays + kept mask."""
    cand = detect_candidates(gray, cascade, interval, k1=k1, k2=k2, k_cand=k_cand)
    if not min_neighbors > 0:
        # min_neighbors=0 skips grouping (src/ccv.js:245-246 returns the raw
        # seq).  Keep the grouped schema so consumers (detect_best) work for
        # both settings: every valid candidate is its own kept "group".
        cand = dict(cand)
        cand["kept"] = cand.pop("valid")
        cand["neighbors"] = cand["kept"].astype(jnp.float32)
        return cand
    g = group_candidates(cand["x"], cand["y"], cand["width"], cand["height"],
                         cand["confidence"], cand["valid"], min_neighbors)
    g["overflow"] = cand["overflow"]  # dropped-survivor count (capacity caps)
    return g


def detect_best(gray, cascade, interval=5, min_neighbors=1, k_cand=256,
                k1=4096, k2=512):
    """The facetrackr candidate pick (src/facetrackr.js:157-165): max confidence,
    first wins ties.  Returns (found, x, y, w, h, confidence)."""
    g = detect_objects_padded(gray, cascade, interval, min_neighbors, k_cand,
                              k1, k2)
    score = jnp.where(g["kept"], g["confidence"], -jnp.inf)
    i = jnp.argmax(score)
    found = jnp.any(g["kept"])
    return (found, g["x"][i], g["y"][i], g["width"][i], g["height"][i],
            g["confidence"][i])
