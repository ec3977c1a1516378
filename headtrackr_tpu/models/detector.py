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
  run densely for all windows; survivors are compacted on-device (ascending
  order, preserving the JS seq order) and deeper stages run as flat gathers over
  the concatenated plane buffer for the survivors only.

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


# --------------------------------------------------------------------------
# Static tables
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ScaleGeom:
    level: int        # scale step i
    qh2: int          # window grid height (2*qh)
    qw2: int          # window grid width  (2*qw)
    w0: int           # plane0 width
    w1: int           # plane1 width
    wI: int           # interleaved quarter width (2*W2)
    start0: int       # offsets into the per-frame flat plane buffer
    start1: int
    startI: int
    scale_x: float
    scale_y: float


@dataclasses.dataclass(frozen=True)
class DetectorTables:
    """Static, shape-dependent tables for one (W, H, interval, cascade) config."""
    spec: object                 # PyramidSpec
    geoms: tuple                 # tuple[ScaleGeom]
    M: int                       # total number of windows across scales
    flat_len: int                # length of the flat plane buffer
    # Per-window metadata (NumPy, become jnp constants on use):
    win_scale: np.ndarray        # (M,) i32 index into geoms
    win_b0: np.ndarray           # (M,) i32 window base offset in plane0
    win_b1: np.ndarray           # (M,) i32
    win_bI: np.ndarray           # (M,) i32
    out_x: np.ndarray            # (M,) f32 detection-space box corner
    out_y: np.ndarray            # (M,) f32
    out_w: np.ndarray            # (M,) f32
    out_h: np.ndarray            # (M,) f32
    # Per-(scale, weak, slot) flat address offsets (window-independent part):
    # addr[s, k, f] = A[s, k, f] + win_b{z}[window]; invalid slots -> 0 with mask.
    A_pos: np.ndarray            # (n_scales, K, 5) i32
    A_neg: np.ndarray            # (n_scales, K, 5) i32
    Z_pos: np.ndarray            # (K, 5) i8 in {-1, 0, 1, 2}
    Z_neg: np.ndarray            # (K, 5) i8


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
    flat = 0
    meta = {k: [] for k in ("scale", "b0", "b1", "bI", "ox", "oy", "ow", "oh")}
    scale_x = 1.0
    scale_y = 1.0
    for i in range(spec.scale_upto):
        W0, H0 = dims[i]
        W1, H1 = dims[i + next_]
        W2, H2 = dims[i + next_ * 2]
        qh, qw = H2 - 6, W2 - 6
        if qh > 0 and qw > 0:
            g = ScaleGeom(
                level=i, qh2=2 * qh, qw2=2 * qw, w0=W0, w1=W1, wI=2 * W2,
                start0=flat, start1=flat + W0 * H0,
                startI=flat + W0 * H0 + W1 * H1,
                scale_x=scale_x, scale_y=scale_y)
            flat += W0 * H0 + W1 * H1 + 4 * W2 * H2
            s_idx = len(geoms)
            geoms.append(g)
            y2, x2 = np.meshgrid(np.arange(2 * qh), np.arange(2 * qw), indexing="ij")
            y2 = y2.ravel()
            x2 = x2.ravel()
            meta["scale"].append(np.full(y2.size, s_idx, np.int32))
            meta["b0"].append((g.start0 + 2 * y2 * W0 + 2 * x2).astype(np.int32))
            meta["b1"].append((g.start1 + y2 * W1 + x2).astype(np.int32))
            meta["bI"].append((g.startI + y2 * g.wI + x2).astype(np.int32))
            meta["ox"].append((2 * x2 * scale_x).astype(np.float32))
            meta["oy"].append((2 * y2 * scale_y).astype(np.float32))
            meta["ow"].append(np.full(y2.size, 24 * scale_x, np.float32))
            meta["oh"].append(np.full(y2.size, 24 * scale_y, np.float32))
        scale_x *= spec.scale
        scale_y *= spec.scale

    cat = {k: (np.concatenate(v) if v else np.zeros((0,), np.int32))
           for k, v in meta.items()}
    M = cat["scale"].size

    # Window-independent flat address offsets per (scale, weak, slot).
    n_scales = len(geoms)
    A_pos = np.zeros((n_scales, K, 5), np.int32)
    A_neg = np.zeros((n_scales, K, 5), np.int32)
    for s, g in enumerate(geoms):
        for side, (xx, yy, zz, A) in (("p", (c["px"], c["py"], c["pz"], A_pos)),
                                      ("n", (c["nx"], c["ny"], c["nz"], A_neg))):
            z0 = zz == 0
            z1 = zz == 1
            z2 = zz == 2
            A[s][z0] = (yy[z0] * g.w0 + xx[z0]).astype(np.int32)
            A[s][z1] = (yy[z1] * g.w1 + xx[z1]).astype(np.int32)
            A[s][z2] = (2 * yy[z2] * g.wI + 2 * xx[z2]).astype(np.int32)

    return DetectorTables(
        spec=spec, geoms=tuple(geoms), M=M, flat_len=flat,
        win_scale=cat["scale"], win_b0=cat["b0"], win_b1=cat["b1"],
        win_bI=cat["bI"], out_x=cat["ox"], out_y=cat["oy"],
        out_w=cat["ow"], out_h=cat["oh"],
        A_pos=A_pos, A_neg=A_neg,
        Z_pos=c["pz"][:, :].astype(np.int8), Z_neg=c["nz"][:, :].astype(np.int8),
    )


_TABLE_CASCADES = {}


def _cascade_digest(cascade):
    import hashlib
    h = hashlib.sha1()
    for k in ("stage_counts", "stage_thresh", "alpha", "size",
              "px", "py", "pz", "nx", "ny", "nz"):
        h.update(np.ascontiguousarray(np.asarray(cascade[k])).tobytes())
    return h.hexdigest()


def detector_tables(w0, h0, cascade, interval=5):
    key = _cascade_digest(cascade)
    _TABLE_CASCADES[key] = cascade
    return _tables_cached(w0, h0, interval, key)


# --------------------------------------------------------------------------
# Dense chunk-A evaluation (static slices, all windows)
# --------------------------------------------------------------------------

def _interleave_quarters(q0, q1, q2, q3):
    """I[2a+dy, 2b+dx] = quarter_{2*dy+dx}[a, b] -> (2*H2, 2*W2)."""
    H2, W2 = q0.shape
    A = jnp.stack([q0, q1, q2, q3]).reshape(2, 2, H2, W2)  # [dy, dx, a, b]
    return A.transpose(2, 0, 3, 1).reshape(2 * H2, 2 * W2)


def _slot_map(p0, p1, I, z, x, y, qh2, qw2):
    """Value of feature pixel (x, y, z) for every window in the (qh2, qw2) grid."""
    if z == 0:
        return jax.lax.slice(p0, (y, x), (y + 2 * qh2 - 1, x + 2 * qw2 - 1), (2, 2))
    if z == 1:
        return jax.lax.slice(p1, (y, x), (y + qh2, x + qw2))
    return jax.lax.slice(I, (2 * y, 2 * x), (2 * y + qh2, 2 * x + qw2))


def _dense_chunk(p0, p1, I, cascade_np, qh2, qw2, k_lo, k_hi, stages):
    """Evaluate weak classifiers [k_lo, k_hi) densely; returns (alive, conf).

    stages: list of (k0, k1, threshold) covering the range, applied in order.
    """
    c = cascade_np
    votes = []
    for k in range(k_lo, k_hi):
        pmin = None
        nmax = None
        for f in range(5):
            if c["pz"][k, f] >= 0:
                v = _slot_map(p0, p1, I, int(c["pz"][k, f]), int(c["px"][k, f]),
                              int(c["py"][k, f]), qh2, qw2)
                pmin = v if pmin is None else jnp.minimum(pmin, v)
            if c["nz"][k, f] >= 0:
                v = _slot_map(p0, p1, I, int(c["nz"][k, f]), int(c["nx"][k, f]),
                              int(c["ny"][k, f]), qh2, qw2)
                nmax = v if nmax is None else jnp.maximum(nmax, v)
        passed = pmin > nmax
        votes.append(jnp.where(passed, np.float32(c["alpha"][k, 1]),
                               np.float32(c["alpha"][k, 0])))
    alive = jnp.ones((qh2, qw2), bool)
    conf = jnp.zeros((qh2, qw2), jnp.float32)
    for (k0, k1, thr) in stages:
        ssum = jnp.zeros((qh2, qw2), jnp.float32)
        for k in range(k0, k1):
            ssum = ssum + votes[k - k_lo]
        alive = alive & (ssum >= np.float32(thr))
        conf = ssum
    return alive, conf


# --------------------------------------------------------------------------
# Compaction + gather-based deep chunks
# --------------------------------------------------------------------------

def compact_indices(mask, size):
    """Indices of True entries of a flat bool mask, ascending, padded with
    ``mask.size`` (an out-of-range sentinel).  O(M), vmap-safe (no nonzero)."""
    m = mask.reshape(-1)
    M = m.shape[0]
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1        # target slot per survivor
    slot = jnp.where(m, jnp.minimum(pos, size - 1), size)  # dead slot for losers
    # Losers all write index M to the dead slot; overflow survivors clamp to the
    # last slot (documented capacity limit, counted below).
    out = jnp.full((size + 1,), M, jnp.int32)
    out = out.at[slot].min(jnp.arange(M, dtype=jnp.int32))
    n = jnp.minimum(pos[-1] + 1, size) if M > 0 else jnp.int32(0)
    return out[:size], n


def _gather_chunk(flatbuf, tables, cascade_np, idx, valid, k_lo, k_hi, stages,
                  conf_in):
    """Evaluate weak [k_lo, k_hi) for the survivor windows ``idx`` via gathers."""
    c = cascade_np
    Kc = k_hi - k_lo
    scale = jnp.asarray(tables.win_scale)[jnp.minimum(idx, tables.M - 1)]
    b0 = jnp.asarray(tables.win_b0)[jnp.minimum(idx, tables.M - 1)]
    b1 = jnp.asarray(tables.win_b1)[jnp.minimum(idx, tables.M - 1)]
    bI = jnp.asarray(tables.win_bI)[jnp.minimum(idx, tables.M - 1)]
    bz = jnp.stack([b0, b1, bI], axis=1)                       # (S_, 3)

    def side(A_all, Z):
        A = jnp.asarray(A_all[:, k_lo:k_hi, :])[scale]          # (S_, Kc, 5)
        z = np.maximum(Z[k_lo:k_hi, :], 0).astype(np.int32)     # (Kc, 5) static
        base = bz[:, z]                                          # (S_, Kc, 5)
        addr = A + base
        vals = flatbuf[addr.reshape(-1)].reshape(idx.shape[0], Kc, 5)
        return vals

    vmask_p = np.asarray(tables.Z_pos[k_lo:k_hi] >= 0)
    vmask_n = np.asarray(tables.Z_neg[k_lo:k_hi] >= 0)
    pv = side(tables.A_pos, tables.Z_pos)
    nv = side(tables.A_neg, tables.Z_neg)
    pmin = jnp.min(jnp.where(vmask_p[None], pv, jnp.uint8(255)), axis=2)
    nmax = jnp.max(jnp.where(vmask_n[None], nv, jnp.uint8(0)), axis=2)
    passed = pmin > nmax                                         # (S_, Kc)
    alpha = np.asarray(cascade_np["alpha"][k_lo:k_hi])           # (Kc, 2)
    votes = jnp.where(passed, alpha[None, :, 1], alpha[None, :, 0])

    alive = valid
    conf = conf_in
    for (k0, k1, thr) in stages:
        ssum = votes[:, k0 - k_lo:k1 - k_lo].sum(axis=1)
        alive = alive & (ssum >= np.float32(thr))
        conf = jnp.where(valid, ssum, conf)
    return alive, conf


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
    sx = mf @ x
    sy = mf @ y
    sw = mf @ w
    sh = mf @ h
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
    confidence + valid mask, in JS seq order (scale -> window-grid row-major,
    which matches phase -> y -> x after the interleaving map), plus overflow
    counters.
    """
    h0, w0 = gray.shape
    tables = detector_tables(w0, h0, cascade, interval)
    c = _cascade_np(cascade)
    S = len(np.asarray(cascade["stage_counts"]))
    a_end = min(CHUNK_A_END, S)
    b_end = min(CHUNK_B_END, S)
    cum = np.concatenate([[0], np.cumsum(c["stage_counts"])])

    pyr, spec = build_pyramid(gray, interval)
    next_ = spec.next

    alive_flat = []
    conf_flat = []
    flat_parts = []
    for g in tables.geoms:
        i = g.level
        p0 = pyr[i * 4]
        p1 = pyr[(i + next_) * 4]
        I = _interleave_quarters(pyr[(i + 2 * next_) * 4 + 0],
                                 pyr[(i + 2 * next_) * 4 + 1],
                                 pyr[(i + 2 * next_) * 4 + 2],
                                 pyr[(i + 2 * next_) * 4 + 3])
        alive, conf = _dense_chunk(p0, p1, I, c, g.qh2, g.qw2,
                                   0, int(cum[a_end]),
                                   _stage_ranges(cascade, 0, a_end))
        alive_flat.append(alive.reshape(-1))
        conf_flat.append(conf.reshape(-1))
        flat_parts.extend([p0.reshape(-1), p1.reshape(-1), I.reshape(-1)])

    if not alive_flat:  # image too small for any window
        z = jnp.zeros((k_cand,), jnp.float32)
        return dict(x=z, y=z, width=z, height=z, confidence=z,
                    valid=jnp.zeros((k_cand,), bool), overflow=jnp.int32(0))

    alive_all = jnp.concatenate(alive_flat)
    conf_all = jnp.concatenate(conf_flat)
    flatbuf = jnp.concatenate(flat_parts)

    if a_end < S:
        # Chunk B on first compaction.
        idx1, n1 = compact_indices(alive_all, k1)
        valid1 = idx1 < tables.M
        conf1 = conf_all[jnp.minimum(idx1, tables.M - 1)]
        alive1, conf1 = _gather_chunk(flatbuf, tables, c, idx1, valid1,
                                      int(cum[a_end]), int(cum[b_end]),
                                      _stage_ranges(cascade, a_end, b_end), conf1)
        if b_end < S:
            # Chunk C on second compaction.
            idx2_in1, n2 = compact_indices(alive1, k2)
            valid2 = idx2_in1 < k1
            idx2 = idx1[jnp.minimum(idx2_in1, k1 - 1)]
            conf2 = conf1[jnp.minimum(idx2_in1, k1 - 1)]
            alive2, conf2 = _gather_chunk(flatbuf, tables, c, idx2, valid2,
                                          int(cum[b_end]), int(cum[S]),
                                          _stage_ranges(cascade, b_end, S), conf2)
            fin_idx_src, fin_alive, fin_conf = idx2, alive2, conf2
        else:
            fin_idx_src, fin_alive, fin_conf = idx1, alive1, conf1
    else:
        idx1, n1 = compact_indices(alive_all, k1)
        valid1 = idx1 < tables.M
        fin_idx_src = idx1
        fin_alive = valid1
        fin_conf = conf_all[jnp.minimum(idx1, tables.M - 1)]

    # Final compaction into candidate slots (ascending seq order preserved).
    slot_idx, n_cand = compact_indices(fin_alive, k_cand)
    cvalid = slot_idx < fin_alive.shape[0]
    sel = jnp.minimum(slot_idx, fin_alive.shape[0] - 1)
    widx = fin_idx_src[sel]
    wconf = fin_conf[sel]
    wsafe = jnp.minimum(widx, tables.M - 1)
    return dict(
        x=jnp.asarray(tables.out_x)[wsafe],
        y=jnp.asarray(tables.out_y)[wsafe],
        width=jnp.asarray(tables.out_w)[wsafe],
        height=jnp.asarray(tables.out_h)[wsafe],
        confidence=wconf,
        valid=cvalid,
        overflow=jnp.int32(0),
    )


def detect_objects_padded(gray, cascade, interval=5, min_neighbors=1, k_cand=256):
    """Grouped detections (the equivalent of ccv.detect_objects with
    min_neighbors > 0).  Returns dict of (k_cand,) arrays + kept mask."""
    cand = detect_candidates(gray, cascade, interval, k_cand=k_cand)
    if not min_neighbors > 0:
        return cand
    return group_candidates(cand["x"], cand["y"], cand["width"], cand["height"],
                            cand["confidence"], cand["valid"], min_neighbors)


def detect_best(gray, cascade, interval=5, min_neighbors=1, k_cand=256):
    """The facetrackr candidate pick (src/facetrackr.js:157-165): max confidence,
    first wins ties.  Returns (found, x, y, w, h, confidence)."""
    g = detect_objects_padded(gray, cascade, interval, min_neighbors, k_cand)
    score = jnp.where(g["kept"], g["confidence"], -jnp.inf)
    i = jnp.argmax(score)
    found = jnp.any(g["kept"])
    return (found, g["x"][i], g["y"][i], g["width"][i], g["height"][i],
            g["confidence"][i])
