"""Histogram / backprojection ops for the camshift tracker — MXU formulation.

Reference math:
  - 4096-bin RGB histogram, bin = 256*(r>>4) + 16*(g>>4) + (b>>4)  (src/camshift.js:62-66)
  - ratio weights  min(model/cur, 1), 0 where cur == 0              (src/camshift.js:314-330)
  - backprojection pdf[p] = weights[bin(p)]                          (src/camshift.js:332-353)

TPU-first design: scatter/gather are slow on TPU, but the 4096-bin space
factorizes as 64*hi + lo, so

    hist(64, 64) = OneHot(hi)^T  @  OneHot(lo)        -- one MXU matmul
    pdf          = rowsum( (OneHot(hi) @ W) * OneHot(lo) ),  W = weights(64, 64)

Counts are exact (f32 accumulation of 0/1 products up to 2^24); pdf is computed
in f32 so weights keep full precision.  Exactness vs the NumPy oracle is
asserted in tests/test_camshift.py.

TPU precision note (measured on v5e, see docs/PERFORMANCE.md):
  - DEFAULT matmul precision is ONE bf16 pass: it rounds the weight matrix to
    8 mantissa bits inside the selection matmul (pdf off by 3.4e-3 relative).
  - Precision.HIGH (bf16x3) keeps only the top-3 cross products a1b1, a1b2,
    a2b1 — for a one-hot lhs (a = (1,0,0)) the b3 term is LOST, still 1e-5 off.
  - Precision.HIGHEST (bf16x6) includes a1b3: EXACT f32 selection for a 0/1
    lhs, verified bit-exact on-chip, at ~53% extra pdf-pass cost.
  - Any reformulation that gives the one-hot operand a second consumer or a
    wider rhs (weight splits, concatenated rhs) breaks XLA's compare-into-dot
    fusion and materializes ~0.5 GB/step of one-hots — measured 5x slower.
    Keep these dots single-consumer, 64-wide.
The exact=... parameters select DEFAULT (serving) vs HIGHEST (conformance,
TrackerConfig.exactCamshift).  Integer one-hot products (the int8 histogram)
are exact at any precision.  split_bf16_3 remains for the Pallas kernels,
where genuine-bf16 operands are native.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_bins", "histogram_4096", "histogram_rect",
           "backprojection_weights", "backprojection_pdf",
           "histogram_and_pdf", "histogram_scan", "pdf_scan",
           "sparse_model_topk", "sparse_hist_counts", "sparse_pdf_scan",
           "split_bf16_3"]

NBINS = 4096
_HI = 64
_LO = 64


def split_bf16_3(w, as_f32=False):
    """Exact triple bf16 split of normal f32: w == w1 + w2 + w3 (f32 sums).

    Implemented by BIT-MASKING the top 16 bits (truncation split), not by
    arithmetic round-trips: XLA:TPU's excess-precision simplification legally
    removes f32->bf16->f32 round-trips, which silently zeroes the residuals of
    the textbook ``w - bf16(w)`` split (measured on-chip: reconstruction error
    collapsed to one bf16 ulp of w).  A masked f32 is exactly representable in
    bf16, so the final casts lose nothing and cannot be simplified away.

    as_f32=True returns the pieces as f32 arrays whose values sit exactly on
    the bf16 grid: a DEFAULT-precision (one-bf16-pass) TPU matmul converts
    such operands losslessly, so f32-layout dots against them are exact —
    and ~5x faster than genuine-bf16 operands here, whose compare->bf16
    relayout was measured at +30 ms/tick at 256 streams."""
    mask = jnp.uint32(0xFFFF0000)

    def trunc(x):
        b = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(b & mask, jnp.float32)

    w1f = trunc(w)
    r1 = w - w1f               # exact (Sterbenz-adjacent: <= 16 mantissa bits)
    w2f = trunc(r1)
    r2 = r1 - w2f              # exact, <= 8 significant bits
    if as_f32:
        return w1f, w2f, r2
    return (w1f.astype(jnp.bfloat16), w2f.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def rgb_bins(rgb):
    """(..., H, W, 3) u8 -> (..., H, W) i32 bin indices."""
    r = (rgb[..., 0].astype(jnp.int32) >> 4)
    g = (rgb[..., 1].astype(jnp.int32) >> 4)
    b = (rgb[..., 2].astype(jnp.int32) >> 4)
    return 256 * r + 16 * g + b


def _one_hots(bins, mask=None, dtype=jnp.float32):
    """(P,) i32 -> two (P, 64) one-hot factors (optionally row-masked)."""
    flat = bins.reshape(-1)
    hi = (flat >> 6)[:, None]
    lo = (flat & 63)[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, _HI), 1)
    oh_hi = (hi == iota)
    oh_lo = (lo == iota)
    if mask is not None:
        m = mask.reshape(-1)[:, None]
        oh_hi = oh_hi & m
    return oh_hi.astype(dtype), oh_lo.astype(dtype)


def histogram_4096(bins, mask=None):
    """(H, W) i32 bin indices -> (4096,) f32 counts (exact)."""
    oh_hi, oh_lo = _one_hots(bins, mask, dtype=jnp.int8)
    hist = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # (64, 64)
    return hist.reshape(NBINS).astype(jnp.float32)


def histogram_rect(bins, x, y, w, h, block=None):
    """Histogram of the rect [x, x+w) x [y, y+h) only (traced rect).

    Equivalent of Histogram(getImageData(tax, tay, taw, tah)) at
    src/camshift.js:206-208.  Blocked like histogram_scan: the unblocked
    form materializes a (P, 64) one-hot per stream under vmap (~1.3 GB at
    256 streams — measured as the dominant cost of a full-batch detect
    tick's VJ->CS handoff)."""
    H, W = bins.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((rows >= y) & (rows < y + h) & (cols >= x) & (cols < x + w))
    flat = bins.reshape(-1)
    block = block or _pick_block(flat.shape[0])
    blocks = _blocked(flat, block)
    mblocks = _blocked(jnp.where(inside.reshape(-1), 1, 0), block) > 0

    def body(acc, xs):
        blk, mb = xs
        oh_hi, oh_lo = _one_hots(blk, mb, dtype=jnp.int8)
        h_ = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        return acc + h_, None

    hist64, _ = jax.lax.scan(body, jnp.zeros((_HI, _LO), jnp.int32),
                             (blocks, mblocks))
    return hist64.reshape(NBINS).astype(jnp.float32)


def backprojection_weights(model_hist, cur_hist):
    """min(model/cur, 1) with 0 where cur == 0."""
    safe = jnp.where(cur_hist != 0, cur_hist, 1.0)
    return jnp.where(cur_hist != 0, jnp.minimum(model_hist / safe, 1.0), 0.0)


def _pdf_rows(flat, Wm, exact):
    """(P,) i32 bins + (64, 64) f32 weights -> (P,) weight lookup.

    ONE dot, fusion-critical: a second consumer of the one-hot operand (or a
    wider rhs) stops XLA fusing the compare into the matmul and materializes
    ~0.5 GB/scan-step of one-hots to HBM — measured 5x slowdowns for every
    split/concat variant.  exact=True keeps that single-dot shape and raises
    the dot to Precision.HIGHEST (bf16x6 includes the a1*b3 term, so a
    one-hot lhs selects the full-f32 weight bit-exactly; +53%% pdf-pass cost,
    measured).  exact=False is the serving default: DEFAULT precision rounds
    the weights to bf16 inside the dot (documented deviation,
    docs/PARITY.md)."""
    oh_hi, oh_lo = _one_hots(flat)
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    rows = jnp.dot(oh_hi, Wm, preferred_element_type=jnp.float32,
                   precision=prec)
    return jnp.sum(rows * oh_lo, axis=1)


def backprojection_pdf(bins, weights, exact=True):
    """(H, W) i32, (4096,) f32 -> (H, W) f32 per-pixel probability (MXU).

    exact=True (default here — this is the conformance-facing API): the
    lookup returns the full-f32 weight on every backend."""
    pdf = _pdf_rows(bins.reshape(-1), weights.reshape(_HI, _LO), exact)
    return pdf.reshape(bins.shape)


def _pick_block(P, cap=16384):
    """Largest 128-multiple exact divisor of P up to ``cap`` (else 8192).

    Padding the pixel axis is pure waste in the scan (measured on v5e at
    256 streams: block 8192 pads 320x240's 76,800 px by 6.7% and costs
    6.5 ms/tick; any exact divisor in 6400..15360 runs 5.5-5.8 ms/tick —
    docs/PERFORMANCE.md).  320x240 -> 15360, 640x480 -> 15360,
    160x120 -> 9600.  r3 note: an isolated track-step microbench favored
    ONE 76,800 block (3.7 vs 5.2 ms/tick), but a same-process interleaved
    A/B of the REAL serving scan program (tools/exp_scan_ab.py) measured
    15,360 FASTER there (7.8 vs 8.4 ms/tick under a noisy tunnel) — the
    smaller blocks overlap better with the rest of the tick.  The default
    stays 15360; TrackerConfig.histBlock overrides per deployment."""
    if P % 128 == 0:
        kmax = cap // 128
        for k in range(min(kmax, P // 128), 0, -1):
            if (P // 128) % k == 0:
                return 128 * k
    return 8192


def _blocked(flat, block):
    """(P,) i32 -> (nb, block) with -1 padding (never matches the iota)."""
    P = flat.shape[0]
    nb = -(-P // block)
    pad = nb * block - P
    return jnp.pad(flat, (0, pad), constant_values=-1).reshape(nb, block)


def histogram_scan(bins, block=None):
    """Full-frame 4096-bin histogram via the blocked int8 one-hot MXU scan
    (exact counts; the hist half of histogram_and_pdf)."""
    flat = bins.reshape(-1)
    blocks = _blocked(flat, block or _pick_block(flat.shape[0]))

    def body(acc, blk):
        oh_hi, oh_lo = _one_hots(blk, dtype=jnp.int8)
        h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + h, None

    hist64, _ = jax.lax.scan(body, jnp.zeros((_HI, _LO), jnp.int32), blocks)
    return hist64.reshape(NBINS).astype(jnp.float32)


def pdf_scan(bins, weights, block=None, exact=False):
    """(..., ) i32 bins + (4096,) f32 weights -> same-shape f32 pdf, computed
    in fusion-friendly blocks (the pdf half of histogram_and_pdf; used by the
    band-local camshift path where the histogram covers the full frame but
    the lookup only a window region)."""
    shape = bins.shape
    flat = bins.reshape(-1)
    P = flat.shape[0]
    blocks = _blocked(flat, block or _pick_block(P))
    Wm = weights.reshape(_HI, _LO)

    def body(_, blk):
        return None, _pdf_rows(blk, Wm, exact)

    _, pdf = jax.lax.scan(body, None, blocks)
    return pdf.reshape(-1)[:P].reshape(shape)


def sparse_model_topk(model_hist, k):
    """(4096,) f32 model histogram -> (bins (k,) i32, counts (k,) f32,
    overflow bool): the k largest-count bins and whether any nonzero bin was
    left out.

    The camshift ratio weights min(model/cur, 1) are ZERO wherever the model
    count is zero (src/camshift.js:314-330), so when the model has <= k
    distinct bins, backprojection only needs current-frame counts for these k
    — the basis of the sparse path (TrackerConfig.sparseHist).  Padded
    entries carry count 0 and therefore weight 0: harmless whichever bin id
    top_k assigned them.  overflow=True marks a model this k cannot
    represent; the serving runtime routes such streams through the
    full-frame fallback (exact, slower)."""
    counts, bins = jax.lax.top_k(model_hist, k)
    overflow = jnp.sum(model_hist != 0) > k
    return bins.astype(jnp.int32), counts, overflow


def sparse_hist_counts(bins, model_bins, block=None):
    """Full-frame EXACT counts of the K model bins only.

    (H, W) i32 bin indices + (K,) i32 bin ids -> (K,) f32 counts, equal to
    histogram_scan(bins)[model_bins].  One K-lane i8 compare per pixel (vs
    the 128 lanes of the two-factor formulation) with the pixel reduction on
    the MXU via a ones-vector dot — single consumer of the one-hot, same
    fusion shape as the histogram scan."""
    flat = bins.reshape(-1)
    blocks = _blocked(flat, block or _pick_block(flat.shape[0]))
    K = model_bins.shape[0]
    ones = jnp.ones((1, blocks.shape[1]), jnp.int8)

    def body(acc, blk):
        oh = (blk[:, None] == model_bins[None, :]).astype(jnp.int8)
        c = jax.lax.dot_general(ones, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + c[0], None

    counts, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.int32), blocks)
    return counts.astype(jnp.float32)


def sparse_pdf_scan(bins, model_bins, weights_k, block=None, exact=False):
    """Backprojection lookup against a sparse (K,) weight table.

    pdf[p] = weights_k[j] where model_bins[j] == bins[p], else 0 — equal to
    the dense lookup because absent bins have zero weight.  Each pixel
    matches at most one lane (top_k ids are distinct), so the row dot has a
    single nonzero term.  exact follows the dense-path precision contract
    (DEFAULT bf16-rounds the weights inside the dot; HIGHEST is the
    bit-exact conformance mode)."""
    shape = bins.shape
    flat = bins.reshape(-1)
    P = flat.shape[0]
    blocks = _blocked(flat, block or _pick_block(P))
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT

    def body(_, blk):
        oh = (blk[:, None] == model_bins[None, :]).astype(jnp.float32)
        return None, jnp.dot(oh, weights_k, precision=prec,
                             preferred_element_type=jnp.float32)

    _, pdf = jax.lax.scan(body, None, blocks)
    return pdf.reshape(-1)[:P].reshape(shape)


def histogram_and_pdf(bins, model_hist, block=None, exact=False):
    """Fused current-histogram + ratio weights + backprojection.

    Pixel axis is scanned in blocks so the transient one-hot factors stay
    ~block x 64 (a full-frame one-hot is ~40 MB/stream and OOMs HBM at serving
    batch sizes); block=None picks the largest exact-divisor block (padding
    measurably slows the scan).  Returns (cur_hist (4096,), pdf (H, W)).

    exact: pdf is the full-f32 weight lookup on TPU too (conformance mode,
    TrackerConfig.exactCamshift); default trades bf16-rounded weights for
    ~35%% camshift throughput (counts are exact either way)."""
    shape = bins.shape
    flat = bins.reshape(-1)
    P = flat.shape[0]
    if block is None:
        block = _pick_block(P)
    nb = -(-P // block)
    pad = nb * block - P
    flat_p = jnp.pad(flat, (0, pad), constant_values=-1)  # -1 never matches iota
    blocks = flat_p.reshape(nb, block)

    def hist_body(acc, blk):
        # int8 one-hots -> int32 MXU accumulation: exact counts, 2x bf16 rate
        oh_hi, oh_lo = _one_hots(blk, dtype=jnp.int8)
        h = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + h, None

    hist64, _ = jax.lax.scan(hist_body, jnp.zeros((_HI, _LO), jnp.int32),
                             blocks)
    cur = hist64.reshape(NBINS).astype(jnp.float32)
    weights = backprojection_weights(model_hist, cur)
    Wm = weights.reshape(_HI, _LO)

    def pdf_body(_, blk):
        return None, _pdf_rows(blk, Wm, exact)

    _, pdf = jax.lax.scan(pdf_body, None, blocks)
    return cur, pdf.reshape(-1)[:P].reshape(shape)
