"""TrackerConfig.bandHist: band-local current histograms (PARITY deviation 13).

The ratio weights min(model/cur, 1) read cur counts (src/camshift.js:268,
314-330).  bandHist counts them over the band instead of the full frame:
EXACT whenever every model-colored pixel lies inside the band (cur counts
for every bin the band pdf reads are then identical), weights inflate
toward 1 when background shares model bins, and zero-mass loss semantics
are unchanged (bins absent from the band are never read by the band pdf).
"""

import jax
import jax.numpy as jnp
import numpy as np

from headtrackr_tpu.cascade import toy_cascade
from headtrackr_tpu.config import TrackerConfig
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.models import facetracker as ft
from headtrackr_tpu.runtime.serving import make_batched_steps

H, W = 120, 160
BAND = (64, 96)


def _blob_frame(cx, cy, extra=None):
    f = np.full((H, W, 3), 40, np.uint8)
    f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    if extra is not None:
        ex, ey = extra
        f[ey - 8:ey + 8, ex - 8:ex + 8] = (230, 80, 60)  # same model color
    return f


def test_track_band_hist_exact_when_band_contains_model_pixels():
    frame = jnp.asarray(_blob_frame(60, 50))
    st = mc.init_tracker(frame, jnp.asarray([48, 38, 24, 24], jnp.int32))
    full = jax.jit(lambda s, f: mc.track_band(s, f, band=BAND))
    bh = jax.jit(lambda s, f: mc.track_band(s, f, band=BAND, band_hist=True))
    s1, e1 = full(st, frame)
    s2, e2 = bh(st, frame)
    assert not bool(e1) and not bool(e2)
    for name, a, b in zip(s1._fields, s1, s2):
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"state {name}")


def test_serving_band_hist_keeps_loss_semantics_and_tracks():
    """Full serving scan on a clip with a mid-clip blue loss frame.  The toy
    cascade's handoff rect includes a BACKGROUND ring, so this clip's model
    carries bg bins and bandHist weights legitimately differ (the documented
    deviation — windows inflate a few px; the REAL cascade's synthface rect
    has no bg bins and is bit-exact, measured r4: 101/101 vs the oracle on
    the realistic conformance clip).  What must hold here: the
    loss -> redetect -> relock transition fires on the same ticks as the
    reference-exact path and tracking stays on the blob throughout."""
    clip = np.stack([
        np.stack([_blob_frame(60 + (t % 5), 50),
                  _blob_frame(100, 70)])
        for t in range(28)])  # (T, 2, H, W, 3)
    blue = np.zeros((H, W, 3), np.uint8)
    blue[..., 2] = 250
    clip[22, 1] = blue  # stream 1 loses track at t=22 (visible at t=23:
                        # the zero-mass tick itself still reports CS w=0)

    outs = {}
    for bh in (False, True):
        # bandHistAudit=False: this test pins the RAW deviation without
        # the audit machinery in the way (the toy model carries bg bins, so
        # the audit would flag these streams — and under the "escape"
        # action route them to the exact fallback, hiding the inflation
        # being bounded here; audited behavior is tests/test_band_audit.py)
        cfg = TrackerConfig(smoothing=False, headPosition=False, bandHist=bh,
                            bandHistAudit=False)
        _, _, _, _, step_scan = make_batched_steps(
            toy_cascade(), cfg, (H, W), bucket=1, band=BAND, donate=False)
        s1 = ft.init_state(cfg.whitebalancing, 0)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(), s1)
        _, out = step_scan(state, jnp.asarray(clip))
        outs[bh] = out

    det_f = np.asarray(outs[False].detection)
    det_b = np.asarray(outs[True].detection)
    np.testing.assert_array_equal(det_b, det_f)  # same mode sequence
    assert (det_b[21] == 2).all()            # both tracking before the loss
    assert np.asarray(outs[True].face_w)[22, 1] == 0  # zero-mass tick
    assert det_b[23, 1] == 1                 # redetect fired
    assert det_b[-1, 1] == 2                 # relocked by clip end
    # windows track the same blobs (bg-bin weight inflation bounded)
    for field in ("face_x", "face_y"):
        a = np.asarray(getattr(outs[False], field))
        b = np.asarray(getattr(outs[True], field))
        cs = (det_f == 2) & (det_b == 2)
        assert np.abs(a[cs] - b[cs]).max() <= 4


def test_band_hist_with_aliasing_background_still_tracks():
    """A same-colored distractor OUTSIDE the band: full-frame weights shrink
    (cur grows), band weights don't — outputs may differ (the documented
    deviation) but both paths must keep tracking the true blob."""
    frames = [jnp.asarray(_blob_frame(60 + (t % 4), 50, extra=(140, 100)))
              for t in range(12)]
    st = mc.init_tracker(frames[0], jnp.asarray([48, 38, 24, 24], jnp.int32))
    full = jax.jit(lambda s, f: mc.track_band(s, f, band=BAND))
    bh = jax.jit(lambda s, f: mc.track_band(s, f, band=BAND, band_hist=True))
    sa = sb = st
    for f in frames[1:]:
        sa, ea = full(sa, f)
        sb, eb = bh(sb, f)
        assert not bool(ea) and not bool(eb)
    for s in (sa, sb):
        assert abs(int(s.track_x) - 62) <= 6
        assert abs(int(s.track_y) - 50) <= 6
        assert int(s.track_w) > 0
