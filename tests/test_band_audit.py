"""bandHist production safety net (PARITY deviation 13, r5).

bandHist is exact only when every model-colored pixel lies inside the
serving band — a CONTENT condition.  The safety net audits it instead of
assuming it:

  (a) handoff audit (TrackerConfig.bandHistAudit, default on): at VJ->CS
      handoff, test on device whether any model-bin pixel lies outside the
      band (camshift.handoff_band_audit) and stamp a per-stream band_dirty
      flag.  The flag's ACTION is TrackerConfig.bandHistAuditAction:
      "flag" (default) leaves it as telemetry (the condition is necessary,
      not sufficient — false positives are the common case on multi-bin
      models); "escape" serves dirty streams by the reference-exact
      full-frame fallback every tick until a clean relock.
  (b) periodic cross-check: BatchedTracker.band_hist_divergence recomputes
      one sampled stream's current histogram both ways and reports the
      weight inflation the band pdf would see.

The toy cascade is the natural CONTAMINATED fixture: its handoff rect
includes a background ring, so the model genuinely carries bg bins (the
exact content class the deviation documents).  The clean fixture feeds a
synthetic rect that contains only blob pixels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import headtrackr_tpu as ht
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.models import facetracker as ftm
from headtrackr_tpu.ops.histogram import rgb_bins

H, W = 120, 160
BAND = (64, 96)


def _blob_frame(cx=60, cy=50):
    f = np.full((H, W, 3), 40, np.uint8)
    f[cy - 12:cy + 12, cx - 12:cx + 12] = (230, 80, 60)
    return f


def test_handoff_band_audit_clean_vs_contaminated():
    """Models-level truth table: a model whose pixels all sit inside the
    band audits clean; one model-colored pixel outside the band flips it."""
    frame = jnp.asarray(_blob_frame())
    bins = rgb_bins(frame)
    rect = jnp.asarray([50, 40, 20, 20], jnp.int32)  # strictly inside blob
    from headtrackr_tpu.ops.histogram import histogram_rect
    model = histogram_rect(bins, rect[0], rect[1], rect[2], rect[3])
    assert int((np.asarray(model) != 0).sum()) == 1  # pure blob bins
    assert not bool(mc.handoff_band_audit(bins, model, rect, BAND))
    # paint ONE blob-colored pixel far outside the band
    dirty_frame = _blob_frame()
    dirty_frame[5, 150] = (230, 80, 60)
    assert bool(mc.handoff_band_audit(rgb_bins(jnp.asarray(dirty_frame)),
                                      model, rect, BAND))
    # a rect that includes the bg ring makes the bg bin a model bin ->
    # contaminated even on the unmodified frame (the toy-cascade class)
    rect_bg = jnp.asarray([44, 34, 32, 32], jnp.int32)
    model_bg = histogram_rect(bins, rect_bg[0], rect_bg[1],
                              rect_bg[2], rect_bg[3])
    assert int((np.asarray(model_bg) != 0).sum()) == 2
    assert bool(mc.handoff_band_audit(bins, model_bg, rect_bg, BAND))


def test_audited_serving_matches_exact_path():
    """A contaminated handoff (toy cascade: model carries bg bins) under the
    audit's "escape" action must (1) flag band_dirty, (2) surface in
    escaped telemetry, and (3) produce bit-identical windows to the
    reference-exact bandHist=False tracker — the fallback doing its job."""
    frames_seq = [np.stack([_blob_frame(60 + (t % 5), 50),
                            _blob_frame(100, 70)]) for t in range(24)]
    mk = lambda bh: ht.BatchedTracker(
        2, frame_shape=(H, W), cascade=ht.toy_cascade(), bucket=1,
        band=BAND, bandHist=bh, bandHistAuditAction="escape",
        smoothing=False, headPosition=False)
    bt_a, bt_x = mk(True), mk(False)
    assert bt_a._band_audit and bt_x.state.cs.band_dirty is None
    for t, f in enumerate(frames_seq):
        out_a = bt_a.step_auto(f)
        out_x = bt_x.step_auto(f)
        for name, a, b in zip(out_a._fields, out_a, out_x):
            if name == "escaped":
                continue  # differs by design (the audit telemetry)
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"tick {t} field {name}")
    assert bt_a.modes.tolist() == [ftm.MODE_CS] * 2
    assert np.asarray(bt_a.state.cs.band_dirty).all()
    assert np.asarray(out_a.escaped).all()       # permanent exact fallback
    assert not np.asarray(out_x.escaped).any()   # plain band path: no audit


def test_flag_action_is_telemetry_only():
    """The DEFAULT audit action ("flag"): contaminated handoffs stamp
    band_dirty but serving stays on the band-local path — no escapes, and
    every output is bit-identical to an audit-OFF tracker (the flag must
    not perturb results; it is pure telemetry read via stream_info)."""
    frames_seq = [np.stack([_blob_frame(60 + (t % 5), 50),
                            _blob_frame(100, 70)]) for t in range(24)]
    mk = lambda audit: ht.BatchedTracker(
        2, frame_shape=(H, W), cascade=ht.toy_cascade(), bucket=1,
        band=BAND, bandHist=True, bandHistAudit=audit,
        smoothing=False, headPosition=False)
    bt_f, bt_off = mk(True), mk(False)
    assert bt_f.config.bandHistAuditAction == "flag"  # the default
    for t, f in enumerate(frames_seq):
        out_f = bt_f.step_auto(f)
        out_off = bt_off.step_auto(f)
        for name, a, b in zip(out_f._fields, out_f, out_off):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"tick {t} field {name}")
    assert bt_f.modes.tolist() == [ftm.MODE_CS] * 2
    assert np.asarray(bt_f.state.cs.band_dirty).all()   # telemetry present
    assert not np.asarray(out_f.escaped).any()          # ...but no fallback
    # stream_info is the deployment-facing read of the flag
    info = bt_f.stream_info(0)
    assert info["mode"] == "cs" and info["band_dirty"] is True
    assert info["model_bins"] >= 2 and len(info["window"]) == 4
    assert bt_off.stream_info(1)["band_dirty"] is None  # audit off


def test_audit_action_validated():
    with pytest.raises(ValueError, match="bandHistAuditAction"):
        ht.BatchedTracker(2, frame_shape=(H, W), cascade=ht.toy_cascade(),
                          bucket=1, band=BAND, bandHist=True,
                          bandHistAuditAction="bogus",
                          smoothing=False, headPosition=False)


def test_audit_off_keeps_approximate_path():
    """bandHistAudit=False restores the r4 behavior: no band_dirty leaf, no
    escapes, approximate windows (bounded by tests/test_band_hist.py)."""
    bt = ht.BatchedTracker(2, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           bucket=1, band=BAND, bandHist=True,
                           bandHistAudit=False,
                           smoothing=False, headPosition=False)
    assert bt.state.cs.band_dirty is None
    f = np.stack([_blob_frame(), _blob_frame(100, 70)])
    for _ in range(18):
        out = bt.step_auto(f)
    assert bt.modes.tolist() == [ftm.MODE_CS] * 2
    assert not np.asarray(out.escaped).any()


def test_band_hist_divergence_reports_inflation():
    """The periodic cross-check must report nonzero inflation on the
    contaminated toy content and refuse to run without an active band."""
    bt = ht.BatchedTracker(2, frame_shape=(H, W), cascade=ht.toy_cascade(),
                           bucket=1, band=BAND, bandHist=True,
                           smoothing=False, headPosition=False)
    f = np.stack([_blob_frame(), _blob_frame(100, 70)])
    for _ in range(18):
        bt.step_auto(f)
    d = bt.band_hist_divergence(f, stream=0)
    assert d["band_dirty"] is True
    assert d["contaminated_bins"] >= 1
    assert d["max_inflation"] > 0.01
    assert d["model_bins"] >= 2
    # no band path -> hard error, not a silent zero
    bt2 = ht.BatchedTracker(2, frame_shape=(H, W), cascade=ht.toy_cascade(),
                            band=None)
    with pytest.raises(ValueError, match="band"):
        bt2.band_hist_divergence(f)


def test_checkpoint_band_dirty_defaults_conservative(tmp_path):
    """A pre-audit checkpoint (no band_dirty leaf) resumed into an audited
    config defaults every stream to DIRTY — exact serving until relock."""
    from headtrackr_tpu.runtime import checkpoint as ckpt
    mk = lambda **kw: ht.BatchedTracker(
        2, frame_shape=(H, W), cascade=ht.toy_cascade(), bucket=1,
        band=BAND, smoothing=False, headPosition=False, **kw)
    bt_old = mk(bandHist=False)  # no audit leaf in its schema
    f = np.stack([_blob_frame(), _blob_frame(100, 70)])
    for _ in range(18):
        bt_old.step_auto(f)
    path = str(tmp_path / "old.npz")
    ckpt.save_tracker(path, bt_old)
    bt_new = mk(bandHist=True, bandHistAuditAction="escape")  # audited schema
    ckpt.load_tracker(path, bt_new)
    assert np.asarray(bt_new.state.cs.band_dirty).all()
    out = bt_new.step_auto(f)
    assert np.asarray(out.escaped).all()  # served exact from the first tick


def test_external_state_builder_schema_rule():
    """Regression (r5 chip-gate failure): an EXTERNAL state builder (the
    verify_chip wiring — make_batched_steps + ft.init_state, no
    BatchedTracker) must derive the audit flag via
    serving.wants_band_audit, or the VJ->CS handoff tree_map hits a
    None/array leaf mismatch at trace time.  Runs the exact failing
    combination: bandHist=True, audit default ON, scan through a handoff."""
    from headtrackr_tpu.runtime.serving import (make_batched_steps,
                                                resolve_band,
                                                wants_band_audit)
    from headtrackr_tpu.config import TrackerConfig
    cfg = TrackerConfig(smoothing=False, headPosition=False, bandHist=True)
    band = resolve_band(BAND, (H, W))
    assert wants_band_audit(cfg, band)  # audit defaults ON with a band
    _, _, _, _, step_scan = make_batched_steps(
        ht.toy_cascade(), cfg, (H, W), bucket=1, band=BAND, donate=False)
    s1 = ftm.init_state(cfg.whitebalancing, 0,
                        band_audit=wants_band_audit(cfg, band))
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(), s1)
    clip = jnp.asarray(np.stack(
        [np.stack([_blob_frame(), _blob_frame(100, 70)])] * 20))
    st, out = step_scan(state, clip)   # traces the handoff: must not raise
    assert (np.asarray(out.detection)[-1] == 2).all()  # locked by clip end
    assert np.asarray(st.cs.band_dirty).shape == (2,)
