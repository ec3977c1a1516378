"""Camshift golden tests: histogram/backprojection/moments/mean-shift vs oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headtrackr_tpu.oracle.camshift import CamshiftTracker, Histogram, Moments
from headtrackr_tpu.models import camshift as mc
from headtrackr_tpu.ops import histogram as oh


def _blob_frame(rng, H, W, cx, cy):
    f = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
    y0, y1 = max(0, cy - 8), min(H, cy + 8)
    x0, x1 = max(0, cx - 6), min(W, cx + 6)
    f[y0:y1, x0:x1, 0] = 200 + rng.integers(0, 30, (y1 - y0, x1 - x0))
    f[y0:y1, x0:x1, 1] = 80
    f[y0:y1, x0:x1, 2] = 60
    return f


def test_histogram_exact(rng):
    f = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    want = Histogram(f)
    got = np.asarray(jax.jit(
        lambda x: oh.histogram_4096(oh.rgb_bins(x)))(jnp.asarray(f)))
    np.testing.assert_array_equal(got, want)


def test_histogram_rect_exact(rng):
    f = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    x, y, w, h = 5, 7, 12, 9
    want = Histogram(f[y:y + h, x:x + w])
    got = np.asarray(jax.jit(lambda im: oh.histogram_rect(
        oh.rgb_bins(im), x, y, w, h))(jnp.asarray(f)))
    np.testing.assert_array_equal(got, want)


def test_backprojection_weights_exact(rng):
    m = rng.integers(0, 50, 4096).astype(np.float64)
    c = rng.integers(0, 50, 4096).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        want = np.where(c != 0, np.minimum(m / c, 1.0), 0.0)
    got = np.asarray(oh.backprojection_weights(
        jnp.asarray(m, jnp.float32), jnp.asarray(c, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_moments_window_semantics(rng):
    """The w/h args of Moments are exclusive upper bounds (src/camshift.js:90-94)."""
    pdf = rng.random((20, 30))
    m = Moments(pdf, 4, 3, 15, 11, True)
    win = pdf[3:11, 4:15]
    assert np.isclose(m["m00"], win.sum())
    vy, vx = np.mgrid[0:8, 0:11]
    assert np.isclose(m["m10"], (vx * win).sum())
    assert np.isclose(m["mu11"], (vx * vy * win).sum() - m["m01"] * m["xc"])


def test_track_parity_20_frames(rng):
    H, W = 60, 80
    frames = [_blob_frame(rng, H, W, 30 + t, 25 + t // 2) for t in range(20)]
    rect = (24, 17, 12, 16)
    o = CamshiftTracker(calc_angles=True)
    o.init_tracker(frames[0], rect)
    st = mc.init_tracker(jnp.asarray(frames[0]), jnp.asarray(rect, jnp.int32))
    np.testing.assert_array_equal(np.asarray(st.model_hist), o.model_hist)

    step = jax.jit(lambda s, f: mc.track(s, f, True))
    for t, f in enumerate(frames[1:], 1):
        ro = o.track(f)
        st, _ = step(st, jnp.asarray(f))
        collapse = ro["width"] == 0 or ro["height"] == 0
        if not collapse:
            assert int(st.track_x) == ro["x"], t
            assert int(st.track_y) == ro["y"], t
            assert int(st.track_w) == ro["width"], t
            assert int(st.track_h) == ro["height"], t
            assert np.asarray(st.window).tolist() == list(o.search_window), t
        else:
            # Collapse-to-loss frames: the centroid is exactly integral when
            # window mass concentrates on one column/row, and the reference's
            # own `>> 0` sits on a 1-ulp f64 knife edge there (docs/PARITY.md
            # "Exactly-integral centroid tie").  The loss decision must be
            # exact; the cosmetic center may differ by 1 px.
            assert int(st.track_w) == ro["width"], t
            assert int(st.track_h) == ro["height"], t
            assert abs(int(st.track_x) - ro["x"]) <= 1, t
            assert abs(int(st.track_y) - ro["y"]) <= 1, t
        if ro["width"] > 0 and ro["height"] > 0:
            # angle is only meaningful on non-degenerate frames; a collapsed
            # window makes atan2 arguments knife-edge float cases (and the
            # pipeline treats the frame as track-lost regardless)
            if np.isnan(ro["angle"]):
                assert np.isnan(float(st.track_angle))
            else:
                assert abs(float(st.track_angle) - ro["angle"]) < 1e-4


def test_zero_mass_loss_semantics(rng):
    """Zero backprojection mass => 0-size box (NaN << 2 in JS), window frozen."""
    H, W = 60, 80
    f0 = _blob_frame(rng, H, W, 30, 25)
    rect = (24, 17, 12, 16)
    o = CamshiftTracker()
    o.init_tracker(f0, rect)
    st = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    blue = np.zeros((H, W, 3), np.uint8)
    blue[..., 2] = 250
    ro = o.track(blue)
    st, _ = jax.jit(lambda s, f: mc.track(s, f, True))(st, jnp.asarray(blue))
    assert ro["width"] == 0 and ro["height"] == 0
    assert int(st.track_w) == 0 and int(st.track_h) == 0
    assert int(st.track_x) == ro["x"] and int(st.track_y) == ro["y"]
    assert np.isnan(ro["angle"]) and np.isnan(float(st.track_angle))


def test_calc_angles_false(rng):
    H, W = 60, 80
    f0 = _blob_frame(rng, H, W, 30, 25)
    rect = (24, 17, 12, 16)
    o = CamshiftTracker(calc_angles=False)
    o.init_tracker(f0, rect)
    st = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    f1 = _blob_frame(rng, H, W, 32, 26)
    ro = o.track(f1)
    st, _ = jax.jit(lambda s, f: mc.track(s, f, False))(st, jnp.asarray(f1))
    assert int(st.track_w) == ro["width"]
    assert int(st.track_h) == ro["height"]
    assert abs(float(st.track_angle) - np.pi / 2) < 1e-6


def test_exact_flag_identical_on_cpu(rng):
    """exactCamshift only raises TPU matmul precision; on CPU both modes must
    be bit-identical (golden tests therefore cover both by construction)."""
    H, W = 60, 80
    f0 = _blob_frame(rng, H, W, 30, 25)
    rect = (24, 17, 12, 16)
    st_f = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    st_e = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    fast = jax.jit(lambda s, f: mc.track(s, f, True, exact=False))
    prec = jax.jit(lambda s, f: mc.track(s, f, True, exact=True))
    for t in range(8):
        f1 = _blob_frame(rng, H, W, 30 + t, 25)
        st_f, pdf_f = fast(st_f, jnp.asarray(f1))
        st_e, pdf_e = prec(st_e, jnp.asarray(f1))
        np.testing.assert_array_equal(np.asarray(pdf_f), np.asarray(pdf_e))
        for a, b in zip(jax.tree_util.tree_leaves(st_f),
                        jax.tree_util.tree_leaves(st_e)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meanshift_unroll_identical(rng):
    """MEANSHIFT_UNROLL statically expands the 10-trip fori_loop (perf knob
    for the chip, tools/exp_unroll_ab.py); results must be bit-identical."""
    H, W = 60, 80
    f0 = _blob_frame(rng, H, W, 30, 25)
    rect = (24, 17, 12, 16)
    st_l = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    st_u = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    # jit traces lazily — force each arm's trace while its flag value is set
    loop = jax.jit(lambda s, f: mc.track(s, f, True))
    loop(st_l, jnp.asarray(f0))  # trace now, with MEANSHIFT_UNROLL=False
    mc.MEANSHIFT_UNROLL = True
    try:
        unrolled = jax.jit(lambda s, f: mc.track(s, f, True))
        unrolled(st_u, jnp.asarray(f0))  # trace with MEANSHIFT_UNROLL=True
        for t in range(6):
            f1 = _blob_frame(rng, H, W, 30 + t, 25 + t)
            st_l, pdf_l = loop(st_l, jnp.asarray(f1))
            st_u, pdf_u = unrolled(st_u, jnp.asarray(f1))
            np.testing.assert_array_equal(np.asarray(pdf_l), np.asarray(pdf_u))
            for a, b in zip(jax.tree_util.tree_leaves(st_l),
                            jax.tree_util.tree_leaves(st_u)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        mc.MEANSHIFT_UNROLL = False


def test_track_band_parity_vs_oracle(rng):
    """Band-local camshift (mc.track_band, the serving fast path): identical
    window updates to the f64 oracle on a 240x320 moving-blob clip, with the
    pdf/moments computed on a (128, 192) band only; no escapes."""
    H, W = 240, 320
    frames = [_blob_frame(rng, H, W, 150 + 2 * t, 120 + t) for t in range(12)]
    rect = (142, 110, 14, 18)
    o = CamshiftTracker(calc_angles=True)
    o.init_tracker(frames[0], rect)
    st = mc.init_tracker(jnp.asarray(frames[0]), jnp.asarray(rect, jnp.int32))
    step = jax.jit(lambda s, f: mc.track_band(s, f, True))
    for t, f in enumerate(frames[1:], 1):
        ro = o.track(f)
        st, esc = step(st, jnp.asarray(f))
        assert not bool(esc), t
        assert int(st.track_x) == ro["x"], t
        assert int(st.track_y) == ro["y"], t
        assert int(st.track_w) == ro["width"], t
        assert int(st.track_h) == ro["height"], t
        assert np.asarray(st.window).tolist() == list(o.search_window), t


def test_track_band_covering_frame_is_fullframe(rng):
    """A band >= the frame degenerates to the full-frame math bit-for-bit."""
    H, W = 60, 80
    f0 = _blob_frame(rng, H, W, 30, 25)
    rect = (24, 17, 12, 16)
    st_a = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    st_b = mc.init_tracker(jnp.asarray(f0), jnp.asarray(rect, jnp.int32))
    full = jax.jit(lambda s, f: mc.track(s, f, True))
    band = jax.jit(lambda s, f: mc.track_band(s, f, True, band=(H, W)))
    for t in range(6):
        f1 = _blob_frame(rng, H, W, 30 + t, 25)
        st_a, _ = full(st_a, jnp.asarray(f1))
        st_b, esc = band(st_b, jnp.asarray(f1))
        assert not bool(esc)
        for a, b in zip(jax.tree_util.tree_leaves(st_a),
                        jax.tree_util.tree_leaves(st_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_track_band_escape_flag(rng):
    """A search window bigger than the band must raise ``escaped`` (the
    serving scheduler then recomputes that tick full-frame)."""
    H, W = 240, 320
    f0 = _blob_frame(rng, H, W, 150, 120)
    big = (10, 10, 280, 200)  # taller/wider than the (128, 192) band
    st = mc.init_tracker(jnp.asarray(f0), jnp.asarray(big, jnp.int32))
    _, esc = jax.jit(lambda s, f: mc.track_band(s, f, True))(
        st, jnp.asarray(f0))
    assert bool(esc)


def test_band_for_sizing_rule(rng):
    """mc.band_for: 8-aligned, window+BAND_SLACK covering, frame-clipped —
    and the returned band actually tracks a blob of that window class
    escape-free (the rule tools/exp_band_rule.py measured)."""
    # arithmetic properties
    assert mc.band_for((39, 39)) == (64, 64)
    assert mc.band_for((70, 70)) == (96, 96)
    assert mc.band_for((101, 101)) == (128, 128)
    assert mc.band_for((17, 17)) == (48, 48)
    assert mc.band_for((230, 310)) == (240, 320)          # frame clip
    assert mc.band_for((64, 64), (48, 80)) == (48, 80)    # small frame clip
    for wh in (10, 33, 57, 120):
        bh, bw = mc.band_for((wh, wh))
        assert bh % 8 == 0 and bw % 8 == 0
        assert bh >= min(wh + mc.BAND_SLACK, 240)

    # end-to-end: 32-px blob reaches a ~39x39 steady window; band_for of
    # that class must run escape-free where (48, 64) escapes ~every tick
    H, W, s = 240, 320, 32
    bg = rng.integers(60, 90, (H, W, 3), dtype=np.uint8)
    frames = []
    for t in range(14):
        f = bg.copy()
        f[104:104 + s, 40 + 2 * t:40 + 2 * t + s] = (210, 120, 60)
        frames.append(f)
    st = mc.init_tracker(jnp.asarray(frames[0]),
                         jnp.asarray((40, 104, s, s), jnp.int32))
    band = mc.band_for((int(1.3 * s) + 1, int(1.3 * s) + 1))
    step = jax.jit(lambda s_, f_: mc.track_band(s_, f_, True, band=band))
    for f in frames[1:]:
        st, esc = step(st, jnp.asarray(f))
        assert not bool(esc)
    assert int(st.track_w) > 0


def test_serving_band_track_step_equals_fullframe(rng):
    """make_batched_steps band path: a batch mixing a normal stream and an
    escaping stream produces exactly the full-frame results for both (the
    escape cond recomputes invalid streams from the pre-track state)."""
    import headtrackr_tpu as ht
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import make_batched_steps

    H, W = 240, 320
    f0 = _blob_frame(rng, H, W, 150, 120)
    f1 = _blob_frame(rng, H, W, 60, 60)
    cs0 = mc.init_tracker(jnp.asarray(f0), jnp.asarray((142, 110, 14, 18),
                                                       jnp.int32))
    cs1 = mc.init_tracker(jnp.asarray(f1), jnp.asarray((10, 10, 280, 200),
                                                       jnp.int32))  # escapes
    base = ft.init_state(True)
    sts = []
    for cs_st in (cs0, cs1):
        sts.append(base._replace(mode=jnp.int32(ft.MODE_CS), cs=cs_st,
                                 face_found=jnp.bool_(True)))
    state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sts)
    frames = jnp.stack([jnp.asarray(f0), jnp.asarray(f1)])

    cfg = TrackerConfig(ui=False)
    cascade = ht.toy_cascade()
    _, tr_band, _, _, _ = make_batched_steps(cascade, cfg, (H, W),
                                             donate=False, band="auto")
    _, tr_full, _, _, _ = make_batched_steps(cascade, cfg, (H, W),
                                             donate=False, band=None)
    stb, outb = tr_band(jax.tree_util.tree_map(jnp.copy, state), frames)
    stf, outf = tr_full(jax.tree_util.tree_map(jnp.copy, state), frames)
    np.testing.assert_array_equal(np.asarray(stb.cs.window),
                                  np.asarray(stf.cs.window))
    for fld in ("face_x", "face_y", "face_w", "face_h", "mode_after"):
        np.testing.assert_array_equal(np.asarray(getattr(outb, fld)),
                                      np.asarray(getattr(outf, fld)),
                                      err_msg=fld)


def test_serving_band_escape_bucket_branches(rng):
    """The escape fallback is COST-BOUNDED (docs/PERFORMANCE.md: the old
    any-escape full-batch recompute scaled its frequency with N): with
    escape_bucket=1, one escaping stream takes the compacted-sub-batch
    branch and two take the full-batch branch — both must equal the
    full-frame step exactly for every stream."""
    import headtrackr_tpu as ht
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import make_batched_steps

    H, W = 240, 320
    frames_np = [_blob_frame(rng, H, W, 40 + 30 * i, 60 + 20 * i)
                 for i in range(4)]
    big = (10, 10, 280, 200)     # escapes the (128, 192) band
    small = (0, 0, 14, 18)       # window origin near the blob, stays put
    base = ft.init_state(True)

    def mk_state(rects):
        sts = []
        for i, rect in enumerate(rects):
            cs_st = mc.init_tracker(jnp.asarray(frames_np[i]),
                                    jnp.asarray(rect, jnp.int32))
            sts.append(base._replace(mode=jnp.int32(ft.MODE_CS), cs=cs_st,
                                     face_found=jnp.bool_(True)))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sts)

    frames = jnp.stack([jnp.asarray(f) for f in frames_np])
    cfg = TrackerConfig(ui=False)
    cascade = ht.toy_cascade()
    _, tr_band, _, _, _ = make_batched_steps(
        cascade, cfg, (H, W), donate=False, band="auto", escape_bucket=1)
    _, tr_full, _, _, _ = make_batched_steps(cascade, cfg, (H, W),
                                             donate=False, band=None)

    win = lambda i: (38 + 30 * i, 58 + 20 * i, 16, 20)
    for rects, tag in ((
            [win(0), big, win(2), win(3)], "1 escape -> few branch"), (
            [big, win(1), big, win(3)], "2 escapes -> many branch")):
        state = mk_state(rects)
        stb, outb = tr_band(jax.tree_util.tree_map(jnp.copy, state), frames)
        stf, outf = tr_full(jax.tree_util.tree_map(jnp.copy, state), frames)
        np.testing.assert_array_equal(np.asarray(stb.cs.window),
                                      np.asarray(stf.cs.window), err_msg=tag)
        for fld in ("face_x", "face_y", "face_w", "face_h", "mode_after"):
            np.testing.assert_array_equal(np.asarray(getattr(outb, fld)),
                                          np.asarray(getattr(outf, fld)),
                                          err_msg=f"{tag}: {fld}")


def test_serving_custom_band_sizes_equal_fullframe(rng):
    """bench --band / BatchedTracker(band=(bh, bw)) accepts arbitrary sizes;
    any band (tiny, tall, frame-covering) must serve results identical to the
    full-frame step — escapes are handled transparently."""
    import headtrackr_tpu as ht
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import make_batched_steps

    H, W = 120, 160
    frames_np = [_blob_frame(rng, H, W, 30 + 20 * i, 40 + 15 * i)
                 for i in range(3)]
    base = ft.init_state(True)
    sts = []
    rects = [(28, 38, 12, 14), (5, 5, 100, 80), (68, 68, 16, 12)]
    for i, rect in enumerate(rects):
        cs_st = mc.init_tracker(jnp.asarray(frames_np[i]),
                                jnp.asarray(rect, jnp.int32))
        sts.append(base._replace(mode=jnp.int32(ft.MODE_CS), cs=cs_st,
                                 face_found=jnp.bool_(True)))
    state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sts)
    frames = jnp.stack([jnp.asarray(f) for f in frames_np])

    cfg = TrackerConfig(ui=False)
    cascade = ht.toy_cascade()
    _, tr_full, _, _, _ = make_batched_steps(cascade, cfg, (H, W),
                                             donate=False, band=None)
    stf, outf = tr_full(jax.tree_util.tree_map(jnp.copy, state), frames)

    for band in ((24, 32), (96, 32), (32, 152), (128, 192)):
        _, tr_band, _, _, _ = make_batched_steps(
            cascade, cfg, (H, W), donate=False, band=band, escape_bucket=2)
        stb, outb = tr_band(jax.tree_util.tree_map(jnp.copy, state), frames)
        np.testing.assert_array_equal(np.asarray(stb.cs.window),
                                      np.asarray(stf.cs.window),
                                      err_msg=str(band))
        for fld in ("face_x", "face_y", "face_w", "face_h", "mode_after"):
            np.testing.assert_array_equal(np.asarray(getattr(outb, fld)),
                                          np.asarray(getattr(outf, fld)),
                                          err_msg=f"{band}: {fld}")


def test_pick_block_exact_divisors():
    """block=None picks a 128-multiple EXACT divisor (padding measurably
    slows the scan on TPU — docs/PERFORMANCE.md); awkward sizes fall back.
    TrackerConfig.histBlock overrides (tools/exp_scan_ab.py A/B knob)."""
    for p, want in [(320 * 240, 15360), (640 * 480, 15360),
                    (160 * 120, 9600), (64 * 48, 3072)]:
        got = oh._pick_block(p)
        assert got == want and p % got == 0
    assert oh._pick_block(100) == 8192  # not 128-aligned: fallback


def test_histogram_and_pdf_block_invariant(rng):
    """Counts and pdf are identical for any block size (exactness is
    block-independent; only the scan shape changes)."""
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    bins = oh.rgb_bins(jnp.asarray(rgb))
    model = jnp.asarray(rng.random(4096, dtype=np.float32))
    cur0, pdf0 = oh.histogram_and_pdf(bins, model)  # auto block (3072)
    for blk in (512, 1024, 4096):
        cur, pdf = oh.histogram_and_pdf(bins, model, block=blk)
        np.testing.assert_array_equal(np.asarray(cur0), np.asarray(cur))
        np.testing.assert_array_equal(np.asarray(pdf0), np.asarray(pdf))


def test_parse_band_tokens():
    """The shared CLI band parser: tokens and diagnostics."""
    assert mc.parse_band("auto") == "auto"
    assert mc.parse_band("none") is None
    assert mc.parse_band("96x128") == (96, 128)
    with pytest.raises(ValueError, match="auto"):
        mc.parse_band("128")
    with pytest.raises(ValueError, match="auto"):
        mc.parse_band("96X128")


def test_make_batched_steps_bucket_exceeds_batch(rng):
    """Public make_batched_steps with bucket > n_streams must clamp at
    trace time (top_k(k) cannot exceed the batch) and still serve."""
    from headtrackr_tpu.cascade import toy_cascade
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import make_batched_steps

    H, W = 48, 64
    cfg = TrackerConfig(maxCandidates=32, survivorsStage2=128,
                        survivorsDeep=32, whitebalancing=False)
    _, _, _, step_auto, _ = make_batched_steps(
        toy_cascade(), cfg, (H, W), bucket=32, donate=False)
    N = 4
    st1 = ft.init_state(cfg.whitebalancing)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + np.shape(x)).copy(), st1)
    f = np.full((N, H, W, 3), 40, np.uint8)
    f[:, 10:34, 16:40] = (230, 80, 60)
    for _ in range(3):
        state, out = step_auto(state, jnp.asarray(f))
    assert (np.asarray(state.mode) == ft.MODE_CS).all()
