"""On-hardware conformance: face-box IoU + camshift-window parity vs the oracle.

Runs the REAL frontal-face pipeline on the current JAX backend (the axon TPU
chip by default) over a synthetic 320x240 clip — still face for the WB/VJ
lock, then a +-2 px/tick ping-pong pan — and compares every camshift frame
against the f64 NumPy oracle (headtrackr_tpu.oracle): exact window matches,
max |delta| in px, and face-rect IoU (the BASELINE gate is IoU >= 0.99).

Both camshift precision modes are measured: fast (serving default; TPU's
one-pass-bf16 matmuls may flip a JS truncation by 1 px occasionally) and
exactCamshift (bit-faithful f32 camshift math, docs/PARITY.md deviation 10).
On CPU both modes are identical to the oracle by construction (the golden
test suite asserts it); this tool exists to demonstrate the same on the
actual serving hardware.

Run:  python tools/verify_chip.py [--frames 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_BG = (120, 100, 90)

# Extra TrackerConfig fields threaded into every tracking-gate config
# (run_device / run_device_serving / run_relock_gate) — set from --k1 so the
# reduced-capacity serving configuration (survivorsStage2=2048, the r5
# detect-tick A/B) can be gated in the exact shape it would serve in.  The
# clutter gate sweeps its own k1 arms and ignores this.
EXTRA_CFG = {}


def build_clip(n_track, noise=0, size=(240, 320)):
    """17 still frames (WB window + VJ lock) then a +-2 px/tick ping-pong pan.

    noise=k adds deterministic uniform +-k LSB sensor noise.  k=0 is the
    DEGENERATE case: pixel-identical content translated in exact 2 px steps
    makes the camshift centroid land exactly on JS truncation boundaries,
    where f32-vs-f64 rounding races decide the result (see docs/PARITY.md);
    real camera input is never boundary-degenerate.

    size=(H, W): frame size — (240, 320) keeps the r1-r3 gate clip
    bit-identical; 640x480 is the second chip-qualified size (the face
    stays the same pixel size, placed at the same relative position)."""
    import headtrackr_tpu  # noqa: F401  (path side effects only)
    data = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "headtrackr_tpu", "data",
                                "synthface.npz"))
    rgb = data["rgb"]
    fh, fw = rgb.shape[:2]
    H, W = size
    px, py = (96, 80) if (H, W) == (240, 320) else         (4 * ((W // 3) // 4), 4 * ((H // 3) // 4))

    def fr(off):
        f = np.full((H, W, 3), _BG, np.uint8)
        f[py:py + fh, px + off:px + off + fw] = rgb
        return f

    half = n_track // 2
    offs = [2 * t for t in range(half)] + \
        [2 * (n_track - t) for t in range(half, n_track)]
    clip = np.stack([fr(0)] * 17 + [fr(o) for o in offs])
    if noise:
        rng = np.random.default_rng(7)
        d = rng.integers(-noise, noise + 1, clip.shape, dtype=np.int16)
        clip = np.clip(clip.astype(np.int16) + d, 0, 255).astype(np.uint8)
    return clip


def build_clip_hard(n_track, kind):
    """Structured-degradation arms (opt-in via --clips hard).

    kind="lighting": still face, global gain 1.0 -> 0.75 -> 1.25 -> 1.0 over
    the tracked phase (+-3 LSB noise) — the frame histogram drifts across the
    4-bit bin boundaries while the model histogram stays fixed.
    kind="occlusion": panning face with a 32 px blue (zero-weight) bar
    sweeping across it — graded mass loss, then total loss -> redetect ->
    re-lock once the bar passes."""
    clip = build_clip(n_track, noise=3)
    if kind == "lighting":
        base = build_clip(n_track, noise=0)
        gains = np.concatenate([
            np.ones(17),
            np.linspace(1.0, 0.75, n_track // 3),
            np.linspace(0.75, 1.25, n_track // 3),
            np.linspace(1.25, 1.0, n_track - 2 * (n_track // 3))])
        rng = np.random.default_rng(7)
        d = rng.integers(-3, 4, base.shape, dtype=np.int16)
        lit = np.clip(base.astype(np.float32) * gains[:, None, None, None]
                      + d, 0, 255).astype(np.uint8)
        return lit
    assert kind == "occlusion"
    t0 = 17 + n_track // 4
    for i, bar_x in enumerate(range(64, 176, 8)):
        t = t0 + i
        if t >= len(clip):
            break
        clip[t][:, bar_x:bar_x + 32] = (0, 0, 250)
    return clip


def build_crowd(rows=3, cols=5, size=(240, 320)):
    """Adversarial-clutter fixture (VERDICT r5 item 6): a grid of synthface
    instances plus one 48 px upsample — every face is a genuine cascade
    preimage, so stage-1/2 survivors are DENSE across tiles and scales (the
    case the bench pool never stresses; overflow telemetry reads 0 there).
    Keep in sync with tests/test_clutter.py (the CPU arm of this gate)."""
    import headtrackr_tpu  # noqa: F401
    face = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "headtrackr_tpu", "data",
                                "synthface.npz"))["rgb"]
    h, w = size
    f = np.full((h, w, 3), _BG, np.uint8)
    ys = np.linspace(8, h - 40, rows).astype(int) & ~1
    xs = np.linspace(8, w - 40, cols).astype(int) & ~1
    for y in ys:
        for x in xs:
            f[y:y + 24, x:x + 24] = face
    if h >= 160 and w >= 200:
        face2 = np.repeat(np.repeat(face, 2, 0), 2, 1)
        f[h - 80:h - 32, w - 88:w - 40] = face2
    return f


def run_clutter_gate(size):
    """Candidate-SET parity vs the oracle under near-capacity tiles, and
    sane eviction past capacity (docs/PARITY.md deviation 5), ON CHIP.

    Three arms on the crowd frame:
      generous   k_tiles=512 i.e. k1=81920 (vs ~209 surviving tiles on
                 this fixture) -> overflow MUST be 0 and the candidate set
                 must match the oracle exactly (rounded to 1e-2 px /
                 5e-3 conf — the chip's bf16-exact integer paths keep
                 these tight).
      near-cap   k_tiles=256 (~1.2x the surviving-tile count) -> same
                 exact parity under real top_k pressure.
      serving    the BatchedTracker serving capacities (4096/128/64) ->
                 overflow MUST be > 0 (the crowd over-subscribes), every
                 reported candidate must be a true oracle survivor, and
                 detect_best must still find a face (the max-confidence
                 tile ranking keeps face tiles; detector.TILE_RANK, r5 —
                 the r1-r4 count rank kept NONE here).
      starved    k1=640 (4 tiles, the capacity floor) -> overflow MUST be
                 > 0 and eviction must DROP, never fabricate (subset of
                 oracle survivors; the set may legally be empty at this
                 floor — overflow telemetry is how callers detect it).
    """
    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.models import detector as jd
    from headtrackr_tpu.oracle import detector as od
    from headtrackr_tpu.oracle.imageproc import grayscale as ogray

    ht.enable_compilation_cache(
        os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    frame = build_crowd(size=size)
    gray = np.asarray(ogray(frame), np.uint8)
    print(f"--- clutter gate ({size[1]}x{size[0]} crowd frame)")
    seq_o = od.dense_scores(gray, ht.cascade())
    bo = sorted((round(s["x"], 3), round(s["y"], 3), round(s["width"], 3),
                 round(s["confidence"], 3)) for s in seq_o)
    print(f"#   oracle: {len(bo)} raw survivors", file=sys.stderr)

    def close(a, b):
        return (abs(a[0] - b[0]) < 1e-2 and abs(a[1] - b[1]) < 1e-2
                and abs(a[2] - b[2]) < 1e-2 and abs(a[3] - b[3]) < 5e-3)

    def device_set(k1, k2, k_cand):
        t0 = time.time()
        cand = jax.jit(lambda x: jd.detect_candidates(
            x, ht.cascade(), k1=k1, k2=k2, k_cand=k_cand))(jnp.asarray(gray))
        cand = jax.tree_util.tree_map(np.asarray, cand)
        print(f"#   device k1={k1}: {time.time() - t0:.0f}s incl. compile",
              file=sys.stderr)
        v = cand["valid"]
        bj = sorted((round(float(cand["x"][i]), 3),
                     round(float(cand["y"][i]), 3),
                     round(float(cand["width"][i]), 3),
                     round(float(cand["confidence"][i]), 3))
                    for i in np.nonzero(v)[0])
        return bj, int(cand["overflow"])

    ok = True
    for label, k1 in (("generous", 81920), ("near-cap", 40960)):
        bj, ovf = device_set(k1, 2048, 1024)
        parity = (ovf == 0 and len(bj) == len(bo)
                  and all(close(a, b) for a, b in zip(bj, bo)))
        ok &= parity
        print(f"clutter {label} (k1={k1}): {len(bj)}/{len(bo)} candidates, "
              f"overflow {ovf} | SET parity: "
              f"{'exact' if parity else 'FAIL'}")

    bj, ovf = device_set(4096, 128, 64)
    subset_s = all(any(close(a, b) for b in bo) for a in bj)
    found, _, _, _, _, conf = jax.jit(lambda a: jd.detect_best(
        a, ht.cascade(), k1=4096, k2=128, k_cand=64))(jnp.asarray(gray))
    serving_ok = ovf > 0 and len(bj) > 0 and subset_s and bool(found)
    ok &= serving_ok
    print(f"clutter serving caps (4096/128/64): {len(bj)} candidates, "
          f"overflow {ovf} | all true survivors: {subset_s} | detect_best "
          f"found: {bool(found)} (conf {float(conf):.2f})")

    # r5 reduced-capacity serving configuration (survivorsStage2=2048 ->
    # 13 tiles): same assertions as the serving-caps arm — over-subscribed
    # on the crowd, every kept candidate a true survivor, face still found.
    bj, ovf = device_set(2048, 128, 64)
    subset2 = all(any(close(a, b) for b in bo) for a in bj)
    found2, _, _, _, _, conf2 = jax.jit(lambda a: jd.detect_best(
        a, ht.cascade(), k1=2048, k2=128, k_cand=64))(jnp.asarray(gray))
    reduced_ok = ovf > 0 and len(bj) > 0 and subset2 and bool(found2)
    ok &= reduced_ok
    print(f"clutter reduced caps (2048/128/64): {len(bj)} candidates, "
          f"overflow {ovf} | all true survivors: {subset2} | detect_best "
          f"found: {bool(found2)} (conf {float(conf2):.2f})")

    bj, ovf = device_set(640, 512, 256)
    subset = all(any(close(a, b) for b in bo) for a in bj)
    starved_ok = ovf > 0 and len(bj) < len(bo) and subset
    ok &= starved_ok
    print(f"clutter starved floor (k1=640): {len(bj)} candidates, overflow "
          f"{ovf} | drops-never-fabricates: {subset}")
    print(f"clutter gate (near-capacity SET parity + sane eviction past "
          f"capacity): {'PASS' if ok else 'FAIL'}")
    return bool(ok)


def iou(a, b):
    """a, b: (cx, cy, w, h) center boxes."""
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    ix = max(0.0, min(ax0 + a[2], bx0 + b[2]) - max(ax0, bx0))
    iy = max(0.0, min(ay0 + a[3], by0 + b[3]) - max(ay0, by0))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else (1.0 if inter == 0 else 0.0)


def run_oracle(clip):
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.oracle.pipeline import HeadTracker

    H, W = clip.shape[1:3]
    o = HeadTracker(frontalface(), W, H, smoothing=False,
                    head_position=False)
    rows = []
    for f in clip:
        o.step(f)
        t = dict(o.facetracker.cur_tracked)
        rows.append((t["detection"], t["x"], t["y"], t["width"], t["height"]))
    return rows


def run_device(clip, exact):
    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft

    ht.enable_compilation_cache(
        os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    cfg = TrackerConfig(smoothing=False, headPosition=False,
                        exactCamshift=exact, **EXTRA_CFG)
    step = ft.make_step(frontalface(), cfg, clip.shape[1:3], "full")

    @jax.jit
    def scan_fn(state, frames):
        def body(s, f):
            s2, out = step(s, f)
            return s2, (out.detection, out.face_x, out.face_y,
                        out.face_w, out.face_h)
        return jax.lax.scan(body, state, frames)

    frames = jnp.asarray(clip)
    t0 = time.time()
    _, (det, x, y, w, h) = scan_fn(ft.init_state(cfg.whitebalancing), frames)
    det = np.asarray(det)
    print(f"#   device run ({'exact' if exact else 'fast'}): "
          f"{time.time() - t0:.0f}s incl. compile", file=sys.stderr)
    return list(zip(det.tolist(), np.asarray(x).tolist(),
                    np.asarray(y).tolist(), np.asarray(w).tolist(),
                    np.asarray(h).tolist()))


def run_device_serving(clip, exact, band="auto", sparse=None,
                       band_hist=False):
    """The PRODUCTION serving path: device-scheduled step_scan (wbtrack /
    bucket / band-local camshift with escape fallback) at n_streams=1."""
    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import (make_batched_steps,
                                                resolve_band,
                                                wants_band_audit)

    ht.enable_compilation_cache(
        os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    cfg = TrackerConfig(smoothing=False, headPosition=False,
                        exactCamshift=exact, sparseHist=sparse,
                        bandHist=band_hist, **EXTRA_CFG)
    _, _, _, _, step_scan = make_batched_steps(
        frontalface(), cfg, clip.shape[1:3], bucket=1, band=band,
        donate=False)

    state1 = ft.init_state(cfg.whitebalancing, sparse or 0,
                           band_audit=wants_band_audit(
                               cfg, resolve_band(band, clip.shape[1:3])))
    state = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state1)
    frames = jnp.asarray(clip)[:, None]
    t0 = time.time()
    _, out = step_scan(state, frames)
    det = np.asarray(out.detection)[:, 0]
    print(f"#   serving run ({'exact' if exact else 'fast'}, band"
          f"{f', sparseHist={sparse}' if sparse else ''}): "
          f"{time.time() - t0:.0f}s incl. compile", file=sys.stderr)
    return list(zip(det.tolist(),
                    np.asarray(out.face_x)[:, 0].tolist(),
                    np.asarray(out.face_y)[:, 0].tolist(),
                    np.asarray(out.face_w)[:, 0].tolist(),
                    np.asarray(out.face_h)[:, 0].tolist()))


def run_relock_gate(clip, band="auto", sparse=None, band_hist=False):
    """Multi-stream bucket-relock stability gate (r3 regression check).

    XLA:TPU miscompiled the u8 frame gather feeding bucket sub-batches
    (channel slices all read R) when the frames buffer also fed the
    full-batch track pass: relocked streams got a model histogram with
    zero backprojection mass and flapped VJ<->CS every tick
    (runtime/serving.py _apply_bucket barrier).  n_streams=1 does not
    trigger the fusion, so this gate runs 8 streams, blue-frames three of
    them mid-clip (camshift zero-mass loss), and requires every stream to
    relock via the bucket/chunk scheduler and STAY locked."""
    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.runtime.serving import (make_batched_steps,
                                                resolve_band,
                                                wants_band_audit)

    ht.enable_compilation_cache(
        os.environ.get("HEADTRACKR_JAX_CACHE", "/root/.cache/headtrackr_jax"))
    N = 8
    T = len(clip)
    loss_t = 25
    frames = np.broadcast_to(clip[:, None], (T, N) + clip.shape[1:]).copy()
    blue = np.zeros_like(clip[0])
    blue[..., 2] = 250
    frames[loss_t, :3] = blue

    cfg = TrackerConfig(smoothing=False, headPosition=False,
                        sparseHist=sparse, bandHist=band_hist, **EXTRA_CFG)
    _, _, _, _, step_scan = make_batched_steps(
        frontalface(), cfg, clip.shape[1:3], bucket=2, band=band,
        donate=False)
    state1 = ft.init_state(cfg.whitebalancing, sparse or 0,
                           band_audit=wants_band_audit(
                               cfg, resolve_band(band, clip.shape[1:3])))
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (N,) + np.shape(x)).copy(),
        state1)
    t0 = time.time()
    _, out = step_scan(state, jnp.asarray(frames))
    det = np.asarray(out.detection)
    print(f"#   relock-gate run: {time.time() - t0:.0f}s incl. compile",
          file=sys.stderr)
    # all streams locked before the loss, and re-locked WITHIN 3 ticks of
    # the loss with no flap afterwards
    pre = (det[loss_t - 1] == 2).all()
    post = (det[loss_t + 3:] == 2).all()
    relocked_rows = (det[loss_t:, :3] == 2).all(1)
    relock_ticks = (int(np.argmax(relocked_rows)) if relocked_rows.any()
                    else "NEVER")  # argmax of all-False is 0, not "never"
    print(f"serving relock gate: pre-loss all CS: {bool(pre)} | "
          f"relock after {relock_ticks} ticks | "
          f"stable post-relock: {bool(post)}")
    return bool(pre) and bool(post)


def compare(tag, oracle_rows, dev_rows):
    modes = {"WB": 0, "VJ": 1, "CS": 2}
    n = exact_n = 0
    worst = 0.0
    ious = []
    for t, (orow, drow) in enumerate(zip(oracle_rows, dev_rows)):
        assert modes[orow[0]] == int(drow[0]), \
            f"{tag}: mode diverged at frame {t}: {orow[0]} vs {drow[0]}"
        if orow[0] != "CS":
            continue
        n += 1
        ob, db = np.asarray(orow[1:], float), np.asarray(drow[1:], float)
        d = np.abs(ob - db).max()
        worst = max(worst, d)
        exact_n += int(d == 0)
        ious.append(iou(ob, db))
    ious = np.asarray(ious)
    print(f"{tag}: {n} camshift frames | exact windows {exact_n}/{n} | "
          f"max |delta| {worst:.0f} px | IoU min {ious.min():.4f} "
          f"mean {ious.mean():.4f}")
    return float(ious.min()), float(ious.mean()), float(worst)


def compare_soft(tag, oracle_rows, dev_rows):
    """Hard-clip comparator: degradation-induced losses make the loss TICK
    sensitive to +-1 px window drift in fast mode, so mode divergence is
    measured (not asserted) and IoU is taken over ticks where both sides
    track.  Exact mode is bit-faithful and must keep 100% mode agreement."""
    # On a loss tick the oracle's cur_tracked reads from the just-rebuilt
    # facetracker (detection "") — transition ticks are skipped, agreement
    # is over ticks with a defined oracle mode.
    modes = {"WB": 0, "VJ": 1, "CS": 2}
    pairs = [(o, d) for o, d in zip(oracle_rows, dev_rows) if o[0] in modes]
    agree = sum(int(int(d[0]) == modes[o[0]]) for o, d in pairs)
    n = len(pairs)
    ious = [iou(np.asarray(o[1:], float), np.asarray(d[1:], float))
            for o, d in zip(oracle_rows, dev_rows)
            if o[0] == "CS" and int(d[0]) == 2]
    ious = np.asarray(ious) if ious else np.asarray([0.0])
    print(f"{tag}: mode agreement {agree}/{n} | {len(ious)} common-CS "
          f"frames | IoU min {ious.min():.4f} mean {ious.mean():.4f}")
    return agree / n, float(ious.mean())


def run_hard_clips(frames, band):
    """Opt-in (--clips hard): lighting-ramp and occlusion->redetect arms on
    the REAL cascade, gated on exact-mode full mode agreement + IoU >= 0.99
    and fast-mode agreement >= 0.95."""
    ok = True
    for kind in ("lighting", "occlusion"):
        clip = build_clip_hard(frames, kind)
        print(f"--- hard clip [{kind}] ({len(clip)} frames)")
        oracle_rows = run_oracle(clip)
        n_cs = sum(r[0] == "CS" for r in oracle_rows)
        n_vj = sum(r[0] == "VJ" for r in oracle_rows)
        print(f"#   oracle: {n_cs} CS / {n_vj} VJ ticks", file=sys.stderr)
        for exact in (False, True):
            dev_rows = run_device(clip, exact)
            tag = f"{kind} {'exact' if exact else 'fast '}"
            agree, miou = compare_soft(tag, oracle_rows, dev_rows)
            ok &= (agree == 1.0 and miou >= 0.99) if exact else (agree >= 0.95)
        dev_rows = run_device_serving(clip, True, band)
        agree, miou = compare_soft(f"{kind} serving exact", oracle_rows,
                                   dev_rows)
        ok &= agree == 1.0 and miou >= 0.99
    print(f"hard-clip gate (exact: full mode agreement + IoU >= 0.99; "
          f"fast: agreement >= 0.95): {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--clips", type=str, default="default",
                    choices=["default", "hard", "clutter", "all"],
                    help="'hard' adds lighting-ramp and occlusion->redetect "
                         "arms (real cascade, tolerant comparator); "
                         "'clutter' runs the adversarial-clutter detector "
                         "gate (crowd frame, near-capacity SET parity + "
                         "eviction sanity); 'all' runs every suite")
    ap.add_argument("--band", type=str, default="auto",
                    help="serving band to gate: 'auto' "
                         "(models/camshift.DEFAULT_BAND), 'none', or HxW — "
                         "use the bench's band (bench.py --band default) to "
                         "gate the exact benched configuration")
    ap.add_argument("--size", type=str, default="320x240",
                    help="frame size WxH; 320x240 (the r1-r3 gate clip) or "
                         "640x480 (the second chip-qualified size)")
    ap.add_argument("--sparse-hist", type=int, default=None,
                    help="gate the serving path with "
                         "TrackerConfig.sparseHist=K (sparse-model camshift "
                         "histograms; the bench's serving configuration)")
    ap.add_argument("--k1", type=int, default=None,
                    help="gate with TrackerConfig.survivorsStage2=K1 (deep-"
                         "stage window capacity; 4096 default = 26 tiles, "
                         "2048 = 13 tiles — the r5 detect-tick A/B's "
                         "reduced-capacity serving configuration).  "
                         "Capacity semantics: PARITY deviation 5; the "
                         "clutter gate sweeps its own k1 arms regardless")
    ap.add_argument("--k2", type=int, default=None,
                    help="gate with TrackerConfig.survivorsDeep=K2 (stage-"
                         "6+ window capacity; 512 default, 256 = the r5 "
                         "reduced serving configuration)")
    ap.add_argument("--deep-dtype", type=str, default=None,
                    choices=["bf16", "int8"],
                    help="gate with detector.DEEP_DTYPE: int8 runs the "
                         "chunk-B/C selection dots as i8 MXU matmuls "
                         "(bit-exact by construction, r5; golden-tested "
                         "on CPU — this flag demonstrates it on chip)")
    ap.add_argument("--band-hist", action="store_true",
                    help="gate the serving path with "
                         "TrackerConfig.bandHist (band-local current "
                         "histograms — the approximate serving mode, "
                         "PARITY deviation 13; bit-exact on these clips "
                         "because the synthface handoff model carries no "
                         "background bins)")
    args = ap.parse_args()
    if args.k1:
        EXTRA_CFG["survivorsStage2"] = args.k1
    if args.k2:
        EXTRA_CFG["survivorsDeep"] = args.k2
    if args.deep_dtype:
        from headtrackr_tpu.models import detector as _det
        _det.DEEP_DTYPE = args.deep_dtype
    from headtrackr_tpu.models.camshift import parse_band
    band = parse_band(args.band)
    try:
        _w, _h = (int(v) for v in args.size.split("x"))
    except ValueError:
        raise SystemExit(f"--size must be WxH; got {args.size!r}")
    size = (_h, _w)

    import jax
    print(f"# backend: {jax.devices()}", file=sys.stderr)

    if args.clips in ("clutter", "all"):
        clutter_ok = run_clutter_gate(size)
        if args.clips == "clutter":
            return 0 if clutter_ok else 1

    if args.clips in ("hard", "all"):
        hard_ok = run_hard_clips(args.frames, band)
        if args.clips == "hard":
            return 0 if hard_ok else 1

    results = {}
    for label, noise in (("realistic (+-3 LSB sensor noise)", 3),
                         ("degenerate (pixel-exact 2 px pan)", 0)):
        clip = build_clip(args.frames, noise=noise, size=size)
        print(f"# clip [{label}]: {len(clip)} frames {args.size}, real "
              f"16-stage cascade", file=sys.stderr)
        oracle_rows = run_oracle(clip)
        print(f"--- {label}")
        for exact in (False, True):
            dev_rows = run_device(clip, exact)
            tag = "exactCamshift" if exact else "fast  (default)"
            results[(noise, exact)] = compare(tag, oracle_rows, dev_rows)
        for exact in (False, True):
            dev_rows = run_device_serving(clip, exact, band,
                                          sparse=args.sparse_hist,
                                          band_hist=args.band_hist)
            tag = ("serving band exact" if exact else "serving band fast ")
            results[(noise, exact, "band")] = compare(tag, oracle_rows,
                                                      dev_rows)

    # Gate on realistic input: exactCamshift must be bit-perfect (IoU 1.0
    # within fp tolerance) at 320x240 — measured to hold r1-r4.  At 640x480
    # the MXU's bf16x6 accumulation rounds differently from f32 FMA and hits
    # a truncation knife-edge ~1/101 frames (TPU-only: CPU-XLA f32 on the
    # SAME clip is 101/101 bit-perfect — measured r4; PARITY.md deviation
    # 10), so exact mode gates on max |delta| <= 1 px AND mean IoU >= 0.999
    # there.  The fast serving mode gates within the BASELINE 0.99, and the
    # PRODUCTION serving path (device scheduler + band-local camshift)
    # within 0.99 in both modes.  The degenerate clip is reported as the
    # documented worst case (f32-vs-f64 truncation races; docs/PARITY.md).
    relock_ok = run_relock_gate(build_clip(args.frames, noise=3, size=size),
                                band, sparse=args.sparse_hist,
                                band_hist=args.band_hist)
    if size == (240, 320):
        exact_ok = results[(3, True)][0] >= 0.999
        exact_desc = "exact bit-perfect"
    else:
        exact_ok = (results[(3, True)][2] <= 1.0
                    and results[(3, True)][1] >= 0.999)
        exact_desc = "exact <=1 px knife-edge (deviation 10) + mean IoU >= 0.999"
    ok = (exact_ok and results[(3, False)][1] >= 0.99
          and results[(3, True, "band")][1] >= 0.99
          and results[(3, False, "band")][1] >= 0.99
          and relock_ok)
    print(f"gate (realistic clip: {exact_desc}, fast/serving mean IoU "
          f">= 0.99, multi-stream bucket relock stable): "
          f"{'PASS' if ok else 'FAIL'}")
    if args.clips == "all":
        ok = ok and hard_ok and clutter_ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
