"""In-context cost split of the band track step by piece-stubbing.

Microbenches of isolated pieces mislead here (XLA overlaps cross-tick work
under the scan chain, and standalone pieces compile to different layouts),
so this measures the REAL step program with individual pieces replaced by
cheap stand-ins; the deltas are each piece's in-context marginal cost:

  full        track_band as served
  no_hist     histogram_scan -> ones   (weights garbage; shapes identical)
  no_pdf      pdf_scan -> zeros        (mean-shift on zeros)
  no_ms       _mean_shift_core -> passthrough window, zero moments
  no_planes   _marginal_planes -> zeros (kills the two prefix-sum matmuls;
                                        the per-iteration machinery remains)
  no_sel      _select_lines -> zeros   (kills the 40 tiny per-iteration
                                        selection dots; planes + loop remain)
  no_m2       _second_moments -> zeros (kills the final masked full-band pass)
  no_bins     rgb_bins -> zeros        (kills the bins compute AND most
                                        downstream value ranges)

r5: defaults match the SERVING configuration (band 96x128, bandHist on —
the r4 bench default); --no-band-hist / --band reproduce the older arms.

Run on the chip: python tools/exp_step_split.py --streams 256
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4,
                    help="timed scan dispatches per piece; MIN is reported "
                         "(single-rep readings swing ~70% run-to-run on the "
                         "shared chip — r5 lesson)")
    ap.add_argument("--band", type=str, default="96x128",
                    help="'HxW', 'auto' (DEFAULT_BAND) — the bench serves "
                         "96x128")
    ap.add_argument("--band-hist", action=argparse.BooleanOptionalAction,
                    default=True, help="bandHist serving mode (r4+ default)")
    ap.add_argument("--size", type=str, default="320x240",
                    help="frame WxH")
    ap.add_argument("--pieces", type=str, default=None,
                    help="comma list to run (default: all)")
    ap.add_argument("--unroll", action="store_true",
                    help="camshift.MEANSHIFT_UNROLL=True for this run")
    ap.add_argument("--bins-arm", type=str, default="bin-first",
                    choices=["slice-first", "bin-first"],
                    help="bandHist bins formulation A/B "
                         "(camshift.BANDHIST_SLICE_FIRST): bin the full "
                         "frame then slice (the module default — XLA fuses "
                         "the slice into the producer) vs slice the (h,w,3) "
                         "u8 frame first then bin (MEASURED 10.8x SLOWER on "
                         "chip, r5: the batched trailing-3 dynamic_slice is "
                         "a layout/gather trap).  Identical results either "
                         "way.  Default matches the module so un-flagged "
                         "runs measure the serving configuration.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.models import camshift as cs
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig

    ht.enable_compilation_cache()
    cs.BANDHIST_SLICE_FIRST = args.bins_arm == "slice-first"
    if args.unroll:
        cs.MEANSHIFT_UNROLL = True
    N, n = args.streams, args.iters
    W, H = (int(v) for v in args.size.split("x"))
    band = cs.parse_band(args.band)
    if band == "auto":
        band = cs.DEFAULT_BAND
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    cfg = TrackerConfig(ui=False, bandHist=args.band_hist)
    casc = frontalface()
    state1 = ft.init_state(True)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + np.shape(x)).copy(), state1)
    # realistic windows so the mean-shift/band geometry is exercised
    win = jnp.tile(jnp.asarray([100, 80, 50, 50], jnp.int32), (N, 1))
    state = state._replace(cs=state.cs._replace(window=win),
                           mode=jnp.full((N,), ft.MODE_CS, jnp.int32))

    real = dict(hist=cs.histogram_scan, pdf=cs.pdf_scan,
                ms=cs._mean_shift_core, bins=cs.rgb_bins,
                planes=cs._marginal_planes, sel=cs._select_lines,
                m2=cs._second_moments)

    def stub(name):
        if name == "no_hist":
            cs.histogram_scan = lambda b, block=None: jnp.ones(
                (4096,), jnp.float32)
        elif name == "no_pdf":
            cs.pdf_scan = lambda b, w, block=None, exact=False: jnp.zeros(
                b.shape, jnp.float32)
        elif name == "no_ms":
            def fake_ms(pdf, window, exact, ry, rx, H_, W_):
                z = jnp.float32(0.0)
                mom = dict(m00=z, m10=z, m01=z, m11=z, m20=z, m02=z,
                           invM00=jnp.float32(jnp.inf), xc=z, yc=z,
                           mu20=z, mu02=z, mu11=z)
                return window, mom, jnp.bool_(True), jnp.bool_(False)
            cs._mean_shift_core = fake_ms
        elif name == "no_planes":
            def fake_planes(pdf, exact=False):
                Hb, Wb = pdf.shape
                return (jnp.zeros((Hb + 1, Wb), jnp.float32),
                        jnp.zeros((Hb, Wb + 1), jnp.float32))
            cs._marginal_planes = fake_planes
        elif name == "no_sel":
            def fake_sel(plane, i0, i1, axis, exact=False):
                m = plane.shape[1 - axis]
                z = jnp.zeros((m,), jnp.float32)
                return z, z
            cs._select_lines = fake_sel
        elif name == "no_m2":
            cs._second_moments = lambda pdf, *a: (
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
        elif name == "no_bins":
            cs.rgb_bins = lambda f: jnp.zeros(f.shape[:-1], jnp.int32)

    def restore():
        cs.histogram_scan = real["hist"]
        cs.pdf_scan = real["pdf"]
        cs._mean_shift_core = real["ms"]
        cs.rgb_bins = real["bins"]
        cs._marginal_planes = real["planes"]
        cs._select_lines = real["sel"]
        cs._second_moments = real["m2"]

    pieces = (args.pieces.split(",") if args.pieces else
              ["full", "no_hist", "no_pdf", "no_ms", "no_planes", "no_sel",
               "no_m2", "no_bins"])
    results = {}
    for name in pieces:
        restore()
        stub(name)
        step1 = ft.make_step(casc, cfg, (H, W), "track", band=band)
        vstep = jax.vmap(step1)

        @jax.jit
        def scan_fn(st, frames):
            def body(s, _):
                s2, out, esc = vstep(s, frames)
                return s2, None
            s, _ = jax.lax.scan(body, st, None, length=n)
            return s
        st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
        np.asarray(st.mode)
        best = np.inf
        for _ in range(max(1, args.reps)):
            t0 = time.time()
            st = scan_fn(jax.tree_util.tree_map(jnp.copy, state), frames)
            np.asarray(st.mode)
            best = min(best, time.time() - t0)
        results[name] = 1000 * best / n
        print(f"{name:10s} {1000 * best / n:.3f} ms/tick", flush=True)
    restore()
    if "full" in results:
        print("\nmarginal costs (full - stubbed):")
        for k, v in results.items():
            if k != "full":
                print(f"  {k:10s} {results['full'] - v:+.3f} ms/tick")


if __name__ == "__main__":
    main()
