"""In-context cost split of the DETECT tick by piece-stubbing (r5).

The detect tick (cold start / relock / bucketed redetect) is the full-step
program: under vmap the 3-way lax.switch executes EVERY branch for every
stream, so its cost is WB + grayscale + pyramid + cascade + grouping +
handoff + camshift, regardless of per-stream mode.  Microbenches of
isolated detector pieces mislead (XLA overlaps cross-tick work under the
scan chain and standalone pieces compile to different layouts), so — like
tools/exp_step_split.py for the track tick — this measures the REAL
full-step scan program with individual pieces replaced by shape-identical
cheap stand-ins; the deltas are each piece's in-context marginal cost:

  full        the serving full step (bench.py cold-start program)
  no_detect   detect_best -> not-found        (the detector's TOTAL cost)
  no_pyramid  build_pyramid -> zero planes    (the ~80 bilinear resizes)
  no_stacks   _tile_stacks -> zero stacks     (pad+stack of 3 plane sets)
  no_chunkA   _dense_chunk_stacked -> all-alive (stages 0-1 dense pass)
  no_blocks   _extract_tile_blocks -> zeros   (~100-iter dynamic_slice loop)
  no_patches  _tile_patches -> zeros          (im2col convs + transpose)
  no_chunkBC  _patch_chunk -> passthrough     (deep-stage selection matmuls,
                                              BOTH calls: stages 2-5 and 6+)
  no_compact  compact_indices -> iota         (top_k compactions, C + final)
  no_group    group_candidates -> passthrough (KxK closure matmuls)
  no_handoff  cs.init_tracker -> zero state   (full-frame model hist at
                                              VJ->CS switch)

Knobs (rebuilt per run; A/B by invoking twice and diffing "full"):
  --chunk-a/--chunk-b   stage-chunk boundaries (defaults 2/6)
  --tile TYxTX          deep-stage tile shape (default 8x20)
  --k1/--k2/--k-cand    survivor capacities (defaults 4096/512/256)

Run on the chip: python tools/exp_detect_split.py --streams 256
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
    ap.add_argument("--iters", type=int, default=8,
                    help="scan length (detect ticks are ~50x track ticks)")
    ap.add_argument("--reps", type=int, default=4,
                    help="timed scan dispatches per piece; MIN is reported "
                         "(single-rep readings swing ~70% run-to-run on the "
                         "shared chip — r5 lesson)")
    ap.add_argument("--size", type=str, default="320x240", help="frame WxH")
    ap.add_argument("--pieces", type=str, default=None,
                    help="comma list to run (default: all)")
    ap.add_argument("--chunk-a", type=int, default=None)
    ap.add_argument("--chunk-b", type=int, default=None)
    ap.add_argument("--tile", type=str, default=None, help="TYxTX, e.g. 8x40")
    ap.add_argument("--k1", type=int, default=None)
    ap.add_argument("--k2", type=int, default=None)
    ap.add_argument("--k-cand", type=int, default=None)
    ap.add_argument("--pyr-gather", type=str, default=None,
                    choices=["onehot", "take"],
                    help="resize_bilinear neighbor fetch "
                         "(imageproc.PYRAMID_GATHER): constant one-hot MXU "
                         "matmuls vs jnp.take gathers — bit-identical "
                         "outputs")
    ap.add_argument("--deep-dtype", type=str, default=None,
                    choices=["bf16", "int8"],
                    help="chunk B/C selection-matmul operand dtype "
                         "(detector.DEEP_DTYPE): int8 runs the one-hot "
                         "selection dots as i8 x i8 -> i32 MXU matmuls on a "
                         "-128-shifted patch matrix — bit-identical "
                         "candidate sets (shift-invariant min>max compare)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import headtrackr_tpu as ht
    from headtrackr_tpu.models import camshift as cs
    from headtrackr_tpu.models import detector as det
    from headtrackr_tpu.models import facetracker as ft
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.config import TrackerConfig
    from headtrackr_tpu.ops.imageproc import pyramid_spec

    ht.enable_compilation_cache()
    N, n = args.streams, args.iters
    W, H = (int(v) for v in args.size.split("x"))
    if args.pyr_gather is not None:
        from headtrackr_tpu.ops import imageproc
        imageproc.PYRAMID_GATHER = args.pyr_gather
    if args.deep_dtype is not None:
        det.DEEP_DTYPE = args.deep_dtype

    # ---- knob overrides (module constants; tables cache depends on tile) --
    if args.chunk_a is not None:
        det.CHUNK_A_END = args.chunk_a
    if args.chunk_b is not None:
        det.CHUNK_B_END = args.chunk_b
    if args.tile is not None:
        ty, tx = (int(v) for v in args.tile.split("x"))
        det.TILE_Y, det.TILE_X = ty, tx
        det.TILE_WINDOWS = ty * tx
        det.B0_SHAPE = (2 * ty + 24, 2 * tx + 24)
        det.B1_SHAPE = (ty + 12, tx + 12)
        det.BI_SHAPE = (ty + 16, tx + 12)
        det._tables_cached.cache_clear()
    cfg_kw = {}
    if args.k1 is not None:
        cfg_kw["survivorsStage2"] = args.k1
    if args.k2 is not None:
        cfg_kw["survivorsDeep"] = args.k2
    if args.k_cand is not None:
        cfg_kw["maxCandidates"] = args.k_cand
    knobs = (f"chunks=({det.CHUNK_A_END},{det.CHUNK_B_END}) "
             f"tile={det.TILE_Y}x{det.TILE_X} "
             f"k1={cfg_kw.get('survivorsStage2', 4096)} "
             f"k2={cfg_kw.get('survivorsDeep', 512)} "
             f"k_cand={cfg_kw.get('maxCandidates', 256)} "
             f"deep={det.DEEP_DTYPE}")
    print(f"# {N} streams, {W}x{H}, {knobs}", flush=True)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    cfg = TrackerConfig(ui=False, **cfg_kw)
    casc = frontalface()
    state1 = ft.init_state(True)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N,) + np.shape(x)).copy(), state1)
    state = state._replace(mode=jnp.full((N,), ft.MODE_VJ, jnp.int32))

    real = dict(pyr=det.build_pyramid, stacks=det._tile_stacks,
                dense=det._dense_chunk_stacked, blocks=det._extract_tile_blocks,
                patches=det._tile_patches, pchunk=det._patch_chunk,
                compact=det.compact_indices, group=det.group_candidates,
                detect=ft.detect_best, handoff=cs.init_tracker)

    def stub(name):
        if name == "no_detect":
            f32 = jnp.float32
            ft.detect_best = lambda *a, **k: (
                jnp.bool_(False), f32(0), f32(0), f32(0), f32(0), f32(-1e4))
        elif name == "no_pyramid":
            def fake_pyr(gray, interval=5):
                h0, w0 = gray.shape
                spec = pyramid_spec(w0, h0, interval)
                dims = dict(spec.dims)
                nx = spec.next
                pyr = {0: gray}
                for i in range(1, spec.scale_upto + nx * 2):
                    w, h = dims[i]
                    pyr[i * 4] = jnp.zeros((h, w), jnp.uint8)
                for i in range(nx * 2, spec.scale_upto + nx * 2):
                    w, h = dims[i]
                    for q in (1, 2, 3):
                        pyr[i * 4 + q] = jnp.zeros((h, w), jnp.uint8)
                return pyr, spec
            det.build_pyramid = fake_pyr
        elif name == "no_stacks":
            def fake_stacks(pyr, tables):
                S = len(tables.geoms)
                nty, ntx = tables.ntymax, tables.ntxmax
                z = lambda h, w: jnp.zeros((S, h, w), jnp.uint8)
                return (z(2 * det.TILE_Y * nty + det.B0_SHAPE[0],
                          2 * det.TILE_X * ntx + det.B0_SHAPE[1]),
                        z(det.TILE_Y * nty + det.B1_SHAPE[0],
                          det.TILE_X * ntx + det.B1_SHAPE[1]),
                        z(det.TILE_Y * nty + det.BI_SHAPE[0],
                          det.TILE_X * ntx + det.BI_SHAPE[1]))
            det._tile_stacks = fake_stacks
        elif name == "no_chunkA":
            def fake_dense(stacks, c, qh2m, qw2m, k_lo, k_hi, stages):
                S = stacks[0].shape[0]
                return (jnp.ones((S, qh2m, qw2m), bool),
                        jnp.zeros((S, qh2m, qw2m), jnp.float32))
            det._dense_chunk_stacked = fake_dense
        elif name == "no_blocks":
            def fake_blocks(stacks, tscale, ty, tx):
                T = tscale.shape[0]
                return (jnp.zeros((T, *det.B0_SHAPE), jnp.uint8),
                        jnp.zeros((T, *det.B1_SHAPE), jnp.uint8),
                        jnp.zeros((T, *det.BI_SHAPE), jnp.uint8))
            det._extract_tile_blocks = fake_blocks
        elif name == "no_patches":
            det._tile_patches = lambda b0, b1, bi: jnp.zeros(
                (det.PATCH_LEN, b0.shape[0] * det.TILE_WINDOWS), jnp.bfloat16)
        elif name == "no_chunkBC":
            det._patch_chunk = (
                lambda patches_t, key, k_lo, k_hi, stages, valid, conf_in, c:
                (valid, conf_in))
        elif name == "no_compact":
            def fake_compact(mask, size):
                m = mask.reshape(-1)
                idx = jnp.arange(size, dtype=jnp.int32) % max(m.shape[0], 1)
                return idx, jnp.int32(size)
            det.compact_indices = fake_compact
        elif name == "no_group":
            def fake_group(x, y, w, h, conf, valid, min_neighbors=1):
                return dict(kept=valid, x=x, y=y, width=w, height=h,
                            neighbors=valid.astype(jnp.float32),
                            confidence=conf)
            det.group_candidates = fake_group
        elif name == "no_handoff":
            def fake_handoff(frame_rgb, rect, sparse_k=0, audit_band=None):
                return cs.init_state(sparse_k, audit_band is not None)
            cs.init_tracker = fake_handoff

    def restore():
        det.build_pyramid = real["pyr"]
        det._tile_stacks = real["stacks"]
        det._dense_chunk_stacked = real["dense"]
        det._extract_tile_blocks = real["blocks"]
        det._tile_patches = real["patches"]
        det._patch_chunk = real["pchunk"]
        det.compact_indices = real["compact"]
        det.group_candidates = real["group"]
        ft.detect_best = real["detect"]
        cs.init_tracker = real["handoff"]

    pieces = (args.pieces.split(",") if args.pieces else
              ["full", "no_detect", "no_pyramid", "no_stacks", "no_chunkA",
               "no_blocks", "no_patches", "no_chunkBC", "no_compact",
               "no_group", "no_handoff"])
    results = {}
    for name in pieces:
        restore()
        stub(name)
        step1 = ft.make_step(casc, cfg, (H, W), "full")
        vstep = jax.vmap(step1)

        @jax.jit
        def scan_fn(st, frames):
            def body(s, _):
                s2, out = vstep(s, frames)
                # keep VJ mode every tick so each scan iteration pays the
                # same detect economics (a handoff would flip streams to CS;
                # all switch branches still execute under vmap, but state
                # shapes/values should stay regime-stable)
                s2 = s2._replace(mode=jnp.full((N,), ft.MODE_VJ, jnp.int32))
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
        print(f"{name:11s} {1000 * best / n:.3f} ms/tick", flush=True)
    restore()
    if "full" in results:
        fps = args.streams / (results["full"] / 1000.0)
        print(f"\nfull detect tick -> {fps:,.0f} frames/sec at N={N}")
        print("marginal costs (full - stubbed):")
        for k, v in results.items():
            if k != "full":
                print(f"  {k:11s} {results['full'] - v:+.3f} ms/tick")


if __name__ == "__main__":
    main()
