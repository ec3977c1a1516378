"""Synthesize a patch the bundled frontal-face cascade detects ("cascade preimage").

There is no real face imagery in this environment, but benchmarks and
integration tests must drive the REAL 16-stage model end-to-end (detection ->
camshift handoff -> tracking).  We optimize a 24x24 grayscale patch so that the
base-scale detection window passes all 16 stages:

  - the three pyramid planes a window reads are linear images of the patch
    (identity / 2x box-average / 4x box-average for the even phase),
  - each weak classifier's pass margin  min(pos px) - max(neg px)  gets a
    sigmoid relaxation, summed into per-stage soft margins,
  - Adam ascent on the float patch, then u8 quantization, verified with the
    exact NumPy oracle.

The result is embedded as headtrackr_tpu/data/synthface.npz (gray patch + an
RGB colorization with constant skin-like hue so camshift can track it).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_synthetic_face.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax
import jax.numpy as jnp

from headtrackr_tpu.cascade import frontalface

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "headtrackr_tpu", "data", "synthface.npz")


def half(x):
    """2x box-average downscale (the defined bilinear at exact 2x)."""
    H, W = x.shape
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def window_planes(patch24):
    """The three planes the base-scale window reads: full / half / quarter."""
    p0 = patch24
    p1 = half(patch24)
    p2 = half(p1)
    return p0, p1, p2


def _addr_tables(c):
    """Static flat addresses into concat([p0.ravel(), p1.ravel(), p2.ravel()])."""
    base = {0: (0, 24), 1: (576, 12), 2: (576 + 144, 6)}

    def side(xx, yy, zz):
        addr = np.zeros(zz.shape, np.int32)
        for z, (b, w) in base.items():
            m = zz == z
            addr[m] = b + yy[m].astype(np.int32) * w + xx[m].astype(np.int32)
        return addr, (zz >= 0)

    ap, mp = side(np.asarray(c.px), np.asarray(c.py), np.asarray(c.pz))
    an, mn = side(np.asarray(c.nx), np.asarray(c.ny), np.asarray(c.nz))
    return ap, mp, an, mn


def _ste_round(x):
    """Round with straight-through gradient (models the u8 pyramid planes)."""
    return x + jax.lax.stop_gradient(jnp.rint(x) - x)


def stage_margins(patch24, c, temp, margin_shift=1.5):
    """Soft stage margins.  margin_shift: a weak counts as passing only when
    pmin - nmax exceeds it — the real test is the STRICT integer pmin > nmax,
    so training with slack keeps quantization from flipping votes."""
    p0 = _ste_round(patch24)
    p1 = _ste_round(half(p0))
    p2 = _ste_round(half(p1))
    v = jnp.concatenate([p0.ravel(), p1.ravel(), p2.ravel()])
    ap, mp, an, mn = _addr_tables(c)
    pv = jnp.where(mp, v[ap], jnp.inf)
    nv = jnp.where(mn, v[an], -jnp.inf)
    m = jnp.min(pv, axis=1) - jnp.max(nv, axis=1)        # (K,)
    pass_prob = jax.nn.sigmoid((m - margin_shift) / temp)
    votes = c.alpha[:, 0] + (c.alpha[:, 1] - c.alpha[:, 0]) * pass_prob
    sums = jax.ops.segment_sum(votes, jnp.asarray(c.stage_of),
                               num_segments=int(c.count))
    return sums - jnp.asarray(c.stage_thresh)


def main():
    c = frontalface()
    key = jax.random.PRNGKey(0)
    patch = 128.0 + 20.0 * jax.random.normal(key, (24, 24))

    def loss_fn(p, temp):
        m = stage_margins(p, c, temp)
        # want every stage margin comfortably positive
        return jnp.sum(jax.nn.softplus(2.0 - m)) + 1e-4 * jnp.sum((p - 128.0) ** 2)

    import optax
    for temp, steps, lr in [(8.0, 300, 2.0), (3.0, 300, 1.0), (1.0, 400, 0.5)]:
        opt = optax.adam(lr)
        st = opt.init(patch)
        g = jax.jit(jax.grad(lambda p: loss_fn(p, temp)))
        for i in range(steps):
            grads = g(patch)
            upd, st = opt.update(grads, st)
            patch = optax.apply_updates(patch, upd)
            patch = jnp.clip(patch, 5.0, 250.0)
        m = stage_margins(jnp.round(patch), c, 0.05)
        print(f"temp={temp}: min stage margin (rounded, hard-ish) = {float(jnp.min(m)):.2f}")

    patch_u8 = np.asarray(jnp.round(jnp.clip(patch, 0, 255))).astype(np.uint8)

    # exact oracle check on the 24x24 window
    from headtrackr_tpu.oracle.detector import detect_at_scale
    p0 = patch_u8
    p1 = np.asarray(jnp.round(half(jnp.asarray(patch_u8, jnp.float32)))).astype(np.uint8)
    p2 = np.asarray(jnp.round(half(half(jnp.asarray(patch_u8, jnp.float32))))).astype(np.uint8)
    # NOTE: quick sanity only; the real verification embeds the patch in a frame.

    # Build a full frame and run the exact detector
    from headtrackr_tpu.oracle.detector import detect_objects
    H, W = 240, 320
    frame = np.full((H, W), 100, np.uint8)
    px_, py_ = 148, 108  # multiples of 4 -> even phase at base scale
    frame[py_:py_ + 24, px_:px_ + 24] = patch_u8
    dets = detect_objects(frame, c, 5, 1)
    print("oracle detections on embedded frame:", dets)
    ok = any(d["confidence"] > -10 and abs(d["x"] - px_) < 12 and
             abs(d["y"] - py_) < 12 for d in dets)
    print("detected at placement:", ok)
    if not ok:
        sys.exit("optimization failed to produce a detectable patch")

    # RGB colorization with constant hue: choose (r, g, b) per pixel so the
    # defined grayscale (30r + 59g + 11b + 50)//100 reproduces the gray value
    # while keeping a distinct chroma for camshift's RGB histogram.
    gray = patch_u8.astype(np.int32)
    r = np.clip(gray + 40, 0, 255)
    b = np.clip(gray - 60, 0, 255)
    # solve g from 30r + 59g + 11b ~= 100*gray
    g_ = np.clip((100 * gray - 30 * r - 11 * b + 29) // 59, 0, 255)
    rgb = np.stack([r, g_, b], axis=-1).astype(np.uint8)
    spec_gray = ((30 * r + 59 * g_ + 11 * b + 50) // 100)
    print("max gray error after colorization:", np.abs(spec_gray - gray).max())

    # verify the colorized patch still detects (grayscale path)
    from headtrackr_tpu.oracle.imageproc import grayscale as ogray
    frame_rgb = np.full((H, W, 3), (120, 100, 90), np.uint8)
    frame_rgb[py_:py_ + 24, px_:px_ + 24] = rgb
    dets2 = detect_objects(ogray(frame_rgb), c, 5, 1)
    ok2 = any(d["confidence"] > -10 and abs(d["x"] - px_) < 12 and
              abs(d["y"] - py_) < 12 for d in dets2)
    print("colorized frame detected:", ok2, dets2[:2])
    if not ok2:
        sys.exit("colorized patch not detectable")

    np.savez_compressed(OUT, gray=patch_u8, rgb=rgb)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
