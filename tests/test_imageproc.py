"""Golden tests: jitted image primitives vs the NumPy oracle (exact equality)."""

import jax
import jax.numpy as jnp
import numpy as np

from headtrackr_tpu.oracle import imageproc as oi
from headtrackr_tpu.ops import imageproc as ji


def test_grayscale_exact(rng):
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    want = oi.grayscale(rgb)
    got = np.asarray(jax.jit(ji.grayscale)(jnp.asarray(rgb)))
    np.testing.assert_array_equal(got, want)


def test_grayscale_spec_vs_js64_within_1(rng):
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    spec = oi.grayscale(rgb, mode="spec").astype(int)
    js64 = oi.grayscale(rgb, mode="js64").astype(int)
    assert np.abs(spec - js64).max() <= 1


def test_whitebalance_close(rng):
    rgb = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    want = oi.whitebalance(rgb)
    got = float(jax.jit(ji.whitebalance)(jnp.asarray(rgb)))
    assert abs(got - want) < 1e-3


def test_resize_bilinear_matches_oracle(rng):
    src = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    cases = [
        (0, 0, 47, 33, 23, 16, 23, 16),     # plain downscale
        (0, 0, 47, 33, 47, 33, 47, 33),     # identity
        (1, 0, 46, 33, 21, 16, 23, 16),     # shifted region, shrunken dest
        (1, 1, 46, 32, 21, 14, 23, 16),
    ]
    for (sx, sy, sw, sh, dw, dh, ow, oh) in cases:
        want = oi.draw_image(src, sx, sy, sw, sh, dw, dh, ow, oh)
        got = np.asarray(ji.resize_bilinear(jnp.asarray(src), sx, sy, sw, sh,
                                            dw, dh, ow, oh))
        np.testing.assert_array_equal(got, want, err_msg=str((sx, sy, sw, sh)))


def test_pyramid_exact(rng):
    g = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    pyr_o, _, _, _ = oi.build_pyramid(g)
    pyr_j, _ = ji.build_pyramid(jnp.asarray(g))
    assert set(pyr_o) == set(pyr_j)
    for k in pyr_o:
        np.testing.assert_array_equal(np.asarray(pyr_j[k]), pyr_o[k],
                                      err_msg=f"plane {k}")
