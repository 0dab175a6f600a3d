"""Native host preprocessing (runtime/_preproc.cpp) vs NumPy fallback.

The native library and the fallback must be bit-identical — both implement
the same fixed-point BT.601 and round-half-up box filter. If g++ is absent
the test still validates the fallback against hand-computed cases.
"""

import numpy as np
import pytest

from laneslam.runtime import host_preproc as hp


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_native_builds_here():
    hp._load()
    # g++ is env-verified present (SURVEY.md §7.1): the native path must be
    # live in this environment, not silently falling back.
    assert hp.HAVE_NATIVE


def test_rgb_to_gray_matches_fallback(rng):
    rgb = rng.randint(0, 256, (37, 53, 3), np.uint8)
    native = hp.rgb_to_gray(rgb)
    r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
    ref = ((9798 * r + 19235 * g + 3735 * b + 16384) >> 15).astype(np.uint8)
    np.testing.assert_array_equal(native, ref)


def test_rgb_to_gray_bt601_weights():
    # Pure channels: weights round to the BT.601 coefficients.
    for ch, w in [(0, 0.299), (1, 0.587), (2, 0.114)]:
        px = np.zeros((1, 1, 3), np.uint8)
        px[0, 0, ch] = 255
        assert abs(int(hp.rgb_to_gray(px)[0, 0]) - round(255 * w)) <= 1


def test_downscale2x(rng):
    g = rng.randint(0, 256, (40, 64), np.uint8)
    out = hp.downscale2x(g)
    a = g.astype(np.uint32)
    ref = ((a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2] + 2) >> 2)
    np.testing.assert_array_equal(out, ref.astype(np.uint8))
    assert out.shape == (20, 32)


def test_to_f32_and_pack(rng):
    frames = [rng.randint(0, 256, (24, 32), np.uint8) for _ in range(3)]
    one = hp.to_f32(frames[0], scale=1.0 / 255.0)
    np.testing.assert_allclose(one, frames[0].astype(np.float32) / 255.0, rtol=1e-6)
    packed = hp.pack_frames(frames, scale=2.0)
    assert packed.shape == (3, 24, 32) and packed.dtype == np.float32
    for k in range(3):
        np.testing.assert_allclose(packed[k], 2.0 * frames[k].astype(np.float32))
