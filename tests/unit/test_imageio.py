"""Native PNG decoder (runtime/_imageio.cpp) vs cv2 golden parity.

cv2.imwrite produces real libpng output (varied row filters chosen by
libpng's heuristics), so decoding those files back exercises Sub/Up/
Average/Paeth unfiltering against an independent encoder, and cv2.imread
is the byte-exact oracle.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laneslam.runtime import imageio  # noqa: E402


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("png")
    rng = np.random.default_rng(0)
    paths = {}

    # Structured gray image (gradients force varied PNG row filters).
    h, w = 97, 123
    yy, xx = np.mgrid[:h, :w]
    gray = ((xx * 2 + yy) % 256).astype(np.uint8)
    gray[20:40, 30:60] = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    p = str(d / "gray.png")
    cv2.imwrite(p, gray)
    paths["gray"] = p

    # RGB image -> decoder must match cv2's BGR->gray conversion.
    rgb = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    p = str(d / "rgb.png")
    cv2.imwrite(p, rgb)
    paths["rgb"] = p

    # Larger KITTI-shaped gray frame.
    big = rng.integers(0, 256, (376, 1241), dtype=np.uint8)
    big[::7] = (np.arange(1241) % 256).astype(np.uint8)
    p = str(d / "big.png")
    cv2.imwrite(p, big)
    paths["big"] = p
    return paths


def test_native_available():
    imageio._load()
    assert imageio.HAVE_NATIVE, "native decoder failed to build/load"


@pytest.mark.parametrize("name", ["gray", "rgb", "big"])
def test_decode_matches_cv2(images, name):
    path = images[name]
    got = imageio.imread_gray(path)
    want = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert got.shape == want.shape and got.dtype == np.uint8
    # Gray sources are lossless -> byte exact. RGB->gray rounding can differ
    # from cv2 by at most 1 LSB (different fixed-point width).
    tol = 1 if name == "rgb" else 0
    assert int(np.abs(got.astype(np.int32) - want.astype(np.int32)).max()) <= tol


def test_peek_size(images):
    assert imageio.peek_size(images["gray"]) == (97, 123)
    assert imageio.peek_size(images["big"]) == (376, 1241)


def test_batch_decode_threaded(images, tmp_path):
    # Many same-sized frames through the thread pool; byte-exact vs cv2.
    rng = np.random.default_rng(1)
    paths = []
    frames = []
    for k in range(9):
        f = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        p = str(tmp_path / f"f{k:03d}.png")
        cv2.imwrite(p, f)
        paths.append(p)
        frames.append(f)
    block = imageio.decode_batch_gray(paths, threads=3)
    assert block.shape == (9, 48, 64)
    np.testing.assert_array_equal(block, np.stack(frames))

    # Caller-provided output block (the prefetch ring slot path).
    out = np.zeros((9, 48, 64), np.uint8)
    got = imageio.decode_batch_gray(paths, out=out, threads=2)
    assert got is out
    np.testing.assert_array_equal(out, np.stack(frames))


def test_batch_fallback_on_bad_file(images, tmp_path):
    good = images["gray"]
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot a real png")
    with pytest.raises(Exception):
        imageio.decode_batch_gray([good, bad])
