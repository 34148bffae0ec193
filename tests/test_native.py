"""Native C++ batch preprocessor: build, bind, and match the numpy path."""

import numpy as np
import pytest

from stylegan3_editing_tpu.data import native

RNG = np.random.RandomState(0)


def test_native_library_builds():
    lib = native.get_library()
    assert lib is not None, "g++ build of the native preprocessor failed"


def test_normalize_batch_matches_numpy():
    imgs = RNG.randint(0, 256, (3, 17, 23, 3), dtype=np.uint8)
    flip = np.array([1, 0, 1], np.uint8)
    got = native.normalize_batch(imgs, flip)
    want = imgs.astype(np.float32) * (2.0 / 255.0) - 1.0
    want[[0, 2]] = want[[0, 2]][:, :, ::-1]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_normalize_batch_no_flip():
    imgs = RNG.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    got = native.normalize_batch(imgs)
    want = imgs.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
