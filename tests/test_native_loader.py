"""Native C++ PNG loader vs OpenCV oracle (skipped if lib unavailable)."""

import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lvt_tpu.io import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native loader not built")


@pytest.fixture
def imgs(rng):
    d = tempfile.mkdtemp()
    g = rng.randint(0, 256, (120, 200), np.uint8)
    pg = os.path.join(d, "g.png")
    cv2.imwrite(pg, g)
    d16 = rng.randint(0, 65535, (90, 130)).astype(np.uint16)
    p16 = os.path.join(d, "d.png")
    cv2.imwrite(p16, d16)
    c = rng.randint(0, 256, (60, 80, 3), np.uint8)
    pc = os.path.join(d, "c.png")
    cv2.imwrite(pc, c)
    return {"gray8": (pg, g), "gray16": (p16, d16), "rgb": (pc, c)}


def test_gray8(imgs):
    path, want = imgs["gray8"]
    np.testing.assert_array_equal(nl.imread_gray_native(path), want)


def test_gray16_depth(imgs):
    path, want = imgs["gray16"]
    np.testing.assert_array_equal(nl.imread_native(path), want)


def test_rgb(imgs):
    path, bgr = imgs["rgb"]
    got = nl.imread_native(path)  # file stores RGB; cv2 wrote from BGR
    np.testing.assert_array_equal(got, bgr[..., ::-1])


def test_gray_luma_matches_cv2(imgs):
    path, _ = imgs["rgb"]
    got = nl.imread_gray_native(path).astype(int)
    want = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(int)
    assert np.abs(got - want).max() <= 1  # rounding differences only


def test_batch(imgs):
    path, want = imgs["gray8"]
    batch = nl.imread_gray_batch([path] * 5, 200, 120, n_threads=3)
    assert batch.shape == (5, 120, 200)
    for i in range(5):
        np.testing.assert_array_equal(batch[i], want)


def test_probe(imgs):
    path, want = imgs["gray16"]
    assert nl.probe(path) == (130, 90, 1, 16)


def test_datasets_imread_uses_native(imgs):
    from lvt_tpu.io import datasets

    path, want = imgs["gray8"]
    np.testing.assert_array_equal(datasets.imread_gray(path), want)
