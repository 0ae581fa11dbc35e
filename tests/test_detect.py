"""FAST-9/16 detection vs OpenCV oracle + cell top-k / adaptive threshold."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops import detect


def synthetic_corner_image(rng, h=240, w=320, n_blobs=60):
    """Smooth background + bright square blobs -> strong corners."""
    img = rng.uniform(40, 60, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3)
    pts = []
    for _ in range(n_blobs):
        y = rng.randint(10, h - 10)
        x = rng.randint(10, w - 10)
        img[y - 2 : y + 3, x - 2 : x + 3] += rng.uniform(80, 120)
        pts.append((x, y))
    return np.clip(img, 0, 255), pts


class TestScoreMap:
    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        assert float(detect.fast_score_map(img).max()) == 0.0

    def test_isolated_bright_pixel_not_corner(self):
        # a single bright pixel: ring around it is uniform -> it is NOT a
        # FAST corner at its own location (ring all darker IS a corner!)
        img = np.full((32, 32), 50.0, np.float32)
        img[16, 16] = 250.0
        s = np.asarray(detect.fast_score_map(jnp.array(img)))
        assert s[16, 16] > 0  # ring all darker by 200 -> dark-arc corner

    def test_bright_blob_corner_score(self):
        img = np.full((32, 32), 50.0, np.float32)
        img[14:19, 14:19] = 200.0  # 5x5 blob: its corners are FAST corners
        s = np.asarray(detect.fast_score_map(jnp.array(img)))
        assert s[14, 14] > 0 and s[18, 18] > 0

    def test_matches_opencv_fast_corners(self, rng):
        img, _ = synthetic_corner_image(rng)
        img_u8 = img.astype(np.uint8)
        th = 25
        fast = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16,
        )
        cv_kps = {(int(k.pt[0]), int(k.pt[1])) for k in fast.detect(img_u8)}
        score = np.asarray(detect.nms3x3(detect.fast_score_map(jnp.array(
            img_u8.astype(np.float32)))))
        ours = {(x, y) for y, x in zip(*np.where(score > th))}
        assert len(cv_kps) > 10
        # criterion is identical; NMS tie-breaking may differ slightly.
        # demand high mutual overlap within 1px
        def near(a, bset):
            return any((a[0] + dx, a[1] + dy) in bset
                       for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        hit = sum(near(p, ours) for p in cv_kps) / len(cv_kps)
        assert hit > 0.9, hit

    def test_border_is_zero(self, rng):
        img, _ = synthetic_corner_image(rng, 64, 64)
        s = np.asarray(detect.fast_score_map(jnp.array(img)))
        assert s[:3].max() == 0 and s[-3:].max() == 0
        assert s[:, :3].max() == 0 and s[:, -3:].max() == 0


class TestDetectCorners:
    def test_finds_blobs(self, rng):
        img, pts = synthetic_corner_image(rng)
        det = detect.detect_corners(
            jnp.array(img), 25.0, cell_size=80, max_per_cell=50,
        )
        kp = np.asarray(det.kp)[np.asarray(det.valid)]
        assert len(kp) > 30
        # every detected corner should be near a blob
        pts_a = np.array(pts)
        d = np.linalg.norm(kp[:, None] - pts_a[None], axis=-1).min(1)
        assert (d < 5).mean() > 0.95

    def test_per_cell_cap(self, rng):
        img, _ = synthetic_corner_image(rng, 160, 160, n_blobs=120)
        det = detect.detect_corners(
            jnp.array(img), 10.0, cell_size=80, max_per_cell=5,
        )
        kp = np.asarray(det.kp)[np.asarray(det.valid)]
        # max 4 cells of (160/80)^2 * 5
        assert len(kp) <= 20
        for cy in range(2):
            for cx in range(2):
                in_cell = (
                    (kp[:, 0] >= cx * 80) & (kp[:, 0] < (cx + 1) * 80)
                    & (kp[:, 1] >= cy * 80) & (kp[:, 1] < (cy + 1) * 80)
                )
                assert in_cell.sum() <= 5

    def test_adaptive_threshold_fallback(self, rng):
        """Weak-texture image: count < corners_low_threshold fires the
        halved-threshold retry (reference lvt_image_features_handler.cpp:161-169)."""
        img = rng.uniform(95, 130, (128, 128)).astype(np.float32)
        det_strict = detect.detect_corners(
            jnp.array(img), 60.0, cell_size=64, max_per_cell=150,
            corners_low_threshold=0,  # no fallback
        )
        det_fallback = detect.detect_corners(
            jnp.array(img), 60.0, cell_size=64, max_per_cell=150,
            corners_low_threshold=200,  # fallback to threshold 30
        )
        assert float(det_fallback.threshold_used) == 30.0
        assert int(det_fallback.count) >= int(det_strict.count)

    def test_fallback_counts_selected_corners(self, rng):
        """The fallback decision keys on what selection would actually
        produce: with max_per_cell capping selection below the bar, the
        halved threshold must fire even if the raw above-threshold count
        exceeds corners_low_threshold."""
        img, _ = synthetic_corner_image(rng, 128, 128, n_blobs=60)
        det = detect.detect_corners(
            jnp.array(img), 20.0, cell_size=64, max_per_cell=2,
            corners_low_threshold=9,  # 4 cells * 2 = 8 selected < 9
        )
        assert float(det.threshold_used) == 10.0

    def test_single_cell_image(self, rng):
        """cell_size larger than the image (TUM config: 2000 on 640x480)."""
        img, _ = synthetic_corner_image(rng, 120, 160)
        det = detect.detect_corners(
            jnp.array(img), 20.0, cell_size=2000, max_per_cell=100,
        )
        assert det.kp.shape[0] == 100
        assert int(det.count) > 10

    def test_kp_coordinates_valid(self, rng):
        img, _ = synthetic_corner_image(rng)
        det = detect.detect_corners(jnp.array(img), 25.0, cell_size=80,
                                    max_per_cell=50)
        kp = np.asarray(det.kp)[np.asarray(det.valid)]
        assert (kp[:, 0] >= 3).all() and (kp[:, 0] < 320 - 3).all()
        assert (kp[:, 1] >= 3).all() and (kp[:, 1] < 240 - 3).all()


def test_subpixel_slice_matches_scatter(rng):
    """_subpixel_refine_slice (one (3,3) dynamic_slice per corner) equals
    the scattered-gather _subpixel_refine bit for bit."""
    import jax.numpy as jnp

    from lvt_tpu.ops.detect import (
        _subpixel_refine, _subpixel_refine_flat, _subpixel_refine_slice,
        fast_score_map,
    )

    img = jnp.asarray(rng.randint(0, 255, (120, 160)).astype(np.float32))
    raw = fast_score_map(img)
    k = 200
    x = jnp.asarray(rng.randint(0, 160, k).astype(np.int32))
    y = jnp.asarray(rng.randint(0, 120, k).astype(np.int32))
    xa, ya = _subpixel_refine(raw, x, y)
    for fn in (_subpixel_refine_slice, _subpixel_refine_flat):
        xb, yb = fn(raw, x, y)
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xa))
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(ya))


def test_select_corners_gather_modes_agree(rng):
    import jax.numpy as jnp

    from lvt_tpu.ops import detect

    img = jnp.asarray(rng.randint(0, 255, (120, 160)).astype(np.float32))
    raw = detect.fast_score_map(img)
    nms = detect.nms3x3(raw)
    a = detect.select_corners(raw, nms, 15, cell_size=64, max_per_cell=32,
                              gather_mode="scatter")
    for mode in ("slice", "flat"):
        b = detect.select_corners(raw, nms, 15, cell_size=64,
                                  max_per_cell=32, gather_mode=mode)
        np.testing.assert_array_equal(np.asarray(a.kp), np.asarray(b.kp))
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
