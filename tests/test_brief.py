"""BRIEF descriptor properties: determinism, locality, discrimination."""

import cv2
import jax.numpy as jnp
import numpy as np

from lvt_tpu.ops import brief
from lvt_tpu.ops.hamming import hamming_matrix


def textured_image(rng, h=200, w=300):
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (0, 0), 1.5)


def test_pattern_properties():
    pat = brief.test_pattern()
    assert pat.shape == (256, 2, 2)
    assert np.abs(pat).max() <= brief.PATCH_SIZE // 2
    # no degenerate pairs
    assert not np.all(pat[:, 0] == pat[:, 1], axis=-1).any()
    # deterministic
    np.testing.assert_array_equal(pat, brief.test_pattern())


def test_box_smooth_matches_opencv_boxfilter(rng):
    img = textured_image(rng, 64, 64)
    got = np.asarray(brief.box_smooth(jnp.array(img))) / 81.0
    want = cv2.blur(img, (9, 9), borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(got[5:-5, 5:-5], want[5:-5, 5:-5], rtol=1e-4)


def test_border_keypoints_invalidated(rng):
    img = jnp.array(textured_image(rng))
    kp = jnp.array([[10.0, 100.0], [150.0, 100.0], [290.0, 100.0],
                    [150.0, 10.0], [150.0, 190.0]])
    _, valid = brief.compute_descriptors(img, kp, jnp.ones(5, bool))
    np.testing.assert_array_equal(np.asarray(valid), [False, True, False, False, False])


def test_descriptors_deterministic_and_discriminative(rng):
    img = textured_image(rng)
    k = 40
    kp = np.stack(
        [rng.uniform(40, 260, k), rng.uniform(40, 160, k)], -1
    ).astype(np.float32)
    d1, v1 = brief.compute_descriptors(jnp.array(img), jnp.array(kp), jnp.ones(k, bool))
    d2, _ = brief.compute_descriptors(jnp.array(img), jnp.array(kp), jnp.ones(k, bool))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert np.asarray(v1).all()
    # distances: self = 0, cross-keypoint should be near 128 (random bits)
    dist = np.asarray(hamming_matrix(d1, d1))
    np.testing.assert_array_equal(np.diag(dist), 0)
    off = dist[~np.eye(k, dtype=bool)]
    assert off.mean() > 80, off.mean()


def test_descriptor_stable_under_shift(rng):
    """The same world patch shifted by a whole pixel keeps its descriptor."""
    img = textured_image(rng)
    shifted = np.roll(img, 7, axis=1)
    kp = np.array([[100.0, 100.0], [180.0, 60.0]], np.float32)
    kp_shift = kp + [7.0, 0.0]
    da, _ = brief.compute_descriptors(jnp.array(img), jnp.array(kp), jnp.ones(2, bool))
    db, _ = brief.compute_descriptors(jnp.array(shifted), jnp.array(kp_shift), jnp.ones(2, bool))
    dist = np.asarray(hamming_matrix(da, db))
    assert dist[0, 0] == 0 and dist[1, 1] == 0


def test_descriptor_robust_to_noise(rng):
    img = textured_image(rng)
    noisy = img + rng.randn(*img.shape).astype(np.float32) * 2.0
    k = 30
    kp = np.stack(
        [rng.uniform(40, 260, k), rng.uniform(40, 160, k)], -1
    ).astype(np.float32)
    da, _ = brief.compute_descriptors(jnp.array(img), jnp.array(kp), jnp.ones(k, bool))
    db, _ = brief.compute_descriptors(jnp.array(noisy), jnp.array(kp), jnp.ones(k, bool))
    dist = np.asarray(hamming_matrix(da, db))
    assert np.diag(dist).mean() < 30   # same point barely changes
    assert dist[~np.eye(k, dtype=bool)].mean() > 80


def test_extract_features_end_to_end(rng):
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.extract import extract_features, extract_features_stereo

    img = textured_image(rng, 240, 320)
    cfg = VOConfig(
        fx=300.0, fy=300.0, cx=160.0, cy=120.0, baseline=0.2,
        img_width=320, img_height=240,
        detection_cell_size=80, max_keypoints_per_cell=64, agast_threshold=15,
    )
    feats = extract_features(jnp.array(img), cfg)
    assert feats.kp.shape == (cfg.kp_capacity, 2)
    assert feats.desc.shape == (cfg.kp_capacity, 8)
    n = int(feats.count())
    assert n > 50
    # stereo: right = shifted copy -> same feature count ballpark
    left, right = extract_features_stereo(
        jnp.array(img), jnp.array(np.roll(img, 5, 1)), cfg
    )
    assert abs(int(left.count()) - int(right.count())) < 40


def test_extract_rgbd_depth_filter(rng):
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.extract import extract_features_rgbd

    img = textured_image(rng, 240, 320)
    depth = np.full((240, 320), 2.0, np.float32)
    depth[:, 160:] = 100.0  # beyond far plane on the right half
    cfg = VOConfig(
        fx=300.0, fy=300.0, cx=160.0, cy=120.0,
        img_width=320, img_height=240,
        near_plane_distance=0.1, far_plane_distance=5.0,
        detection_cell_size=80, max_keypoints_per_cell=64, agast_threshold=15,
    )
    feats = extract_features_rgbd(jnp.array(img), jnp.array(depth), cfg)
    kp = np.asarray(feats.kp)[np.asarray(feats.valid)]
    assert len(kp) > 10
    assert (kp[:, 0] < 160).all()
    d = np.asarray(feats.depth)[np.asarray(feats.valid)]
    np.testing.assert_allclose(d, 2.0)


def test_sparse_matches_dense_planes(rng):
    """The production sparse path (one flat gather at keypoints) must be
    bit-identical to gathering the dense bit-planes at the same keypoints —
    same smoothed values, same comparisons (ops/brief.descriptors_sparse)."""
    img = jnp.asarray(rng.randint(0, 255, (96, 128)).astype(np.float32))
    smooth = brief.box_smooth(img)
    planes = brief.dense_descriptor_planes(smooth)
    k = 64
    kp = jnp.asarray(
        np.stack([rng.uniform(0, 128, k), rng.uniform(0, 96, k)], -1)
    ).astype(jnp.float32)
    valid_in = jnp.asarray(rng.rand(k) > 0.2)

    d_dense, v_dense = brief.descriptors_from_planes(planes, kp, valid_in)
    d_sparse, v_sparse = brief.descriptors_sparse(smooth, kp, valid_in)
    np.testing.assert_array_equal(np.asarray(v_sparse), np.asarray(v_dense))
    np.testing.assert_array_equal(np.asarray(d_sparse), np.asarray(d_dense))


def test_slice8_gather_matches_scatter(rng):
    """descriptors_from_planes_slice8 (contiguous dynamic-slice gather from
    interleaved planes) is bit-identical to descriptors_from_planes."""
    img = jnp.asarray(rng.randint(0, 255, (96, 128)).astype(np.float32))
    planes = brief.dense_descriptor_planes(brief.box_smooth(img))
    k = 64
    kp = jnp.asarray(
        np.stack([rng.uniform(0, 128, k), rng.uniform(0, 96, k)], -1)
    ).astype(jnp.float32)
    valid_in = jnp.asarray(rng.rand(k) > 0.2)
    d_a, v_a = brief.descriptors_from_planes(planes, kp, valid_in)
    for fn in (brief.descriptors_from_planes_slice8,
               brief.descriptors_from_planes_flat):
        d_b, v_b = fn(planes, kp, valid_in)
        np.testing.assert_array_equal(np.asarray(v_b), np.asarray(v_a))
        np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_a))
