"""Feature extraction stage: detection + description (+ RGB-D filtering).

TPU-native equivalent of the reference's ``lvt_image_features_handler``
(lvt/src/lvt_image_features_handler.cpp:131-300). The reference processes the
two stereo images on two CPU threads (:196-209); here both images are one
batch dimension of the same jitted computation. All outputs are padded to the
static keypoint capacity with validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lvt_tpu.config import VOConfig
from lvt_tpu.core.features import FrameFeatures
from lvt_tpu.ops import brief, detect, undistort


def _pad_to(arr: jnp.ndarray, capacity: int, axis: int = 0) -> jnp.ndarray:
    n = arr.shape[axis]
    if n == capacity:
        return arr
    assert n < capacity, f"detector output {n} exceeds capacity {capacity}"
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, capacity - n)
    return jnp.pad(arr, pad)


def _use_pallas(config: VOConfig) -> bool:
    if config.use_pallas_perception is not None:
        return config.use_pallas_perception
    return jax.default_backend() == "tpu"


def extract_features(img: jnp.ndarray, config: VOConfig) -> FrameFeatures:
    """Detect + describe one grayscale image -> FrameFeatures [kp_capacity].

    On TPU the score maps + BRIEF bit-planes come from the fused Pallas
    perception kernel (one pass over the image in VMEM); elsewhere from the
    equivalent XLA ops. Selection/gather stages are shared.
    """
    if _use_pallas(config):
        from lvt_tpu.ops.perception_pallas import perception_maps

        score_raw, score_nms, planes = perception_maps(img)
    else:
        score_raw = detect.fast_score_map(img.astype(jnp.float32))
        score_nms = detect.nms3x3(score_raw)
        planes = brief.dense_descriptor_planes(
            brief.box_smooth(img.astype(jnp.float32))
        )
    det = detect.select_corners(
        score_raw, score_nms,
        config.agast_threshold,
        cell_size=config.detection_cell_size,
        max_per_cell=config.max_keypoints_per_cell,
        corners_low_threshold=config.corners_low_threshold,
    )
    desc, valid = brief.descriptors_from_planes(planes, det.kp, det.valid)
    cap = config.kp_capacity
    return FrameFeatures(
        kp=_pad_to(det.kp, cap),
        desc=_pad_to(desc, cap),
        score=_pad_to(det.score, cap),
        depth=jnp.zeros((cap,), jnp.float32),
        valid=_pad_to(valid, cap),
    )


def extract_features_stereo(
    img_left: jnp.ndarray, img_right: jnp.ndarray, config: VOConfig
) -> tuple[FrameFeatures, FrameFeatures]:
    """Both stereo images as one batch dim (replaces the reference's
    std::thread split, lvt_image_features_handler.cpp:196-209)."""
    both = jnp.stack([img_left, img_right])
    feats = jax.vmap(lambda im: extract_features(im, config))(both)
    left = jax.tree.map(lambda a: a[0], feats)
    right = jax.tree.map(lambda a: a[1], feats)
    return left, right


def extract_features_rgbd(
    img_gray: jnp.ndarray, img_depth: jnp.ndarray, config: VOConfig
) -> FrameFeatures:
    """RGB-D path: detect + describe, then keep only keypoints with valid
    depth in [near, far], undistorting positions if k1 != 0
    (lvt_image_features_handler.cpp:227-300). Fixed shapes: filtering clears
    the validity mask instead of compacting."""
    feats = extract_features(img_gray, config)
    xi = jnp.clip(feats.kp[:, 0].astype(jnp.int32), 0, config.img_width - 1)
    yi = jnp.clip(feats.kp[:, 1].astype(jnp.int32), 0, config.img_height - 1)
    d = img_depth[yi, xi]
    depth_ok = (d >= config.near_plane_distance) & (d <= config.far_plane_distance)
    valid = feats.valid & depth_ok

    if abs(config.k1) > 1e-5:
        kp_und = undistort.undistort_points(
            feats.kp,
            config.fx, config.fy, config.cx, config.cy,
            config.k1, config.k2, config.p1, config.p2, config.k3,
        )
    else:
        kp_und = feats.kp
    return feats._replace(kp=kp_und, depth=d, valid=valid)


def describe_external_corners(
    img: jnp.ndarray,
    corners: jnp.ndarray,       # [N, 2] float32 caller-provided positions
    corners_valid: jnp.ndarray,  # [N] bool
    config: VOConfig,
) -> FrameFeatures:
    """Descriptors-only path for externally supplied corners
    (== compute_descriptors_only, lvt_image_features_handler.cpp:178-225,
    exposed through track_with_external_corners)."""
    desc, valid = brief.compute_descriptors(img, corners, corners_valid)
    cap = config.kp_capacity
    return FrameFeatures(
        kp=_pad_to(corners.astype(jnp.float32), cap),
        desc=_pad_to(desc, cap),
        score=jnp.zeros((cap,), jnp.float32),
        depth=jnp.zeros((cap,), jnp.float32),
        valid=_pad_to(valid, cap),
    )
