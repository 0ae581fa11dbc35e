"""Fused Pallas perception kernel vs the unfused XLA path (interpret mode on
CPU; the same kernel compiles for TPU in production)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops import brief, detect
from lvt_tpu.ops.perception_pallas import perception_maps


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(3)
    base = rng.uniform(0, 255, (200, 300)).astype(np.float32)
    return cv2.GaussianBlur(base, (0, 0), 1.5)


@pytest.fixture(scope="module")
def fused(img):
    raw, nms, planes = perception_maps(jnp.array(img), interpret=True)
    return np.asarray(raw), np.asarray(nms), np.asarray(planes)


def test_score_map_matches(img, fused):
    raw, _, _ = fused
    want = np.asarray(detect.fast_score_map(jnp.array(img)))
    np.testing.assert_allclose(raw, want, atol=1e-3)


def test_nms_matches(img, fused):
    _, nms, _ = fused
    want = np.asarray(detect.nms3x3(detect.fast_score_map(jnp.array(img))))
    np.testing.assert_allclose(nms, want, atol=1e-3)


def test_brief_planes_match_within_float_order(img, fused):
    _, _, planes = fused
    want = np.asarray(
        brief.dense_descriptor_planes(brief.box_smooth(jnp.array(img)))
    )
    # identical except where the 9x9 box sums differ in summation order by
    # 1 ulp at a test pair's equality boundary
    m = brief.BORDER
    interior = (planes ^ want)[:, m:-m, m:-m]
    diff_bits = np.unpackbits(interior.copy().view(np.uint8)).sum()
    total_bits = interior.size * 32
    assert diff_bits / total_bits < 1e-4, diff_bits


def test_full_extraction_equivalence(img):
    """End-to-end: keypoints + descriptors from the fused path match the
    unfused extraction for the overwhelming majority of features."""
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.extract import extract_features

    cfg = dict(
        fx=260.0, fy=260.0, cx=150.0, cy=100.0, baseline=0.2,
        img_width=300, img_height=200,
        detection_cell_size=100, max_keypoints_per_cell=64,
        agast_threshold=12,
    )
    f_ref = extract_features(
        jnp.array(img), VOConfig(**cfg, use_pallas_perception=False)
    )

    raw, nms, planes = perception_maps(jnp.array(img), interpret=True)
    det = detect.select_corners(
        raw, nms, 12.0, cell_size=100, max_per_cell=64,
        spread_ties=False,   # extraction disables the dither for float
    )                        # frames (core/extract._spread_ties)
    desc, valid = brief.descriptors_from_planes(
        planes, det.kp_int.astype(jnp.float32), det.valid)

    np.testing.assert_allclose(np.asarray(det.kp), np.asarray(f_ref.kp)[: det.kp.shape[0]], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.asarray(f_ref.valid)[: valid.shape[0]])
    d_ref = np.asarray(f_ref.desc)[: desc.shape[0]]
    xor = np.asarray(desc) ^ d_ref
    ham = np.unpackbits(xor.view(np.uint8), axis=-1).sum(-1)
    assert (ham[np.asarray(valid)] <= 2).mean() > 0.99


@pytest.mark.slow  # the path is blocked on current hardware (interpret-only)
def test_uint8_int16_path_matches_f32_path(img):
    """The int16 kernel-A path (32-bit sublane-pair rolls, enabled via the
    ``int16`` static argument / config.int16_perception) is EXACT for
    uint8 frames — box sums <= 20655, diffs in +-255 — verified in
    interpret mode against the f32 kernels bit for bit. On-hardware
    validation: scripts/tpu_patch_check.py."""
    from lvt_tpu.ops import perception_pallas as pp

    u8 = np.clip(img, 0, 255).astype(np.uint8)
    outs_i = pp.perception_maps_batched(
        jnp.array(u8)[None], interpret=True, int16=True)
    outs_f = pp.perception_maps_batched(
        jnp.array(u8)[None], interpret=True, int16=False)
    for got, want, name in zip(outs_i, outs_f, ("raw", "nms", "planes")):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name)
    # the patch-mode entry point agrees too (padded maps)
    nms_i, raw_i, sm_i = pp.perception_patch_maps_batched(
        jnp.array(u8)[None], interpret=True, int16=True)
    nms_f, raw_f, sm_f = pp.perception_patch_maps_batched(
        jnp.array(u8)[None], interpret=True, int16=False)
    np.testing.assert_array_equal(np.asarray(nms_i), np.asarray(nms_f))
    np.testing.assert_array_equal(np.asarray(raw_i), np.asarray(raw_f))
    np.testing.assert_array_equal(np.asarray(sm_i), np.asarray(sm_f))


@pytest.mark.slow  # the path is blocked on v5e (interpret-only)
def test_uint8_bf16_score_path_matches_f32_path(img):
    """The bf16 score-side path (BF16_SCORE_DEFAULT; exact for uint8
    frames — FAST diffs/scores are integers in [-255, 255], all exactly
    representable in bf16) is bit-identical to the f32 kernels. On-chip
    gate: scripts/tpu_patch_check.py."""
    from lvt_tpu.ops import perception_pallas as pp

    u8 = np.clip(img, 0, 255).astype(np.uint8)
    for entry in (pp.perception_maps_batched,
                  pp.perception_patch_maps_batched):
        outs_b = entry(jnp.array(u8)[None], interpret=True, bf16_score=True)
        outs_f = entry(jnp.array(u8)[None], interpret=True, bf16_score=False)
        for got, want in zip(outs_b, outs_f):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
