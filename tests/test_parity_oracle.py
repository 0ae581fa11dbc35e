"""Trajectory-level parity vs the reference oracle (golden regression).

The reference's acceptance method is trajectory evaluation of its example
drivers (SURVEY.md §4; kitti_example.cpp:33-47). Here: a faithful CPU oracle
of the reference pipeline (tools/oracle) was run over deterministic
synthetic-world scenarios by scripts/make_goldens.py and its trajectories +
ATE stored under tests/golden/. This test runs lvt_tpu over the SAME frames
and asserts its ATE is within margin of the oracle's — proving the TPU-native
re-design tracks at least as accurately as the reference behavior.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from lvt_tpu.config import VOConfig
from lvt_tpu.core.system import SensorType, VOSystem
from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.io.synthetic import ate_rmse
from lvt_tpu.io.trajectory import rot_rmse_deg, rpe_rmse
from tools.oracle.scenarios import SCENARIOS

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _config(sc) -> VOConfig:
    world = sc.world()
    return VOConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height, use_pallas_perception=False,
        **dict(sc.vo_overrides),
    )


@pytest.mark.parametrize(
    "sc",
    [pytest.param(s, marks=[] if s.name == "fast" else [pytest.mark.slow])
     for s in SCENARIOS],
    ids=[s.name for s in SCENARIOS],
)
def test_trajectory_within_oracle_margin(sc):
    """Three parity axes against the stored oracle run on identical frames:
    absolute trajectory error, 1-frame relative pose error (local drift),
    and rotation RMSE — each bounded by oracle * rel_margin + abs."""
    golden_path = GOLDEN_DIR / f"{sc.name}.npz"
    assert golden_path.exists(), (
        f"golden fixture missing; run scripts/make_goldens.py {sc.name}"
    )
    golden = np.load(golden_path)
    assert int(golden["n_frames"]) == sc.n_frames, "fixture out of date"

    sensor = SensorType.RGBD if sc.sensor == "rgbd" else SensorType.STEREO
    vo = VOSystem(_config(sc), sensor)
    if sc.reset_on_lost:
        from lvt_tpu.core.system import TrackingState
        from tools.oracle.scenarios import run_with_reset_on_lost

        def track(a, b):
            pose = vo.track(a, b)
            return (np.asarray(quat.to_matrix(pose.q)),
                    np.asarray(pose.t))

        est_r, est, gt_r, gt, went_lost = run_with_reset_on_lost(
            track, vo.get_state, vo.reset, sc.frames(),
            lost_state=TrackingState.LOST,
        )
        est_r = list(est_r)
        assert went_lost, "blackout never caused LOST"
        assert vo.get_state() == TrackingState.TRACKING, "did not recover"
    else:
        est, est_r, gt, gt_r = [], [], [], []
        for a, b, (r, t) in sc.frames():
            pose = vo.track(a, b)
            est.append(np.asarray(pose.t))
            est_r.append(np.asarray(quat.to_matrix(pose.q)))
            gt.append(t)
            gt_r.append(r)
        est, gt = np.array(est), np.array(gt)
    checks = [
        ("ATE", ate_rmse(est, gt), float(golden["ate"]), sc.abs_margin, "m"),
        ("RPE(1)", rpe_rmse(est, gt), float(golden["rpe"]),
         sc.rpe_abs_margin, "m"),
        ("rot", rot_rmse_deg(np.array(est_r), np.array(gt_r)),
         float(golden["rot"]), sc.rot_abs_margin, "deg"),
    ]
    failures = [
        f"{name}: lvt_tpu {ours:.4f} {unit} > bound "
        f"{oracle * sc.rel_margin + abs_m:.4f} {unit} "
        f"(oracle {oracle:.4f} {unit})"
        for name, ours, oracle, abs_m, unit in checks
        if ours > oracle * sc.rel_margin + abs_m
    ]
    assert not failures, f"{sc.name}: " + "; ".join(failures)


def test_descriptor_level_parity(rng):
    """The oracle's BRIEF (cv2 boxFilter + NumPy sampling) and lvt_tpu's
    (jnp box sums + dense bit planes) share the pattern and must agree
    bit-for-bit up to float summation order at test-pair equality
    boundaries — a much stronger check than trajectory-level ATE."""
    import cv2
    import jax.numpy as jnp

    from lvt_tpu.ops import brief
    from lvt_tpu.ops.hamming import hamming_matrix
    from tools.oracle import features as feat

    img = rng.uniform(0, 255, (200, 300)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.5).astype(np.uint8)
    k = 50
    xs = rng.uniform(brief.BORDER + 1, 300 - brief.BORDER - 1, k)
    ys = rng.uniform(brief.BORDER + 1, 200 - brief.BORDER - 1, k)
    kps = [cv2.KeyPoint(float(x), float(y), 7.0) for x, y in zip(xs, ys)]

    kept, desc_bytes = feat.brief_compute(img, kps)
    assert len(kept) == k
    words_oracle = jnp.asarray(
        feat.desc_bytes_to_words(desc_bytes).astype(np.uint32))

    kp_arr = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    d_tpu, valid = brief.compute_descriptors(
        jnp.asarray(img, jnp.float32), kp_arr, jnp.ones(k, bool))
    assert np.asarray(valid).all()

    ham = np.diag(np.asarray(hamming_matrix(words_oracle, d_tpu)))
    assert (ham <= 3).all(), ham.max()
    assert np.median(ham) == 0


@pytest.mark.slow
def test_goldens_tracked_to_completion():
    """The stored oracle runs themselves must not have been LOST — otherwise
    the ATE bound is vacuous."""
    for sc in SCENARIOS:
        golden = np.load(GOLDEN_DIR / f"{sc.name}.npz")
        assert int(golden["final_state"]) == 2, f"{sc.name}: oracle lost"
        assert golden["est_t"].shape == golden["gt_t"].shape
