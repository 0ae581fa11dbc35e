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
from lvt_tpu.io.synthetic import ate_rmse
from tools.oracle.scenarios import SCENARIOS

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _config(sc) -> VOConfig:
    world = sc.world()
    return VOConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height, use_pallas_perception=False,
    )


@pytest.mark.parametrize("sc", SCENARIOS, ids=[s.name for s in SCENARIOS])
def test_ate_within_oracle_margin(sc):
    golden_path = GOLDEN_DIR / f"{sc.name}.npz"
    assert golden_path.exists(), (
        f"golden fixture missing; run scripts/make_goldens.py {sc.name}"
    )
    golden = np.load(golden_path)
    oracle_ate = float(golden["ate"])
    assert int(golden["n_frames"]) == sc.n_frames, "fixture out of date"

    sensor = SensorType.RGBD if sc.sensor == "rgbd" else SensorType.STEREO
    vo = VOSystem(_config(sc), sensor)
    est, gt = [], []
    for a, b, t in sc.frames():
        pose = vo.track(a, b)
        est.append(np.asarray(pose.t))
        gt.append(t)
    ate = ate_rmse(np.array(est), np.array(gt))

    bound = oracle_ate * sc.rel_margin + sc.abs_margin
    assert ate <= bound, (
        f"{sc.name}: lvt_tpu ATE {ate:.4f} m exceeds oracle bound "
        f"{bound:.4f} m (oracle ATE {oracle_ate:.4f} m)"
    )


def test_goldens_tracked_to_completion():
    """The stored oracle runs themselves must not have been LOST — otherwise
    the ATE bound is vacuous."""
    for sc in SCENARIOS:
        golden = np.load(GOLDEN_DIR / f"{sc.name}.npz")
        assert int(golden["final_state"]) == 2, f"{sc.name}: oracle lost"
        assert golden["est_t"].shape == golden["gt_t"].shape
