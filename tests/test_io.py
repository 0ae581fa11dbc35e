"""Trajectory formats, metrics recorder, config tree, undistort/rectify."""

import os

import jax.numpy as jnp
import numpy as np

from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.io import trajectory


def rand_poses(rng, n=5):
    out = []
    for _ in range(n):
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        out.append(Pose(jnp.array(rng.randn(3).astype(np.float32)), jnp.array(q)))
    return out


def test_kitti_roundtrip(tmp_path, rng):
    poses = rand_poses(rng)
    p = str(tmp_path / "seq.txt")
    trajectory.dump_kitti(p, poses)
    mats = trajectory.load_kitti(p)
    assert mats.shape == (5, 3, 4)
    for pose, m in zip(poses, mats):
        r, t = trajectory.pose_to_rt(pose)
        np.testing.assert_allclose(m[:, :3], r, atol=1e-6)
        np.testing.assert_allclose(m[:, 3], t, atol=1e-6)


def test_tum_roundtrip(tmp_path, rng):
    poses = rand_poses(rng)
    stamps = [1234.5 + 0.1 * i for i in range(5)]
    p = str(tmp_path / "tum.txt")
    trajectory.dump_tum(p, poses, stamps)
    ts, xyz = trajectory.load_tum(p)
    np.testing.assert_allclose(ts, stamps, atol=1e-5)
    np.testing.assert_allclose(
        xyz, np.stack([np.asarray(q.t) for q in poses]), atol=1e-6
    )


def test_ate_alignment_invariance(rng):
    gt = np.cumsum(rng.randn(50, 3), 0)
    # a rigidly transformed copy of gt has ATE ~ 0 after alignment
    theta = 0.3
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    est = gt @ r.T + [5.0, -3.0, 2.0]
    assert trajectory.ate_rmse_aligned(est, gt) < 1e-9
    assert trajectory.ate_rmse_aligned(est + rng.randn(50, 3) * 0.01, gt) < 0.05


def test_value_recorder(tmp_path):
    from lvt_tpu.core.state import StepMetrics
    from lvt_tpu.observability import REFERENCE_SERIES, ValueRecorder

    rec = ValueRecorder(out_dir=str(tmp_path))
    m = StepMetrics.zero()._replace(
        map_points_count=jnp.asarray(100, jnp.int32),
        tracked_map_points=jnp.asarray(42, jnp.int32),
    )
    rec.record_step(m)
    rec.record_step(m)
    rec.finish()
    rows = open(rec.values_path).read().strip().split("\n")
    assert len(rows) == 2
    titles = open(rec.titles_path).read().strip().split("\n")
    assert titles[: len(REFERENCE_SERIES)] == REFERENCE_SERIES
    assert float(rows[0].split(",")[0]) == 100.0
    assert float(rows[0].split(",")[3]) == 42.0


def test_trace_log(tmp_path):
    from lvt_tpu.config import VOConfig
    from lvt_tpu.observability import TraceLog

    log = TraceLog(out_dir=str(tmp_path))
    log.log("hello")
    log.log_params(VOConfig(img_width=10, img_height=10))
    log.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("vo-")]
    assert len(files) == 1
    content = open(tmp_path / files[0]).read()
    assert "hello" in content and "img_width = 10" in content


def test_kitti_config_tree():
    from lvt_tpu.config import load_config, load_kitti_calib

    base = os.path.join(os.path.dirname(__file__), "..", "lvt_tpu", "configs")
    calib = load_kitti_calib(os.path.join(base, "kitti", "00.yaml"))
    assert abs(calib["fx"] - 718.856) < 1e-3
    assert abs(calib["baseline"] - 0.53716571886) < 1e-6
    cfg = load_config(os.path.join(base, "kitti", "vo_config.yaml"),
                      img_width=1241, img_height=376, **calib)
    assert cfg.agast_threshold == 25
    assert cfg.staged_threshold == 2
    cfg_tum = load_config(os.path.join(base, "tum_rgbd", "config_tum1.yaml"))
    assert cfg_tum.detection_cell_size == 2000
    assert abs(cfg_tum.k1 - 0.262383) < 1e-6
    assert cfg_tum.triangulation_policy == 2


def test_rectify_map_matches_opencv():
    import cv2

    from lvt_tpu.io.datasets import (
        EUROC_DL, EUROC_KL, EUROC_P, EUROC_RL, EUROC_SIZE,
    )
    from lvt_tpu.ops.undistort import make_rectify_map

    w, h = EUROC_SIZE
    got = make_rectify_map(w, h, EUROC_KL, EUROC_DL, EUROC_RL, EUROC_P)
    m1, m2 = cv2.initUndistortRectifyMap(
        EUROC_KL, EUROC_DL, EUROC_RL, EUROC_P, (w, h), cv2.CV_32FC1
    )
    # compare in the central region (corners can diverge where the
    # distortion model extrapolates)
    sl = np.s_[100:380, 150:600]
    np.testing.assert_allclose(got[..., 0][sl], m1[sl], atol=0.1)
    np.testing.assert_allclose(got[..., 1][sl], m2[sl], atol=0.1)


def test_undistort_points_matches_opencv(rng):
    import cv2

    from lvt_tpu.ops.undistort import undistort_points

    fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
    dist = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])
    pts = np.stack([rng.uniform(50, 590, 40), rng.uniform(50, 430, 40)], -1)
    got = np.asarray(undistort_points(
        jnp.asarray(pts, jnp.float32), fx, fy, cx, cy, *dist
    ))
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    want = cv2.undistortPoints(
        pts.reshape(-1, 1, 2).astype(np.float64), k, dist, P=k
    ).reshape(-1, 2)
    np.testing.assert_allclose(got, want, atol=0.05)
