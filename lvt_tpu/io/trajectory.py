"""Trajectory writers/readers in the standard evaluation formats.

Equivalents of the reference's dump helpers: KITTI format (row-major 3x4 per
line, examples/kitti/kitti_example.cpp:33-47) and TUM format
(timestamp tx ty tz qx qy qz qw, examples/euroc/euroc_example.cpp:34-47,
examples/tum_rgbd/tum_rgbd_example.cpp:34-47), consumed by the KITTI devkit /
evo / TUM evaluate_ate.py. Plus ATE/RPE computation so the framework is its
own evaluation harness.
"""

from __future__ import annotations

import numpy as np

from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.geometry.se3 import Pose


def pose_to_rt(pose: Pose) -> tuple[np.ndarray, np.ndarray]:
    return (np.asarray(quat.to_matrix(pose.q), np.float64),
            np.asarray(pose.t, np.float64))


def dump_kitti(path: str, poses: list[Pose]) -> None:
    with open(path, "w") as f:
        for pose in poses:
            r, t = pose_to_rt(pose)
            m = np.hstack([r, t[:, None]]).reshape(-1)
            f.write(" ".join(f"{v:.9f}" for v in m) + "\n")


def dump_tum(path: str, poses: list[Pose], stamps: list[float]) -> None:
    with open(path, "w") as f:
        for pose, ts in zip(poses, stamps):
            t = np.asarray(pose.t, np.float64)
            q = np.asarray(pose.q, np.float64)  # (w, x, y, z)
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def load_kitti(path: str) -> np.ndarray:
    """[N, 3, 4] camera-to-world matrices."""
    data = np.loadtxt(path)
    return data.reshape(-1, 3, 4)


def load_tum(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(stamps [N], positions [N, 3]); quaternions ignored for ATE."""
    data = np.loadtxt(path, comments="#")
    return data[:, 0], data[:, 1:4]


def ate_rmse_aligned(est_xyz: np.ndarray, gt_xyz: np.ndarray) -> float:
    """Absolute trajectory error after SE(3) (Horn/Umeyama) alignment —
    the standard KITTI/TUM ATE metric."""
    est = np.asarray(est_xyz, np.float64)
    gt = np.asarray(gt_xyz, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    h = ec.T @ gc
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    s = np.diag([1.0, 1.0, d])
    r = vt.T @ s @ u.T
    aligned = ec @ r.T + mu_g
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))))


def rpe_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, delta: int = 1) -> float:
    """Relative pose (translation drift) error over `delta`-frame intervals."""
    est = np.asarray(est_xyz, np.float64)
    gt = np.asarray(gt_xyz, np.float64)
    de = est[delta:] - est[:-delta]
    dg = gt[delta:] - gt[:-delta]
    return float(np.sqrt(np.mean(np.sum((de - dg) ** 2, axis=-1))))


def rot_rmse_deg(est_r: np.ndarray, gt_r: np.ndarray) -> float:
    """Rotation error RMSE in degrees: per-frame geodesic angle between
    estimated and ground-truth orientation, both trajectories anchored to
    the shared first-frame identity."""
    est = np.asarray(est_r, np.float64)
    gt = np.asarray(gt_r, np.float64)
    # relative rotation est^T @ gt per frame; angle from the trace
    rel = np.einsum("nij,nik->njk", est, gt)
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.degrees(np.arccos(tr))
    return float(np.sqrt(np.mean(ang**2)))
