"""Oracle pose utilities (lvt_pose.{h,cpp}), float64 NumPy.

A pose is (r [3,3] rotation camera->world, t [3] position) — the Eigen
quaternion+position pair of lvt_pose represented directly as a matrix pair.
"""

from __future__ import annotations

import numpy as np

Pose = tuple  # (r_c2w [3,3], t [3])


def identity() -> Pose:
    return np.eye(3), np.zeros(3)


def world_to_camera(pose: Pose) -> np.ndarray:
    """3x4 world->camera (lvt_pose_utils::compute_world_to_camera_transform,
    lvt_pose.cpp:36-43): [R^T | -R^T t]."""
    r, t = pose
    rt = r.T
    return np.concatenate([rt, (-rt @ t)[:, None]], axis=1)


def right_camera_pose(pose: Pose, baseline: float) -> Pose:
    """(lvt_pose.cpp:28-34): right camera sits +baseline along the left
    camera's x axis, same orientation."""
    r, t = pose
    return r, t + r @ np.array([baseline, 0.0, 0.0])


# -- quaternion helpers (w, x, y, z), Eigen conventions ---------------------

def quat_from_matrix(r: np.ndarray) -> np.ndarray:
    m00, m01, m02 = r[0]
    m10, m11, m12 = r[1]
    m20, m21, m22 = r[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                         (m10 - m01) / s])
    if m00 > m11 and m00 > m22:
        s = np.sqrt(1.0 + m00 - m11 - m22) * 2
        return np.array([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                         (m02 + m20) / s])
    if m11 > m22:
        s = np.sqrt(1.0 + m11 - m00 - m22) * 2
        return np.array([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                         (m12 + m21) / s])
    s = np.sqrt(1.0 + m22 - m00 - m11) * 2
    return np.array([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                     0.25 * s])


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_conj(q: np.ndarray) -> np.ndarray:
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quat_slerp(a: np.ndarray, t: float, b: np.ndarray) -> np.ndarray:
    """Eigen's a.slerp(t, b)."""
    d = float(np.dot(a, b))
    absd = abs(d)
    if absd >= 1.0 - 1e-12:
        s0, s1 = 1.0 - t, t
    else:
        theta = np.arccos(absd)
        sin_t = np.sin(theta)
        s0 = np.sin((1.0 - t) * theta) / sin_t
        s1 = np.sin(t * theta) / sin_t
    if d < 0:
        s1 = -s1
    return s0 * a + s1 * b
