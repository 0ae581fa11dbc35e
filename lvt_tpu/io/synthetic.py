"""Synthetic 3D world renderer for dataset-free testing and benchmarking.

The reference has no tests and validates only against datasets (SURVEY.md
section 4); this module provides the synthetic-world integration harness the TPU
framework is tested and benchmarked with when no dataset is on disk: a random
3D point cloud rendered as Gaussian splats into stereo (or RGB-D) frames from
a scripted camera trajectory, so the recovered trajectory can be compared
against ground truth with no external data.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticWorld:
    width: int = 640
    height: int = 480
    fx: float = 500.0
    fy: float = 500.0
    cx: float = 320.0
    cy: float = 240.0
    baseline: float = 0.3
    n_points: int = 4000
    seed: int = 7
    background: float = 40.0
    blob_sigma: float = 1.1
    extent_x: float = 60.0
    extent_y: float = 25.0
    extent_z: float = 120.0

    def __post_init__(self):
        rs = np.random.RandomState(self.seed)
        self.points = np.stack(
            [
                rs.uniform(-self.extent_x, self.extent_x, self.n_points),
                rs.uniform(-self.extent_y, self.extent_y, self.n_points),
                rs.uniform(2.0, self.extent_z, self.n_points),
            ],
            axis=-1,
        )
        self.intensities = rs.uniform(60.0, 215.0, self.n_points)

    # -- camera trajectory ---------------------------------------------
    def trajectory(self, n_frames: int, speed: float = 0.8,
                   yaw_rate: float = 0.002) -> list[tuple[np.ndarray, np.ndarray]]:
        """Forward motion with gentle yaw. Returns [(R_c2w, t_c2w)] per frame."""
        poses = []
        pos = np.zeros(3)
        yaw = 0.0
        for _ in range(n_frames):
            c, s = np.cos(yaw), np.sin(yaw)
            r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            poses.append((r, pos.copy()))
            pos = pos + r @ np.array([0.0, 0.0, speed])
            yaw += yaw_rate
        return poses

    # -- rendering ------------------------------------------------------
    def render(self, r_c2w: np.ndarray, t_c2w: np.ndarray,
               right: bool = False) -> np.ndarray:
        """Render one grayscale frame with bilinear-positioned blobs."""
        r_w2c = r_c2w.T
        t = t_c2w.copy()
        if right:
            t = t + r_c2w @ np.array([self.baseline, 0.0, 0.0])
        p_cam = (self.points - t) @ r_w2c.T
        z = p_cam[:, 2]
        vis = z > 0.5
        u = self.fx * p_cam[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fy * p_cam[:, 1] / np.where(vis, z, 1.0) + self.cy
        m = 4
        vis &= (u > m) & (u < self.width - m) & (v > m) & (v < self.height - m)

        img = np.full((self.height, self.width), self.background, np.float32)
        ku = np.arange(-m, m + 1)
        for ui, vi, ii in zip(u[vis], v[vis], self.intensities[vis]):
            x0, y0 = int(ui), int(vi)
            dx = x0 + ku - ui
            dy = y0 + ku - vi
            g = np.exp(-(dy[:, None] ** 2 + dx[None, :] ** 2)
                       / (2 * self.blob_sigma**2))
            img[y0 - m : y0 + m + 1, x0 - m : x0 + m + 1] += ii * g
        return np.clip(img, 0.0, 255.0)

    def render_depth(self, r_c2w: np.ndarray, t_c2w: np.ndarray) -> np.ndarray:
        """Depth image: each blob's footprint takes its point's depth
        (nearest wins), background = 0 (invalid)."""
        r_w2c = r_c2w.T
        p_cam = (self.points - t_c2w) @ r_w2c.T
        z = p_cam[:, 2]
        vis = z > 0.5
        u = self.fx * p_cam[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fy * p_cam[:, 1] / np.where(vis, z, 1.0) + self.cy
        m = 4
        vis &= (u > m) & (u < self.width - m) & (v > m) & (v < self.height - m)
        depth = np.full((self.height, self.width), np.inf, np.float32)
        for ui, vi, zi in zip(u[vis], v[vis], z[vis]):
            x0, y0 = int(ui), int(vi)
            patch = depth[y0 - m : y0 + m + 1, x0 - m : x0 + m + 1]
            np.minimum(patch, zi, out=patch)
        depth[~np.isfinite(depth)] = 0.0
        return depth

    def stereo_sequence(self, n_frames: int, **kw):
        """Yields (img_left, img_right, (R_c2w, t_c2w)) per frame."""
        for r, t in self.trajectory(n_frames, **kw):
            yield self.render(r, t), self.render(r, t, right=True), (r, t)

    def rgbd_sequence(self, n_frames: int, **kw):
        for r, t in self.trajectory(n_frames, **kw):
            yield self.render(r, t), self.render_depth(r, t), (r, t)


def ate_rmse(est: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error (translation RMSE) without alignment —
    both trajectories share the first-frame anchor by construction."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))
