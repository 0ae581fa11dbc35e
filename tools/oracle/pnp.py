"""Oracle motion-only PnP: robust LM mirroring the reference's g2o setup.

The reference (lvt_pnp_solver.cpp:44-128) builds one free VertexCam, fixed
point vertices, monocular reprojection edges with identity information and a
Cauchy robust kernel (delta^2 = 5.991), then runs 2 passes of optimize(5)
with chi2 > 5.991 edges demoted after each pass. This oracle solves the same
robustified nonlinear least squares in float64 with g2o's
OptimizationAlgorithmLevenberg schedule: lambda0 = tau * max(diag(H)) with
tau = 1e-5, gain-ratio lambda update (rho-based), ni doubling on rejection.
"""

from __future__ import annotations

import numpy as np

from tools.oracle.pose import quat_from_matrix, quat_to_matrix

REPROJECTION_TH2 = 5.991
N_PASSES = 2
N_ITERS = 5
TAU = 1e-5


def _residuals(r_wc, t_wc, points, obs, fx, fy, cx, cy):
    p_cam = points @ r_wc.T + t_wc
    z = np.where(np.abs(p_cam[:, 2]) < 1e-12, 1e-12, p_cam[:, 2])
    u = fx * p_cam[:, 0] / z + cx
    v = fy * p_cam[:, 1] / z + cy
    return np.stack([u, v], -1) - obs, p_cam


def _jacobians(p_cam, fx, fy):
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    inv_z = 1.0 / z
    fxz, fyz = fx * inv_z, fy * inv_z
    fxxz = fxz * x * inv_z
    fyyz = fyz * y * inv_z
    zeros = np.zeros_like(z)
    ju = np.stack([fxz, zeros, -fxxz, -fxxz * y, fx + fxxz * x, -fxz * y], -1)
    jv = np.stack([zeros, fyz, -fyyz, -fy - fyyz * y, fyyz * x, fyz * x], -1)
    return np.stack([ju, jv], -2)  # [M, 2, 6]


def _robust_chi2(r, delta2):
    e2 = np.sum(r * r, -1)
    return float(np.sum(delta2 * np.log1p(e2 / delta2)))


def _retract(r_wc, t_wc, step):
    v, w = step[:3], step[3:]
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        dr = np.eye(3) + _skew(w)
    else:
        k = _skew(w / theta)
        dr = np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)
    return dr @ r_wc, dr @ t_wc + v


def _skew(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


class PnPSolver:
    def __init__(self, fx, fy, cx, cy, baseline=0.0):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.baseline = baseline

    def compute_pose(self, cam_pose, map_points, observations):
        points = np.asarray(map_points, np.float64).reshape(-1, 3)
        obs = np.asarray(observations, np.float64).reshape(-1, 2)
        r_c2w, t = cam_pose
        r_wc = r_c2w.T.copy()
        t_wc = -r_wc @ t
        fx, fy, cx, cy = self.fx, self.fy, self.cx, self.cy
        delta2 = REPROJECTION_TH2
        active = np.ones(len(points), bool)

        for _ in range(N_PASSES):
            pts, ob = points[active], obs[active]
            if len(pts) == 0:
                break
            r, _ = _residuals(r_wc, t_wc, pts, ob, fx, fy, cx, cy)
            chi2 = _robust_chi2(r, delta2)
            lam = None
            ni = 2.0
            for _ in range(N_ITERS):
                r, p_cam = _residuals(r_wc, t_wc, pts, ob, fx, fy, cx, cy)
                e2 = np.sum(r * r, -1)
                w = 1.0 / (1.0 + e2 / delta2)  # Cauchy rho'
                jac = _jacobians(p_cam, fx, fy)
                jw = jac * w[:, None, None]
                h = np.einsum("mki,mkj->ij", jw, jac)
                g = np.einsum("mki,mk->i", jw, r)
                if lam is None:
                    lam = TAU * float(np.max(np.diag(h)))  # g2o init
                try:
                    step = np.linalg.solve(h + lam * np.eye(6), -g)
                except np.linalg.LinAlgError:
                    break
                r_new, t_new = _retract(r_wc, t_wc, step)
                rn, _ = _residuals(r_new, t_new, pts, ob, fx, fy, cx, cy)
                chi2_new = _robust_chi2(rn, delta2)
                # g2o gain ratio: rho = (chi2 - chi2_new) / (step' (lam step - g))
                denom = float(step @ (lam * step - g))
                rho = (chi2 - chi2_new) / denom if denom != 0 else -1.0
                if rho > 0 and np.isfinite(chi2_new):
                    r_wc, t_wc = r_new, t_new
                    chi2 = chi2_new
                    lam *= max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                    ni = 2.0
                else:
                    lam *= ni
                    ni *= 2.0
            # demotion: raw chi2 > threshold excluded from the next pass
            r_all, _ = _residuals(r_wc, t_wc, points, obs, fx, fy, cx, cy)
            e2_all = np.sum(r_all * r_all, -1)
            active = active & (e2_all <= delta2)

        r_c2w_out = r_wc.T
        t_out = -r_c2w_out @ t_wc
        # orthonormalize through the quaternion round-trip like g2o's SBACam
        r_c2w_out = quat_to_matrix(quat_from_matrix(r_c2w_out))
        return (r_c2w_out, t_out), int(np.sum(active))
