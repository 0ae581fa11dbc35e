"""LM PnP solver: convergence, robustness to outliers, demotion schedule.

This is the g2o-parity risk area (SURVEY.md section 7 hard part #1): the solver
must recover poses from a perturbed initial guess under the fixed 2x5
iteration budget, with Cauchy-robust weighting suppressing gross outliers.
"""

import jax.numpy as jnp
import numpy as np

from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.solver.pnp import solve_pnp

FX, FY, CX, CY = 718.856, 718.856, 607.19, 185.21
K = dict(fx=FX, fy=FY, cx=CX, cy=CY)


def make_world(rng, n=200, zmin=4.0, zmax=80.0):
    z = rng.uniform(zmin, zmax, n)
    x = (rng.uniform(50, 1191, n) - CX) * z / FX
    y = (rng.uniform(30, 346, n) - CY) * z / FY
    return np.stack([x, y, z], -1).astype(np.float32)


def small_pose(rng, t_scale=0.5, r_scale=0.05):
    w = rng.randn(3) * r_scale
    theta = np.linalg.norm(w)
    q = np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * w / max(theta, 1e-12)])
    return Pose(jnp.array(rng.randn(3).astype(np.float32) * t_scale),
                jnp.array(q.astype(np.float32)))


def observe(points_world, pose):
    """Project world points into the camera at `pose`."""
    q_inv = quat.inverse(pose.q)
    p_cam = np.asarray(quat.rotate(q_inv, jnp.array(points_world) - pose.t))
    uv = np.stack(
        [FX * p_cam[:, 0] / p_cam[:, 2] + CX,
         FY * p_cam[:, 1] / p_cam[:, 2] + CY], -1)
    return uv.astype(np.float32), p_cam


def pose_error(got: Pose, want: Pose):
    dt = float(np.linalg.norm(np.asarray(got.t) - np.asarray(want.t)))
    dq = float(np.abs(np.sum(np.asarray(got.q) * np.asarray(want.q))))
    dr = 2 * np.arccos(min(dq, 1.0))
    return dt, dr


def test_converges_from_perturbed_guess(rng):
    pts = make_world(rng)
    true_pose = small_pose(rng, t_scale=2.0, r_scale=0.1)
    uv, _ = observe(pts, true_pose)
    guess = Pose(true_pose.t + jnp.array(rng.randn(3).astype(np.float32) * 0.3),
                 quat.normalize(true_pose.q + jnp.array(rng.randn(4).astype(np.float32) * 0.02)))
    res = solve_pnp(guess, jnp.array(pts), jnp.array(uv), jnp.ones(len(pts)), **K)
    dt, dr = pose_error(res.pose, true_pose)
    assert dt < 2e-2, dt
    assert dr < 2e-3, dr
    assert int(res.inlier_count) == len(pts)


def test_robust_to_outliers(rng):
    pts = make_world(rng)
    true_pose = small_pose(rng)
    uv, _ = observe(pts, true_pose)
    n_out = 50
    uv_noisy = uv.copy()
    uv_noisy[:n_out] += rng.uniform(30, 120, (n_out, 2)).astype(np.float32)
    guess = Pose(true_pose.t + jnp.array(rng.randn(3).astype(np.float32) * 0.2),
                 true_pose.q)
    res = solve_pnp(guess, jnp.array(pts), jnp.array(uv_noisy),
                    jnp.ones(len(pts)), **K)
    dt, dr = pose_error(res.pose, true_pose)
    assert dt < 5e-2, dt
    assert dr < 5e-3, dr
    inl = np.asarray(res.inlier_mask)
    assert not inl[:n_out].any()        # outliers demoted
    assert inl[n_out:].sum() >= len(pts) - n_out - 2


def test_weight_mask_excludes_points(rng):
    pts = make_world(rng, 100)
    true_pose = small_pose(rng)
    uv, _ = observe(pts, true_pose)
    # corrupt the masked-out half grotesquely; solver must ignore them
    uv_bad = uv.copy()
    uv_bad[50:] += 500.0
    w = np.zeros(100, np.float32)
    w[:50] = 1.0
    res = solve_pnp(Pose.identity() if False else true_pose,
                    jnp.array(pts), jnp.array(uv_bad), jnp.array(w), **K)
    dt, dr = pose_error(res.pose, true_pose)
    assert dt < 1e-3 and dr < 1e-4
    assert int(res.inlier_count) == 50


def test_noise_only_small_residuals(rng):
    pts = make_world(rng)
    true_pose = small_pose(rng)
    uv, _ = observe(pts, true_pose)
    uv += rng.randn(*uv.shape).astype(np.float32) * 0.3
    guess = Pose(true_pose.t + jnp.array([0.1, -0.1, 0.2], jnp.float32), true_pose.q)
    res = solve_pnp(guess, jnp.array(pts), jnp.array(uv), jnp.ones(len(pts)), **K)
    dt, dr = pose_error(res.pose, true_pose)
    assert dt < 5e-2
    assert dr < 2e-3
    assert int(res.inlier_count) > 190


def test_exact_initial_guess_stays_put(rng):
    pts = make_world(rng, 50)
    true_pose = small_pose(rng)
    uv, _ = observe(pts, true_pose)
    res = solve_pnp(true_pose, jnp.array(pts), jnp.array(uv),
                    jnp.ones(50), **K)
    dt, dr = pose_error(res.pose, true_pose)
    assert dt < 1e-4 and dr < 1e-5


def test_motion_model_prediction():
    """Constant-velocity model predicts constant motion exactly."""
    from lvt_tpu.core.motion import MotionState, predict_next_pose

    ms = MotionState.initial()
    step = jnp.array([0.0, 0.0, 1.0])
    pose = Pose.identity()
    # feed constant forward motion; prediction converges to +1 z per frame
    for i in range(12):
        ms, pred = predict_next_pose(ms, pose)
        pose = Pose(pose.t + step, pose.q)
    np.testing.assert_allclose(np.asarray(pred.t), [0, 0, 12.0], atol=0.2)
    np.testing.assert_allclose(np.abs(np.asarray(pred.q)[0]), 1.0, atol=1e-5)
