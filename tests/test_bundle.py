"""Windowed Schur-complement BA: recovers perturbed poses+structure and the
sharded (psum) variant matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.solver.bundle import BAResult, refine_window

FX = FY = 500.0
CX, CY = 320.0, 240.0
K = dict(fx=FX, fy=FY, cx=CX, cy=CY)
BASELINE = 0.4


def make_ba_problem(rng, f=4, m=200, point_noise=0.05, pose_noise=0.02,
                    pixel_noise=0.0):
    """Returns (poses_gt, pts_gt, poses_noisy, pts_noisy, obs_l, obs_r, w)."""
    pts = np.stack([
        rng.uniform(-8, 8, m), rng.uniform(-4, 4, m), rng.uniform(8, 30, m)
    ], -1).astype(np.float32)
    ts, qs, obs, obs_r = [], [], [], []
    for i in range(f):
        t = np.array([0.05 * i, 0.0, 0.6 * i], np.float32)
        ts.append(t)
        qs.append(np.array([1.0, 0, 0, 0], np.float32))
        p_cam = pts - t
        uv = np.stack([FX * p_cam[:, 0] / p_cam[:, 2] + CX,
                       FY * p_cam[:, 1] / p_cam[:, 2] + CY], -1)
        obs.append(uv + rng.randn(m, 2) * pixel_noise)
        p_r = p_cam - [BASELINE, 0.0, 0.0]
        uv_r = np.stack([FX * p_r[:, 0] / p_r[:, 2] + CX,
                         FY * p_r[:, 1] / p_r[:, 2] + CY], -1)
        obs_r.append(uv_r + rng.randn(m, 2) * pixel_noise)
    poses_gt = Pose(jnp.array(np.stack(ts)), jnp.array(np.stack(qs)))

    pts_n = pts + rng.randn(m, 3).astype(np.float32) * point_noise
    ts_n = np.stack(ts).copy()
    ts_n[1:] += rng.randn(f - 1, 3).astype(np.float32) * pose_noise
    qs_n = np.stack(qs).copy()
    qs_n[1:, 1:] += rng.randn(f - 1, 3).astype(np.float32) * (pose_noise * 0.2)
    qs_n /= np.linalg.norm(qs_n, axis=-1, keepdims=True)
    poses_n = Pose(jnp.array(ts_n), jnp.array(qs_n.astype(np.float32)))
    return (
        poses_gt, jnp.array(pts),
        poses_n, jnp.array(pts_n),
        jnp.array(np.stack(obs).astype(np.float32)),
        jnp.array(np.stack(obs_r).astype(np.float32)),
        jnp.ones((f, m), jnp.float32),
    )


def pose_err(a: Pose, b: Pose) -> float:
    return float(np.linalg.norm(np.asarray(a.t) - np.asarray(b.t)))


def test_stereo_window_recovers_exactly(rng):
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(rng)
    before = pose_err(poses_n, poses_gt)
    res = refine_window(
        poses_n, pts_n, obs, w, **K, baseline=BASELINE,
        obs_right=obs_r, w_right=w, iterations=12,
    )
    after = pose_err(res.poses, poses_gt)
    # the stereo baseline pins scale: exact recovery up to float32
    assert after < 2e-3, (before, after)
    assert np.abs(np.asarray(res.points) - np.asarray(pts_gt)).mean() < 5e-3
    assert int(res.n_obs) == 2 * obs.shape[0] * obs.shape[1]


def test_mono_window_reduces_error(rng):
    """Monocular window with one fixed pose has a free scale gauge, so we
    only require a large error reduction + (near-)zero residual."""
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(rng)
    before = pose_err(poses_n, poses_gt)
    res = refine_window(poses_n, pts_n, obs, w, **K, iterations=10)
    after = pose_err(res.poses, poses_gt)
    assert after < 0.3 * before
    assert float(res.chi2) < 1e-3


def test_gauge_pose0_fixed(rng):
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(rng)
    res = refine_window(poses_n, pts_n, obs, w, **K, baseline=BASELINE,
                        obs_right=obs_r, w_right=w, iterations=5)
    np.testing.assert_allclose(np.asarray(res.poses.t)[0],
                               np.asarray(poses_n.t)[0], atol=1e-6)


def test_robust_to_outlier_observations(rng):
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(
        rng, pixel_noise=0.2)
    obs_bad = np.asarray(obs).copy()
    obs_bad[:, :20] += 120.0  # 10% gross outliers in the left camera
    res = refine_window(
        poses_n, pts_n, jnp.array(obs_bad), w, **K, baseline=BASELINE,
        obs_right=obs_r, w_right=w, iterations=12,
    )
    assert pose_err(res.poses, poses_gt) < 0.02


def test_weight_mask_respected(rng):
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(rng)
    obs_bad = np.asarray(obs).copy()
    obs_bad[:, :50] = 1e5  # nonsense, but masked out
    w2 = np.asarray(w).copy()
    w2[:, :50] = 0.0
    res = refine_window(
        poses_n, pts_n, jnp.array(obs_bad), jnp.array(w2), **K,
        baseline=BASELINE, obs_right=obs_r, w_right=jnp.array(w2),
        iterations=8,
    )
    assert pose_err(res.poses, poses_gt) < 1e-2
    # masked points keep their (perturbed) positions: no update force
    np.testing.assert_allclose(np.asarray(res.points)[:50],
                               np.asarray(pts_n)[:50], atol=1e-4)


def test_sharded_matches_unsharded(rng):
    poses_gt, pts_gt, poses_n, pts_n, obs, obs_r, w = make_ba_problem(rng, m=256)
    kwargs = dict(**K, baseline=BASELINE, iterations=6)
    ref = refine_window(poses_n, pts_n, obs, w, obs_right=obs_r, w_right=w,
                        **kwargs)

    mesh = Mesh(np.array(jax.devices()), ("points",))
    shard = P(None, "points")

    def run(pts, obs_s, obs_rs, w_s):
        return refine_window(poses_n, pts, obs_s, w_s, obs_right=obs_rs,
                             w_right=w_s, psum_axis="points", **kwargs)

    got = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P("points"), shard, shard, shard),
        out_specs=BAResult(poses=P(), points=P("points"), chi2=P(), n_obs=P()),
    ))(pts_n, obs, obs_r, w)

    np.testing.assert_allclose(np.asarray(got.poses.t),
                               np.asarray(ref.poses.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.points),
                               np.asarray(ref.points), atol=1e-3)


def test_chi2_gate_cuts_mismatches_keeps_noise(rng):
    """r5 gate semantics (solver/bundle.chi2_gate_weights): observations a
    few pixels off (wrong-feature associations) are zeroed while Gaussian
    pixel noise — even large — survives, because the gate adapts to the
    window's own residual scale."""
    from lvt_tpu.solver.bundle import chi2_gate_weights

    poses_gt, pts, _, _, obs, obs_r, w = make_ba_problem(
        rng, pixel_noise=2.0)
    f, m = obs.shape[:2]
    # corrupt 10% of left observations by 6-40 px (mismatch-sized)
    bad = rng.rand(f, m) < 0.10
    obs = jnp.asarray(
        np.asarray(obs) + bad[..., None] * rng.uniform(6, 40, (f, m, 2)))
    w_g, w_rg = chi2_gate_weights(
        poses_gt, pts, obs, w, baseline=BASELINE,
        obs_right=obs_r, w_right=w, **K)
    w_g = np.asarray(w_g)
    # mismatches cut...
    assert (w_g[bad] == 0).mean() > 0.9, (w_g[bad] == 0).mean()
    # ...while sigma=2 noise passes
    assert (w_g[~bad] > 0).mean() > 0.9, (w_g[~bad] > 0).mean()


def test_weighted_point_e2_ranks_fit(rng):
    """weighted_point_e2 orders point hypotheses by observation fit: the
    true points must score (strictly) below perturbed copies."""
    from lvt_tpu.solver.bundle import weighted_point_e2

    poses_gt, pts, _, pts_n, obs, obs_r, w = make_ba_problem(rng)
    args = dict(baseline=BASELINE, obs_right=obs_r, w_right=w, **K)
    e_true = np.asarray(weighted_point_e2(poses_gt, pts, obs, w, **args))
    e_pert = np.asarray(weighted_point_e2(poses_gt, pts_n, obs, w, **args))
    assert (e_true <= e_pert).mean() > 0.98
    assert e_true.sum() < e_pert.sum()


def test_chi2_gate_sharded_matches_unsharded(rng):
    """The gate's scale estimate is psum-only, so the sharded-map mode
    (points axis under shard_map) must reproduce the unsharded weights."""
    from lvt_tpu.solver.bundle import chi2_gate_weights

    poses_gt, pts, _, _, obs, obs_r, w = make_ba_problem(
        rng, m=256, pixel_noise=1.0)
    kwargs = dict(**K, baseline=BASELINE)
    ref_w, ref_wr = chi2_gate_weights(
        poses_gt, pts, obs, w, obs_right=obs_r, w_right=w, **kwargs)

    mesh = Mesh(np.array(jax.devices()), ("points",))
    shard = P(None, "points")

    def run(pts_s, obs_s, obs_rs, w_s):
        return chi2_gate_weights(
            poses_gt, pts_s, obs_s, w_s, obs_right=obs_rs, w_right=w_s,
            psum_axis="points", **kwargs)

    got_w, got_wr = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P("points"), shard, shard, shard),
        out_specs=(shard, shard),
    ))(pts, obs, obs_r, w)
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(ref_w))
    np.testing.assert_array_equal(np.asarray(got_wr), np.asarray(ref_wr))
