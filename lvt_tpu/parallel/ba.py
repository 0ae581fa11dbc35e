"""Distributed bundle-adjustment reductions over the device mesh.

The reference's g2o solve is single-threaded on one CPU
(lvt/src/lvt_pnp_solver.cpp:44-52). For the pod-scale configs
(BASELINE.json config 5: sharded map blocks), the normal-equation
accumulation H = sum_i w_i J_i^T J_i and g = sum_i w_i J_i^T r_i is an
embarrassingly shardable reduction: map-point blocks live on different
devices, each computes its [6,6]/[6] partials locally, and one `psum` over
the ICI `points` axis produces the global system — the Schur-style
block reduction of SURVEY.md section 2 (distributed-BA inventory). The tiny 6x6
solve and the pose retraction are replicated on every device, so the LM loop
state stays consistent without further communication.

Implemented with `shard_map` so the collective placement is explicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map

from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.parallel.mesh import POINT_AXIS
from lvt_tpu.solver import pnp as pnp_mod


def solve_pnp_sharded(
    initial_pose: Pose,
    points: jnp.ndarray,   # [M, 3] — M divisible by the point-axis size
    obs: jnp.ndarray,      # [M, 2]
    weights: jnp.ndarray,  # [M]
    mesh,
    *,
    fx, fy, cx, cy,
    reprojection_th2: float = 5.991,
    axis: str = POINT_AXIS,
) -> pnp_mod.PnPResult:
    """Identical math to lvt_tpu.solver.pnp.solve_pnp, with the residual
    blocks sharded over `axis` and the H/g accumulation reduced with psum.
    Validated against the single-device path on identical inputs
    (tests/test_parallel.py)."""
    dtype = points.dtype
    fx = jnp.asarray(fx, dtype)
    fy = jnp.asarray(fy, dtype)
    cx = jnp.asarray(cx, dtype)
    cy = jnp.asarray(cy, dtype)
    delta2 = jnp.asarray(reprojection_th2, dtype)

    r_cw = quat.to_matrix(initial_pose.q)
    r_wc0 = r_cw.T
    t_wc0 = -r_wc0 @ initial_pose.t

    def sharded_body(points_s, obs_s, w_s, r_wc0_s, t_wc0_s):
        """Runs per-device on a block of points; pose state is replicated."""
        psum = lambda x: jax.lax.psum(x, axis)

        def robust_chi2(r_wc, t_wc, w_mask):
            r, _, _ = pnp_mod._project_residuals(
                r_wc, t_wc, points_s, obs_s, fx, fy, cx, cy
            )
            e2 = jnp.sum(r * r, -1)
            rho = delta2 * jnp.log1p(e2 / delta2)
            return psum(jnp.sum(w_mask * rho))

        def normal_eq(r_wc, t_wc, w_mask):
            r, p_cam, inv_z = pnp_mod._project_residuals(
                r_wc, t_wc, points_s, obs_s, fx, fy, cx, cy
            )
            e2 = jnp.sum(r * r, -1)
            w = w_mask * pnp_mod._cauchy_weights(e2, delta2)
            jac = pnp_mod._jacobians(p_cam, inv_z, fx, fy)
            jw = jac * w[:, None, None]
            h = psum(jnp.einsum("mki,mkj->ij", jw, jac))
            g = psum(jnp.einsum("mki,mk->i", jw, r))
            return h, g

        def lm_iteration(state):
            h, g = normal_eq(state.r_wc, state.t_wc, w_mask[0])
            step = jnp.linalg.solve(h + state.lam * jnp.eye(6, dtype=dtype), -g)
            r_new, t_new = pnp_mod._retract(state.r_wc, state.t_wc, step)
            chi2_new = robust_chi2(r_new, t_new, w_mask[0])
            accept = (chi2_new < state.chi2) & jnp.all(jnp.isfinite(step))
            return pnp_mod._LMState(
                r_wc=jnp.where(accept, r_new, state.r_wc),
                t_wc=jnp.where(accept, t_new, state.t_wc),
                lam=jnp.where(accept, state.lam / 3.0, state.lam * state.nu),
                nu=jnp.where(accept, jnp.asarray(2.0, dtype), state.nu * 2.0),
                chi2=jnp.where(accept, chi2_new, state.chi2),
            )

        w_mask = [w_s.astype(dtype)]
        r_wc, t_wc = r_wc0_s, t_wc0_s
        for _ in range(pnp_mod.N_PASSES):
            # g2o-style initial lambda from the *global* H diagonal
            h0, _ = normal_eq(r_wc, t_wc, w_mask[0])
            lam0 = pnp_mod.LM_TAU * jnp.max(jnp.diag(h0)) + 1e-12
            state = pnp_mod._LMState(
                r_wc, t_wc, lam0, jnp.asarray(2.0, dtype),
                robust_chi2(r_wc, t_wc, w_mask[0]),
            )
            state = jax.lax.fori_loop(
                0, pnp_mod.N_ITERS_PER_PASS, lambda _, s: lm_iteration(s), state
            )
            r_wc, t_wc = state.r_wc, state.t_wc
            r, _, _ = pnp_mod._project_residuals(
                r_wc, t_wc, points_s, obs_s, fx, fy, cx, cy
            )
            e2 = jnp.sum(r * r, -1)
            w_mask[0] = w_mask[0] * (e2 <= delta2)

        inlier_mask = w_mask[0] > 0
        inlier_count = psum(jnp.sum(inlier_mask))
        return r_wc, t_wc, inlier_mask, inlier_count, state.chi2

    shard = P(axis)
    rep = P()
    r_wc, t_wc, inlier_mask, inlier_count, chi2 = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(shard, shard, shard, rep, rep),
        out_specs=(rep, rep, shard, rep, rep),
    )(points, obs, weights, r_wc0, t_wc0)

    r_cw = r_wc.T
    pose = Pose(-r_cw @ t_wc, quat.from_matrix(r_cw))
    return pnp_mod.PnPResult(pose, inlier_mask, inlier_count, chi2)
