"""Fused masked top-2 kernel vs the XLA masked_top2 oracle (interpret mode),
plus MXU-Hamming exactness."""

import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops import hamming
from lvt_tpu.ops.top2_pallas import masked_dual_top2


@pytest.fixture
def problem(rng):
    m, k = 200, 300
    qdesc = jnp.asarray(
        rng.randint(0, 2**32, (m, 8), dtype=np.uint32).astype(np.uint32))
    tdesc = jnp.asarray(
        rng.randint(0, 2**32, (k, 8), dtype=np.uint32).astype(np.uint32))
    q_uv = jnp.asarray(rng.uniform(0, 300, (m, 2)).astype(np.float32))
    t_kp = jnp.asarray(rng.uniform(0, 300, (k, 2)).astype(np.float32))
    q_valid = jnp.asarray(rng.rand(m) > 0.15)
    t_valid = jnp.asarray(rng.rand(k) > 0.15)
    dist = hamming.hamming_matrix(qdesc, tdesc)
    return dist, q_uv, q_valid, t_kp, t_valid


def test_mxu_hamming_is_exact(rng):
    a = jnp.asarray(rng.randint(0, 2**32, (64, 8), dtype=np.uint32))
    b = jnp.asarray(rng.randint(0, 2**32, (96, 8), dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(hamming.hamming_matrix(a, b, use_mxu=True)),
        np.asarray(hamming.hamming_matrix(a, b)),
    )


def _oracle(dist, q_uv, q_valid, t_kp, t_valid, r2):
    diff = t_kp[None] - q_uv[:, None]
    dr2 = jnp.sum(diff * diff, -1)
    cand = q_valid[:, None] & t_valid[None, :] & (dr2 < r2)
    return hamming.masked_top2(dist, cand), cand


def test_dual_radius_matches_oracle(problem):
    dist, q_uv, q_valid, t_kp, t_valid = problem
    ra, rb = 40.0, 80.0
    got_a, got_b = masked_dual_top2(
        dist, q_uv, q_valid, t_kp, t_valid,
        r2a=ra * ra, r2b=rb * rb, interpret=True,
    )
    for got, r in ((got_a, ra), (got_b, rb)):
        (d1, d2, best, nc), cand = _oracle(
            dist, q_uv, q_valid, t_kp, t_valid, r * r)
        np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(nc))
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(d2))
        has = np.asarray(nc) > 0
        np.testing.assert_array_equal(np.asarray(got[2])[has],
                                      np.asarray(best)[has])


def test_row_mode_matches_oracle(problem, rng):
    dist, _, q_valid, t_kp, t_valid = problem
    m = dist.shape[0]
    y_l = jnp.asarray(rng.uniform(0, 300, (m,)).astype(np.float32))
    lo = jnp.maximum(jnp.floor(y_l) - 2, 0.0)
    hi = jnp.minimum(jnp.floor(y_l) + 2, 300.0)
    window = jnp.stack([lo, hi], -1)
    (d1, d2, best, nc), _ = masked_dual_top2(
        dist, window, q_valid, t_kp, t_valid,
        r2a=0.0, r2b=0.0, row_mode=True, interpret=True,
    )
    y_r = t_kp[:, 1]
    cand = (
        q_valid[:, None] & t_valid[None, :]
        & (y_r[None, :] >= lo[:, None]) & (y_r[None, :] <= hi[:, None])
    )
    rd1, rd2, rbest, rnc = hamming.masked_top2(dist, cand)
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(rnc))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(rd1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(rd2))
    has = np.asarray(rnc) > 0
    np.testing.assert_array_equal(np.asarray(best)[has],
                                  np.asarray(rbest)[has])


def test_full_step_kernel_vs_xla_path(rng):
    """End-to-end: the same frames tracked with use_pallas_matching +
    use_mxu_hamming on (interpret-mode kernels on CPU) and off produce the
    same trajectory — the MXU Hamming is exact and the kernel top-2 is
    semantics-identical, so only LM float order may differ."""
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.system import VOSystem
    from lvt_tpu.io.synthetic import SyntheticWorld

    world = SyntheticWorld(width=192, height=144, fx=160.0, fy=160.0,
                           cx=96.0, cy=72.0, baseline=0.25, n_points=900,
                           extent_x=25.0, extent_y=12.0, extent_z=50.0)
    base = dict(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height, detection_cell_size=64,
        max_keypoints_per_cell=40, agast_threshold=12,
        near_plane_distance=0.5, far_plane_distance=80.0,
        max_map_points=512, max_staged_points=512,
    )
    import lvt_tpu.ops.top2_pallas as tp
    import functools
    import unittest.mock as mock

    vo_x = VOSystem(VOConfig(**base, use_pallas_matching=False,
                             use_mxu_hamming=False))
    # route the kernel through interpret mode on CPU
    orig = tp.masked_dual_top2
    with mock.patch.object(
        tp, "masked_dual_top2",
        functools.partial(orig.__wrapped__, interpret=True),
    ):
        vo_k = VOSystem(VOConfig(**base, use_pallas_matching=True,
                                 use_mxu_hamming=True))
        for img_l, img_r, _ in world.stereo_sequence(4, speed=0.3):
            p_x = vo_x.track(img_l, img_r)
            p_k = vo_k.track(img_l, img_r)
    np.testing.assert_allclose(np.asarray(p_k.t), np.asarray(p_x.t),
                               atol=1e-5)
    assert vo_k.map_size == vo_x.map_size
