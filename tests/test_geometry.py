"""Unit tests for quaternion / SE(3) modules against scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.geometry import se3
from lvt_tpu.geometry.se3 import Pose


def rand_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.randn(*shape).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):
    """Our (w,x,y,z) -> scipy's (x,y,z,w)."""
    return Rotation.from_quat(np.roll(np.asarray(q), -1, axis=-1))


class TestQuaternion:
    def test_multiply_matches_rotation_composition(self, rng):
        a, b = rand_quat(rng, 8), rand_quat(rng, 8)
        got = quat.to_matrix(quat.multiply(jnp.array(a), jnp.array(b)))
        want = to_scipy(a).as_matrix() @ to_scipy(b).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = rand_quat(rng, 8)
        v = rng.randn(8, 3).astype(np.float32)
        got = quat.rotate(jnp.array(q), jnp.array(v))
        want = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        q = rand_quat(rng, 32)
        q_rt = np.asarray(quat.from_matrix(quat.to_matrix(jnp.array(q))))
        # equality up to sign
        dot = np.abs(np.sum(q * q_rt, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_inverse(self, rng):
        q = rand_quat(rng, 8)
        ident = quat.multiply(jnp.array(q), quat.inverse(jnp.array(q)))
        np.testing.assert_allclose(
            np.abs(np.asarray(ident)), np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5
        )

    @pytest.mark.parametrize("t", [0.0, 0.25, 0.5, 0.9, 1.0])
    def test_slerp_matches_scipy(self, rng, t):
        a, b = rand_quat(rng), rand_quat(rng)
        got = to_scipy(quat.slerp(jnp.array(a), t, jnp.array(b))).as_matrix()
        sl = Slerp([0.0, 1.0], Rotation.concatenate([to_scipy(a), to_scipy(b)]))
        want = sl(t).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_slerp_near_parallel(self, rng):
        a = rand_quat(rng)
        out = quat.slerp(jnp.array(a), 0.5, jnp.array(a))
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.abs(np.sum(out * a)), 1.0, atol=1e-5)

    def test_slerp_takes_short_path(self, rng):
        a = rand_quat(rng)
        mid = quat.slerp(jnp.array(a), 0.5, jnp.array(-a))
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(mid) * a)), 1.0, atol=1e-5)


class TestSE3:
    def rand_pose(self, rng):
        return Pose(jnp.array(rng.randn(3).astype(np.float32)),
                    jnp.array(rand_quat(rng)))

    def test_world_to_camera_inverts_pose(self, rng):
        pose = self.rand_pose(rng)
        pts_cam = rng.randn(16, 3).astype(np.float32)
        pts_world = np.asarray(
            quat.rotate(pose.q, jnp.array(pts_cam)) + pose.t
        )
        w2c = se3.world_to_camera(pose)
        back = se3.transform_points(w2c, jnp.array(pts_world))
        np.testing.assert_allclose(back, pts_cam, atol=1e-4)

    def test_compose_inverse(self, rng):
        pose = self.rand_pose(rng)
        ident = pose.compose(pose.inverse())
        np.testing.assert_allclose(ident.t, np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(np.abs(ident.q[0]), 1.0, atol=1e-5)

    def test_right_camera_pose(self, rng):
        pose = self.rand_pose(rng)
        right = se3.right_camera_pose(pose, 0.5)
        # offset in the left camera frame is (baseline, 0, 0)
        offset_cam = quat.rotate(quat.inverse(pose.q), right.t - pose.t)
        np.testing.assert_allclose(offset_cam, [0.5, 0, 0], atol=1e-5)
        np.testing.assert_allclose(right.q, pose.q)

    def test_projection(self):
        pts = jnp.array([[0.0, 0.0, 2.0], [1.0, -1.0, 4.0]])
        uv = se3.project_points(pts, fx=100.0, fy=100.0, cx=320.0, cy=240.0)
        np.testing.assert_allclose(uv, [[320, 240], [345, 215]], atol=1e-5)

    def test_visibility_mask(self):
        pts_cam = jnp.array(
            [[0, 0, 1.0], [0, 0, 0.05], [0, 0, 600.0], [5, 0, 1.0]]
        )
        uv = se3.project_points(pts_cam, 100.0, 100.0, 320.0, 240.0)
        vis = se3.visibility_mask(
            pts_cam, uv, near=0.1, far=500.0,
            min_x=0, max_x=640, min_y=0, max_y=480,
        )
        np.testing.assert_array_equal(vis, [True, False, False, False])

    def test_matrix44_roundtrip(self, rng):
        pose = self.rand_pose(rng)
        rt = Pose.from_matrix44(pose.matrix44())
        np.testing.assert_allclose(rt.t, pose.t, atol=1e-5)
        dot = np.abs(np.sum(np.asarray(rt.q) * np.asarray(pose.q)))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestConfig:
    def test_kp_capacity_kitti(self):
        from lvt_tpu.config import VOConfig

        cfg = VOConfig(img_width=1241, img_height=376, fx=718.856, fy=718.856,
                       cx=607.19, cy=185.21, baseline=0.537).validate()
        assert cfg.num_cells_x == 5 and cfg.num_cells_y == 2
        assert cfg.kp_capacity == 1536  # 10 cells * 150, rounded to 128

    def test_opencv_yaml_parsing(self, tmp_path):
        from lvt_tpu.config import load_config

        p = tmp_path / "cfg.yaml"
        p.write_text(
            "%YAML:1.0\n\nagast_threshold: 20\ntracking_radius: 30\n"
            "enable_logging: 0\ntriangulation_policy: 2\n"
            "viewer_camera_size: 0.6\n"
        )
        cfg = load_config(str(p), img_width=640, img_height=480)
        assert cfg.agast_threshold == 20
        assert cfg.tracking_radius == 30
        assert cfg.triangulation_policy == 2
        assert cfg.img_width == 640
