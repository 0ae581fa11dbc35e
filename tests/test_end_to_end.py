"""Synthetic-world integration test: the full pipeline must recover a
scripted camera trajectory (SURVEY.md section 4: the dataset-free acceptance
harness). Exercises detection, description, row matching, triangulation, map
matching, PnP, staging and culling end-to-end through the jitted step."""

import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import VOConfig
from lvt_tpu.core.system import SensorType, TrackingState, VOSystem
from lvt_tpu.io.synthetic import SyntheticWorld, ate_rmse


def make_world(**kw):
    defaults = dict(width=320, height=240, fx=260.0, fy=260.0,
                    cx=160.0, cy=120.0, baseline=0.3, n_points=1500,
                    extent_x=40.0, extent_y=18.0, extent_z=90.0)
    defaults.update(kw)
    return SyntheticWorld(**defaults)


def make_config(world, **kw):
    defaults = dict(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline,
        img_width=world.width, img_height=world.height,
        detection_cell_size=80, max_keypoints_per_cell=60,
        agast_threshold=15, near_plane_distance=0.5,
        far_plane_distance=150.0,
        max_map_points=1024, max_staged_points=1024,
    )
    defaults.update(kw)
    return VOConfig(**defaults)


class TestStereoEndToEnd:
    def run_sequence(self, vo, world, n_frames, speed=0.5, yaw_rate=0.001):
        est, gt = [], []
        for img_l, img_r, (r, t) in world.stereo_sequence(
            n_frames, speed=speed, yaw_rate=yaw_rate
        ):
            pose = vo.track(img_l, img_r)
            est.append(np.asarray(pose.t))
            gt.append(t)
            assert vo.get_state() == TrackingState.TRACKING, (
                f"lost at frame {len(est)}"
            )
        return np.array(est), np.array(gt)

    def test_recovers_forward_trajectory(self):
        world = make_world()
        vo = VOSystem(make_config(world))
        est, gt = self.run_sequence(vo, world, 20, speed=0.5)
        err = ate_rmse(est, gt)
        dist = np.linalg.norm(gt[-1] - gt[0])
        assert dist > 8.0
        assert err < 0.05 * dist, f"ATE {err:.3f} over {dist:.1f}m"

    def test_recovers_turning_trajectory(self):
        world = make_world(seed=11)
        vo = VOSystem(make_config(world))
        est, gt = self.run_sequence(vo, world, 25, speed=0.4, yaw_rate=0.01)
        err = ate_rmse(est, gt)
        assert err < 0.5, err

    def test_first_frame_is_identity_and_initializes(self):
        world = make_world()
        vo = VOSystem(make_config(world))
        img_l, img_r, _ = next(world.stereo_sequence(1))
        pose = vo.track(img_l, img_r)
        np.testing.assert_allclose(np.asarray(pose.t), 0.0, atol=1e-6)
        assert vo.get_state() == TrackingState.TRACKING
        assert vo.map_size > 50
        assert vo.frame_number == 1

    def test_reset(self):
        world = make_world()
        vo = VOSystem(make_config(world))
        for img_l, img_r, _ in world.stereo_sequence(3):
            vo.track(img_l, img_r)
        vo.reset()
        assert vo.get_state() == TrackingState.NOT_INITIALIZED
        assert vo.map_size == 0
        assert vo.frame_number == 0
        est, gt = self.run_sequence(vo, world, 5)
        assert vo.get_state() == TrackingState.TRACKING

    def test_lost_on_blank_frames_returns_last_pose(self):
        world = make_world()
        vo = VOSystem(make_config(world))
        seq = list(world.stereo_sequence(4))
        for img_l, img_r, _ in seq[:3]:
            pose = vo.track(img_l, img_r)
        last_t = np.asarray(pose.t).copy()
        blank = np.full((world.height, world.width), 50.0, np.float32)
        pose = vo.track(blank, blank)
        assert vo.get_state() == TrackingState.LOST
        np.testing.assert_allclose(np.asarray(pose.t), last_t, atol=1e-6)
        # further calls short-circuit and keep returning the last pose
        pose2 = vo.track(*seq[3][:2])
        np.testing.assert_allclose(np.asarray(pose2.t), last_t, atol=1e-6)

    def test_checkpoint_roundtrip(self, tmp_path):
        world = make_world()
        vo = VOSystem(make_config(world))
        seq = list(world.stereo_sequence(8))
        for img_l, img_r, _ in seq[:4]:
            vo.track(img_l, img_r)
        ckpt = str(tmp_path / "vo_state.npz")
        vo.save_checkpoint(ckpt)
        t_before = np.asarray(vo.last_pose.t).copy()

        vo2 = VOSystem(make_config(world))
        vo2.load_checkpoint(ckpt)
        np.testing.assert_allclose(np.asarray(vo2.last_pose.t), t_before)
        assert vo2.map_size == vo.map_size
        # both continue identically
        for img_l, img_r, _ in seq[4:6]:
            p1 = vo.track(img_l, img_r)
            p2 = vo2.track(img_l, img_r)
        np.testing.assert_allclose(np.asarray(p1.t), np.asarray(p2.t), atol=1e-6)


class TestRgbdEndToEnd:
    def test_recovers_trajectory(self):
        world = make_world(extent_z=25.0, n_points=1200)
        cfg = make_config(
            world, far_plane_distance=40.0, staged_threshold=0,
            triangulation_policy=2, max_map_points=4096,
        )
        vo = VOSystem(cfg, SensorType.RGBD)
        est, gt = [], []
        for gray, depth, (r, t) in world.rgbd_sequence(15, speed=0.25):
            pose = vo.track(gray, depth)
            est.append(np.asarray(pose.t))
            gt.append(t)
            assert vo.get_state() == TrackingState.TRACKING, len(est)
        err = ate_rmse(np.array(est), np.array(gt))
        assert err < 0.3, err


class TestExternalCorners:
    def test_tracks_with_external_corners(self):
        world = make_world()
        cfg = make_config(world)
        vo = VOSystem(cfg)

        from lvt_tpu.ops import detect

        est, gt = [], []
        for img_l, img_r, (r, t) in world.stereo_sequence(6, speed=0.4):
            def corners(img):
                d = detect.detect_corners(
                    jnp.asarray(img, jnp.float32), cfg.agast_threshold,
                    cell_size=cfg.detection_cell_size,
                    max_per_cell=cfg.max_keypoints_per_cell,
                )
                return np.asarray(d.kp)[np.asarray(d.valid)]

            pose = vo.track_with_external_corners(
                img_l, img_r, corners(img_l), corners(img_r)
            )
            est.append(np.asarray(pose.t))
            gt.append(t)
            assert vo.get_state() == TrackingState.TRACKING
        err = ate_rmse(np.array(est), np.array(gt))
        assert err < 0.2, err


class TestLocalBA:
    @pytest.mark.slow
    def test_local_ba_bounded_under_heavy_noise(self):
        """Sliding-window BA's *wins* are pinned elsewhere (the noisy_ba
        golden scenario and scripts/ba_accuracy_report.py: -37..-49% ATE
        on the stress scenarios with the r5 chi2 gate + improvement-only
        writeback). What this end-to-end test pins is the DOWNSIDE bound
        on an adversarial scene: sigma=6 intensity noise on a sparse blob
        world is where ungated BA used to compound bad refinements; with
        the r5 guards the cost must stay within a small fraction of the
        BA-off error (measured band on this seed: -4%..+15% depending on
        window config — scenario-dependent variance, not a regression
        class like r4's +194% on textured)."""
        rng = np.random.RandomState(1)
        world = make_world(seed=5)
        frames = [
            (l + rng.randn(*l.shape) * 6.0, r + rng.randn(*r.shape) * 6.0, g)
            for l, r, g in world.stereo_sequence(25, speed=0.5, yaw_rate=0.004)
        ]

        def run(cfg):
            vo = VOSystem(cfg)
            est = []
            for img_l, img_r, _ in frames:
                pose = vo.track(img_l, img_r)
                est.append(np.asarray(pose.t))
                assert vo.get_state() == TrackingState.TRACKING
            return np.array(est)

        gt = np.array([t for _, _, (r, t) in frames])
        base_err = ate_rmse(run(make_config(world)), gt)
        ba_err = ate_rmse(
            run(make_config(world, local_ba_window=6, local_ba_every=1)), gt
        )
        assert ba_err < base_err * 1.2, (base_err, ba_err)
