"""Chunked (scan) tracking must match per-frame tracking exactly."""

import jax
import numpy as np
import pytest

from lvt_tpu.core.system import SensorType, TrackingState, VOSystem
from tests.test_end_to_end import make_config, make_world


def test_chunk_matches_per_frame_stereo():
    world = make_world()
    cfg = make_config(world)
    frames = [(l, r) for l, r, _ in world.stereo_sequence(8, speed=0.4)]

    vo_online = VOSystem(cfg)
    online_poses = [np.asarray(vo_online.track(l, r).t) for l, r in frames]

    vo_chunk = VOSystem(cfg)
    il = np.stack([f[0] for f in frames]).astype(np.uint8)
    ir = np.stack([f[1] for f in frames]).astype(np.uint8)
    # note: online path got float images; feed the same values
    il = np.stack([f[0] for f in frames]).astype(np.float32)
    ir = np.stack([f[1] for f in frames]).astype(np.float32)
    poses, metrics = vo_chunk.track_chunk(il, ir)

    est = np.asarray(poses.t)
    np.testing.assert_allclose(est, np.array(online_poses), atol=1e-5)
    assert vo_chunk.get_state() == vo_online.get_state() == TrackingState.TRACKING
    np.testing.assert_array_equal(
        np.asarray(vo_chunk.state.map.valid), np.asarray(vo_online.state.map.valid)
    )


@pytest.mark.slow
def test_chunk_split_matches_single_chunk():
    world = make_world(seed=3)
    cfg = make_config(world)
    frames = [(l, r) for l, r, _ in world.stereo_sequence(6, speed=0.4)]
    il = np.stack([f[0] for f in frames]).astype(np.float32)
    ir = np.stack([f[1] for f in frames]).astype(np.float32)

    vo_a = VOSystem(cfg)
    poses_a, _ = vo_a.track_chunk(il, ir)

    vo_b = VOSystem(cfg)
    p1, _ = vo_b.track_chunk(il[:3], ir[:3])
    p2, _ = vo_b.track_chunk(il[3:], ir[3:])
    est_b = np.concatenate([np.asarray(p1.t), np.asarray(p2.t)])
    np.testing.assert_allclose(np.asarray(poses_a.t), est_b, atol=1e-6)


def test_chunk_rgbd():
    world = make_world(extent_z=25.0, n_points=1200)
    cfg = make_config(
        world, far_plane_distance=40.0, staged_threshold=0,
        triangulation_policy=2, max_map_points=4096,
    )
    frames = list(world.rgbd_sequence(6, speed=0.25))
    g = np.stack([f[0] for f in frames]).astype(np.float32)
    d = np.stack([f[1] for f in frames]).astype(np.float32)
    vo = VOSystem(cfg, SensorType.RGBD)
    poses, metrics = vo.track_chunk(g, d)
    assert vo.get_state() == TrackingState.TRACKING
    gt = np.array([f[2][1] for f in frames])
    err = np.linalg.norm(np.asarray(poses.t) - gt, axis=-1)
    assert err.max() < 0.5


def test_last_metrics_lazy_after_chunk():
    """last_metrics after a chunk is the FINAL frame's metrics, computed
    lazily (the slice must not ride inside the dispatch loop), and the
    deferred value must survive interleaving with reset/track transitions."""
    world = make_world()
    cfg = make_config(world)
    frames = [(l, r) for l, r, _ in world.stereo_sequence(6, speed=0.4)]
    il = np.stack([f[0] for f in frames]).astype(np.float32)
    ir = np.stack([f[1] for f in frames]).astype(np.float32)

    vo = VOSystem(cfg)
    _, metrics = vo.track_chunk(il, ir)
    lm = vo.last_metrics
    assert lm is not None
    np.testing.assert_array_equal(
        np.asarray(lm.tracked_map_points),
        np.asarray(metrics.tracked_map_points)[-1],
    )
    # cached on second access (same object, no recompute)
    assert vo.last_metrics is lm

    # a single-frame track overwrites the deferred chunk value
    vo.track(frames[0][0], frames[0][1])
    assert vo.last_metrics.tracked_map_points.ndim == 0

    # reset clears it
    vo.reset()
    assert vo.last_metrics is None
