"""Streaming driver (ROS-node equivalent): lazy init, odometry output,
stale-frame guard, auto-reset on lost, async worker."""

import time

import numpy as np

from lvt_tpu.core.system import TrackingState
from lvt_tpu.io.streaming import ROT_OPTICAL_TO_ROBOT, StreamingVO
from tests.test_end_to_end import make_config, make_world


def make_stream(**kw):
    world = make_world()
    cfg = make_config(world)
    s = StreamingVO(cfg, apply_axis_fix=kw.pop("apply_axis_fix", False), **kw)
    return world, s


def test_sync_stream_tracks():
    world, s = make_stream()
    outs = []
    s.on_odometry(outs.append)
    for i, (l, r, (rot, t)) in enumerate(world.stereo_sequence(8, speed=0.4)):
        s.feed(0.1 * i, l, r)
    assert len(outs) == 8
    assert outs[-1].tracking_state == TrackingState.TRACKING
    # odometry should track ground truth (no axis fix, identity extrinsic)
    gt_final = t
    np.testing.assert_allclose(outs[-1].position, gt_final, atol=0.3)
    # twist: forward motion of 0.4m / 0.1s = 4 m/s along z (optical)
    v = outs[-1].linear_velocity
    assert abs(np.linalg.norm(v) - 4.0) < 1.0


def test_stale_frames_dropped():
    world, s = make_stream()
    frames = list(world.stereo_sequence(3))
    assert s.feed(1.0, frames[0][0], frames[0][1])
    assert not s.feed(0.5, frames[1][0], frames[1][1])  # stale
    assert s.dropped_frames == 1
    assert s.feed(1.5, frames[1][0], frames[1][1])


def test_auto_reset_on_lost_continues():
    world, s = make_stream()
    outs = []
    s.on_odometry(outs.append)
    frames = list(world.stereo_sequence(6, speed=0.3))
    blank = np.full(frames[0][0].shape, 60.0, np.float32)
    for i, (l, r, _) in enumerate(frames[:3]):
        s.feed(0.1 * i, l, r)
    pos_before = outs[-1].position.copy()
    s.feed(0.35, blank, blank)  # lose tracking
    assert outs[-1].tracking_state == TrackingState.LOST
    # vo auto-reset: next frames re-initialize and odometry continues
    for i, (l, r, _) in enumerate(frames[3:]):
        s.feed(0.4 + 0.1 * i, l, r)
    assert outs[-1].tracking_state == TrackingState.TRACKING
    # odometry did not jump back to origin
    assert np.linalg.norm(outs[-1].position) >= np.linalg.norm(pos_before) - 0.2


def test_axis_fix_transform():
    world, s = make_stream(apply_axis_fix=True)
    outs = []
    s.on_odometry(outs.append)
    for i, (l, r, (rot, t)) in enumerate(world.stereo_sequence(5, speed=0.4)):
        s.feed(0.1 * i, l, r)
    # camera moves +z (optical); robot frame: +x forward
    p = outs[-1].position
    assert p[0] > 1.0, p
    assert abs(p[1]) < 0.5 and abs(p[2]) < 0.5


def test_async_worker():
    world, s = make_stream()
    outs = []
    s.on_odometry(outs.append)
    s.start()
    frames = list(world.stereo_sequence(5, speed=0.4))
    for i, (l, r, _) in enumerate(frames):
        s.feed(0.1 * i, l, r)
        time.sleep(0.01)
    deadline = time.time() + 60
    while len(outs) + s.dropped_frames < 5 and time.time() < deadline:
        time.sleep(0.1)
    s.stop()
    assert len(outs) >= 3
    assert outs[-1].tracking_state == TrackingState.TRACKING


def test_concurrent_producers_feed_safely():
    """Multiple producer threads may feed concurrently: the stale-stamp
    check/update and the evict-then-put on a full queue are atomic (feed
    lock), so no producer ever sees queue.Full escape and the stamp guard
    stays monotonic."""
    import threading

    world, s = make_stream(queue_size=2)
    outs = []
    s.on_odometry(outs.append)
    s.start()
    frames = list(world.stereo_sequence(2, speed=0.4))
    l0, r0 = frames[0][0], frames[0][1]
    errors = []
    accepted = [0] * 4

    def producer(tid):
        try:
            for i in range(25):
                if s.feed(tid + 4 * i, l0, r0):
                    accepted[tid] += 1
        except Exception as e:  # noqa: BLE001 — fail the test with it
            errors.append(e)

    threads = [threading.Thread(target=producer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    deadline = time.time() + 60
    while not s._queue.empty() and time.time() < deadline:
        time.sleep(0.05)
    s.stop()
    assert not errors, errors
    # every one of the 100 attempts was rejected as stale (dropped), evicted
    # from the queue (dropped), or tracked (outs) — exactly once
    assert len(outs) + s.dropped_frames == 100


def test_lazy_camera_info():
    world, _ = make_stream()
    s = StreamingVO(apply_axis_fix=False)
    s.set_camera_info(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, width=world.width, height=world.height,
        detection_cell_size=80, max_keypoints_per_cell=60,
        agast_threshold=15, near_plane_distance=0.5,
        far_plane_distance=150.0, max_map_points=1024,
        max_staged_points=1024,
    )
    outs = []
    s.on_odometry(outs.append)
    for i, (l, r, _) in enumerate(world.stereo_sequence(3, speed=0.4)):
        s.feed(0.1 * i, l, r)
    assert len(outs) == 3
