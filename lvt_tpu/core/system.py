"""VOSystem — the host-side driver around the jitted track step.

Public API equivalent of the reference's ``lvt_system``
(lvt/src/lvt_system.h:57-70: create/destroy/track/track_with_external_corners/
reset/get_state) and, transitively, of its C ABI (lvt/src/lvt_c.h:57-62) —
in this framework the Python class *is* the public API. The driver holds the
``VOState`` pytree on device; each ``track`` call uploads the frame, runs one
compiled step, and reads back the pose (host<->device = image in, pose out).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvt_tpu.config import VOConfig
from lvt_tpu.core import step as step_mod
from lvt_tpu.core.state import StepMetrics, VOState
from lvt_tpu.geometry import quaternion as quat
from lvt_tpu.geometry.se3 import Pose


class SensorType(enum.IntEnum):
    STEREO = 1
    RGBD = 2


class TrackingState(enum.IntEnum):
    NOT_INITIALIZED = 1
    TRACKING = 2
    LOST = 3


class VOSystem:
    """Visual odometry system over one camera stream."""

    def __init__(
        self,
        config: VOConfig,
        sensor_type: SensorType = SensorType.STEREO,
        metrics_recorder=None,
    ):
        config.validate()
        self.config = config
        self.sensor_type = SensorType(sensor_type)
        self.metrics_recorder = metrics_recorder
        self.state = VOState.initial(
            config.max_map_points, config.max_staged_points,
            config.local_ba_window,
        )
        self.last_metrics: Optional[StepMetrics] = None

    # -- lifecycle ------------------------------------------------------
    @staticmethod
    def create(config: VOConfig, sensor_type: SensorType = SensorType.STEREO,
               **kw) -> "VOSystem":
        """Factory mirroring lvt_system::create (lvt_system.cpp:70-127)."""
        return VOSystem(config, sensor_type, **kw)

    def reset(self) -> None:
        """Clear map, motion model and state machine
        (lvt_system::reset, lvt_system.cpp:44-68)."""
        self.state = VOState.initial(
            self.config.max_map_points, self.config.max_staged_points,
            self.config.local_ba_window,
        )
        self.last_metrics = None
        if self.metrics_recorder is not None:
            self.metrics_recorder.reset()

    # -- introspection --------------------------------------------------
    def get_state(self) -> TrackingState:
        return TrackingState(int(self.state.status))

    @property
    def frame_number(self) -> int:
        return int(self.state.frame_number)

    @property
    def map_size(self) -> int:
        return int(self.state.map.size())

    @property
    def last_pose(self) -> Pose:
        return self.state.pose

    # -- tracking -------------------------------------------------------
    def _prep_image(self, img) -> jnp.ndarray:
        a = jnp.asarray(img)
        assert a.ndim == 2, "images must be single-channel grayscale"
        assert a.shape == (self.config.img_height, self.config.img_width), (
            f"image shape {a.shape} != configured "
            f"{(self.config.img_height, self.config.img_width)}"
        )
        return a.astype(jnp.float32)

    def _finish(self, out) -> Pose:
        self.state, pose, metrics = out
        self.last_metrics = metrics
        if self.metrics_recorder is not None:
            self.metrics_recorder.record_step(metrics)
        return pose

    def track(self, img1, img2) -> Pose:
        """One frame. Stereo: (left, right) rectified grayscale.
        RGB-D: (grayscale, metric depth float32)."""
        if self.sensor_type == SensorType.STEREO:
            out = step_mod.track_step_stereo(
                self.state, self._prep_image(img1), self._prep_image(img2),
                self.config,
            )
        else:
            depth = jnp.asarray(img2, jnp.float32)
            out = step_mod.track_step_rgbd(
                self.state, self._prep_image(img1), depth, self.config
            )
        return self._finish(out)

    def track_with_external_corners(
        self, left_image, right_image, corners_left, corners_right
    ) -> Pose:
        """Descriptors-only tracking on caller-supplied corner locations
        (lvt_system::track_with_external_corners, lvt_system.cpp:209-250).
        Corner arrays are [N, 2] (x, y); N may differ between calls — they
        are padded to the configured keypoint capacity."""
        cap = self.config.kp_capacity

        def pad(c):
            c = np.asarray(c, np.float32).reshape(-1, 2)
            n = min(len(c), cap)
            out = np.zeros((cap, 2), np.float32)
            out[:n] = c[:n]
            valid = np.zeros(cap, bool)
            valid[:n] = True
            return jnp.asarray(out), jnp.asarray(valid)

        cl, vl = pad(corners_left)
        cr, vr = pad(corners_right)
        out = step_mod.track_step_external_corners(
            self.state, self._prep_image(left_image),
            self._prep_image(right_image), cl, vl, cr, vr, self.config,
        )
        return self._finish(out)

    def track_chunk(self, imgs1, imgs2):
        """Offline/batch mode: process a chunk of N frames in ONE device
        dispatch (lax.scan inside the jit). Semantically identical to N
        `track` calls; returns (poses, metrics) with a leading N axis.

        This is the TPU-native high-throughput path: the per-frame host
        round-trip of the online mode disappears and the VOState stays on
        device across the whole chunk."""
        a = jnp.asarray(imgs1)
        b = jnp.asarray(
            imgs2, jnp.float32 if self.sensor_type == SensorType.RGBD else None
        )
        assert a.ndim == 3 and b.shape == a.shape if self.sensor_type == SensorType.STEREO else True
        if self.sensor_type == SensorType.STEREO:
            self.state, poses, metrics = step_mod.track_chunk_stereo(
                self.state, a, b, self.config
            )
        else:
            self.state, poses, metrics = step_mod.track_chunk_rgbd(
                self.state, a, b, self.config
            )
        self.last_metrics = jax.tree.map(lambda x: x[-1], metrics)
        if self.metrics_recorder is not None:
            n = a.shape[0]
            for i in range(n):
                self.metrics_recorder.record_step(
                    jax.tree.map(lambda x: x[i], metrics)
                )
        return poses, metrics

    # -- checkpoint / resume -------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Snapshot the full VOState (a pytree) to disk. The reference has
        no checkpointing at all (SURVEY.md section 5); for long multi-stream runs
        this makes the VO resumable."""
        leaves, treedef = jax.tree.flatten(self.state)
        np.savez(
            path,
            *[np.asarray(x) for x in leaves],
            _sensor=int(self.sensor_type),
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        arrays = [data[k] for k in data.files if not k.startswith("_")]
        _, treedef = jax.tree.flatten(self.state)
        self.state = jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrays])


def pose_to_numpy(pose: Pose) -> tuple[np.ndarray, np.ndarray]:
    """(position[3], rotation_matrix[3,3]) on host."""
    return np.asarray(pose.t), np.asarray(quat.to_matrix(pose.q))
