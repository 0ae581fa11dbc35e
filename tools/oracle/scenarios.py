"""Shared synthetic-world parity scenarios.

One definition used by both the golden generator (scripts/make_goldens.py,
which runs the reference oracle) and the regression test
(tests/test_parity_oracle.py, which runs lvt_tpu on the SAME frames and
compares ATE/RPE/rotation error against the stored oracle metrics). Frames
are deterministic: worlds are seeded and per-frame sensor noise uses a
fixed seed.

Two image models:
  * "blobs"    — isolated Gaussian splats (ideal features);
  * "textured" — ray-cast corridor with procedural noise texture
    (natural-imagery-like dense gradients), with low-texture, repetitive-
    structure, occlusion and illumination-drift stress variants — the
    regimes where detector/descriptor/matching choices actually diverge
    from the reference behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from lvt_tpu.io.synthetic import SyntheticWorld, TexturedWorld


@dataclasses.dataclass(frozen=True)
class Scenario:
    name: str
    n_frames: int
    sensor: str = "stereo"       # "stereo" | "rgbd"
    speed: float = 0.8
    yaw_rate: float = 0.002
    noise_sigma: float = 0.0
    noise_seed: int = 1234
    # margins for the parity assertions: lvt_tpu metric must be
    # <= oracle metric * rel + abs
    rel_margin: float = 1.15
    abs_margin: float = 0.10       # ATE, meters
    rpe_abs_margin: float = 0.01   # RPE(1), meters
    rot_abs_margin: float = 0.25   # rotation RMSE, degrees
    kitti_geometry: bool = False   # full KITTI frame size + intrinsics
    world_kind: str = "blobs"      # "blobs" | "textured"
    world_args: tuple = ()         # ((field, value), ...) world overrides
    illum_drift: float = 0.0       # multiplicative exposure drift amplitude

    def world(self):
        if self.world_kind == "textured":
            return TexturedWorld(**dict(self.world_args))
        if self.kitti_geometry:
            # KITTI seq 00 camera (lvt_tpu/configs/kitti/00.yaml)
            return SyntheticWorld(
                width=1241, height=376, fx=718.856, fy=718.856,
                cx=607.1928, cy=185.2157, baseline=0.5371657,
                n_points=6000, extent_x=80.0, extent_y=20.0,
                extent_z=160.0,
            )
        return SyntheticWorld(**dict(self.world_args))

    def frames(self) -> Iterator[tuple[np.ndarray, np.ndarray, tuple]]:
        """Yields (img1 uint8/float, img2, (gt_rotation, gt_position)).
        img2 is the right stereo image (uint8) or the float32 depth map
        for RGB-D."""
        world = self.world()
        rs = np.random.RandomState(self.noise_seed)
        if self.sensor == "stereo":
            seq = world.stereo_sequence(self.n_frames, speed=self.speed,
                                        yaw_rate=self.yaw_rate)
        else:
            seq = world.rgbd_sequence(self.n_frames, speed=self.speed,
                                      yaw_rate=self.yaw_rate)
        for i, (a, b, (r, t)) in enumerate(seq):
            if self.illum_drift > 0.0:
                # auto-exposure-like drift, ~40-frame period
                gain = 1.0 + self.illum_drift * np.sin(2 * np.pi * i / 40.0)
                a = a * gain
                if self.sensor == "stereo":
                    b = b * gain
            if self.noise_sigma > 0.0:
                a = a + rs.randn(*a.shape) * self.noise_sigma
                if self.sensor == "stereo":
                    b = b + rs.randn(*b.shape) * self.noise_sigma
            a = np.clip(a, 0, 255).astype(np.uint8)
            if self.sensor == "stereo":
                b = np.clip(b, 0, 255).astype(np.uint8)
            else:
                b = np.asarray(b, np.float32)
            yield a, b, (r, t)


SCENARIOS = (
    # ---- blob world (ideal isolated features)
    Scenario("fwd_yaw", n_frames=100),
    Scenario("turn", n_frames=80, speed=0.6, yaw_rate=0.02),
    Scenario("noisy", n_frames=80, noise_sigma=4.0),
    Scenario("fast", n_frames=60, speed=1.6),
    Scenario("rgbd", n_frames=80, sensor="rgbd", speed=0.5),
    # the benchmark's exact camera: full KITTI frame size + seq-00 intrinsics
    Scenario("kitti_geom", n_frames=40, speed=0.9, kitti_geometry=True),
    # ---- textured world (natural-imagery-like dense texture)
    Scenario("textured", n_frames=80, world_kind="textured"),
    Scenario("tex_lowtex", n_frames=60, world_kind="textured",
             world_args=(("texture_amp", 45.0),)),
    Scenario("tex_stripes", n_frames=60, world_kind="textured",
             world_args=(("stripe_walls", True),)),
    Scenario("tex_occlusion", n_frames=70, world_kind="textured",
             world_args=(("n_occluders", 4),)),
    Scenario("tex_illum", n_frames=60, world_kind="textured",
             illum_drift=0.18),
    Scenario("tex_rgbd", n_frames=60, sensor="rgbd", speed=0.5,
             world_kind="textured"),
)


def by_name(name: str) -> Scenario:
    for s in SCENARIOS:
        if s.name == name:
            return s
    raise KeyError(name)
