"""Dataset loaders: KITTI odometry, EuRoC MAV, TUM RGB-D.

Equivalents of the reference's three example drivers' input handling
(examples/kitti/kitti_example.cpp:62-104, examples/euroc/euroc_example.cpp:
63-143, examples/tum_rgbd/tum_rgbd_example.cpp:62-132). Image decoding uses
OpenCV when available and otherwise the framework's own native PNG loader
(lvt_tpu.io.native_loader). Iterators yield numpy grayscale frames; all
device work happens in the jitted step.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from lvt_tpu.config import VOConfig, load_config, load_kitti_calib


def imread_gray(path: str) -> np.ndarray:
    """Grayscale image load (uint8 [H, W])."""
    try:
        from lvt_tpu.io.native_loader import imread_gray_native

        img = imread_gray_native(path)
        if img is not None:
            return img
    except Exception:
        pass
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def imread_raw(path: str) -> np.ndarray:
    """Load preserving dtype/channels (for 16-bit TUM depth PNGs)."""
    try:
        from lvt_tpu.io.native_loader import imread_native

        img = imread_native(path)
        if img is not None:
            return img
    except Exception:
        pass
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return img


# ----------------------------------------------------------------------
# KITTI odometry
# ----------------------------------------------------------------------
class KittiSequence:
    """KITTI odometry grayscale stereo sequence (image_0/image_1)."""

    def __init__(self, sequences_dir: str, seq: int,
                 calib_path: str | None = None):
        self.seq = seq
        self.dir = os.path.join(sequences_dir, f"{seq:02d}")
        self.left_dir = os.path.join(self.dir, "image_0")
        self.right_dir = os.path.join(self.dir, "image_1")
        if calib_path is None:
            calib_path = os.path.join(
                os.path.dirname(__file__), "..", "configs", "kitti",
                f"{seq:02d}.yaml",
            )
        self.calib = load_kitti_calib(calib_path)
        self.frames = sorted(
            f for f in os.listdir(self.left_dir) if f.endswith(".png")
        )

    def __len__(self) -> int:
        return len(self.frames)

    def probe_image_size(self) -> tuple[int, int]:
        img = imread_gray(os.path.join(self.left_dir, self.frames[0]))
        return img.shape[1], img.shape[0]

    def configure(self, config: VOConfig) -> VOConfig:
        w, h = self.probe_image_size()
        return config.replace(img_width=w, img_height=h, **self.calib)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        for name in self.frames:
            yield (
                imread_gray(os.path.join(self.left_dir, name)),
                imread_gray(os.path.join(self.right_dir, name)),
            )


# ----------------------------------------------------------------------
# EuRoC MAV
# ----------------------------------------------------------------------
# Public EuRoC camera calibration, as hardcoded by the reference driver
# (examples/euroc/euroc_example.cpp:95-119).
EUROC_KL = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1.0]])
EUROC_KR = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1.0]])
EUROC_DL = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
EUROC_DR = np.array([-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0])
EUROC_RL = np.array([
    [0.999966347530033, -0.001422739138722922, 0.008079580483432283],
    [0.001365741834644127, 0.9999741760894847, 0.007055629199258132],
    [-0.008089410156878961, -0.007044357138835809, 0.9999424675829176]])
EUROC_RR = np.array([
    [0.9999633526194376, -0.003625811871560086, 0.007755443660172947],
    [0.003680398547259526, 0.9999684752771629, -0.007035845251224894],
    [-0.007729688520722713, 0.007064130529506649, 0.999945173484644]])
EUROC_P = np.array([
    [435.2046959714599, 0, 367.4517211914062],
    [0, 435.2046959714599, 252.2008514404297],
    [0, 0, 1.0]])
EUROC_BASELINE = 0.110077842
EUROC_SIZE = (752, 480)
# body<-sensor transform (euroc_example.cpp:115-119)
EUROC_T_BS = np.array([
    [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
    [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
    [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
    [0.0, 0.0, 0.0, 1.0]])


class EurocSequence:
    """EuRoC stereo sequence with on-device rectification remap."""

    def __init__(self, root_dir: str, dataset_name: str,
                 stamps_path: str | None = None):
        self.seq_dir = os.path.join(root_dir, dataset_name, "mav0")
        if stamps_path is None:
            stamps_path = os.path.join(
                os.path.dirname(__file__), "..", "configs", "euroc",
                f"{dataset_name}.txt",
            )
        self.titles: list[str] = []
        self.stamps: list[float] = []
        with open(stamps_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name = line.split()[0]
                self.titles.append(name + ".png")
                self.stamps.append(float(name) / 1e9)
        from lvt_tpu.ops.undistort import make_rectify_map

        w, h = EUROC_SIZE
        self.map_l = make_rectify_map(w, h, EUROC_KL, EUROC_DL, EUROC_RL, EUROC_P)
        self.map_r = make_rectify_map(w, h, EUROC_KR, EUROC_DR, EUROC_RR, EUROC_P)

    def __len__(self) -> int:
        return len(self.titles)

    def configure(self, config: VOConfig) -> VOConfig:
        w, h = EUROC_SIZE
        return config.replace(
            fx=float(EUROC_P[0, 0]), fy=float(EUROC_P[1, 1]),
            cx=float(EUROC_P[0, 2]), cy=float(EUROC_P[1, 2]),
            baseline=EUROC_BASELINE, img_width=w, img_height=h,
        )

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yields *unrectified* frames; rectify with `rectify` on device."""
        for name in self.titles:
            yield (
                imread_gray(os.path.join(self.seq_dir, "cam0", "data", name)),
                imread_gray(os.path.join(self.seq_dir, "cam1", "data", name)),
            )

    def rectify(self, img_left: np.ndarray, img_right: np.ndarray):
        import jax.numpy as jnp

        from lvt_tpu.ops.undistort import remap_bilinear

        return (
            remap_bilinear(jnp.asarray(img_left), jnp.asarray(self.map_l)),
            remap_bilinear(jnp.asarray(img_right), jnp.asarray(self.map_r)),
        )


# ----------------------------------------------------------------------
# TUM RGB-D
# ----------------------------------------------------------------------
TUM_DEPTH_SCALE = 1.0 / 5000.0  # tum_rgbd_example.cpp:111


class TumRgbdSequence:
    """TUM RGB-D sequence via an association file (rgb <-> depth pairs)."""

    def __init__(self, dataset_dir: str, association_path: str | None = None):
        self.dir = dataset_dir
        if association_path is None:
            name = os.path.basename(os.path.normpath(dataset_dir))
            association_path = os.path.join(
                os.path.dirname(__file__), "..", "configs", "tum_rgbd",
                "associations", f"{name}.txt",
            )
        self.entries: list[tuple[float, str, str]] = []
        with open(association_path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 4 and not line.startswith("#"):
                    self.entries.append((float(parts[0]), parts[1], parts[3]))

    def __len__(self) -> int:
        return len(self.entries)

    @property
    def stamps(self) -> list[float]:
        return [e[0] for e in self.entries]

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yields (grayscale uint8, metric depth float32)."""
        for _, rgb_rel, depth_rel in self.entries:
            rgb = imread_gray(os.path.join(self.dir, rgb_rel))
            depth_raw = imread_raw(os.path.join(self.dir, depth_rel))
            depth = depth_raw.astype(np.float32) * TUM_DEPTH_SCALE
            yield rgb, depth
