"""CLI drivers end-to-end on synthetic datasets written in the real
directory layouts (KITTI sequences/, TUM rgb/depth + association)."""

import os

import cv2
import numpy as np
import pytest

from lvt_tpu.cli import main
from lvt_tpu.io.synthetic import SyntheticWorld
from lvt_tpu.io.trajectory import ate_rmse_aligned, load_kitti, load_tum


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Tiny synthetic stereo sequence in KITTI layout + calib/config."""
    root = tmp_path_factory.mktemp("kitti")
    world = SyntheticWorld(width=320, height=240, fx=260.0, fy=260.0,
                           cx=160.0, cy=120.0, baseline=0.3, n_points=1500,
                           extent_x=40.0, extent_y=18.0, extent_z=90.0)
    seq = root / "sequences" / "03"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    gt = []
    for i, (l, r, (rot, t)) in enumerate(world.stereo_sequence(10, speed=0.5)):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), l.astype(np.uint8))
        cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), r.astype(np.uint8))
        gt.append(t)
    calib = root / "calib_03.yaml"
    calib.write_text(
        "camera_matrix:\n  data: [260.0, 0.0, 160.0, 0.0, 260.0, 120.0, "
        "0.0, 0.0, 1.0]\nbaseline: 0.3\n"
    )
    cfg = root / "vo.yaml"
    cfg.write_text(
        "near_plane_distance: 0.5\nfar_plane_distance: 150.0\n"
        "agast_threshold: 15\ndetection_cell_size: 80\n"
        "max_keypoints_per_cell: 60\nmax_map_points: 1024\n"
        "max_staged_points: 1024\n"
    )
    return root, np.array(gt)


@pytest.mark.parametrize(
    "chunk", [1, pytest.param(4, marks=pytest.mark.slow)])
def test_kitti_cli(kitti_tree, tmp_path, chunk):
    root, gt = kitti_tree
    out = str(tmp_path / f"03_{chunk}.txt")
    rc = main([
        "kitti", "--sequences-dir", str(root / "sequences"), "--seq", "3",
        "--calib", str(root / "calib_03.yaml"),
        "--config", str(root / "vo.yaml"),
        "--output", out, "--chunk", str(chunk),
    ])
    assert rc == 0
    mats = load_kitti(out)
    assert mats.shape == (10, 3, 4)
    est = mats[:, :, 3]
    assert ate_rmse_aligned(est, gt) < 0.3


def test_kitti_cli_chunk_truncates_at_lost(kitti_tree, tmp_path):
    """Chunk mode must cut the trajectory at the first LOST frame instead of
    writing frozen post-LOST poses for the rest of the chunk (the reference
    drivers stop at LOST, kitti_example.cpp:133-137)."""
    root, _ = kitti_tree
    world = SyntheticWorld(width=320, height=240, fx=260.0, fy=260.0,
                           cx=160.0, cy=120.0, baseline=0.3, n_points=1500,
                           extent_x=40.0, extent_y=18.0, extent_z=90.0)
    seq = tmp_path / "sequences" / "04"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    blank = np.full((240, 320), 40, np.uint8)
    for i, (l, r, _) in enumerate(world.stereo_sequence(10, speed=0.5)):
        if i >= 5:  # blind the camera from frame 5 on
            l = r = blank
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), l.astype(np.uint8))
        cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), r.astype(np.uint8))
    out = str(tmp_path / "04.txt")
    rc = main([
        "kitti", "--sequences-dir", str(tmp_path / "sequences"), "--seq", "4",
        "--calib", str(root / "calib_03.yaml"),
        "--config", str(root / "vo.yaml"),
        "--output", out, "--chunk", "4",
    ])
    assert rc == 0
    mats = load_kitti(out)
    # frames 0-4 tracked, frame 5 is the first LOST -> exactly 6 poses
    # (the LOST frame reports the last tracked pose, like online mode)
    assert mats.shape == (6, 3, 4)


def test_tum_cli(tmp_path):
    world = SyntheticWorld(width=320, height=240, fx=260.0, fy=260.0,
                           cx=160.0, cy=120.0, n_points=1200,
                           extent_x=40.0, extent_y=18.0, extent_z=20.0)
    data = tmp_path / "rgbd_dataset_synthetic"
    (data / "rgb").mkdir(parents=True)
    (data / "depth").mkdir(parents=True)
    assoc_lines = []
    gt = []
    for i, (g, d, (rot, t)) in enumerate(world.rgbd_sequence(8, speed=0.2)):
        ts = 1000.0 + i * 0.1
        cv2.imwrite(str(data / "rgb" / f"{ts:.6f}.png"), g.astype(np.uint8))
        d16 = np.clip(d * 5000.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(data / "depth" / f"{ts:.6f}.png"), d16)
        assoc_lines.append(
            f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png"
        )
        gt.append(t)
    assoc = tmp_path / "assoc.txt"
    assoc.write_text("\n".join(assoc_lines) + "\n")
    cfg = tmp_path / "tum.yaml"
    cfg.write_text(
        "fx: 260.0\nfy: 260.0\ncx: 160.0\ncy: 120.0\n"
        "img_width: 320\nimg_height: 240\n"
        "near_plane_distance: 0.1\nfar_plane_distance: 40.0\n"
        "agast_threshold: 15\ndetection_cell_size: 2000\n"
        "max_keypoints_per_cell: 400\nstaged_threshold: 0\n"
        "triangulation_policy: 2\nmax_map_points: 4096\n"
        "max_staged_points: 512\n"
    )
    out = str(tmp_path / "tum_out.txt")
    rc = main([
        "tum", "--dataset-dir", str(data), "--association", str(assoc),
        "--config", str(cfg), "--output", out,
    ])
    assert rc == 0
    stamps, est = load_tum(out)
    assert len(stamps) == 8
    assert ate_rmse_aligned(est, np.array(gt)) < 0.3


def _render_euroc_raw(points, intensities, t_rect, right):
    """Render a raw (distorted, unrectified) EuRoC camera frame: project
    world points through R^-1 -> distort -> K, i.e. the inverse of the
    rectification the CLI applies on device. Vectorized Gaussian splats."""
    from lvt_tpu.io.datasets import (
        EUROC_BASELINE, EUROC_DL, EUROC_DR, EUROC_KL, EUROC_KR, EUROC_RL,
        EUROC_RR, EUROC_SIZE,
    )

    w, h = EUROC_SIZE
    k_mat = EUROC_KR if right else EUROC_KL
    dist = EUROC_DR if right else EUROC_DL
    r_rect = EUROC_RR if right else EUROC_RL
    t = t_rect + (np.array([EUROC_BASELINE, 0, 0]) if right else 0.0)
    p_cam = (points - t) @ r_rect  # x_raw = R^-1 @ x_rect (R orthonormal)
    z = p_cam[:, 2]
    vis = z > 0.5
    xn = p_cam[:, 0] / np.where(vis, z, 1.0)
    yn = p_cam[:, 1] / np.where(vis, z, 1.0)
    k1, k2, p1, p2, k3 = dist
    r2 = xn * xn + yn * yn
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    u = k_mat[0, 0] * xd + k_mat[0, 2]
    v = k_mat[1, 1] * yd + k_mat[1, 2]
    m = 4
    vis &= (u > m) & (u < w - m) & (v > m) & (v < h - m)
    img = np.full((h, w), 40.0, np.float32)
    ku = np.arange(-m, m + 1)
    for ui, vi, ii in zip(u[vis], v[vis], intensities[vis]):
        x0, y0 = int(ui), int(vi)
        g = np.exp(-(((y0 + ku - vi)[:, None]) ** 2
                     + ((x0 + ku - ui)[None, :]) ** 2) / (2 * 1.1 ** 2))
        img[y0 - m : y0 + m + 1, x0 - m : x0 + m + 1] += ii * g
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.slow
def test_euroc_cli(tmp_path):
    """EuRoC layout end-to-end: raw distorted frames in, on-device
    rectification inside the jitted step, body-frame TUM trajectory out."""
    rs = np.random.RandomState(5)
    n_pts = 2500
    points = np.stack([
        rs.uniform(-30, 30, n_pts), rs.uniform(-15, 15, n_pts),
        rs.uniform(2.0, 60.0, n_pts),
    ], -1)
    intensities = rs.uniform(60.0, 215.0, n_pts)

    root = tmp_path / "euroc"
    cam0 = root / "V9_99_synthetic" / "mav0" / "cam0" / "data"
    cam1 = root / "V9_99_synthetic" / "mav0" / "cam1" / "data"
    cam0.mkdir(parents=True)
    cam1.mkdir(parents=True)
    stamps, gt = [], []
    n = 8
    for i in range(n):
        t_rect = np.array([0.0, 0.0, 0.25 * i])
        name = f"{1403636579763555584 + i * 50000000}"
        cv2.imwrite(str(cam0 / f"{name}.png"),
                    _render_euroc_raw(points, intensities, t_rect, False))
        cv2.imwrite(str(cam1 / f"{name}.png"),
                    _render_euroc_raw(points, intensities, t_rect, True))
        stamps.append(name)
        gt.append(t_rect)
    stamps_file = tmp_path / "stamps.txt"
    stamps_file.write_text("\n".join(stamps) + "\n")
    cfg = tmp_path / "euroc.yaml"
    cfg.write_text(
        "near_plane_distance: 0.5\nfar_plane_distance: 100.0\n"
        "agast_threshold: 15\ndetection_cell_size: 160\n"
        "max_keypoints_per_cell: 60\nmax_map_points: 1024\n"
        "max_staged_points: 1024\n"
    )
    out = str(tmp_path / "euroc_out.txt")
    rc = main([
        "euroc", "--root", str(root), "--dataset", "V9_99_synthetic",
        "--stamps", str(stamps_file), "--config", str(cfg),
        "--output", out, "--chunk", "4", "--record",
    ])
    assert rc == 0
    ts, est = load_tum(out)
    assert len(ts) == n
    # SE(3) alignment absorbs the T_BS body-frame transform
    assert ate_rmse_aligned(est, np.array(gt)) < 0.15
    # --record produced the reference-format metrics artifacts
    assert os.path.exists("measurments.txt") and os.path.exists("titles.txt")
    assert len(open("measurments.txt").read().strip().splitlines()) == n
    os.remove("measurments.txt")
    os.remove("titles.txt")


def test_synthetic_cli(capsys):
    rc = main(["synthetic", "--frames", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ATE RMSE" in out
