"""Projection matching and row matching semantics."""

import jax.numpy as jnp
import numpy as np

from lvt_tpu.core.features import FrameFeatures
from lvt_tpu.geometry.se3 import Pose
from lvt_tpu.ops import matching

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
CAM = dict(
    fx=FX, fy=FY, cx=CX, cy=CY,
    near=0.1, far=500.0, min_x=0.0, max_x=640.0, min_y=0.0, max_y=480.0,
    tracking_radius=25, ratio_threshold=0.8, abs_threshold=25.0,
    retry_min_matches=50,
)


def rand_desc(rng, n):
    return rng.randint(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def project(pts):
    return np.stack(
        [FX * pts[:, 0] / pts[:, 2] + CX, FY * pts[:, 1] / pts[:, 2] + CY], -1
    ).astype(np.float32)


def make_map_and_frame(rng, n_map=80, k_cap=128, jitter=2.0):
    z = rng.uniform(2, 40, n_map)
    x = (rng.uniform(60, 580, n_map) - CX) * z / FX
    y = (rng.uniform(60, 420, n_map) - CY) * z / FY
    pos = np.stack([x, y, z], -1).astype(np.float32)
    desc = rand_desc(rng, n_map)
    uv = project(pos) + rng.randn(n_map, 2).astype(np.float32) * jitter

    kp = np.zeros((k_cap, 2), np.float32)
    fdesc = np.zeros((k_cap, 8), np.uint32)
    valid = np.zeros(k_cap, bool)
    kp[:n_map] = uv
    fdesc[:n_map] = desc  # identical descriptors -> distance 0 at the target
    valid[:n_map] = True
    feats = FrameFeatures.from_arrays(kp, fdesc, valid=valid)
    return pos, desc, feats


def test_perfect_matches_found(rng):
    pos, desc, feats = make_map_and_frame(rng)
    m_valid = np.ones(80, bool)
    res = matching.find_map_matches(
        jnp.array(pos), jnp.array(desc), jnp.array(m_valid),
        Pose.identity(), feats, **CAM,
    )
    idx = np.asarray(res.match_idx)
    # with distance-0 descriptors and unique random 256-bit codes, every map
    # point should match its own feature (ratio 0/d2 passes)
    assert int(res.matches_count) >= 78
    hit = idx[:80] == np.arange(80)
    assert hit.sum() >= 78
    fm = np.asarray(res.feature_matched)
    assert fm[:80].sum() == int(res.matches_count)


def test_invisible_points_marked_minus2(rng):
    pos, desc, feats = make_map_and_frame(rng, n_map=40)
    pos_bad = pos.copy()
    pos_bad[:5, 2] = -10.0  # behind camera
    res = matching.find_map_matches(
        jnp.array(pos_bad), jnp.array(desc), jnp.ones(40, bool),
        Pose.identity(), feats, **CAM,
    )
    idx = np.asarray(res.match_idx)
    assert (idx[:5] == -2).all()
    vis = np.asarray(res.visible)
    assert not vis[:5].any() and vis[5:].all()


def test_radius_gates_candidates(rng):
    pos, desc, feats = make_map_and_frame(rng, n_map=60)
    # push half the keypoints far from their projections (> 2*radius)
    kp = np.asarray(feats.kp).copy()
    kp[:30] += 120.0
    feats = feats._replace(kp=jnp.array(kp))
    res = matching.find_map_matches(
        jnp.array(pos), jnp.array(desc), jnp.ones(60, bool),
        Pose.identity(), feats, **CAM,
    )
    idx = np.asarray(res.match_idx)
    assert (idx[:30] == -1).all()   # visible but no candidate in radius
    assert (idx[30:] == np.arange(30, 60)).all()
    assert bool(res.used_wide_radius)  # only 30 < 50 matches -> wide retry


def test_wide_radius_rescues_low_matches(rng):
    pos, desc, feats = make_map_and_frame(rng, n_map=60, jitter=0.0)
    # shift keypoints ~35px: outside 25px radius, inside 50px
    kp = np.asarray(feats.kp).copy()
    kp[:, 0] += 35.0
    feats = feats._replace(kp=jnp.array(kp))
    res = matching.find_map_matches(
        jnp.array(pos), jnp.array(desc), jnp.ones(60, bool),
        Pose.identity(), feats, **CAM,
    )
    assert bool(res.used_wide_radius)
    assert int(res.matches_count) >= 58


def test_row_match_pairs_by_rows(rng):
    k = 64
    n = 40
    kp_l = np.zeros((k, 2), np.float32)
    kp_r = np.zeros((k, 2), np.float32)
    desc = rand_desc(rng, n)
    dl = np.zeros((k, 8), np.uint32)
    dr = np.zeros((k, 8), np.uint32)
    valid = np.zeros(k, bool)
    ys = rng.uniform(10, 400, n).astype(np.float32)
    kp_l[:n] = np.stack([rng.uniform(100, 600, n), ys], -1)
    # +-1.0 row jitter always falls inside the reference's floor(y)+-2 window
    kp_r[:n] = np.stack([kp_l[:n, 0] - 20.0, ys + rng.uniform(-1.0, 1.0, n)], -1)
    dl[:n] = desc
    dr[:n] = desc
    valid[:n] = True
    left = FrameFeatures.from_arrays(kp_l, dl, valid=valid)
    right = FrameFeatures.from_arrays(kp_r, dr, valid=valid)
    res = matching.row_match(
        left, right, jnp.zeros(k, bool),
        vertical_search_radius=2, ratio_threshold=0.6, abs_threshold=25.0,
        img_rows=480,
    )
    idx = np.asarray(res.right_idx)
    assert (idx[:n] == np.arange(n)).sum() >= n - 2
    assert int(res.count) >= n - 2
    assert not np.asarray(res.left_matched)[n:].any()


def test_row_match_excludes_tracked_left(rng):
    k = 32
    n = 10
    kp = np.zeros((k, 2), np.float32)
    kp[:n] = np.stack([np.linspace(100, 500, n), np.full(n, 50.0)], -1)
    desc = np.zeros((k, 8), np.uint32)
    desc[:n] = rand_desc(rng, n)
    valid = np.zeros(k, bool)
    valid[:n] = True
    feats = FrameFeatures.from_arrays(kp, desc, valid=valid)
    excluded = np.zeros(k, bool)
    excluded[:5] = True
    res = matching.row_match(
        feats, feats, jnp.array(excluded),
        vertical_search_radius=2, ratio_threshold=0.6, abs_threshold=25.0,
        img_rows=480,
    )
    idx = np.asarray(res.right_idx)
    assert (idx[:5] == -1).all()
    assert (idx[5:n] == np.arange(5, n)).all()


def test_vertical_window_excludes_far_rows(rng):
    k = 16
    kp_l = np.zeros((k, 2), np.float32)
    kp_r = np.zeros((k, 2), np.float32)
    desc = np.zeros((k, 8), np.uint32)
    desc[:2] = rand_desc(rng, 2)
    kp_l[0] = [300, 100.0]
    kp_r[0] = [280, 104.0]  # 4 rows away > radius 2
    kp_l[1] = [300, 200.0]
    kp_r[1] = [280, 201.5]  # within window
    valid = np.zeros(k, bool)
    valid[:2] = True
    left = FrameFeatures.from_arrays(kp_l, desc, valid=valid)
    right = FrameFeatures.from_arrays(kp_r, desc, valid=valid)
    res = matching.row_match(
        left, right, jnp.zeros(k, bool),
        vertical_search_radius=2, ratio_threshold=0.6, abs_threshold=25.0,
        img_rows=480,
    )
    idx = np.asarray(res.right_idx)
    assert idx[0] == -1
    assert idx[1] == 1
