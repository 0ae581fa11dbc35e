"""Oracle local map: rolling 3D point set with staging, culling, triangulation.

Faithful port of lvt_local_map.cpp (reference file:line cited per method).
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np

from tools.oracle import features as feat
from tools.oracle.pose import (
    right_camera_pose,
    world_to_camera,
)

REPROJECTION_TH2 = 5.991   # lvt_definitions.h:29
N_MAP_POINTS = 250         # lvt_definitions.h:30
N_MATCHES_TH = 50          # lvt_definitions.h:34


@dataclasses.dataclass
class MapPoint:
    """lvt_map_point (lvt_local_map.h:64-72)."""
    position: np.ndarray
    descriptor: np.ndarray
    counter: int = 0
    age: int = 0
    match_idx: int = -2


class LocalMap:
    def __init__(self, params):
        self.params = params
        self.map_points: list[MapPoint] = []
        self.staged_points: list[MapPoint] = []
        # image bounds (lvt_local_map.cpp:87-122)
        if abs(params.k1) < 1e-5:
            self.min_x, self.max_x = 0.0, float(params.img_width)
            self.min_y, self.max_y = 0.0, float(params.img_height)
        else:
            corners = np.array(
                [[0, 0], [params.img_width, 0], [0, params.img_height],
                 [params.img_width, params.img_height]], np.float32)
            kmat = np.array([[params.fx, 0, params.cx],
                             [0, params.fy, params.cy], [0, 0, 1]], np.float32)
            dist = np.array([params.k1, params.k2, params.p1, params.p2,
                             params.k3], np.float32)
            und = cv2.undistortPoints(corners.reshape(-1, 1, 2), kmat, dist,
                                      P=kmat).reshape(-1, 2)
            self.min_x = min(und[0, 0], und[2, 0])
            self.max_x = max(und[1, 0], und[3, 0])
            self.min_y = min(und[0, 1], und[1, 1])
            self.max_y = max(und[2, 1], und[3, 1])

    # -- helpers ---------------------------------------------------------
    def reset(self):
        self.map_points.clear()
        self.staged_points.clear()

    def get_map_size(self) -> int:
        return len(self.map_points)

    def get_staged_points_count(self) -> int:
        return len(self.staged_points)

    def is_point_visible(self, pt: np.ndarray, w2c: np.ndarray):
        """(lvt_local_map.cpp:62-82). Returns (visible, projected [2])."""
        p = self.params
        pt_cam = w2c[:, :3] @ pt + w2c[:, 3]
        if pt_cam[2] < p.near_plane_distance or pt_cam[2] > p.far_plane_distance:
            return False, None
        inv_z = 1.0 / pt_cam[2]
        u = p.fx * pt_cam[0] * inv_z + p.cx
        v = p.fy * pt_cam[1] * inv_z + p.cy
        if u < self.min_x or u > self.max_x or v < self.min_y or v > self.max_y:
            return False, None
        return True, np.array([u, v])

    # -- matching (lvt_local_map.cpp:136-229) ----------------------------
    def find_matches(self, cam_pose, left: feat.FeaturesStruct):
        """Returns (map_points [N,3], matches_left [N], matches_count)."""
        w2c = world_to_camera(cam_pose)
        matches = [-2] * len(self.map_points)
        projections = [None] * len(self.map_points)
        matches_count = 0
        for i, mp in enumerate(self.map_points):
            visible, proj = self.is_point_visible(mp.position, w2c)
            if not visible:
                mp.counter += 1
                continue
            projections[i] = proj
            idx, _, _ = left.find_match_index(proj, mp.descriptor)
            matches[i] = idx
            if idx != -1:
                matches_count += 1
                left.matched[idx] = True

        if matches_count < N_MATCHES_TH:
            # retry all visible points with doubled radius; NOTE the hash
            # search window stays at the original cell radius (the reference
            # never recomputes m_cell_search_radius, .h:56,69)
            matches_count = 0
            left.reset_matched_marks()
            wide = 2 * left.tracking_radius
            for i, mp in enumerate(self.map_points):
                if matches[i] == -2:
                    continue
                idx, _, _ = left.find_match_index(
                    projections[i], mp.descriptor, radius_override=wide)
                matches[i] = idx
                if idx != -1:
                    matches_count += 1
                    left.matched[idx] = True

        out_points, out_matches = [], []
        for i, mp in enumerate(self.map_points):
            mp.match_idx = matches[i]
            if matches[i] == -2:
                continue
            if matches[i] == -1:
                mp.counter += 1
                continue
            mp.age += 1
            out_points.append(mp.position)
            out_matches.append(matches[i])
        return out_points, out_matches, matches_count

    # -- triangulation (lvt_local_map.cpp:231-329) -----------------------
    def triangulate(self, cam_pose, left: feat.FeaturesStruct,
                    right: feat.FeaturesStruct) -> list[MapPoint]:
        matches = feat.row_match_pairs(left, right)
        if not matches:
            return []
        p = self.params
        pose_r = right_camera_pose(cam_pose, p.baseline)
        cml = world_to_camera(cam_pose)
        cmr = world_to_camera(pose_r)
        out = []
        inv_fx, inv_fy = 1.0 / p.fx, 1.0 / p.fy
        for qi, ti in matches:
            u1 = left.kp[qi]
            u2 = right.kp[ti]
            u1x = (u1[0] - p.cx) * inv_fx
            u1y = (u1[1] - p.cy) * inv_fy
            u2x = (u2[0] - p.cx) * inv_fx
            u2y = (u2[1] - p.cy) * inv_fy
            a = np.stack([
                u1x * cml[2] - cml[0],
                u1y * cml[2] - cml[1],
                u2x * cmr[2] - cmr[0],
                u2y * cmr[2] - cmr[1],
            ])  # [4, 4]
            world_pt, *_ = np.linalg.lstsq(a[:, :3], -a[:, 3], rcond=None)
            vis_l, proj_l = self.is_point_visible(world_pt, cml)
            if not vis_l:
                continue
            vis_r, proj_r = self.is_point_visible(world_pt, cmr)
            if not vis_r:
                continue
            if np.sum((proj_l - u1) ** 2) > REPROJECTION_TH2:
                continue
            if np.sum((proj_r - u2) ** 2) > REPROJECTION_TH2:
                continue
            out.append(MapPoint(world_pt, left.desc[qi].copy()))
        return out

    def triangulate_rgbd(self, cam_pose, img_struct: feat.FeaturesStruct):
        """(lvt_local_map.cpp:231-256) — backproject every feature with
        valid depth, matched or not."""
        p = self.params
        r, t = cam_pose
        out = []
        for i in range(img_struct.count()):
            u, v = img_struct.kp[i]
            z = float(img_struct.depth[i])
            x = (u - p.cx) * z / p.fx
            y = (v - p.cy) * z / p.fy
            pt_w = r @ np.array([x, y, z]) + t
            out.append(MapPoint(pt_w, img_struct.desc[i].copy()))
        return out

    def update_with_new_triangulation(self, cam_pose, left, right,
                                      dont_stage: bool = False):
        """(lvt_local_map.cpp:331-353)."""
        if left.depth is not None:
            new_points = self.triangulate_rgbd(cam_pose, left)
        else:
            new_points = self.triangulate(cam_pose, left, right)
        if (dont_stage or self.params.staged_threshold == 0
                or self.get_map_size() < N_MAP_POINTS):
            self.map_points.extend(new_points)
        else:
            self.staged_points.extend(new_points)

    def update_staged_map_points(self, cam_pose, left: feat.FeaturesStruct):
        """(lvt_local_map.cpp:355-391)."""
        w2c = world_to_camera(cam_pose)
        remaining = []
        for mp in self.staged_points:
            visible, proj = self.is_point_visible(mp.position, w2c)
            idx = -1
            if visible:
                idx, _, _ = left.find_match_index(proj, mp.descriptor)
            if not visible or idx == -1:
                continue  # erased
            left.matched[idx] = True
            mp.counter += 1
            if (mp.counter == self.params.staged_threshold
                    or self.get_map_size() < N_MAP_POINTS):
                self.map_points.append(mp)  # promoted, counter carried over
            else:
                remaining.append(mp)
        self.staged_points = remaining

    def clean_untracked_points(self, left: feat.FeaturesStruct):
        """(lvt_local_map.cpp:393-413)."""
        th = self.params.untracked_threshold
        kept = []
        for mp in self.map_points:
            if mp.counter >= th:
                if mp.match_idx >= 0:
                    left.matched[mp.match_idx] = False
            else:
                kept.append(mp)
        self.map_points = kept
