"""Oracle VO system: state machine + per-frame pipeline (lvt_system.cpp)."""

from __future__ import annotations

import dataclasses

import numpy as np

from tools.oracle import features as feat
from tools.oracle.local_map import LocalMap
from tools.oracle.motion import MotionModel
from tools.oracle.pnp import PnPSolver
from tools.oracle.pose import identity

NOT_INITIALIZED, TRACKING, LOST = 1, 2, 3
N_MATCHES_WINDOWS = 3  # lvt_system.h:102-104


@dataclasses.dataclass
class OracleParams:
    """lvt_parameters with reference defaults (lvt_parameters.cpp:29-52)."""
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    baseline: float = 0.0
    img_width: int = 0
    img_height: int = 0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    near_plane_distance: float = 0.1
    far_plane_distance: float = 500.0
    triangulation_ratio_test_threshold: float = 0.60
    tracking_ratio_test_threshold: float = 0.80
    descriptor_matching_threshold: float = 30.0
    min_num_matches_for_tracking: int = 10
    tracking_radius: int = 25
    detection_cell_size: int = 250
    max_keypoints_per_cell: int = 150
    agast_threshold: int = 25
    untracked_threshold: int = 10
    staged_threshold: int = 2
    triangulation_policy: int = 1


class OracleVO:
    """lvt_system equivalent (create/track/reset/get_state,
    lvt_system.cpp:70-207). Poses are (r_c2w [3,3], t [3]) float64."""

    def __init__(self, params: OracleParams, sensor: str = "stereo"):
        self.params = params
        self.sensor = sensor
        self.detector = feat.GridDetector(
            params.img_width, params.img_height, params.detection_cell_size,
            params.max_keypoints_per_cell, params.agast_threshold,
        )
        self.local_map = LocalMap(params)
        self.pnp = PnPSolver(params.fx, params.fy, params.cx, params.cy,
                             params.baseline)
        self.motion = MotionModel()
        self.state = NOT_INITIALIZED
        self.last_pose = identity()
        self.frame_number = 0
        self.last_matches = [np.iinfo(np.int32).max] * N_MATCHES_WINDOWS
        self.last_inlier_count = 0

    def reset(self):
        self.local_map.reset()
        self.motion.reset()
        self.last_pose = identity()
        self.frame_number = 0
        self.last_matches = [np.iinfo(np.int32).max] * N_MATCHES_WINDOWS
        self.state = NOT_INITIALIZED

    def get_state(self):
        return self.state

    # -- per-frame (lvt_system.cpp:157-207) ------------------------------
    def track(self, img1: np.ndarray, img2: np.ndarray):
        self.frame_number += 1
        if self.state == LOST:
            return self.last_pose

        if self.sensor == "stereo":
            left = feat.compute_features(img1, self.detector, self.params)
            right = feat.compute_features(img2, self.detector, self.params)
        else:
            left = feat.compute_features_rgbd(
                img1, img2, self.detector, self.params)
            right = None

        if self.state == NOT_INITIALIZED:
            pose = identity()
            self.local_map.update_with_new_triangulation(
                pose, left, right, dont_stage=True)
            self.state = TRACKING
            self.last_matches[0] = self.local_map.get_map_size()
            return pose

        predicted = self.motion.predict_next_pose(self.last_pose)
        pose, is_tracking = self._perform_tracking(predicted, left, right)
        if not is_tracking:
            self.state = LOST
            return self.last_pose
        self.last_pose = pose
        return pose

    def _perform_tracking(self, estimated_pose, left, right):
        """(lvt_system.cpp:252-306)."""
        map_points, matches_left, _ = self.local_map.find_matches(
            estimated_pose, left)
        matches_count = len(map_points)
        if matches_count < self.params.min_num_matches_for_tracking:
            return self.last_pose, False
        self.last_matches.append(matches_count)
        self.last_matches.pop(0)

        obs = left.kp[matches_left]
        optimized, self.last_inlier_count = self.pnp.compute_pose(
            estimated_pose, map_points, obs)

        self.local_map.clean_untracked_points(left)
        if self.params.staged_threshold > 0:
            self.local_map.update_staged_map_points(optimized, left)
        if self._need_new_triangulation():
            self.local_map.update_with_new_triangulation(
                optimized, left, right)
        return optimized, True

    def _need_new_triangulation(self) -> bool:
        """Triangulation policies (lvt_system.cpp:308-334)."""
        p = self.params.triangulation_policy
        if p == 2:
            return True
        if p == 3:
            return self.local_map.get_map_size() < 1000
        ratio = 0.99
        for i in range(N_MATCHES_WINDOWS - 1, 0, -1):
            if float(self.last_matches[i]) > ratio * float(self.last_matches[i - 1]):
                return False
        return True
