"""Oracle constant-velocity motion model (lvt_motion_model.cpp:26-65)."""

from __future__ import annotations

import numpy as np

from tools.oracle.pose import (
    quat_conj,
    quat_from_matrix,
    quat_mul,
    quat_slerp,
    quat_to_matrix,
)


class MotionModel:
    def __init__(self):
        self.reset()

    def reset(self):
        self.last_q = np.array([1.0, 0.0, 0.0, 0.0])
        self.angular_velocity = np.array([1.0, 0.0, 0.0, 0.0])
        self.last_position = np.zeros(3)
        self.linear_velocity = np.zeros(3)

    def predict_next_pose(self, pose):
        r, t = pose
        new_lin = (t - self.last_position + self.linear_velocity) * 0.5
        current_q = quat_from_matrix(r)
        ang_diff = quat_mul(current_q, quat_conj(self.last_q))
        new_ang = quat_slerp(ang_diff, 0.5, self.angular_velocity)
        new_ang = new_ang / np.linalg.norm(new_ang)

        self.last_q = current_q
        self.angular_velocity = new_ang
        self.last_position = t.copy()
        self.linear_velocity = new_lin

        int_pos = self.last_position + self.linear_velocity
        int_q = quat_mul(current_q, new_ang)
        int_q = int_q / np.linalg.norm(int_q)
        return quat_to_matrix(int_q), int_pos
