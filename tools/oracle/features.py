"""Oracle feature pipeline: grid detection + ANMS + BRIEF + matching struct.

Mirrors lvt_image_features_handler.cpp and lvt_image_features_struct.cpp.
Sequential, greedy, hash-grid semantics are reproduced exactly (including
the quirk that the 2x-radius tracking retry keeps the hash-grid search
window of the ORIGINAL radius, because set_tracking_radius never
recomputes m_cell_search_radius — lvt_image_features_struct.h:56,69).
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from lvt_tpu.ops.brief import (
    BORDER as BRIEF_BORDER,
    KERNEL_SIZE,
    N_BITS,
    PATCH_SIZE,
    test_pattern,
)

HASHING_CELL_SIZE = 25          # lvt_definitions.h:32
VERTICAL_SEARCH_RADIUS = 2      # lvt_definitions.h:31
CORNERS_LOW_TH = 200            # lvt_definitions.h:33


# ---------------------------------------------------------------------------
# detection (lvt_image_features_handler.cpp:131-169)
# ---------------------------------------------------------------------------

def adaptive_non_maximal_suppression(kp: list, num_to_keep: int,
                                     tx: float, ty: float) -> list:
    """Greedy ANMS, faithful port of _adaptive_non_maximal_suppresion
    (lvt_image_features_handler.cpp:34-83): sort by response desc, compute
    each keypoint's suppression radius against stronger ones (robustCoeff
    1.11), keep those with radius >= the num_to_keep-th largest."""
    kp = sorted(kp, key=lambda k: -k.response)
    n = len(kp)
    pts = np.array([[k.pt[0], k.pt[1]] for k in kp], np.float32)
    resp = np.array([k.response for k in kp], np.float32)
    robust = np.float32(1.11)
    radii = np.empty(n, np.float32)
    for i in range(n):
        response = resp[i] * robust
        stronger = resp[:i] > response
        if stronger.any():
            d = pts[:i][stronger] - pts[i]
            radius = math.sqrt(float(np.min(np.sum(d * d, axis=1))))
        else:
            radius = np.finfo(np.float32).max
        radii[i] = radius
    decision = np.sort(radii)[::-1][num_to_keep]
    out = []
    for i in range(n):
        if radii[i] >= decision:
            k = kp[i]
            k.pt = (k.pt[0] + tx, k.pt[1] + ty)
            out.append(k)
    return out


class GridDetector:
    """Per-cell FAST detection + ANMS cap + low-corner threshold retry
    (perform_detect_corners / perform_compute_features,
    lvt_image_features_handler.cpp:131-176)."""

    def __init__(self, img_width: int, img_height: int, cell_size: int,
                 max_per_cell: int, threshold: int):
        self.max_per_cell = max_per_cell
        self.threshold = threshold
        # cell rects exactly as the ctor builds them (:95-114)
        ncy = 1 + (img_height - 1) // cell_size
        ncx = 1 + (img_width - 1) // cell_size
        self.rects = []
        s = cell_size
        for i in range(ncy):
            for k in range(ncx):
                sy = s
                if i == ncy - 1 and (i + 1) * s > img_height:
                    sy = img_height - i * s
                sx = s
                if k == ncx - 1 and (k + 1) * s > img_width:
                    sx = img_width - k * s
                self.rects.append((k * s, i * s, sx, sy))
        self._detector = cv2.FastFeatureDetector_create(
            threshold=threshold, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16,
        )

    def _detect_cells(self, img: np.ndarray, threshold: int) -> list:
        self._detector.setThreshold(threshold)
        all_kp = []
        for (x, y, sx, sy) in self.rects:
            sub = img[y : y + sy, x : x + sx]
            kps = self._detector.detect(sub)
            if len(kps) > self.max_per_cell:
                kps = adaptive_non_maximal_suppression(
                    list(kps), self.max_per_cell, float(x), float(y)
                )
            else:
                for k in kps:
                    k.pt = (k.pt[0] + x, k.pt[1] + y)
            all_kp.extend(kps)
        return all_kp

    def detect(self, img: np.ndarray) -> list:
        kps = self._detect_cells(img, self.threshold)
        if len(kps) < CORNERS_LOW_TH:
            lowered = int(float(self.threshold) * 0.5 + 0.5)
            kps = self._detect_cells(img, lowered)
        return kps


# ---------------------------------------------------------------------------
# BRIEF (xfeatures2d::BriefDescriptorExtractor behavior; shared pattern
# with lvt_tpu.ops.brief so descriptors are directly comparable)
# ---------------------------------------------------------------------------

def brief_compute(img: np.ndarray, kps: list) -> tuple[list, np.ndarray]:
    """Box-smoothed BRIEF-256: removes border keypoints then packs 256
    comparison bits into 32 bytes (CV_8U rows, BFMatcher-compatible).
    Returns (kept keypoints, desc [N, 32] uint8)."""
    h, w = img.shape
    kept = [
        k for k in kps
        if BRIEF_BORDER <= round(k.pt[0]) < w - BRIEF_BORDER
        and BRIEF_BORDER <= round(k.pt[1]) < h - BRIEF_BORDER
    ]
    if not kept:
        return [], np.zeros((0, N_BITS // 8), np.uint8)
    # 9x9 box *sum* like OpenCV BRIEF's integral-image smoothedSum
    smooth = cv2.boxFilter(
        img.astype(np.float32), -1, (KERNEL_SIZE, KERNEL_SIZE),
        normalize=False, borderType=cv2.BORDER_REPLICATE,
    )
    pat = test_pattern()  # [256, 2, 2] (pair, point, (dx, dy))
    xs = np.array([round(k.pt[0]) for k in kept], np.int64)
    ys = np.array([round(k.pt[1]) for k in kept], np.int64)
    s1 = smooth[ys[:, None] + pat[None, :, 0, 1], xs[:, None] + pat[None, :, 0, 0]]
    s2 = smooth[ys[:, None] + pat[None, :, 1, 1], xs[:, None] + pat[None, :, 1, 0]]
    bits = (s1 < s2).astype(np.uint8)  # [N, 256]
    # pack little-endian within each byte (bit i of word -> byte i//8)
    desc = np.zeros((len(kept), N_BITS // 8), np.uint8)
    for b in range(8):
        desc |= bits[:, b::8] << b
    return kept, desc


def desc_bytes_to_words(desc: np.ndarray) -> np.ndarray:
    """[N, 32] uint8 -> [N, 8] uint32 little-endian (lvt_tpu packing)."""
    return desc.reshape(-1, 8, 4).astype(np.uint32) @ np.uint32(
        [1, 1 << 8, 1 << 16, 1 << 24]
    )


# ---------------------------------------------------------------------------
# features struct (lvt_image_features_struct.cpp)
# ---------------------------------------------------------------------------

class FeaturesStruct:
    """Per-frame keypoints + descriptors + matched marks + 25px hash grid
    (lvt_image_features_struct.cpp:35-148)."""

    def __init__(self, img_shape: tuple, kps: list, desc: np.ndarray,
                 tracking_radius: int, triangulation_ratio_th: float,
                 tracking_ratio_th: float, desc_dist_th: float,
                 kps_depth: np.ndarray | None = None):
        self.rows, self.cols = img_shape
        self.kp = np.array([[k.pt[0], k.pt[1]] for k in kps], np.float32).reshape(-1, 2)
        self.desc = desc
        self.tracking_radius = tracking_radius
        self.triangulation_ratio_th = triangulation_ratio_th
        self.tracking_ratio_th = tracking_ratio_th
        self.desc_dist_th = desc_dist_th
        self.depth = kps_depth
        cell = float(HASHING_CELL_SIZE)
        self.cell_count_x = math.ceil(self.cols / cell)
        self.cell_count_y = math.ceil(self.rows / cell)
        # (:53) — frozen at init; never recomputed on set_tracking_radius
        self.cell_search_radius = (
            1 if tracking_radius == HASHING_CELL_SIZE
            else math.ceil(tracking_radius / cell)
        )
        self.grid: list[list[list[int]]] = [
            [[] for _ in range(self.cell_count_x)]
            for _ in range(self.cell_count_y)
        ]
        for i, (x, y) in enumerate(self.kp):
            cy = min(int(y / cell), self.cell_count_y - 1)
            cx = min(int(x / cell), self.cell_count_x - 1)
            self.grid[cy][cx].append(i)
        self.matched = np.zeros(len(self.kp), bool)
        self._matcher = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)

    def count(self) -> int:
        return len(self.kp)

    def reset_matched_marks(self):
        self.matched[:] = False

    def find_match_index(self, pt: np.ndarray, desc: np.ndarray,
                         radius_override: int | None = None):
        """Masked 2-NN + ratio/absolute acceptance
        (lvt_image_features_struct.cpp:68-120). Returns (idx, d1, d2)."""
        if len(self.kp) == 0:
            return -1, 0.0, 0.0
        radius = radius_override or self.tracking_radius
        cell = float(HASHING_CELL_SIZE)
        hy = min(int(pt[1] / cell), self.cell_count_y - 1)
        hx = min(int(pt[0] / cell), self.cell_count_x - 1)
        r = self.cell_search_radius
        mask = np.zeros((1, len(self.kp)), np.uint8)
        r2 = float(radius * radius)
        for cy in range(max(hy - r, 0), min(hy + r + 1, self.cell_count_y)):
            for cx in range(max(hx - r, 0), min(hx + r + 1, self.cell_count_x)):
                for idx in self.grid[cy][cx]:
                    if not self.matched[idx]:
                        d = self.kp[idx] - pt
                        if d[0] * d[0] + d[1] * d[1] < r2:
                            mask[0, idx] = 1
        matches = self._matcher.knnMatch(desc[None, :], self.desc, k=2,
                                         mask=mask)
        m = matches[0] if matches else []
        if len(m) > 1:
            # C++ float semantics: d2 == 0 makes the ratio inf/NaN -> reject
            if m[1].distance > 0 and (
                m[0].distance / m[1].distance < self.tracking_ratio_th
            ):
                return m[0].trainIdx, m[0].distance, m[1].distance
        elif len(m) == 1 and m[0].distance <= self.desc_dist_th:
            return m[0].trainIdx, m[0].distance, -1.0
        return -1, 0.0, 0.0

    def row_match(self, pt: np.ndarray, desc: np.ndarray) -> int:
        """(lvt_image_features_struct.cpp:122-148)."""
        if len(self.kp) == 0:
            return -1
        start_y = max(int(pt[1]) - VERTICAL_SEARCH_RADIUS, 0)
        end_y = min(int(pt[1]) + VERTICAL_SEARCH_RADIUS, self.rows)
        ok = (~self.matched) & (self.kp[:, 1] >= start_y) & (self.kp[:, 1] <= end_y)
        mask = ok[None, :].astype(np.uint8)
        matches = self._matcher.knnMatch(desc[None, :], self.desc, k=2,
                                         mask=np.ascontiguousarray(mask))
        m = matches[0] if matches else []
        # C++ float semantics: d2 == 0 makes the ratio inf/NaN -> reject
        if (len(m) > 1 and m[1].distance > 0
                and m[0].distance / m[1].distance < self.triangulation_ratio_th) or (
            len(m) == 1 and m[0].distance <= self.desc_dist_th
        ):
            return m[0].trainIdx
        return -1


def row_match_pairs(left: FeaturesStruct, right: FeaturesStruct) -> list:
    """Greedy L->R epipolar matching over unmatched left features
    (lvt_image_features_handler.cpp:302-323). Returns [(qi, ti)]."""
    out = []
    for i in range(left.count()):
        if left.matched[i]:
            continue
        ti = right.row_match(left.kp[i], left.desc[i])
        if ti != -1:
            out.append((i, ti))
            left.matched[i] = True
            right.matched[ti] = True
    return out


def compute_features(img: np.ndarray, detector: GridDetector,
                     params) -> FeaturesStruct:
    """perform_compute_features (lvt_image_features_handler.cpp:156-176)."""
    kps = detector.detect(img)
    kept, desc = brief_compute(img, kps)
    return FeaturesStruct(
        img.shape, kept, desc, params.tracking_radius,
        params.triangulation_ratio_test_threshold,
        params.tracking_ratio_test_threshold,
        params.descriptor_matching_threshold,
    )


def compute_features_rgbd(img: np.ndarray, depth: np.ndarray,
                          detector: GridDetector, params) -> FeaturesStruct:
    """Detection + description + depth filter (+ undistort if k1 != 0)
    (lvt_image_features_handler.cpp:227-300)."""
    kps = detector.detect(img)
    kept, desc = brief_compute(img, kps)
    filt_kp, filt_desc, depths = [], [], []
    for i, k in enumerate(kept):
        d = float(depth[int(k.pt[1]), int(k.pt[0])])
        if params.near_plane_distance <= d <= params.far_plane_distance:
            filt_kp.append(k)
            filt_desc.append(desc[i])
            depths.append(d)
    desc = (np.stack(filt_desc) if filt_desc
            else np.zeros((0, N_BITS // 8), np.uint8))
    if abs(params.k1) > 1e-5 and filt_kp:
        pts = np.array([[k.pt[0], k.pt[1]] for k in filt_kp], np.float32)
        kmat = np.array([[params.fx, 0, params.cx],
                         [0, params.fy, params.cy], [0, 0, 1]], np.float32)
        dist = np.array([params.k1, params.k2, params.p1, params.p2,
                         params.k3], np.float32)
        und = cv2.undistortPoints(pts.reshape(-1, 1, 2), kmat, dist,
                                  P=kmat).reshape(-1, 2)
        for k, (x, y) in zip(filt_kp, und):
            k.pt = (float(x), float(y))
    return FeaturesStruct(
        img.shape, filt_kp, desc, params.tracking_radius,
        params.triangulation_ratio_test_threshold,
        params.tracking_ratio_test_threshold,
        params.descriptor_matching_threshold,
        np.array(depths, np.float32),
    )
