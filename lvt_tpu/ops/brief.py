"""BRIEF-256 binary descriptors, bit-packed for Hamming matmuls.

TPU-native replacement for OpenCV's ``xfeatures2d::BriefDescriptorExtractor``
(used by the reference at lvt/src/lvt_image_features_handler.cpp:117,172):
a 9x9 box-smoothed intensity is sampled at 256 fixed point pairs inside a
48x48 patch around each keypoint; bit i = [S(p1_i) < S(p2_i)]. Descriptors
are packed as 8 x uint32 (see lvt_tpu.ops.hamming).

The OpenCV test pattern is a machine-generated table; we instead generate the
pattern the way the BRIEF paper (Calonder et al., ECCV 2010) prescribes for
its best-performing variant (G II): i.i.d. isotropic Gaussian with
sigma = patch/5, clipped to the patch, from a fixed seed. The pattern only
needs to be *consistent across frames*, not identical to OpenCV's — matching
quality is equivalent and trajectory-level parity is the acceptance bar.

Keypoints closer than PATCH/2 + KERNEL/2 to the image border are invalidated,
mirroring OpenCV's runByImageBorder removal (we clear the validity mask
instead of shrinking arrays — fixed shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_SIZE = 48
KERNEL_SIZE = 9
N_BITS = 256
BORDER = PATCH_SIZE // 2 + KERNEL_SIZE // 2  # 28, matches OpenCV BRIEF
_PATTERN_SEED = 0x5F3759DF


@functools.lru_cache(maxsize=1)
def test_pattern() -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (dx, dy)) sampling offsets."""
    rs = np.random.RandomState(_PATTERN_SEED)
    sigma = PATCH_SIZE / 5.0
    half = PATCH_SIZE // 2 - 1
    pts = rs.randn(N_BITS, 2, 2) * sigma
    pts = np.clip(np.round(pts), -half, half).astype(np.int32)
    # degenerate pairs (p1 == p2) always compare false; nudge them apart
    same = np.all(pts[:, 0] == pts[:, 1], axis=-1)
    pts[same, 1, 0] += 1
    return pts


def box_smooth(img: jnp.ndarray, size: int = KERNEL_SIZE) -> jnp.ndarray:
    """Separable box *sum* over a size x size window (edge-replicated),
    the analogue of OpenCV BRIEF's integral-image smoothedSum."""
    img = img.astype(jnp.float32)
    r = size // 2

    def along(a, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r + 1, r)
        ap = jnp.pad(a, pad, mode="edge")
        c = jnp.cumsum(ap, axis=axis)
        hi = jax.lax.slice_in_dim(c, size, size + a.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, a.shape[axis], axis=axis)
        return hi - lo

    return along(along(img, 0), 1)


_PATCH = PATCH_SIZE  # 48: pattern offsets live in [-23, 23] -> patch coords


@functools.lru_cache(maxsize=1)
def _sampling_matrices() -> tuple[np.ndarray, np.ndarray]:
    """One-hot [PATCH*PATCH, 256] selection matrices for the two points of
    every test pair. Sampling 256 scalars per keypoint becomes two
    [K, 2304] x [2304, 256] matmuls on the MXU — the TPU-native replacement
    for per-scalar gathers (which the profiler showed dominating the step:
    XLA lowers a 1.5M-element random gather to ~20ms of serial loads)."""
    pat = test_pattern()
    half = _PATCH // 2 - 1  # offsets clipped to +-23 by test_pattern
    m = np.zeros((2, _PATCH * _PATCH, N_BITS), np.float32)
    for i in range(N_BITS):
        for p in range(2):
            dx, dy = pat[i, p]
            m[p, (dy + half) * _PATCH + (dx + half), i] = 1.0
    return m[0], m[1]


@jax.jit
def compute_descriptors(
    img: jnp.ndarray,       # [H, W] grayscale
    kp: jnp.ndarray,        # [K, 2] float32 (x, y)
    kp_valid: jnp.ndarray,  # [K] bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (desc [K, 8] uint32, valid [K] bool with border removal)."""
    h, w = img.shape
    k = kp.shape[0]
    smooth = box_smooth(img)

    x = jnp.round(kp[:, 0]).astype(jnp.int32)
    y = jnp.round(kp[:, 1]).astype(jnp.int32)
    inside = (
        (x >= BORDER) & (x < w - BORDER) & (y >= BORDER) & (y < h - BORDER)
    )
    valid = kp_valid & inside

    # one 48x48 window per keypoint (windowed gather, not scalar gather)
    half = _PATCH // 2 - 1
    y0 = jnp.clip(y - half, 0, h - _PATCH)
    x0 = jnp.clip(x - half, 0, w - _PATCH)
    patches = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(smooth, (yy, xx), (_PATCH, _PATCH))
    )(y0, x0)
    flat = patches.reshape(k, _PATCH * _PATCH)

    m1, m2 = _sampling_matrices()
    s1 = flat @ jnp.asarray(m1)  # [K, 256] — MXU one-hot sampling
    s2 = flat @ jnp.asarray(m2)
    bits = (s1 < s2).astype(jnp.uint32)

    # pack 256 bits into 8 uint32 words
    bits = bits.reshape(k, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    desc = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    desc = jnp.where(valid[:, None], desc, jnp.uint32(0))
    return desc, valid
