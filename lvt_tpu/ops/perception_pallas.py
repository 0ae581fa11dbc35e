"""Fused perception kernels (Pallas/TPU): FAST score + NMS + BRIEF planes.

The XLA path (ops/detect.py + ops/brief.py) is correct but memory-bound: the
FAST ring stack, 3x3 NMS and the shifted reads of the dense BRIEF comparison
re-stream the image from HBM hundreds of times. Here the work is TWO
single-pass kernels, each sized to its own halo so neither pays the other's
recompute amplification:

  * kernel A (``_score_smooth_kernel``): 9x9 box sum, FAST-9/16
    max-threshold score (log-step doubling over the 16 ring diffs), 3x3 NMS
    — all from one VMEM-resident slab with an 8-row halo. Outputs the raw
    score, the NMS'd score and the smoothed image.
  * kernel B (``_brief_kernel``): dense BRIEF-256 bit planes from the
    smoothed image. The pattern samples a 64-point pool (ops/brief.py), so
    the slab is shifted only 64 times (vs 512 for i.i.d. pairs) with a
    16-row halo; the 256 pair comparisons index the resident pool.

HBM traffic = image in + (raw, nms, smooth) out + smooth in + planes out;
all compute touches each slab exactly once. Outputs match
ops/detect.fast_score_map -> nms3x3 and ops/brief.dense_descriptor_planes up
to float-summation order in the 9x9 box filter (the jnp path uses cumsum
differences; here a shift-add tree), which can flip a BRIEF bit only where a
test pair's two box sums are bitwise-equal up to 1 ulp — validated within
tolerance in tests/test_pallas_perception.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvt_tpu.ops.brief import pair_indices, sample_pool
from lvt_tpu.ops.detect import RING_OFFSETS

HALO_A = 8        # kernel A: ring 3 + NMS 1 = 4, box 4; 8 keeps sublanes aligned
HALO_B = 16       # kernel B: max |pattern offset| = 15
TILE_ROWS_A = 64  # rows computed per grid step of kernel A
TILE_ROWS_B = 32  # kernel B keeps 64 pool slabs live -> smaller row tile
#                   (40 rows measured perf-neutral on v5e with tighter VMEM
#                   headroom, so 32 stays)
COL_HALO = 64     # column halo (covers both kernels; 2*64 keeps the slab
#                   width a multiple of 128 whenever the column tile is)
MAX_COL_TILE = 512
# int16 kernel-A compute for uint8 frames (exact; see _score_smooth_kernel).
# Mosaic's rotate is 32-bit-only, so int16 shifts ride a bitcast SUBLANE-PAIR
# view (two rows per uint32 lane; hardware packing probed on v5e by
# scripts/tpu_patch_check.py: lo half = even row) — every roll moves half
# the bytes of the f32 path. CONCLUSION OF THE r5 HARDWARE CAMPAIGN: the
# path cannot be enabled on this toolchain. Mosaic legalizes i16 vector
# add/sub/bitcast but NEITHER `arith.minsi` NOR `arith.cmpi` (both fail
# "failed to legalize" on vector<8x128x2xi16>, v5e remote relay), and the
# FAST arc reduction is 64 min/max ops; SWAR-emulating a packed-halfword
# min in uint32 costs ~8 half-width ops (~4 full-width equivalents) per
# min — worse than the f32 it replaces. The path stays interpret-proven
# (tests/test_pallas_perception.py) and off on hardware; revisit only if a
# newer Mosaic legalizes 16-bit vector compares.
# Overridable per-call via the ``int16`` static arg (config.int16_perception).
INT16_DEFAULT = False
# bf16 SCORE-side compute for uint8 frames (the attempted r5 replacement
# for the blocked int16 path): every value in the FAST score chain is an
# integer in [-255, 255] — exact in bf16 — and the 16-bit pair view
# (_Roller) halves the ring/NMS shift movement. ALSO BLOCKED on v5e:
# Mosaic fails with "Target does not support this comparison" — the VPU
# comparison path is 32-bit-only on this target, so neither int16 nor
# bf16 16-bit compute can reach the score chain's min/max/compare ops.
# The path stays interpret-proven (tests/test_pallas_perception.py);
# hardware status re-probed by scripts/tpu_patch_check.py. Conclusion:
# on v5e the perception kernels are stuck at f32 compute width.
BF16_SCORE_DEFAULT = False


def _col_tile(w: int) -> int:
    """Column tile width for an image of width ``w``: the smallest multiple
    of 128 that covers ``w`` in ceil(w / MAX_COL_TILE) tiles (minimises the
    padded-out compute while keeping every slab inside scoped VMEM)."""
    n = -(-w // MAX_COL_TILE)
    return -(-(-(-w // n)) // 128) * 128


def _roll2(a, dy: int, dx: int):
    """out[p] = a[p + (dy, dx)] as a static circular shift; wrap-around only
    corrupts pixels within the halo of the slab edge, which the central
    output rows never read. (pltpu.roll requires non-negative shifts.)

    Do NOT replace these rolls with static lane-offset slices of the halo
    slab: tried in r4 (it would shrink comparisons to the central extent
    and open the int16 path, since Mosaic's rotate is 32-bit-only) — the
    slice formulation is bit-exact in interpret mode but MISCOMPILES on
    real v5e (tpu_smoke diverged 0.66 m; silent wrong values from
    unaligned lane-offset slices). Any future rewrite must re-validate
    against scripts/tpu_smoke.py, not just the interpret-mode tests."""
    out = a
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[0], 0)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[1], 1)
    return out


def _colroll(x, dx: int):
    """Column-only shift, any dtype. 16-bit dtypes ride the 32-bit
    sublane-pair view (column rolls never cross the row packing), halving
    the movement; other dtypes defer to _roll2."""
    if x.dtype.itemsize == 2 and dx:
        p = pltpu.bitcast(x, jnp.uint32)
        return pltpu.bitcast(pltpu.roll(p, (-dx) % x.shape[1], 1), x.dtype)
    return _roll2(x, 0, dx)


class _Roller:
    """Shift provider: ``shift(dy, dx)[p] = a[p + (dy, dx)]`` circularly
    (wrap corruption confined to the slab halo, same as _roll2).

    32-bit slabs defer to _roll2 (bit-identical to the r3/r4 kernels).
    16-bit slabs (int16, bfloat16) — Mosaic's dynamic rotate being
    32-bit-only — are viewed as uint32 SUBLANE PAIRS (row 2i in the low
    half, row 2i+1 in the high half; hardware packing probed by
    scripts/tpu_patch_check.py). In that view any even row shift and any
    column shift is ONE half-size roll; odd row shifts reuse a one-time
    ``p1`` view of the slab pre-shifted by a single row (built with two
    16-bit lane shifts + one roll), after which they too are single
    half-size rolls. Net: ~half the VPU data movement per shifted
    sample. The bit tricks are dtype-agnostic (pure bit movement), so
    bf16 values pass through exactly."""

    def __init__(self, a):
        self.a = a
        self.paired = a.dtype.itemsize == 2
        if self.paired:
            assert a.shape[0] % 2 == 0, a.shape
            self.rh = a.shape[0] // 2
            p0 = pltpu.bitcast(a, jnp.uint32)
            pn = pltpu.roll(p0, self.rh - 1, 0)           # p0[i + 1]
            self.pair = (p0, (p0 >> 16) | (pn << 16))     # p1[i] = rows(2i+1, 2i+2)

    def shift(self, dy: int, dx: int):
        if not self.paired:
            return _roll2(self.a, dy, dx)
        out = self.pair[dy & 1]
        q = dy >> 1   # floor halving: dy = 2q (even) or 2q + 1 (odd)
        if q:
            out = pltpu.roll(out, (-q) % self.rh, 0)
        if dx:
            out = pltpu.roll(out, (-dx) % self.a.shape[1], 1)
        return pltpu.bitcast(out, self.a.dtype)


def _score_smooth_kernel(img_hbm, raw_ref, score_ref, smooth_ref, slab, sem,
                         *, img_h: int, img_w: int, col_tile: int,
                         work_dtype=jnp.float32, score_dtype=None):
    b = pl.program_id(0)   # image in the batch (e.g. stereo left/right)
    i = pl.program_id(1)   # row tile
    j = pl.program_id(2)   # column tile
    rows = slab.shape[0]   # TILE_ROWS_A + 2*HALO_A
    cols = slab.shape[1]   # col_tile + 2*COL_HALO

    copy = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * TILE_ROWS_A, rows), pl.ds(j * col_tile, cols)],
        slab, sem,
    )
    copy.start()
    copy.wait()
    # uint8 frames are DMA'd as-is (4x less HBM image traffic than float32)
    # and widened in VMEM (via int32: Mosaic has no direct u8->f32 cast).
    # work_dtype int16 (uint8 inputs only) keeps every intermediate EXACT —
    # 9x9 box sums <= 81*255 = 20655 < 32767, FAST diffs in [-255, 255] —
    # while halving the VPU data movement of the ~40 slab rolls that
    # dominate this kernel (r4 xplane trace: kernel A 0.19 ms/frame-stream
    # in f32).
    a = slab[:]
    if a.dtype == jnp.uint8:
        a = a.astype(jnp.int32)
    a = a.astype(work_dtype)
    ra = _Roller(a)

    def central(x):
        x = jax.lax.slice_in_dim(x, HALO_A, HALO_A + TILE_ROWS_A, axis=0)
        return jax.lax.slice_in_dim(x, COL_HALO, COL_HALO + col_tile, axis=1)

    def widen(x):
        # Mosaic-safe cast to the f32 output refs (int16 via int32)
        if x.dtype == jnp.int16:
            x = x.astype(jnp.int32)
        return x.astype(jnp.float32)

    # score-side compute dtype: bf16 for uint8 frames (exact — every value
    # in the FAST score chain is an integer in [-255, 255], and bf16
    # represents integers up to 256 exactly) halves the movement of the 16
    # ring shifts + 8 NMS shifts (the _Roller pair view) AND runs the ~80
    # arc/NMS min-max ops at the native (16, 128) double rate. Unlike the
    # int16 attempt, bf16 min/max/compare are first-class Mosaic ops.
    sd = score_dtype or work_dtype
    if sd != work_dtype:
        sbase = a.astype(sd)
        rscore = _Roller(sbase)
    else:
        sbase = a
        rscore = ra

    # ---- 9x9 box *sum* (separable shift-add tree)
    rsum = a
    for d in range(1, 5):
        rsum = rsum + ra.shift(d, 0) + ra.shift(-d, 0)
    smooth = rsum
    for d in range(1, 5):
        smooth = smooth + _colroll(rsum, d) + _colroll(rsum, -d)
    smooth_ref[0, :, :] = widen(central(smooth))

    # ---- FAST-9/16 max-threshold score via log-step doubling.
    # arc9_min[i] = min(d[i..i+8]) built as windows 2 -> 4 -> 8 -> 9;
    # the "rolls" along the ring axis are list reindexings (free), so this
    # is 4x16 min ops instead of the 16x8 sequential-arc formulation.
    # Peak liveness: diffs + two window levels ~= 48 slab-sized arrays.
    # int16 lacks a legalized vector min/max in Mosaic (v5e:
    # "failed to legalize arith.minsi" on vector<...xi16>), so the int16
    # path spells them as compare+select.
    if sd == jnp.int16:
        vmin = lambda x, y: jnp.where(x < y, x, y)
        vmax = lambda x, y: jnp.where(x > y, x, y)
    else:
        vmin, vmax = jnp.minimum, jnp.maximum
    diffs = [rscore.shift(dy, dx) - sbase for dx, dy in RING_OFFSETS]

    def arc9(ds, op):
        b2 = [op(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        b4 = [op(b2[k], b2[(k + 2) % 16]) for k in range(16)]
        b8 = [op(b4[k], b4[(k + 4) % 16]) for k in range(16)]
        return [op(b8[k], ds[(k + 8) % 16]) for k in range(16)]

    def list_reduce(xs, op):
        while len(xs) > 1:
            xs = [op(xs[k], xs[k + 1]) for k in range(0, len(xs) - 1, 2)] + (
                [xs[-1]] if len(xs) % 2 else []
            )
        return xs[0]

    # bright: max over arcs of (min of d within arc)
    score_bright = list_reduce(arc9(diffs, vmin), vmax)
    # dark: max over arcs of (min of -d) == -(min over arcs of (max of d))
    score_dark = -list_reduce(arc9(diffs, vmax), vmin)
    score = vmax(vmax(score_bright, score_dark),
                 jnp.zeros_like(score_bright))

    # zero outside the ring-interior of the *original* image before NMS so
    # suppression decisions match the unfused path (fast_score_map masks the
    # 3px border before nms3x3 sees it)
    local_r = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
    local_c = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    global_r = i * TILE_ROWS_A + local_r - HALO_A
    global_c = j * col_tile + local_c - COL_HALO
    inside = (
        (global_r >= 3) & (global_r < img_h - 3)
        & (global_c >= 3) & (global_c < img_w - 3)
    )
    score = jnp.where(inside, score, jnp.asarray(0, score.dtype))

    # ---- 3x3 non-max suppression, plateau-collapsing like detect.nms3x3:
    # strictly beat the lexicographically-earlier neighbors, tie toward the
    # later ones (collapses equal-score runs on repetitive structure)
    if jnp.issubdtype(score.dtype, jnp.floating):
        neg_inf = jnp.asarray(-jnp.inf, score.dtype)
    else:
        neg_inf = jnp.asarray(jnp.iinfo(score.dtype).min, score.dtype)
    before = score * 0 + neg_inf
    after = before
    rs = _Roller(score)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            n = rs.shift(dy, dx)
            if (dy, dx) < (0, 0):
                before = vmax(before, n)
            else:
                after = vmax(after, n)
    raw_ref[0, :, :] = widen(central(score))
    score_ref[0, :, :] = widen(central(
        jnp.where((score > before) & (score >= after), score,
                  jnp.asarray(0, score.dtype))
    ))


def _brief_kernel(smooth_hbm, planes_ref, slab, sem,
                  *, col_tile: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    rows = slab.shape[0]   # TILE_ROWS_B + 2*HALO_B
    cols = slab.shape[1]

    copy = pltpu.make_async_copy(
        smooth_hbm.at[b, pl.ds(i * TILE_ROWS_B, rows), pl.ds(j * col_tile, cols)],
        slab, sem,
    )
    copy.start()
    copy.wait()
    s = slab[:]

    def central(x):
        x = jax.lax.slice_in_dim(x, HALO_B, HALO_B + TILE_ROWS_B, axis=0)
        return jax.lax.slice_in_dim(x, COL_HALO, COL_HALO + col_tile, axis=1)

    pool = sample_pool()     # [64, 2] static numpy (dx, dy)
    pairs = pair_indices()   # [256, 2] static numpy
    samples = [_roll2(s, int(dy), int(dx)) for dx, dy in pool]
    for word in range(8):
        acc = jnp.zeros_like(s, dtype=jnp.uint32)
        for bit_idx in range(32):
            pi, pj = pairs[word * 32 + bit_idx]
            bit = samples[pi] < samples[pj]
            acc = acc | (bit.astype(jnp.uint32) << np.uint32(bit_idx))
        planes_ref[0, word, :, :] = central(acc)


def _run_kernel_a(imgs: jnp.ndarray, interpret: bool,
                  int16: bool | None = None,
                  bf16_score: bool | None = None):
    """Kernel A over a [B, H, W] batch -> (raw, score, smooth) padded to
    tile multiples (crop with [:, :h, :w]); all three outputs f32.

    ``int16`` (None = INT16_DEFAULT) selects int16 compute for uint8
    frames — EXACT: 9x9 box sums <= 81*255 = 20655 < 32767, FAST diffs in
    [-255, 255] — with every shifted sample built through the 32-bit
    sublane-pair view (_Roller), since Mosaic's rotate rejects non-32-bit
    data. This halves the VPU movement of the ~40 slab shifts that
    dominate the kernel AND doubles the native (16, 128) element
    throughput of the arc reduction. The r4 attempt to get here via
    static lane-offset slices miscompiled on real v5e (_roll2 docstring);
    the pair view uses only rolls + 32-bit shift/or — but the path is
    still blocked ON HARDWARE because Mosaic cannot legalize i16 vector
    min/cmp (see INT16_DEFAULT above). Interpret-mode exact; hardware
    status re-probed by scripts/tpu_patch_check.py."""
    bsz, h, w = imgs.shape
    # uint8 input stays uint8 through the pad + DMA (kernel A widens in
    # VMEM); any other dtype normalizes to float32
    if imgs.dtype != jnp.uint8:
        imgs = imgs.astype(jnp.float32)
    use_i16 = ((INT16_DEFAULT if int16 is None else bool(int16))
               and imgs.dtype == jnp.uint8)
    work_dtype = jnp.int16 if use_i16 else jnp.float32
    use_bf16 = ((BF16_SCORE_DEFAULT if bf16_score is None else
                 bool(bf16_score))
                and imgs.dtype == jnp.uint8 and not use_i16)
    score_dtype = jnp.bfloat16 if use_bf16 else None
    col_tile = _col_tile(w)
    n_col = -(-w // col_tile)
    wp = n_col * col_tile

    # ---- kernel A: raw score + NMS score + smooth
    n_tiles_a = -(-h // TILE_ROWS_A)
    hp_a = n_tiles_a * TILE_ROWS_A
    padded = jnp.pad(
        imgs,
        ((0, 0), (HALO_A, hp_a - h + HALO_A), (COL_HALO, wp - w + COL_HALO)),
    )

    def _kernel_a(img_hbm, raw_ref, score_ref, smooth_ref, slab, sem):
        _score_smooth_kernel(img_hbm, raw_ref, score_ref, smooth_ref, slab,
                             sem, img_h=h, img_w=w, col_tile=col_tile,
                             work_dtype=work_dtype, score_dtype=score_dtype)

    # distinct Mosaic kernel names per working dtype (see masked_dual_top2's
    # note on name collisions through the remote-compile relay)
    variant = "i16" if use_i16 else ("bf16s" if use_bf16 else "f32")
    _kernel_a.__name__ = f"score_smooth_{variant}"

    raw, score, smooth = pl.pallas_call(
        _kernel_a,
        grid=(bsz, n_tiles_a, n_col),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, TILE_ROWS_A, col_tile), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS_A, col_tile), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS_A, col_tile), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, hp_a, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp_a, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp_a, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (TILE_ROWS_A + 2 * HALO_A, col_tile + 2 * COL_HALO),
                imgs.dtype,
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return raw, score, smooth


def _interior_mask(h: int, w: int):
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return ((ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3))[None]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "int16", "bf16_score"))
def score_smooth_batched(
    imgs: jnp.ndarray, interpret: bool = False, int16: bool | None = None,
    bf16_score: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Kernel A only: imgs [B, H, W] -> (raw_score, nms_score, smooth),
    each [B, H, W]. Used by the sparse descriptor mode
    (descriptor_mode="sparse"): descriptors are formed from ``smooth``
    at the selected keypoints, so the dense bit-plane kernel B never runs.
    The take-based sparse gather measured 538 -> 283 fps on v5e and is
    opt-in evidence only; the patch-kernel mode (ops/patches_pallas.py)
    is the production TPU default."""
    bsz, h, w = imgs.shape
    raw, score, smooth = _run_kernel_a(imgs, interpret, int16,
                                   bf16_score)
    raw = raw[:, :h, :w]
    score = score[:, :h, :w]
    interior = _interior_mask(h, w)
    return (
        jnp.where(interior, raw, 0.0),
        jnp.where(interior, score, 0.0),
        smooth[:, :h, :w],
    )


@functools.partial(jax.jit,
                   static_argnames=("interpret", "int16", "bf16_score"))
def perception_patch_maps_batched(
    imgs: jnp.ndarray, interpret: bool = False, int16: bool | None = None,
    bf16_score: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Kernel A for the patch descriptor mode: imgs [B, H, W] ->
    (nms_padded, raw_padded, smooth_padded), each [B, Hp, Wp].

    ALL THREE outputs keep kernel A's tile padding: the kernel masks the
    3px interior of the TRUE image extent in-kernel (pad rows/cols come
    out zero), selection derives cell geometry from ``img_hw``
    (ops/detect.select_corners), and the patch kernel clamps coords
    against the padded extent — so no crop/where of any big map is ever
    materialized (r4 xplane: the crop+mask passes cost ~0.2 ms per
    frame-stream)."""
    raw, score, smooth = _run_kernel_a(imgs, interpret, int16,
                                   bf16_score)
    return score, raw, smooth


@functools.partial(jax.jit,
                   static_argnames=("interpret", "int16", "bf16_score"))
def perception_maps_batched(
    imgs: jnp.ndarray, interpret: bool = False, int16: bool | None = None,
    bf16_score: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched fused perception: imgs [B, H, W] ->
    (raw_score [B, H, W], nms_score [B, H, W], planes [B, 8, H, W]).

    The batch is a leading grid dimension (NOT vmap: the TPU lowering of
    ANY-memory-space inputs does not support vmap's batched block specs);
    stereo pairs and multi-stream batches all route through here.
    """
    bsz, h, w = imgs.shape
    if imgs.dtype != jnp.uint8:
        imgs = imgs.astype(jnp.float32)
    col_tile = _col_tile(w)
    n_col = -(-w // col_tile)
    wp = n_col * col_tile
    raw, score, smooth = _run_kernel_a(imgs, interpret, int16,
                                   bf16_score)

    # ---- kernel B: BRIEF planes from the smoothed image (always f32:
    # dense mode left the TPU production path in r5 — the patch kernel
    # replaced it — so kernel B keeps the plain-f32 formulation)
    n_tiles_b = -(-h // TILE_ROWS_B)
    hp_b = n_tiles_b * TILE_ROWS_B
    smooth_p = jnp.pad(
        smooth[:, :h, :],
        ((0, 0), (HALO_B, hp_b - h + HALO_B), (COL_HALO, COL_HALO)),
    )
    def _kernel_b(smooth_hbm, planes_ref, slab, sem):
        _brief_kernel(smooth_hbm, planes_ref, slab, sem, col_tile=col_tile)

    _kernel_b.__name__ = f"brief_planes_{smooth_p.dtype.name}"

    planes = pl.pallas_call(
        _kernel_b,
        grid=(bsz, n_tiles_b, n_col),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_ROWS_B, col_tile), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 8, hp_b, wp), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM(
                (TILE_ROWS_B + 2 * HALO_B, col_tile + 2 * COL_HALO),
                smooth_p.dtype,
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(smooth_p)

    raw = raw[:, :h, :w]
    score = score[:, :h, :w]
    # zero the 3px ring border like fast_score_map's interior mask
    interior = _interior_mask(h, w)
    return (
        jnp.where(interior, raw, 0.0),
        jnp.where(interior, score, 0.0),
        planes[:, :, :h, :w],
    )


def perception_maps(img: jnp.ndarray, interpret: bool = False):
    """Single-image convenience wrapper around perception_maps_batched."""
    raw, score, planes = perception_maps_batched(img[None], interpret=interpret)
    return raw[0], score[0], planes[0]
