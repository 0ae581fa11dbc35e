"""Fused perception kernel (Pallas/TPU): FAST score + NMS + BRIEF planes.

The XLA path (ops/detect.py + ops/brief.py) is correct but memory-bound: the
FAST ring stack, 3x3 NMS and the 512 shifted reads of the dense BRIEF
comparison re-stream the image from HBM hundreds of times (~4.5 ms/frame of
the KITTI-size step). This kernel computes everything in ONE pass: each
row-slab of the image is DMA'd to VMEM once (with a 28-row halo covering the
BRIEF pattern +-23, box kernel 4, FAST ring 3 and NMS 1), and all shifted
accesses become rolls of the resident slab:

    HBM traffic = image in (once, + halo overlap) + score/planes out.

Outputs match ops/detect.fast_score_map->nms3x3 and
ops/brief.dense_descriptor_planes up to float-summation order in the 9x9 box
filter (the jnp path uses cumsum differences; here a shift-add tree), which
can flip a BRIEF bit only where a test pair's two box sums are bitwise-equal
up to 1 ulp — validated within tolerance in tests/test_pallas_perception.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvt_tpu.ops.brief import test_pattern
from lvt_tpu.ops.detect import RING_OFFSETS

HALO = 28       # max(23 pattern + 4 box, 3 ring + 1 nms), rounded up
TILE_ROWS = 32  # rows computed per grid step (slab must fit VMEM with all
#                 live temporaries; see the liveness notes in the kernel)
COL_HALO = 64   # column halo (>= HALO, multiple of 128/2 keeps DMA lanes
#                 aligned: slab width = COL_TILE + 2*COL_HALO is a multiple
#                 of 128 whenever COL_TILE is)
MAX_COL_TILE = 512  # widest column tile: the FAST phase keeps ~16 slab-sized
#                 ring-diff arrays live, so scoped VMEM (~16MB/core) caps the
#                 slab at about (TILE_ROWS+2*HALO) x 640 floats


def _col_tile(w: int) -> int:
    """Column tile width for an image of width ``w``: the smallest multiple
    of 128 that covers ``w`` in ceil(w / MAX_COL_TILE) tiles (minimises the
    padded-out compute while keeping every slab inside scoped VMEM)."""
    n = -(-w // MAX_COL_TILE)
    return -(-(-(-w // n)) // 128) * 128


def _roll2(a, dy: int, dx: int):
    """out[p] = a[p + (dy, dx)] as a static circular shift; wrap-around only
    corrupts pixels within HALO of the slab edge, which the central output
    rows never read. (pltpu.roll requires non-negative shifts.)"""
    out = a
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[0], 0)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[1], 1)
    return out


def _perception_kernel(img_hbm, raw_ref, score_ref, planes_ref, slab, sem,
                       *, img_h: int, img_w: int, col_tile: int):
    b = pl.program_id(0)   # image in the batch (e.g. stereo left/right)
    i = pl.program_id(1)   # row tile
    j = pl.program_id(2)   # column tile
    rows = slab.shape[0]   # TILE_ROWS + 2*HALO
    cols = slab.shape[1]   # col_tile + 2*COL_HALO

    copy = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * TILE_ROWS, rows), pl.ds(j * col_tile, cols)],
        slab, sem,
    )
    copy.start()
    copy.wait()
    a = slab[:]

    # ---- 9x9 box *sum* (separable shift-add tree)
    rsum = a
    for d in range(1, 5):
        rsum = rsum + _roll2(a, d, 0) + _roll2(a, -d, 0)
    smooth = rsum
    for d in range(1, 5):
        smooth = smooth + _roll2(rsum, 0, d) + _roll2(rsum, 0, -d)

    # ---- FAST-9/16 max-threshold score.
    # Liveness-minimal formulation: keep only the 16 ring diffs plus two
    # accumulators live (the log-step doubling variant holds ~64 slab-sized
    # arrays and blows the 16MB scoped-VMEM budget). Cost: 16 arcs x 8 mins
    # x2 (bright/dark share diffs via sign flip) — pure VPU throughput.
    diffs = [_roll2(a, dy, dx) - a for dx, dy in RING_OFFSETS]

    def max_arc_min(sign):
        best = None
        for k in range(16):
            m = sign * diffs[k]
            for j in range(1, 9):
                m = jnp.minimum(m, sign * diffs[(k + j) % 16])
            best = m if best is None else jnp.maximum(best, m)
        return best

    score = jnp.maximum(max_arc_min(1.0), max_arc_min(-1.0))
    score = jnp.maximum(score, 0.0)

    # zero outside the ring-interior of the *original* image before NMS so
    # suppression decisions match the unfused path (fast_score_map masks the
    # 3px border before nms3x3 sees it)
    local_r = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
    local_c = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    global_r = i * TILE_ROWS + local_r - HALO
    global_c = j * col_tile + local_c - COL_HALO
    inside = (
        (global_r >= 3) & (global_r < img_h - 3)
        & (global_c >= 3) & (global_c < img_w - 3)
    )
    score = jnp.where(inside, score, 0.0)

    # ---- 3x3 non-max suppression
    neigh = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                neigh = jnp.maximum(neigh, _roll2(score, dy, dx))
    score_nms = jnp.where(score >= neigh, score, 0.0)

    def central(x):
        x = jax.lax.slice_in_dim(x, HALO, HALO + TILE_ROWS, axis=0)
        return jax.lax.slice_in_dim(x, COL_HALO, COL_HALO + col_tile, axis=1)

    raw_ref[0, :, :] = central(score)
    score_ref[0, :, :] = central(score_nms)

    # ---- dense BRIEF-256 bit planes (packed 32 bits per uint32 word)
    pat = test_pattern()  # static numpy [256, 2, 2]
    for word in range(8):
        acc = jnp.zeros_like(a, dtype=jnp.uint32)
        for bit_idx in range(32):
            (dx1, dy1), (dx2, dy2) = pat[word * 32 + bit_idx]
            bit = _roll2(smooth, int(dy1), int(dx1)) < _roll2(
                smooth, int(dy2), int(dx2)
            )
            acc = acc | (bit.astype(jnp.uint32) << np.uint32(bit_idx))
        planes_ref[0, word, :, :] = central(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def perception_maps_batched(
    imgs: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched fused perception: imgs [B, H, W] ->
    (raw_score [B, H, W], nms_score [B, H, W], planes [B, 8, H, W]).

    The batch is a leading grid dimension (NOT vmap: the TPU lowering of
    ANY-memory-space inputs does not support vmap's batched block specs);
    stereo pairs and multi-stream batches all route through here.
    """
    bsz, h, w = imgs.shape
    imgs = imgs.astype(jnp.float32)
    col_tile = _col_tile(w)
    n_col = -(-w // col_tile)
    wp = n_col * col_tile
    n_tiles = -(-h // TILE_ROWS)
    hp = n_tiles * TILE_ROWS
    # row padding covers the row halo; column padding covers the column halo
    # on the left and (halo + tile round-up) on the right
    padded = jnp.pad(
        imgs,
        ((0, 0), (HALO, hp - h + HALO), (COL_HALO, wp - w + COL_HALO)),
    )

    raw, score, planes = pl.pallas_call(
        functools.partial(
            _perception_kernel, img_h=h, img_w=w, col_tile=col_tile
        ),
        grid=(bsz, n_tiles, n_col),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, TILE_ROWS, col_tile), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS, col_tile), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE_ROWS, col_tile),
                         lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 8, hp, wp), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (TILE_ROWS + 2 * HALO, col_tile + 2 * COL_HALO), jnp.float32
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)

    raw = raw[:, :h, :w]
    score = score[:, :h, :w]
    # zero the 3px ring border like fast_score_map's interior mask
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = ((ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3))[None]
    return (
        jnp.where(interior, raw, 0.0),
        jnp.where(interior, score, 0.0),
        planes[:, :, :h, :w],
    )


def perception_maps(img: jnp.ndarray, interpret: bool = False):
    """Single-image convenience wrapper around perception_maps_batched."""
    raw, score, planes = perception_maps_batched(img[None], interpret=interpret)
    return raw[0], score[0], planes[0]
