"""Per-keypoint patch extraction (Pallas/TPU): the gather-tax killer.

Round-4 attribution (BASELINE.md "gather tax") measured scattered
per-keypoint lookups at ~10-25 ns/element on v5e: the dense BRIEF planes
kernel (0.34 ms/frame-stream, the largest single op in the r4 xplane trace)
plus its crop and the per-keypoint descriptor/subpixel gathers cost ~0.5 ms
of the ~1.9 ms step.  This kernel replaces all of that with the structural
fix the r4 round scoped: keep the *whole* smoothed-image and raw-score maps
resident in VMEM (KITTI-sized maps are ~2 MB each; v5e VMEM is 16 MB) and
extract one contiguous 32x32 smooth patch + 8x8 raw patch per keypoint.

Extraction method: ONE aligned vector load of a span that provably
contains the patch, then two dynamic rotates (Mosaic's 32-bit
``tpu.dynamic_rotate``) bring it to offset (0, 0) + a static offset-0
slice.  Mosaic only proves vector loads whose sublane offset is a
multiple of 8 and lane offset a multiple of 128 (probed on v5e: an
unaligned ``ref[pl.ds(y-15, 32), ...]`` fails with "cannot statically
prove that index in dimension 0 is a multiple of 8"), hence the
span+rotate dance.

Rejected alternatives (all probed on hardware in r5):
  * per-patch async VMEM->VMEM DMAs (a chunk's copies in flight on
    per-slot semaphores): Mosaic requires DMA slice offsets to respect
    the (8, 128) tiling too — "Failed to prove that a tile index in
    dimension 0 is divisible by the tiling (8)";
  * a narrow 160-lane fast path (load/rotate 160 lanes when the patch
    provably fits): "Not implemented: unsupported unaligned shape" —
    dynamic rotates only exist for multiple-of-128 lane widths, so the
    256-lane span is the floor;
  * static lane-offset slices (r4: silent miscompile on v5e);
  * per-element gathers (the very tax this kernel removes).

Span width: each map is staged in VMEM at TWO lane phases (0 and +64 —
the +64 copy comes from one cheap XLA shift of the padded map).  A
keypoint picks the phase that puts its column within [0, 96) of a
128-aligned lane start, so every span is only 128 lanes wide — without
the phase split the 128-alignment rule forces 256-lane spans.  Measured:
single-stream identical (709 vs 710 fps — the loop is bound by
per-keypoint fixed overhead more than span bytes) but multistream S=8
gained 740 -> 766 fps/chip, so the split ships.

Downstream, descriptor formation is dense linear algebra on the patch
tensor (ops/brief.descriptors_from_patches): the 64 BRIEF pool samples are
one static one-hot matmul, evaluated at ``Precision.HIGHEST`` so every
sampled value is *bit-exact* f32 (a one-hot contraction's partial sums are
exactly representable at every step of the bf16 expansion), and the 256
pair comparisons + packing act on [K, 64] — no HBM-visible per-keypoint
gather anywhere.  Subpixel refinement reads static slices of the raw
patches (ops/detect.subpixel_from_patches).

Invalid slots (30-60%% of the padded capacity on typical frames) are
skipped: the chunk's output block is zeroed once up front and only valid
keypoints pay the span loads + rotates.

Replaces the detect+describe hot loops of the reference
(lvt/src/lvt_image_features_handler.cpp:131-175) on the TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 32        # smooth patch extent; pool offsets live in [-15, 15]
PATCH_R0 = 15     # pool sample (dx, dy) maps to patch row PATCH_R0 + dy
PATCH_C0 = 16     # ... and patch col PATCH_C0 + dx
RAWP = 8          # raw-score patch extent (3x3 subpixel neighborhood + pad)
RAWP_R0 = 3       # corner center sits at raw patch (RAWP_R0, RAWP_C0)
RAWP_C0 = 4
CHUNK = 128       # keypoints per grid step (keeps the out block <= 512 KB)

# ---- span geometry
SPAN_R = 40       # smooth span rows: 32 + 8 (row-alignment slack)
SPAN_RR = 16      # raw span rows: 8 + 8
SPAN_C = 128      # span lanes (phase-split: column offset lands in [0, 96))
PHASE = 64        # lane shift of the second staged copy
_RAW_OFF = PATCH_R0 - RAWP_R0  # == PATCH_C0 - RAWP_C0 == 12


def clamp_coords(x: jnp.ndarray, y: jnp.ndarray, hp: int, wp: int):
    """Clamp integer keypoint coords so both patch reads stay in-bounds of
    the [hp, wp] padded maps.  Valid keypoints (BRIEF border: 20 px) are
    never moved; invalid/padded selections produce in-bounds garbage that
    the validity mask kills downstream."""
    x = jnp.clip(x, PATCH_C0, wp - PATCH + PATCH_C0)   # [16, wp-16]
    y = jnp.clip(y, PATCH_R0, hp - PATCH + PATCH_R0)   # [15, hp-17]
    return x, y


def _stage_maps(b, hbm_refs, slabs, sems):
    """DMA the whole maps (both phases) for image ``b`` into VMEM:
    slabs[0] holds (smooth phase0, smooth phase1), slabs[1] the raw pair."""
    copies = [
        pltpu.make_async_copy(hbm_refs[0].at[b], slabs[0].at[0], sems.at[0]),
        pltpu.make_async_copy(hbm_refs[1].at[b], slabs[0].at[1], sems.at[1]),
        pltpu.make_async_copy(hbm_refs[2].at[b], slabs[1].at[0], sems.at[2]),
        pltpu.make_async_copy(hbm_refs[3].at[b], slabs[1].at[1], sems.at[3]),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def _patch_kernel(coords_ref, smooth0_hbm, smooth1_hbm, raw0_hbm, raw1_hbm,
                  patches_ref, rawp_ref, smooth_slab, raw_slab, sems,
                  *, hp: int, wp: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        _stage_maps(b, (smooth0_hbm, smooth1_hbm, raw0_hbm, raw1_hbm),
                    (smooth_slab, raw_slab), sems)

    # zero the whole chunk block once; invalid slots stay zero
    patches_ref[0] = jnp.zeros((CHUNK, PATCH, PATCH), jnp.float32)
    rawp_ref[0] = jnp.zeros((CHUNK, RAWP, RAWP), jnp.float32)

    def spanned(slab, phase, y0, x0, r, c, span_r, extent):
        big = slab[phase, pl.ds(pl.multiple_of(y0, 8), span_r),
                   pl.ds(pl.multiple_of(x0, 128), SPAN_C)]
        big = pltpu.roll(big, (span_r - r) % span_r, 0)
        big = pltpu.roll(big, (SPAN_C - c) % SPAN_C, 1)
        return big[:extent, :extent]

    def one(k):
        x = coords_ref[0, k, 0]
        y = coords_ref[0, k, 1]
        v = coords_ref[0, k, 2]

        @pl.when(v != 0)
        def _():
            extract(k, x, y)

    def extract(k, x, y):
        ys = y - PATCH_R0
        xs = x - PATCH_C0
        # phase selection: use the +64-shifted copy whenever the column
        # offset from a 128-aligned start would exceed 96, so a 128-lane
        # span always covers the 32-lane patch (and the raw patch at +12)
        phase = (xs % 128 >= 96).astype(jnp.int32)
        xe = xs - phase * PHASE
        y0 = jnp.minimum((ys // 8) * 8, hp - SPAN_R)
        x0 = jnp.minimum((xe // 128) * 128, wp - SPAN_C)
        r = ys - y0   # in [0, 8]
        c = xe - x0   # in [0, 96]
        patches_ref[0, k] = spanned(smooth_slab, phase, y0, x0, r, c,
                                    SPAN_R, PATCH)
        # raw span: same lane window, own (tighter) row window
        yr = y - RAWP_R0
        y0r = jnp.minimum((yr // 8) * 8, hp - SPAN_RR)
        rawp_ref[0, k] = spanned(raw_slab, phase, y0r, x0, yr - y0r,
                                 c + _RAW_OFF, SPAN_RR, RAWP)

    def body(i, carry):
        one(i)
        return carry

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patches_batched(
    smooth: jnp.ndarray,   # [B, Hp, Wp] float32 (padded maps; Hp % 8 == 0,
    raw: jnp.ndarray,      #   Wp % 128 == 0 — kernel A guarantees both)
    x: jnp.ndarray,        # [B, K] int32, pre-clamped (clamp_coords)
    y: jnp.ndarray,        # [B, K] int32
    valid: jnp.ndarray,    # [B, K] bool — invalid slots come back zeroed
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-keypoint patches: ([B, Kp, 32, 32] smooth, [B, Kp, 8, 8] raw)
    where Kp = K rounded up to CHUNK. Outputs stay CHUNK-padded — callers
    size K to the (128-aligned) keypoint capacity so no multi-MB slice of
    the patch tensor is ever materialized."""
    bsz, hp, wp = smooth.shape
    assert raw.shape == smooth.shape, (raw.shape, smooth.shape)
    assert hp % 8 == 0 and wp % 128 == 0 and hp >= SPAN_R and wp >= SPAN_C, (
        (hp, wp))
    k = x.shape[1]
    kp = -(-k // CHUNK) * CHUNK
    if kp != k:
        pad = ((0, 0), (0, kp - k))
        x = jnp.pad(x, pad, constant_values=PATCH_C0)
        y = jnp.pad(y, pad, constant_values=PATCH_R0)
        valid = jnp.pad(valid, pad)
    coords = jnp.stack(
        [x, y, valid.astype(x.dtype), jnp.zeros_like(x)], axis=-1
    ).astype(jnp.int32)                                   # [B, Kp, 4]

    smooth = smooth.astype(jnp.float32)
    raw = raw.astype(jnp.float32)

    def shifted(a):  # the +PHASE lane copy (tail zeros are never read)
        return jnp.pad(a[:, :, PHASE:], ((0, 0), (0, 0), (0, PHASE)))

    def kernel(*refs):
        _patch_kernel(*refs, hp=hp, wp=wp)

    # distinct Mosaic kernel name per shape (remote-relay kernel-name
    # collisions across executables; see ops/top2_pallas.py)
    kernel.__name__ = f"extract_patches_{hp}x{wp}_{kp}"

    patches, rawp = pl.pallas_call(
        kernel,
        grid=(bsz, kp // CHUNK),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 4), lambda b, j: (b, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, CHUNK, PATCH, PATCH), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, RAWP, RAWP), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, kp, PATCH, PATCH), jnp.float32),
            jax.ShapeDtypeStruct((bsz, kp, RAWP, RAWP), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, hp, wp), jnp.float32),
            pltpu.VMEM((2, hp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(coords, smooth, shifted(smooth), raw, shifted(raw))
    return patches, rawp


def extract_patches_xla(
    smooth: jnp.ndarray, raw: jnp.ndarray,
    x: jnp.ndarray, y: jnp.ndarray, valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA reference implementation (CPU path + equivalence tests):
    identical outputs via vmapped dynamic_slice (K stays as given, no
    CHUNK padding)."""

    def one(sm, rw, xs, ys, vs):
        p = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            sm, (yy - PATCH_R0, xx - PATCH_C0), (PATCH, PATCH)))(ys, xs)
        rp = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            rw, (yy - RAWP_R0, xx - RAWP_C0), (RAWP, RAWP)))(ys, xs)
        return (jnp.where(vs[:, None, None], p, 0.0),
                jnp.where(vs[:, None, None], rp, 0.0))

    return jax.vmap(one)(smooth.astype(jnp.float32), raw.astype(jnp.float32),
                         x, y, valid)
