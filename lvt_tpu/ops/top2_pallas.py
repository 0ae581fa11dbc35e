"""Fused masked top-2 selection kernel (Pallas/TPU) for the matching loops.

The XLA matching path materializes, per frame, a dozen [M, K]-sized
intermediates in HBM (candidate masks, +inf-masked distance copies, argmin
one-hots — twice for the dual-radius retry): ~90 MB of traffic for a
1024x1536 problem that only *reads* 6 MB of distances. This kernel makes the
spatial predicate + dual-radius masked top-2 ONE pass: each [TILE_M, K]
distance tile is resident in VMEM once, the radius/row predicates are
computed from tiny coordinate vectors, and both radii reduce to packed
(distance << 11 | column) int keys, whose min / second-min ARE the top-2
with jnp.argmin's tie-breaking (lowest column wins) built in.

Key packing bounds: distances are Hamming values <= 256 and columns < 2048,
so keys fit comfortably in int32; callers assert K <= 2048 (the framework's
kp capacities are ~1536).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
COL_BITS = 11               # keys = d << COL_BITS | col; col < 2048
MAX_K = 1 << COL_BITS
_IMAX = np.int32(np.iinfo(np.int32).max)
BIG = jnp.float32(1.0e9)    # matches ops.hamming.BIG


def _top2_kernel(dist_ref, qm_ref, tm_ref, out_ref,
                 *, r2a: float, r2b: float, row_mode: bool):
    # Layout note: per-query vectors stay SUBLANE-oriented throughout
    # (q meta is [TILE_M, 8], reductions use keepdims, outputs are
    # [TILE_M, 8] columns) — mixing lane- and sublane-oriented 1D vectors
    # forces Mosaic relayouts that wreck this kernel.
    d = dist_ref[0]                      # [TILE_M, K] int32
    q = qm_ref[:]                        # [TILE_M, 8] f32
    t = tm_ref[:]                        # [8, K] f32
    qv = q[:, 2:3] > 0.0                 # [TILE_M, 1]
    tv = t[2:3, :] > 0.0                 # [1, K]
    base = qv & tv

    if row_mode:
        # q cols 0/1 carry the (lo, hi) row window; predicate ignores r2
        ty = t[1:2, :]
        preds = [(ty >= q[:, 0:1]) & (ty <= q[:, 1:2])]
    else:
        dx = t[0:1, :] - q[:, 0:1]
        dy = t[1:2, :] - q[:, 1:2]
        dr2 = dx * dx + dy * dy
        preds = [dr2 < jnp.float32(r2a)]
        if r2b != r2a:  # single-predicate callers skip the second reduction
            preds.append(dr2 < jnp.float32(r2b))

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    keys_all = (d << COL_BITS) | col

    # out cols: 0..2 = (k1, k2, n_cand) for r2a, 3..5 for r2b
    cols_out = []
    for pred in preds:
        cand = base & pred
        keys = jnp.where(cand, keys_all, _IMAX)
        k1 = jnp.min(keys, axis=1, keepdims=True)          # [TILE_M, 1]
        k2 = jnp.min(jnp.where(keys == k1, _IMAX, keys), axis=1,
                     keepdims=True)
        nc = jnp.sum(cand.astype(jnp.int32), axis=1, keepdims=True)
        cols_out += [k1, k2, nc]
    if len(cols_out) == 3:
        cols_out = cols_out * 2  # identical masks -> identical top-2
    zeros = jnp.zeros_like(cols_out[0])
    out_ref[:, :] = jnp.concatenate(cols_out + [zeros, zeros], axis=1)


@functools.partial(
    jax.jit, static_argnames=("r2a", "r2b", "row_mode", "interpret")
)
def masked_dual_top2(
    dist: jnp.ndarray,      # [M, K] int32 distances (values <= 256)
    q_meta: jnp.ndarray,    # [M, 2] query coords (or (lo, hi) in row mode)
    q_valid: jnp.ndarray,   # [M] bool
    t_meta: jnp.ndarray,    # [K, 2] target coords
    t_valid: jnp.ndarray,   # [K] bool
    *,
    r2a: float,
    r2b: float,
    row_mode: bool = False,
    interpret: bool = False,
):
    """Returns ((d1, d2, best, n_cand) for r2a, same for r2b) — identical
    semantics to ops.hamming.masked_top2 over the two candidate masks."""
    m, k = dist.shape
    assert k <= MAX_K, f"K={k} exceeds key packing bound {MAX_K}"
    n_tiles = -(-m // TILE_M)
    mp = n_tiles * TILE_M

    kp = -(-k // 128) * 128
    dist_p = jnp.pad(dist, ((0, mp - m), (0, kp - k)))
    # query meta sublane-oriented [Mp, 8]; target meta lane-oriented [8, Kp]
    qm = jnp.zeros((mp, 8), jnp.float32)
    qm = qm.at[:m, 0].set(q_meta[:, 0].astype(jnp.float32))
    qm = qm.at[:m, 1].set(q_meta[:, 1].astype(jnp.float32))
    qm = qm.at[:m, 2].set(q_valid.astype(jnp.float32))
    tm = jnp.zeros((8, kp), jnp.float32)
    tm = tm.at[0, :k].set(t_meta[:, 0].astype(jnp.float32))
    tm = tm.at[1, :k].set(t_meta[:, 1].astype(jnp.float32))
    tm = tm.at[2, :k].set(t_valid.astype(jnp.float32))

    # one kernel NAME per instantiated shape: same-named Mosaic kernels with
    # different block shapes in one program can collide in compile caches
    # keyed by name (observed through this environment's remote-compile
    # relay as a runtime InvalidArgument)
    def _kernel(dist_ref, qm_ref, tm_ref, out_ref):
        _top2_kernel(dist_ref, qm_ref, tm_ref, out_ref,
                     r2a=r2a, r2b=r2b, row_mode=row_mode)

    _kernel.__name__ = (
        f"top2_{mp}x{kp}_{'row' if row_mode else 'rad'}"
        f"_{'dual' if (not row_mode and r2b != r2a) else 'single'}"
    )

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE_M, kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 8), jnp.int32),
        interpret=interpret,
    )(dist_p.reshape(1, mp, kp), qm, tm)

    def decode(k1, k2, nc):
        k1, k2, nc = k1[:m], k2[:m], nc[:m]
        has1 = k1 != _IMAX
        has2 = k2 != _IMAX
        d1 = jnp.where(has1, (k1 >> COL_BITS).astype(jnp.float32), BIG)
        d2 = jnp.where(has2, (k2 >> COL_BITS).astype(jnp.float32), BIG)
        best = jnp.where(has1, k1 & (MAX_K - 1), 0)
        return d1, d2, best, nc

    return (decode(out[:, 0], out[:, 1], out[:, 2]),
            decode(out[:, 3], out[:, 4], out[:, 5]))
