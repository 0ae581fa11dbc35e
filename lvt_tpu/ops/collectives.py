"""Conditional mesh collectives shared by the optionally-sharded ops.

Every map-indexed op in the pipeline takes an optional ``axis_name``; with
None it compiles to the plain single-device program, otherwise these wrap
the cross-shard reductions (SCALING.md documents where each fires).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum_if(x, axis_name: str | None):
    """psum over the mesh axis when the caller's arrays are sharded."""
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def por_if(mask, axis_name: str | None):
    """Logical OR of a boolean mask across shards."""
    if axis_name is None:
        return mask
    return jax.lax.psum(mask.astype(jnp.int32), axis_name) > 0
