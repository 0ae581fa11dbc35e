"""Pin SCALING.md's communication model to the compiled programs.

The per-frame collective table in SCALING.md was derived from the axis_name
call sites; this test keeps it honest by jaxpr-inspecting the actual sharded
step (config 5) and the multistream chunk (config 4): a code change that
adds, removes, or changes a collective fails here and must update SCALING.md
alongside. Counts are STATIC call sites in the jaxpr — branches of the
status lax.switch all contribute, and loop bodies (LM's fori_loop) count
once though they execute per iteration; the dynamic ~40/frame figure in
SCALING.md weights these by trip count and taken branch.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax._src.core import ClosedJaxpr, Jaxpr
from jax.sharding import PartitionSpec as P

from lvt_tpu.config import VOConfig
from lvt_tpu.core import extract, step as step_mod
from lvt_tpu.core.state import VOState
from lvt_tpu.geometry.se3 import Pose

COLLECTIVE_FAMILIES = (
    "psum", "pmin", "pmax", "all_gather", "ppermute", "all_to_all",
    "reduce_scatter", "pbroadcast",
)

# the pinned model: static collective call sites in the sharded step
# (loop bodies count once; all three status branches contribute)
EXPECTED_SHARDED = {"psum": 28, "pmin": 3}


def _subjaxprs(v):
    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _subjaxprs(x)


def count_collectives(jaxpr, counter=None) -> collections.Counter:
    if counter is None:
        counter = collections.Counter()
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if any(name.startswith(c) for c in COLLECTIVE_FAMILIES):
            counter[name] += 1
        for v in eqn.params.values():
            for j in _subjaxprs(v):
                count_collectives(j, counter)
    return counter


def _config() -> VOConfig:
    return VOConfig(
        fx=210.0, fy=210.0, cx=128.0, cy=96.0, baseline=0.25,
        img_width=256, img_height=192, detection_cell_size=96,
        max_keypoints_per_cell=48, agast_threshold=12,
        near_plane_distance=0.5, far_plane_distance=90.0,
        max_map_points=1024, max_staged_points=1024,
    )


def test_sharded_step_collective_count_is_pinned():
    from lvt_tpu.parallel.sharded_stream import (
        _metrics_specs, _rep_like, state_specs,
    )

    cfg = _config()
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("points",))
    state = VOState.initial(cfg.max_map_points, cfg.max_staged_points,
                            cfg.local_ba_window)
    img = jnp.zeros((cfg.img_height, cfg.img_width), jnp.float32)
    left, right = extract.extract_features_stereo(img, img, cfg)
    specs = state_specs("points")
    fn = jax.shard_map(
        lambda st, l, r: step_mod.track_features(
            st, l, r, cfg, rgbd=False, axis_name="points"
        ),
        mesh=mesh,
        in_specs=(specs, _rep_like(left), _rep_like(left)),
        out_specs=(specs, Pose(P(), P()), _metrics_specs()),
        check_vma=False,
    )
    counts = count_collectives(jax.make_jaxpr(fn)(state, left, right).jaxpr)
    assert dict(counts) == EXPECTED_SHARDED, (
        f"collective call sites changed: {dict(counts)} != "
        f"{EXPECTED_SHARDED}; update SCALING.md's communication model "
        "and this pin together"
    )


def test_multistream_chunk_has_zero_collectives():
    """Config 4 is embarrassingly parallel: the stream axis must never
    introduce a collective (SCALING.md row 1)."""
    from lvt_tpu.parallel import multistream as ms

    cfg = _config()
    s = 8
    states = ms.batched_initial_state(cfg, s)
    imgs = jnp.zeros((2, s, cfg.img_height, cfg.img_width), jnp.uint8)

    def chunk(states, a, b):
        return ms.multistream_chunk(states, a, b, cfg)

    counts = count_collectives(
        jax.make_jaxpr(chunk)(states, imgs, imgs).jaxpr
    )
    assert not counts, f"stream-parallel path grew collectives: {dict(counts)}"
