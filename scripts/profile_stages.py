"""Stage-level timing of the VO step on the current backend.

Times each pipeline stage in isolation (separate jits) plus the fused
full step, so regressions localize. Not a test — a perf tool.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from __graft_entry__ import _kitti_config
    from lvt_tpu.core import extract as ex
    from lvt_tpu.core import step as step_mod
    from lvt_tpu.core.state import VOState
    from lvt_tpu.io.synthetic import SyntheticWorld

    config = _kitti_config()
    world = SyntheticWorld(
        width=config.img_width, height=config.img_height,
        fx=config.fx, fy=config.fy, cx=config.cx, cy=config.cy,
        baseline=config.baseline, n_points=6000,
        extent_x=80.0, extent_y=20.0, extent_z=160.0,
    )
    frames = list(world.stereo_sequence(8, speed=0.9))
    il = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
    ir = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
    pair = jnp.stack([il[0], ir[0]])  # [2, H, W]

    print(f"backend={jax.default_backend()} shape={pair.shape}")

    try:
        from lvt_tpu.ops import perception_pallas as pp
        ms = timeit(pp.perception_maps_batched, pair)
        print(f"perception_maps_batched (pallas, B=2): {ms:.2f} ms")
    except Exception as e:
        print(f"pallas perception failed: {e}")

    f = jax.jit(lambda p: ex.extract_features_stereo(p[0], p[1], config))
    ms = timeit(f, pair)
    print(f"extract_stereo (full perception + selection): {ms:.2f} ms")

    st = VOState.initial(config.max_map_points, config.max_staged_points,
                         config.local_ba_window)
    step = jax.jit(lambda s, a, b: step_mod.track_step_stereo(s, a, b, config))
    ms = timeit(step, st, il[0], ir[0])
    print(f"track_step_stereo (full, online): {ms:.2f} ms")

    chunk = jax.jit(
        lambda s, a, b: step_mod.track_chunk_stereo(s, a, b, config))
    ms = timeit(chunk, st, il, ir, n=5)
    print(f"track_chunk_stereo (8 frames): {ms:.2f} ms -> {ms / 8:.2f} ms/frame")


if __name__ == "__main__":
    main()
