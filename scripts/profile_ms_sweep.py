"""Multistream tax localizer: bench.py-identical setup, one config per run.

Usage: python scripts/profile_ms_sweep.py single
       python scripts/profile_ms_sweep.py multi <S> [noreset]

Times one chunk dispatch (synchronous round trip, min over reps) so the
vmap tax is directly readable as ms/stream-frame. One configuration per
process: the axon tunnel client crashes when single-stream and multistream
programs with different shardings run in the same process.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 8
REPS = 10


def timeit(fn, *args, n=REPS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3  # ms (min over reps: least noise from the tunnel)


def make_frames(config):
    from lvt_tpu.io.synthetic import SyntheticWorld

    world = SyntheticWorld(
        width=config.img_width, height=config.img_height,
        fx=config.fx, fy=config.fy, cx=config.cx, cy=config.cy,
        baseline=config.baseline, n_points=6000,
        extent_x=80.0, extent_y=20.0, extent_z=160.0,
    )
    frames = list(world.stereo_sequence(CHUNK * 2, speed=0.9))
    il8 = np.stack([f[0].astype(np.uint8) for f in frames])
    ir8 = np.stack([f[1].astype(np.uint8) for f in frames])
    return il8, ir8


def main():
    from __graft_entry__ import _kitti_config

    config = _kitti_config()
    il8, ir8 = make_frames(config)
    mode = sys.argv[1] if len(sys.argv) > 1 else "single"

    if mode == "single":
        from lvt_tpu.core import step as step_mod
        from lvt_tpu.core.state import VOState

        st = VOState.initial(config.max_map_points, config.max_staged_points,
                             config.local_ba_window)
        single = jax.jit(
            lambda s, x, y: step_mod.track_chunk_stereo(s, x, y, config))
        st2, _, _ = single(st, jnp.asarray(il8[:CHUNK]), jnp.asarray(ir8[:CHUNK]))
        ms = timeit(single, st2, jnp.asarray(il8[CHUNK:]), jnp.asarray(ir8[CHUNK:]))
        print(f"single chunk:        {ms:8.2f} ms  {ms / CHUNK:6.3f} ms/frame")
        return

    from lvt_tpu.parallel.multistream import MultiStreamVO

    s_count = int(sys.argv[2])
    auto_reset = "noreset" not in sys.argv
    msvo = MultiStreamVO(config, s_count, auto_reset=auto_reset)

    def put(x):
        return jax.device_put(
            jnp.asarray(np.broadcast_to(
                x[:, None], (CHUNK, s_count) + x.shape[1:])),
            msvo.chunk_sharding)

    xa, xb = put(il8[:CHUNK]), put(ir8[:CHUNK])
    xa2, xb2 = put(il8[CHUNK:]), put(ir8[CHUNK:])
    jax.block_until_ready((xa, xb, xa2, xb2))
    msvo.track_chunk(xa, xb)  # warm state into TRACKING + compile

    ms = timeit(lambda x, y: msvo.track_chunk(x, y), xa2, xb2)
    per = ms / (CHUNK * s_count)
    print(f"multi S={s_count} reset={int(auto_reset)}: {ms:8.2f} ms  "
          f"{per:6.3f} ms/stream-frame")


if __name__ == "__main__":
    main()
