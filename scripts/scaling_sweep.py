"""Virtual-mesh scaling sweep for SCALING.md.

Measures, on an N-virtual-device CPU mesh (XLA_FLAGS=
--xla_force_host_platform_device_count=8), how the two sharded modes scale:

  * streams axis (config 4): S streams sharded D ways, fixed work per
    stream -> weak scaling: ideal = flat time as S and D grow together.
  * points axis (config 5): one stream's map sharded D ways, fixed total
    map -> strong scaling of the per-point work + collective overhead.

CPU timings are a WEAK PROXY for TPU (no ICI, shared host cores — virtual
devices contend for the same CPU, so wall-clock cannot show real speedup);
what this sweep validates is that the sharded programs compile, run, and
keep per-device work/memory at 1/D, and it measures the collective-call
overhead trend. The ICI/DCN communication model in SCALING.md projects the
2+-host efficiency analytically from the measured collective payload sizes.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python scripts/scaling_sweep.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from lvt_tpu.config import VOConfig
    from lvt_tpu.io.synthetic import SyntheticWorld
    from lvt_tpu.parallel import mesh as mesh_mod
    from lvt_tpu.parallel.multistream import MultiStreamVO
    from lvt_tpu.parallel.sharded_stream import ShardedStreamVO

    world = SyntheticWorld(width=256, height=192, fx=210.0, fy=210.0,
                           cx=128.0, cy=96.0, baseline=0.25, n_points=1500,
                           extent_x=30.0, extent_y=14.0, extent_z=60.0)
    cfg = VOConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height, detection_cell_size=96,
        max_keypoints_per_cell=48, agast_threshold=12,
        near_plane_distance=0.5, far_plane_distance=90.0,
        max_map_points=1024, max_staged_points=1024,
    )
    chunk = 4
    frames = list(world.stereo_sequence(chunk * 2, speed=0.35))
    il = np.stack([f[0] for f in frames]).astype(np.uint8)
    ir = np.stack([f[1] for f in frames]).astype(np.uint8)

    devices = jax.devices()
    results = {"streams_axis": [], "points_axis": []}

    # ---- streams axis: weak scaling (S = D streams, same frames)
    for d in (1, 2, 4, 8):
        if d > len(devices):
            break
        mesh = mesh_mod.stream_mesh(devices[:d])
        msvo = MultiStreamVO(cfg, n_streams=d, mesh=mesh)
        a = np.broadcast_to(il[:, None], (len(frames), d) + il.shape[1:])
        b = np.broadcast_to(ir[:, None], (len(frames), d) + ir.shape[1:])
        msvo.track_chunk(a[:chunk], b[:chunk])  # init + compile
        ms = timeit(lambda: msvo.track_chunk(a[chunk:], b[chunk:]))
        results["streams_axis"].append({
            "devices": d, "streams": d, "ms_per_chunk": round(ms, 2),
            "stream_frames_per_s": round(1000.0 * chunk * d / ms, 1),
        })
        print(f"streams D={d}: {ms:8.2f} ms/chunk "
              f"({results['streams_axis'][-1]['stream_frames_per_s']} sf/s)")

    # ---- points axis: one stream, map sharded D ways
    for d in (1, 2, 4, 8):
        if d > len(devices):
            break
        mesh = jax.sharding.Mesh(np.array(devices[:d]), (mesh_mod.POINT_AXIS,))
        svo = ShardedStreamVO(cfg, mesh=mesh)
        svo.track_chunk(il[:chunk], ir[:chunk])  # init + compile
        ms = timeit(lambda: svo.track_chunk(il[chunk:], ir[chunk:]))
        results["points_axis"].append({
            "devices": d, "ms_per_chunk": round(ms, 2),
            "points_per_device": cfg.max_map_points // d,
        })
        print(f"points  D={d}: {ms:8.2f} ms/chunk "
              f"({cfg.max_map_points // d} pts/dev)")

    out = pathlib.Path(__file__).resolve().parents[1] / "scaling_sweep.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
