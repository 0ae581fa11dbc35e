"""Headline benchmark: frames/sec/chip on KITTI-geometry stereo VO.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the full jitted track step (detection + BRIEF + row/map matching + LM
PnP + map maintenance) on a synthetic KITTI-sized stereo sequence (no dataset
access in this environment; the synthetic world exercises the identical
compute path — see lvt_tpu/io/synthetic.py).

Timing methodology mirrors the reference: kitti_example.cpp:129-131 brackets
only the vo->track() call — image decode/IO is outside the measured region.
Here the frames are uploaded to device HBM before the timed region, and the
timed region covers the chunked track dispatches (the production streaming
path overlaps uploads with compute; this isolates the VO pipeline itself).

Baseline: the reference C++ LVT cannot be built here (g2o/OpenCV-C++ absent;
zero egress). BASELINE.md records both denominator candidates: the measured
reference-oracle throughput (scripts/bench_oracle.py, 4.44 fps — Python-bound,
not representative of the C++ binary) and the Sensors-2018 "real-time" claim
of ~70 fps on a desktop CPU. vs_baseline uses the CONSERVATIVE denominator
max(70, measured oracle fps) = 70.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 70.0
CHUNK = 16
N_CHUNKS = 24


def main():
    import jax
    import jax.numpy as jnp

    from lvt_tpu.core.system import VOSystem
    from lvt_tpu.io.synthetic import SyntheticWorld
    from __graft_entry__ import _kitti_config

    config = _kitti_config()
    ba = "--ba" in sys.argv
    if ba:
        # windowed-BA cost variant (BASELINE.md windowed-BA row)
        config = config.replace(local_ba_window=4)
    world = SyntheticWorld(
        width=config.img_width, height=config.img_height,
        fx=config.fx, fy=config.fy, cx=config.cx, cy=config.cy,
        baseline=config.baseline, n_points=6000,
        extent_x=80.0, extent_y=20.0, extent_z=160.0,
    )
    n_frames = CHUNK * (N_CHUNKS + 1)
    frames = [
        (l.astype(np.uint8), r.astype(np.uint8))
        for l, r, _ in world.stereo_sequence(n_frames, speed=0.9)
    ]
    # device-resident sequence (outside the timed region, like the
    # reference's imread)
    il = jnp.asarray(np.stack([f[0] for f in frames]))
    ir = jnp.asarray(np.stack([f[1] for f in frames]))
    jax.block_until_ready((il, ir))

    # pre-split the device-resident sequence into chunk views outside the
    # timed region (slicing a device array is itself a device op; feeding
    # frames is the reference's imread side of the bracket)
    chunks = [
        (il[c * CHUNK : (c + 1) * CHUNK], ir[c * CHUNK : (c + 1) * CHUNK])
        for c in range(N_CHUNKS + 1)
    ]
    jax.block_until_ready(chunks)

    # offline/batch mode: chunks of frames scanned on device in one dispatch
    vo = VOSystem(config)
    poses, _ = vo.track_chunk(*chunks[0])  # warmup: compiles
    # warm the D2H transfer path too: through a relayed PJRT client the
    # FIRST readback pays a large one-time channel setup (measured ~minutes)
    # that must not land inside the timed region
    np.asarray(poses.t)

    t0 = time.perf_counter()
    for c in range(1, N_CHUNKS + 1):
        poses, _ = vo.track_chunk(*chunks[c])
    # anchor on a real value readback, not just block_until_ready: through a
    # relayed PJRT client the ready-fence can resolve before compute, and a
    # scalar D2H is the only airtight barrier (cost: one [CHUNK,3] transfer)
    np.asarray(poses.t)
    dt = time.perf_counter() - t0

    fps = (N_CHUNKS * CHUNK) / dt
    suffix = ", local BA window=4" if ba else ""
    print(json.dumps({
        "metric": "frames/sec/chip (KITTI-geometry stereo VO, "
                  f"synthetic world{suffix})",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


def main_multistream():
    """Config-4 benchmark shape: S = 8 x devices concurrent KITTI-geometry
    streams, chunked frames, one dispatch per chunk, sharded over the mesh.
    Reports aggregate frames/s/chip (all streams / wall time / devices)."""
    import jax
    import jax.numpy as jnp

    from lvt_tpu.io.synthetic import SyntheticWorld
    from lvt_tpu.parallel.multistream import MultiStreamVO
    from __graft_entry__ import _kitti_config

    config = _kitti_config()
    n_dev = len(jax.devices())
    s = 8 * n_dev
    for a in sys.argv:
        if a.startswith("--streams="):
            s = int(a.split("=", 1)[1]) * n_dev
    chunk, n_chunks = 8, 12
    world = SyntheticWorld(
        width=config.img_width, height=config.img_height,
        fx=config.fx, fy=config.fy, cx=config.cx, cy=config.cy,
        baseline=config.baseline, n_points=6000,
        extent_x=80.0, extent_y=20.0, extent_z=160.0,
    )
    n_frames = chunk * (n_chunks + 1)
    frames = list(world.stereo_sequence(n_frames, speed=0.9))
    il = np.stack([
        np.broadcast_to(f[0].astype(np.uint8), (s,) + f[0].shape)
        for f in frames
    ])
    ir = np.stack([
        np.broadcast_to(f[1].astype(np.uint8), (s,) + f[1].shape)
        for f in frames
    ])

    msvo = MultiStreamVO(config, s)
    # device-resident frames (outside the timed region, like the reference's
    # imread; the streaming path overlaps uploads with compute)
    il = jax.device_put(jnp.asarray(il), msvo.chunk_sharding)
    ir = jax.device_put(jnp.asarray(ir), msvo.chunk_sharding)
    jax.block_until_ready((il, ir))
    chunks = [
        (il[c * chunk : (c + 1) * chunk], ir[c * chunk : (c + 1) * chunk])
        for c in range(n_chunks + 1)
    ]
    jax.block_until_ready(chunks)
    poses, _ = msvo.track_chunk(*chunks[0])  # warmup: compiles
    np.asarray(poses.t)  # warm the D2H path too (see main())

    t0 = time.perf_counter()
    for c in range(1, n_chunks + 1):
        poses, _ = msvo.track_chunk(*chunks[c])
    np.asarray(poses.t)  # value-readback anchor (see main())
    dt = time.perf_counter() - t0

    fps_per_chip = (n_chunks * chunk * s) / dt / n_dev
    print(json.dumps({
        "metric": f"frames/sec/chip (multistream S={s}, {n_dev} devices, "
                  "KITTI-geometry stereo VO)",
        "value": round(fps_per_chip, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_per_chip / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    if "--multistream" in sys.argv:
        main_multistream()
    else:
        main()
