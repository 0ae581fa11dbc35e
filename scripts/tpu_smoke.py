"""Real-TPU smoke lane: the bug class interpret-mode tests cannot catch.

The CPU test suite runs Pallas kernels in interpret mode only; round 2's
fused-matching failure passed every interpret test and broke only on real
hardware (Mosaic compile/runtime behavior). This script drives the full
jitted step on the real chip at the benchmark's exact KITTI geometry:

  1. ~20 KITTI-geometry textured frames with ALL Pallas/MXU paths ON;
  2. the same frames with all of them OFF (pure-XLA reference);
  3. pose agreement between the two runs (descriptor bits may flip at
     box-sum float-equality boundaries, so agreement is bounded, not
     bitwise);
  4. one multistream chunk step and one single-stream chunk dispatch.

Run before every bench capture:

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python scripts/tpu_smoke.py

Exit code 0 = PASS. Budget ~15 min on a cold Mosaic cache.
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N_FRAMES = 20


def make_world():
    from lvt_tpu.io.synthetic import TexturedWorld

    # the benchmark camera (KITTI seq 00, bench.py)
    return TexturedWorld(
        width=1241, height=376, fx=718.856, fy=718.856,
        cx=607.1928, cy=185.2157, baseline=0.5371657,
    )


def make_config(world, kernels_on: bool):
    from lvt_tpu.config import VOConfig

    return VOConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height,
        use_pallas_perception=kernels_on,
        use_mxu_hamming=kernels_on,
        use_pallas_matching=kernels_on,
    )


def track_run(world, frames, kernels_on: bool):
    from lvt_tpu.core.system import TrackingState, VOSystem

    vo = VOSystem(make_config(world, kernels_on))
    t0 = time.time()
    poses = []
    for i, (l, r) in enumerate(frames):
        pose = vo.track(l, r)
        if i == 0:
            print(f"  [kernels={'ON' if kernels_on else 'OFF'}] first frame "
                  f"(compile) {time.time() - t0:.0f}s", flush=True)
        poses.append(np.asarray(pose.t))
    assert vo.get_state() == TrackingState.TRACKING, (
        f"kernels={'ON' if kernels_on else 'OFF'}: tracking LOST"
    )
    matches = int(vo.last_metrics.tracked_map_points)
    return np.array(poses), matches


def main() -> int:
    import jax

    from lvt_tpu.backend import is_tpu_backend

    print(f"devices: {jax.devices()}", flush=True)
    assert is_tpu_backend(), (
        "smoke lane must run on the real chip (JAX_PLATFORMS=axon)"
    )
    world = make_world()
    frames = [
        (l.astype(np.uint8), r.astype(np.uint8))
        for l, r, _ in world.stereo_sequence(N_FRAMES, speed=0.9)
    ]

    print("== full step, all Pallas/MXU paths ON", flush=True)
    poses_on, matches_on = track_run(world, frames, True)
    print("== full step, all Pallas/MXU paths OFF (pure XLA)", flush=True)
    poses_off, matches_off = track_run(world, frames, False)

    drift = np.linalg.norm(poses_on - poses_off, axis=-1)
    print(f"ON vs OFF pose drift: max {drift.max():.4f} m "
          f"(matches {matches_on} vs {matches_off})")
    assert drift.max() < 0.05, (
        f"kernel path diverges from XLA path: {drift.max():.4f} m"
    )
    assert matches_on > 0.7 * matches_off, (matches_on, matches_off)

    print("== chunked single-stream dispatch", flush=True)
    from lvt_tpu.core.system import TrackingState, VOSystem

    vo = VOSystem(make_config(world, True))
    a = np.stack([f[0] for f in frames[:8]])
    b = np.stack([f[1] for f in frames[:8]])
    _, metrics = vo.track_chunk(a, b)
    assert int(np.asarray(metrics.status)[-1]) == int(TrackingState.TRACKING)

    print("== multistream chunk step (2 streams)", flush=True)
    from lvt_tpu.parallel.multistream import MultiStreamVO

    ms = MultiStreamVO(make_config(world, True), n_streams=2)
    chunk_a = np.stack([a[:4], a[:4]], axis=1)  # [N=4, S=2, H, W]
    chunk_b = np.stack([b[:4], b[:4]], axis=1)
    _, metrics = ms.track_chunk(chunk_a, chunk_b)
    assert (np.asarray(metrics.status)[-1] ==
            int(TrackingState.TRACKING)).all()

    print("SMOKE PASS", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
