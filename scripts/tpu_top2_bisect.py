"""Bisect the fused top-2 matching kernel composition on real TPU.

Round-2 finding (config.py use_pallas_matching note): each kernel instance
passes standalone, two compose, but the FULL step (three matching-kernel
instances + the two perception kernels under lax.switch) hits a runtime
"TPU backend error (InvalidArgument)" on the first tracking frame. This
script reproduces and bisects that composition by call site
(config.pallas_matching_sites) and perception-kernel presence, appending
one JSON line per experiment to scripts/top2_bisect_log.jsonl.

Run on the real chip (each variant is a fresh XLA program; Mosaic builds
go through a remote relay at minutes per kernel):

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python scripts/tpu_top2_bisect.py [exp ...]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

LOG = "scripts/top2_bisect_log.jsonl"

EXPERIMENTS = {
    # name: (pallas_matching_sites, use_pallas_perception)
    "all_plus_perception": ("mrs", True),     # the round-2 repro
    "all_no_perception": ("mrs", False),
    "map_only": ("m", True),
    "row_only": ("r", True),
    "staged_only": ("s", True),
    "map_row": ("mr", True),
    "map_staged": ("ms", True),
    "row_staged": ("rs", True),
}


def log(rec: dict) -> None:
    rec["t"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_one(name: str, sites: str, perception: bool) -> None:
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.system import TrackingState, VOSystem
    from lvt_tpu.io.synthetic import SyntheticWorld, ate_rmse

    world = SyntheticWorld()
    config = VOConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        baseline=world.baseline, img_width=world.width,
        img_height=world.height, detection_cell_size=160,
        max_keypoints_per_cell=100, agast_threshold=15,
        near_plane_distance=0.5, far_plane_distance=200.0,
        use_pallas_matching=True, pallas_matching_sites=sites,
        use_pallas_perception=perception,
    )
    vo = VOSystem(config)
    t0 = time.time()
    est, gt = [], []
    first_frame_s = None
    try:
        for i, (l, r, (_, t)) in enumerate(world.stereo_sequence(10)):
            pose = vo.track(l, r)
            if i == 0:
                first_frame_s = time.time() - t0
            est.append(np.asarray(pose.t))
            gt.append(t)
        ate = ate_rmse(np.array(est), np.array(gt))
        log({
            "exp": name, "sites": sites, "perception": perception,
            "ok": True, "ate": round(float(ate), 4),
            "state": vo.get_state().name,
            "compile_s": round(first_frame_s, 1),
            "total_s": round(time.time() - t0, 1),
        })
    except Exception as e:  # noqa: BLE001 — record and continue bisecting
        log({
            "exp": name, "sites": sites, "perception": perception,
            "ok": False, "error": f"{type(e).__name__}: {e}"[:400],
            "frames_done": len(est),
            "compile_s": None if first_frame_s is None else round(first_frame_s, 1),
            "total_s": round(time.time() - t0, 1),
        })
        traceback.print_exc()


def main() -> None:
    names = sys.argv[1:] or list(EXPERIMENTS)
    import jax

    log({"event": "start", "devices": str(jax.devices()), "plan": names})
    for name in names:
        sites, perception = EXPERIMENTS[name]
        run_one(name, sites, perception)
    log({"event": "done"})


if __name__ == "__main__":
    main()
