"""Roofline grounding for the headline benchmark (VERDICT r2 'what's weak' #2).

The 70-fps baseline denominator is a paper claim, so the perf story also
needs a hardware-grounded bound: how close is the measured ms/frame to the
HBM-bandwidth / MXU-compute floor of the compiled step? This script compiles
the exact bench.py program (chunked single-stream track step at KITTI
geometry), pulls FLOPs and HBM bytes from XLA's cost analysis, and prints

    bytes/frame, flops/frame, HBM-bound ms, MXU-bound ms, roofline ms,
    measured ms (optional timed run), headroom = measured / roofline.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py [--time]

Cost-analysis caveat: XLA reports bytes accessed per instruction assuming no
cache reuse between fused computations; on TPU this IS effectively HBM
traffic (VMEM reuse happens inside a fusion, which the analysis models), so
the number is the right roofline numerator, modulo DMA rounding to tile
boundaries.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CHUNK = 16

# TPU v5e (one chip): 197 TFLOP/s bf16, half that for f32 on MXU; 819 GB/s HBM
PEAK_BYTES_S = 819e9
PEAK_F32_FLOPS_S = 98.5e12   # conservative: f32 matmul rate
VPU_FLOPS_S = 4 * 8 * 128 * 2 * 0.94e9  # 8 VPUs x (8,128) lanes x fma @ ~940MHz


def main() -> int:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _kitti_config
    from lvt_tpu.core import step as step_mod
    from lvt_tpu.core.state import VOState

    config = _kitti_config()
    st = VOState.initial(config.max_map_points, config.max_staged_points,
                         config.local_ba_window)
    il = jnp.zeros((CHUNK, config.img_height, config.img_width), jnp.uint8)
    ir = jnp.zeros_like(il)

    fn = jax.jit(lambda s, a, b: step_mod.track_chunk_stereo(s, a, b, config))
    lowered = fn.lower(st, il, ir)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    per_frame_bytes = bytes_accessed / CHUNK
    per_frame_flops = flops / CHUNK
    t_hbm_ms = per_frame_bytes / PEAK_BYTES_S * 1e3
    t_mxu_ms = per_frame_flops / PEAK_F32_FLOPS_S * 1e3
    t_vpu_ms = per_frame_flops / VPU_FLOPS_S * 1e3
    # roofline floor: traffic and compute overlap, so the floor is their max;
    # report both compute ceilings (all-MXU is optimistic, all-VPU pessimistic)
    roof_ms = max(t_hbm_ms, t_mxu_ms)

    out = {
        "chunk": CHUNK,
        "img": [config.img_height, config.img_width],
        "bytes_per_frame": round(per_frame_bytes),
        "flops_per_frame": round(per_frame_flops),
        "hbm_bound_ms": round(t_hbm_ms, 4),
        "mxu_bound_ms": round(t_mxu_ms, 4),
        "vpu_bound_ms": round(t_vpu_ms, 4),
        "roofline_ms": round(roof_ms, 4),
    }

    if "--time" in sys.argv:
        st2, poses, _ = fn(st, il, ir)
        np.asarray(poses.t)  # value-readback anchor
        reps = 8
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _, poses, _ = fn(st2, il, ir)
            np.asarray(poses.t)
            ts.append(time.perf_counter() - t0)
        measured_ms = min(ts) * 1e3 / CHUNK
        out["measured_ms_per_frame"] = round(measured_ms, 4)
        out["headroom_vs_roofline"] = round(measured_ms / roof_ms, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
