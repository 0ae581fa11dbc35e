"""Capture a jax.profiler device trace of the chunked step and summarize
per-op self-times (r4: probe-roulette attribution is ~15 min/probe through
the remote-compile relay; one trace gives the whole picture IF the tunnel
supports profiling).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_xplane.py [--s 8]
  python scripts/profile_xplane.py --parse /tmp/lvt_xplane   # parse only
"""

from __future__ import annotations

import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = "/tmp/lvt_xplane"


def capture(s: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvt_tpu.parallel import multistream as ms
    from scripts.profile_s_sweep import load_state, make_frames
    import __graft_entry__ as ge

    config = ge._kitti_config()
    state1 = load_state("/tmp/vostate.npz", config)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (s,) + x.shape).copy(), state1)
    il, ir = make_frames(config, 8)
    ca = jnp.asarray(np.broadcast_to(il[:, None], (8, s) + il.shape[1:]))
    cb = jnp.asarray(np.broadcast_to(ir[:, None], (8, s) + ir.shape[1:]))

    @jax.jit
    def run(st, a, b):
        return ms.multistream_chunk(st, a, b, config, auto_reset=True,
                                    rgbd=False)

    st2, poses, _ = run(states, ca, cb)   # compile + warm
    np.asarray(poses.t)
    jax.profiler.start_trace(OUT)
    st2, poses, _ = run(st2, ca, cb)
    st2, poses, _ = run(st2, ca, cb)
    np.asarray(poses.t)
    jax.profiler.stop_trace()
    print("trace captured to", OUT, flush=True)


def parse(out_dir: str) -> None:
    paths = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO trace.json.gz found under", out_dir)
        for p in glob.glob(f"{out_dir}/**/*", recursive=True)[:20]:
            print("  ", p)
        return
    path = max(paths, key=lambda p: pathlib.Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events: pick pids whose thread/process names
    # mention TPU/device; fall back to all X events
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in names.items()
                   if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))
        agg[e["name"]] = agg.get(e["name"], 0.0) + dur
        total += dur
    print(f"parsed {path}: {len(agg)} op names, total {total / 1e3:.2f} ms")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur / 1e3:9.3f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    if "--parse" in sys.argv:
        parse(sys.argv[sys.argv.index("--parse") + 1])
    else:
        s = int(sys.argv[sys.argv.index("--s") + 1]) if "--s" in sys.argv else 8
        capture(s)
        parse(OUT)
