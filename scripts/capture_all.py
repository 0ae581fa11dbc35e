"""Round capture orchestrator: smoke lane, then headline bench, multistream
bench and roofline — ONE SUBPROCESS PER STAGE.

Why subprocesses: the relayed PJRT client (axon tunnel) gets corrupted when
several differently-shaped/sharded programs run in one process (same
limitation documented in profile_ms_sweep.py; observed again here — after a
full smoke run, the next program's first eager op dies with a TPU backend
InvalidArgument). Each stage therefore pays its own client setup, and the
in-stage warmups (bench.py warms compile + the D2H channel before the timed
region) keep the numbers honest.

    python scripts/capture_all.py

Exits non-zero if the smoke lane fails (never capture a bench number on a
failing smoke) or any stage errors.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

STAGES = [
    ("patch/bitcast kernel checks", [sys.executable,
                                     "scripts/tpu_patch_check.py"]),
    ("tpu_smoke", [sys.executable, "scripts/tpu_smoke.py"]),
    ("bench single-stream", [sys.executable, "bench.py"]),
    ("bench multistream", [sys.executable, "bench.py", "--multistream"]),
    ("bench windowed-BA", [sys.executable, "bench.py", "--ba"]),
    ("roofline", [sys.executable, "scripts/roofline.py", "--time"]),
]


def main() -> int:
    for name, cmd in STAGES:
        print(f"== stage: {name}", flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            print(f"stage '{name}' FAILED (rc={rc}) — stopping", flush=True)
            return rc
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
