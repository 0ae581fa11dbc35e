"""C ABI (liblvt_c.so) end-to-end: a real C program drives the framework.

The reference ships a C-interface shared library (lvt/src/lvt_c.h:57-62,
lvt_c.cpp:33-148). Here we compile an actual C driver against our
liblvt_c.so, run it in a subprocess on synthetic stereo frames, and check
(a) the status-machine contract (1 -> 2 after init, 1 again after reset)
and (b) that the poses it prints match an in-process VOSystem run on the
identical frames.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "lvt_tpu", "native")
LIB = os.path.join(NATIVE, "liblvt_c.so")

W, H = 320, 240
N_FRAMES = 4

CONFIG_YAML = f"""
fx: 260.0
fy: 260.0
cx: 160.0
cy: 120.0
baseline: 0.3
img_width: {W}
img_height: {H}
near_plane_distance: 0.5
far_plane_distance: 150.0
detection_cell_size: 80
max_keypoints_per_cell: 60
agast_threshold: 15
max_map_points: 1024
max_staged_points: 1024
"""

DRIVER_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "lvt_c.h"

static unsigned char *read_raw(const char *path, int n) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "missing %s\n", path); exit(2); }
    unsigned char *buf = malloc(n);
    if (fread(buf, 1, n, f) != (size_t)n) { exit(3); }
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc != 5) { fprintf(stderr, "usage: driver cfg dir n_frames ignored\n"); return 1; }
    const char *cfg = argv[1], *dir = argv[2];
    int n_frames = atoi(argv[3]);
    lvt_handle vo = lvt_create(cfg, 1 /* STEREO */);
    if (!vo) { fprintf(stderr, "create failed\n"); return 4; }
    printf("status %d\n", lvt_get_status(vo));
    double R[3][3], t[3];
    char path[4096];
    for (int i = 0; i < n_frames; i++) {
        snprintf(path, sizeof path, "%s/left_%d.raw", dir, i);
        unsigned char *l = read_raw(path, %(H)d * %(W)d);
        snprintf(path, sizeof path, "%s/right_%d.raw", dir, i);
        unsigned char *r = read_raw(path, %(H)d * %(W)d);
        lvt_track(vo, l, r, %(H)d, %(W)d, R, t);
        printf("status %d\n", lvt_get_status(vo));
        printf("pose %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
               R[0][0], R[0][1], R[0][2], R[1][0], R[1][1], R[1][2],
               R[2][0], R[2][1], R[2][2], t[0], t[1], t[2]);
        free(l); free(r);
    }
    lvt_reset(vo);
    printf("status %d\n", lvt_get_status(vo));
    lvt_destroy(vo);
    printf("done\n");
    return 0;
}
"""


def _build_lib():
    if os.path.exists(LIB):
        return True
    try:
        subprocess.run(["make", "-C", NATIVE, "liblvt_c.so"], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(LIB)


pytestmark = pytest.mark.skipif(
    not (_build_lib() and shutil.which("gcc")),
    reason="liblvt_c.so or gcc unavailable",
)


@pytest.fixture(scope="module")
def world_frames():
    from lvt_tpu.io.synthetic import SyntheticWorld

    world = SyntheticWorld(width=W, height=H, fx=260.0, fy=260.0,
                           cx=160.0, cy=120.0, baseline=0.3, n_points=1500,
                           extent_x=40.0, extent_y=18.0, extent_z=90.0)
    return [
        (l.astype(np.uint8), r.astype(np.uint8))
        for l, r, _ in world.stereo_sequence(N_FRAMES, speed=0.5)
    ]


@pytest.fixture(scope="module")
def driver(tmp_path_factory, world_frames):
    d = tmp_path_factory.mktemp("c_abi")
    cfg = d / "vo_config.yaml"
    cfg.write_text(CONFIG_YAML)
    for i, (l, r) in enumerate(world_frames):
        (d / f"left_{i}.raw").write_bytes(l.tobytes())
        (d / f"right_{i}.raw").write_bytes(r.tobytes())
    src = d / "driver.c"
    src.write_text(DRIVER_C.replace("%(H)d", str(H)).replace("%(W)d", str(W)))
    exe = d / "driver"
    subprocess.run(
        ["gcc", "-O1", "-o", str(exe), str(src),
         f"-I{NATIVE}", f"-L{NATIVE}", "-llvt_c",
         f"-Wl,-rpath,{NATIVE}"],
        check=True, capture_output=True, text=True,
    )
    return d, cfg, exe


@pytest.fixture(scope="module")
def run_output(driver):
    d, cfg, exe = driver
    env = dict(os.environ)
    # the embedded interpreter must resolve the venv's site-packages and
    # this repo; run the pipeline on CPU (same platform as the rest of the
    # test suite)
    env["LVT_PYTHON"] = sys.executable
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [str(exe), str(cfg), str(d), str(N_FRAMES), "0"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout.splitlines()


def test_status_machine(run_output):
    statuses = [int(l.split()[1]) for l in run_output if l.startswith("status")]
    # before init, after each of N frames, after reset
    assert statuses[0] == 1           # NOT_INITIALIZED
    assert statuses[1] == 2           # TRACKING after first frame
    assert all(s == 2 for s in statuses[1:-1])
    assert statuses[-1] == 1          # reset -> NOT_INITIALIZED
    assert run_output[-1] == "done"


def test_poses_match_python_api(run_output, world_frames):
    from lvt_tpu.config import VOConfig
    from lvt_tpu.core.system import VOSystem, pose_to_numpy

    config = VOConfig(
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, baseline=0.3,
        img_width=W, img_height=H, near_plane_distance=0.5,
        far_plane_distance=150.0, detection_cell_size=80,
        max_keypoints_per_cell=60, agast_threshold=15,
        max_map_points=1024, max_staged_points=1024,
    )
    vo = VOSystem(config)
    got = [
        np.array([float(x) for x in l.split()[1:]])
        for l in run_output if l.startswith("pose")
    ]
    assert len(got) == N_FRAMES
    for i, (l, r) in enumerate(world_frames):
        vo.track(l, r)
        t, rot = pose_to_numpy(vo.last_pose)
        want = np.concatenate([rot.reshape(-1), t])
        np.testing.assert_allclose(got[i], want, atol=1e-4)
