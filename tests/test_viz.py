"""Visualization artifact generation (host-side, smoke tests)."""

import os

import numpy as np
import pytest

from lvt_tpu import viz
from lvt_tpu.core.system import VOSystem
from tests.test_end_to_end import make_config, make_world


def test_draw_features(tmp_path, rng):
    img = rng.uniform(0, 255, (120, 160))
    kp = np.stack([rng.uniform(0, 160, 30), rng.uniform(0, 120, 30)], -1)
    valid = np.ones(30, bool)
    age = rng.randint(-1, 15, 30)
    p = viz.draw_features(img, kp, valid, age,
                          out_path=str(tmp_path / "f.png"))
    assert os.path.getsize(p) > 1000


def test_draw_map_and_trajectory(tmp_path):
    world = make_world()
    vo = VOSystem(make_config(world))
    traj = []
    for img_l, img_r, (r, t) in world.stereo_sequence(4, speed=0.4):
        pose = vo.track(img_l, img_r)
        traj.append(np.asarray(pose.t))
    p = viz.draw_map(vo.state, np.array(traj), out_path=str(tmp_path / "m.png"))
    assert os.path.getsize(p) > 1000
    p2 = viz.plot_trajectories({"est": np.array(traj)},
                               out_path=str(tmp_path / "t.png"))
    assert os.path.getsize(p2) > 1000


@pytest.mark.slow
def test_feature_overlay_from_live_tracked_frame(tmp_path):
    """The age-colored feature display renders real per-feature match data
    from a tracked frame (reference: lvt_visualization.cpp:99-135)."""
    world = make_world()
    vo = VOSystem(make_config(world))
    dumper = viz.FrameDumper(str(tmp_path / "frames"), every=1)
    last = None
    for img_l, img_r, _ in world.stereo_sequence(4, speed=0.4):
        vo.track(img_l, img_r)
        last = img_l
    disp, kp, valid, age = viz.feature_debug(vo, last)
    assert disp.shape == last.shape
    assert valid.any()
    # after 3 tracked frames some features must match aged map points
    assert (age[valid] >= 0).sum() > 10
    assert (age > 0).any()
    dumper.update(vo, last)
    overlay = tmp_path / "frames" / "features_000000.png"
    assert overlay.exists() and overlay.stat().st_size > 1000


def test_html_viewer_artifact(tmp_path):
    """--viz writes a self-contained viewer.html with embedded frames
    (pose, age-colored map points, staged points) and the keyboard/follow
    controls of the reference viewer (lvt_visualization.cpp:137-349)."""
    import json
    import re

    from lvt_tpu.cli import main as cli_main

    out = tmp_path / "viz"
    rc = cli_main(["synthetic", "--frames", "6", "--viz", str(out)])
    assert rc == 0
    html = (out / "viewer.html").read_text()
    m = re.search(r"const FRAMES=(\[.*?\]);\n", html, re.S)
    assert m, "embedded frame data missing"
    frames = json.loads(m.group(1))
    assert len(frames) == 6
    last = frames[-1]
    assert set(last) == {"t", "R", "map", "age", "staged"}
    assert len(last["map"]) > 50 and len(last["map"]) == len(last["age"])
    # camera advanced forward (z) like the synthetic trajectory
    assert last["t"][2] > 1.0
    # the viewer logic (follow camera, playback, keyboard) is present
    for needle in ("follow", "requestAnimationFrame", "keydown", "frustum"):
        assert needle in html
