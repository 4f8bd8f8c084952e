"""Batched-pose rendering + viewer controller tests."""

import os

import numpy as np
import pytest

from conftest import reference_path

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.gui.viewer import FlyController, Viewer
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye


@pytest.fixture()
def renderer():
    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene(background="white")
    r.scene.cameras.append(
        CompoundEyeCamera("eye", "single_dimension_fast",
                          make_sphere_eye(24, acceptance_deg=1e-5))
    )
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    return r


def test_batched_poses_match_sequential(renderer):
    poses = [
        ((0.0, 100.0, 0.0), (0.0, 0.0, 0.0)),
        ((5.0, 100.0, 5.0), (0.0, 1.0, 0.0)),
        ((0.0, 0.9, 0.0), (0.2, 0.0, 0.0)),
    ]
    batched = renderer.render_batch_poses(poses)
    assert batched.shape == (3, 24, 3)

    # sequential reference (deterministic eye: jitter ~ 0)
    seq = []
    for pos, rot in poses:
        renderer.set_camera_pose(*pos, *rot)
        renderer.render_frame()
        seq.append(renderer.get_camera_data().copy())
    seq = np.stack(seq)
    np.testing.assert_allclose(batched, seq, atol=2e-4)


def test_batched_poses_with_matrix(renderer):
    ls = np.eye(3)
    batched = renderer.render_batch_poses([((0.0, 100.0, 0.0), ls)])
    assert batched.shape == (1, 24, 3)
    up = renderer.current_camera().ommatidia[:, 4] > 0.3
    np.testing.assert_allclose(batched[0][up], 1.0, atol=1e-6)


def test_fly_controller_movement(renderer):
    v = Viewer(renderer, width=8, height=4)
    p0 = np.array(renderer.current_camera().position)
    v.controller.press("w")
    v.tick()
    p1 = np.array(renderer.current_camera().position)
    assert not np.allclose(p0, p1)
    # forward = local z
    np.testing.assert_allclose(
        p1 - p0, renderer.current_camera().local_space[2] * FlyController.MOVE_SPEED,
        atol=1e-12,
    )
    v.controller.release("w")
    v.controller.press("q")
    v.tick()
    assert v.dirty


def test_viewer_keys(renderer, tmp_path, monkeypatch):
    v = Viewer(renderer, width=8, height=4)
    assert renderer.get_current_eye_samples_per_ommatidium() == 1
    v.handle_key("pageup")
    assert renderer.get_current_eye_samples_per_ommatidium() == 2
    v.handle_key("pagedown")
    assert renderer.get_current_eye_samples_per_ommatidium() == 1
    v.handle_key("n")
    v.handle_key("b")
    assert renderer.get_current_camera_name() == "eye"
    monkeypatch.chdir(tmp_path)
    v.frame()
    path = v.handle_key("c")
    assert path and (tmp_path / path).exists()
    assert v.handle_key("escape") == "quit"


def test_viewer_frame_orientation(renderer):
    v = Viewer(renderer, width=8, height=4)
    img = v.frame()
    assert img.shape == (4, 8, 3)


def test_viewer_run_loop_headless(renderer, tmp_path, monkeypatch):
    """Drive the REAL Viewer.run() loop under the Agg backend: open, render,
    fly forward (held key -> release), save a PPM, quit via Esc — the
    newGuiEyeRenderer validation loop (gui.cpp:191-275) without a display
    (VERDICT r2 #9)."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from matplotlib.backend_bases import KeyEvent

    monkeypatch.chdir(tmp_path)
    v = Viewer(renderer, width=8, height=4)
    p0 = np.array(renderer.current_camera().position)
    script = {
        0: ("key_press_event", "w"),
        2: ("key_release_event", "w"),
        3: ("key_press_event", "c"),
        4: ("key_press_event", "escape"),
    }

    def on_frame(i, canvas):
        if i in script:
            name, key = script[i]
            KeyEvent(name, canvas, key)._process()

    v.run(max_frames=20, on_frame=on_frame)
    p1 = np.array(renderer.current_camera().position)
    assert not np.allclose(p0, p1), "held W must move the camera"
    ppm = tmp_path / "gui-capture-0.ppm"
    assert ppm.exists(), "C must save the frame as PPM"
    with open(ppm, "rb") as f:
        assert f.read(2) == b"P6"


def test_web_viewer_end_to_end(tmp_path):
    """Launch the WebAgg web viewer as a real subprocess and drive it over
    the SAME wire the browser uses (HTTP page + websocket key events):
    open, render, fly forward, save two PPM captures that must differ,
    Esc must terminate the server (VERDICT r2 #9 'ship the web viewer')."""
    import json
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    scene = reference_path("test-scene", "test-scene.gltf")
    if not os.path.isfile(scene):
        pytest.skip("reference scene not available")
    tornado = pytest.importorskip("tornado")  # noqa: F841
    from tornado.websocket import websocket_connect
    import asyncio

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "compound_ray_tpu.gui.viewer",
         "-f", scene, "-W", "64", "-H", "48", "--web", "--port", str(port)],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 180
        html = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "viewer exited early:\n"
                    + proc.stdout.read().decode(errors="replace"))
            try:
                html = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=2).read().decode()
                break
            except OSError:
                time.sleep(1.0)
        assert html and "mpl" in html, "WebAgg page must serve"

        async def drive():
            ws = await websocket_connect(f"ws://127.0.0.1:{port}/1/ws")
            def key(name, k):  # the browser JS prefixes values with 'k'
                ws.write_message(json.dumps({"type": name, "key": "k" + k}))
            key("key_press", "c")
            key("key_release", "c")
            await asyncio.sleep(1.5)
            key("key_press", "w")
            await asyncio.sleep(1.0)
            key("key_release", "w")
            await asyncio.sleep(1.5)
            key("key_press", "c")
            key("key_release", "c")
            await asyncio.sleep(1.5)
            key("key_press", "Escape")
            ws.close()

        asyncio.run(drive())
        proc.wait(timeout=60)  # Esc must stop the tornado loop
        c0 = tmp_path / "gui-capture-0.ppm"
        c1 = tmp_path / "gui-capture-1.ppm"
        assert c0.exists() and c1.exists(), "C must save PPM captures"
        assert c0.read_bytes()[:2] == b"P6"
        assert c0.read_bytes() != c1.read_bytes(), "held W must move the view"
    finally:
        if proc.poll() is None:
            proc.kill()
