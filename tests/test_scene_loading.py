"""Scene/eye ingestion tests against the reference data assets
(parity targets: MulticamScene.cpp loadScene/processGLTFNode)."""

import math
import os

import numpy as np
import pytest

from compound_ray_tpu.cameras.types import (
    CompoundEyeCamera,
    OrthographicCamera,
    PanoramicCamera,
    PerspectiveCamera,
)
from compound_ray_tpu.scene.eye_io import (
    icosphere_eye,
    read_eye_file,
    write_eye_file,
)
from compound_ray_tpu.scene.flat import load_scene


def test_load_test_scene(test_scene_path):
    scene = load_scene(test_scene_path)
    # test-scene.gltf: 6 cameras (2 compound), 2 meshes, 980 triangles
    assert scene.num_triangles == 980
    assert len(scene.cameras) == 6
    kinds = {c.name: type(c) for c in scene.cameras}
    assert kinds["Camera"] is PerspectiveCamera
    assert kinds["far-camera"] is PerspectiveCamera
    assert kinds["insect-cam-1"] is CompoundEyeCamera
    assert kinds["ortho-camera"] is OrthographicCamera
    assert kinds["panoramic-camera"] is PanoramicCamera
    assert kinds["insect-cam-2"] is CompoundEyeCamera
    # compound structure: test.eye has 1000 rows, test100.eye has 100
    cams = {c.name: c for c in scene.cameras}
    assert cams["insect-cam-1"].ommatidial_count == 1000
    assert cams["insect-cam-2"].ommatidial_count == 100
    assert cams["insect-cam-1"].projection == "spherical_orientationwise"
    assert scene.background_shader == "default_background"


def test_camera_local_space_orthonormal(test_scene_path):
    scene = load_scene(test_scene_path)
    for cam in scene.cameras:
        ls = cam.local_space
        # right/up/forward from a rigid glTF node transform stay orthonormal
        assert np.allclose(ls @ ls.T, np.eye(3), atol=1e-5), cam.name
        # right x up should be BACKWARD (-forward): glTF cameras look down -z
        assert np.allclose(np.cross(ls[0], ls[1]), -ls[2], atol=1e-5), cam.name


def test_perspective_fov(test_scene_path):
    scene = load_scene(test_scene_path)
    cam = [c for c in scene.cameras if c.name == "Camera"][0]
    # yfov 0.39959652 rad; scale.y = tan(yfov/2) * 1, scale.x = scale.y (aspect 1)
    expect = math.tan(0.39959652046304894 / 2.0)
    assert np.isclose(cam.scale[1], expect, rtol=1e-6)
    assert np.isclose(cam.scale[0], expect, rtol=1e-6)
    assert cam.scale[2] == 1.0


def test_natural_scene(natural_scene_path):
    scene = load_scene(natural_scene_path)
    assert scene.num_triangles == 24200
    assert scene.background_shader == "simple_sky"
    assert scene.has_any_texture
    names = [c.name for c in scene.cameras]
    # cameras 2/3 reference their .eye relative to the process cwd
    # ('1000-horizontallyAcute-variableDegree.eye' without the eyes/ prefix);
    # like the reference loader they are skipped unless cwd resolves them
    # (MulticamScene.cpp:320-343).
    assert names[:2] == ["regular-panoramic", "insect-eye-spherical-projector"]
    proj = [c for c in scene.cameras if c.name == "insect-eye-spherical-projector"][0]
    assert proj.projection == "spherical_orientationwise"
    assert proj.ommatidial_count == 1000


def test_natural_scene_cwd_relative_eyes(natural_scene_path, monkeypatch):
    # running with cwd = data/eyes resolves the bare eye filenames, loading
    # all four cameras — the reference's documented workflow
    import os as _os

    eyes_dir = os.path.join(os.path.dirname(natural_scene_path), "eyes")
    if not os.path.isdir(eyes_dir):
        pytest.skip("eyes dir missing")
    monkeypatch.chdir(eyes_dir)
    scene = load_scene(natural_scene_path)
    names = [c.name for c in scene.cameras]
    assert "insect-eye-fast-vector" in names
    fast = [c for c in scene.cameras if c.name == "insect-eye-fast-vector"][0]
    assert fast.projection == "single_dimension_fast"
    assert fast.ommatidial_count == 1000


def test_eye_roundtrip(tmp_path):
    omms = icosphere_eye()
    assert len(omms) == 12
    p = tmp_path / "test.eye"
    write_eye_file(str(p), omms)
    back = read_eye_file(str(p))
    assert len(back) == 12
    for a, b in zip(omms, back):
        assert np.allclose(a.position, b.position, atol=1e-9)
        assert np.allclose(a.direction, b.direction, atol=1e-9)
        assert np.isclose(a.acceptance_angle, b.acceptance_angle)
    # one-steradian acceptance angle
    assert np.isclose(omms[0].solid_angle(), 1.0, rtol=1e-6)


def test_reference_eye_file():
    p = "/root/reference/data/eyes/1000-equidistant.eye"
    if not os.path.isfile(p):
        pytest.skip("reference eyes not available")
    omms = read_eye_file(p)
    assert len(omms) == 1000
    dirs = np.stack([o.direction for o in omms])
    assert np.allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-3)


def test_procedural_scene(box_scene):
    assert box_scene.num_triangles == 36
    assert box_scene.has_color.all()
    assert box_scene.aabb_min[1] < -2.0
