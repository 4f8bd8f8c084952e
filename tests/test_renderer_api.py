"""End-to-end EyeRenderer API tests (parity: libEyeRenderer.h surface)."""

import numpy as np
import pytest

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.scene.eye_io import icosphere_eye
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye


def _renderer_with_box_scene(projection="single_dimension_fast", background="white"):
    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene(background=background)
    cam = CompoundEyeCamera("eye", projection, make_sphere_eye(64))
    r.scene.cameras.append(cam)
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    return r


def test_white_background_means_exact():
    # eye floating far above the scene looking outward: upper hemisphere
    # ommatidia see only the miss shader -> mean == exactly 1.0
    r = _renderer_with_box_scene(background="white")
    cam = r.current_camera()
    cam.set_position((0.0, 100.0, 0.0))
    ms = r.render_frame()
    assert ms > 0.0
    data = r.get_camera_data()
    assert data.shape == (64, 3)
    up = r.current_camera().ommatidia[:, 4] > 0.3  # dir.y > 0.3: sees only sky
    np.testing.assert_allclose(data[up], 1.0, atol=1e-6)


def test_render_frame_buffer_and_projection():
    r = _renderer_with_box_scene(projection="spherical_orientationwise")
    r.set_render_size(32, 16)
    r.render_frame()
    frame = r.get_frame_pointer()
    assert frame.shape == (16, 32, 4)
    assert frame[..., 3].min() == 255


def test_samples_controls():
    r = _renderer_with_box_scene()
    assert r.is_compound_eye_active()
    assert r.get_current_eye_samples_per_ommatidium() == 1
    r.set_current_eye_samples_per_ommatidium(8)
    assert r.get_current_eye_samples_per_ommatidium() == 8
    r.change_current_eye_samples_per_ommatidium_by(-4)
    assert r.get_current_eye_samples_per_ommatidium() == 4
    assert r.get_current_eye_ommatidial_count() == 64
    r.render_frame()
    assert r.get_camera_data().shape == (64, 3)


def test_set_ommatidia():
    r = _renderer_with_box_scene()
    r.set_ommatidia(icosphere_eye())
    assert r.get_current_eye_ommatidial_count() == 12
    r.render_frame()
    assert r.get_camera_data().shape == (12, 3)


def test_camera_cycling_and_names():
    r = _renderer_with_box_scene()
    # only one camera in procedural scene
    assert r.get_camera_count() == 1
    assert r.goto_camera_by_name("eye")
    assert not r.goto_camera_by_name("nonexistent")
    assert r.get_current_camera_name() == "eye"


def test_geometry_bounds():
    r = _renderer_with_box_scene()
    mx = r.get_geometry_max_bounds("box-scene")
    mn = r.get_geometry_min_bounds("box-scene")
    assert (mx > mn).all()
    assert (r.get_geometry_max_bounds("missing") == 0).all()


def test_config_env_parsing(monkeypatch):
    from compound_ray_tpu.config import RenderConfig

    # empty value = unset (the `CR_TPU_X= cmd` shell idiom must not crash)
    monkeypatch.setenv("CR_TPU_SEED", "")
    assert RenderConfig.from_env().base_seed == RenderConfig().base_seed
    monkeypatch.setenv("CR_TPU_SEED", "7")
    assert RenderConfig.from_env().base_seed == 7
    monkeypatch.setenv("CR_TPU_SEED", "banana")
    with pytest.raises(ValueError, match="CR_TPU_SEED"):
        RenderConfig.from_env()


def test_base_seed_comes_from_config():
    # CR_TPU_SEED -> config.base_seed must reach the frame keys (it is the
    # analogue of the reference's curand_init seed)
    import dataclasses

    import jax
    from compound_ray_tpu import config as config_mod
    from compound_ray_tpu.api import renderer as renderer_mod

    saved_key = renderer_mod._base_key
    saved_cfg = config_mod._global_config
    try:
        renderer_mod._base_key = None
        config_mod._global_config = dataclasses.replace(
            config_mod.RenderConfig(), base_seed=7
        )
        got = renderer_mod._frame_key(3)
        want = jax.random.fold_in(jax.random.PRNGKey(7), np.uint32(3))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        renderer_mod._base_key = saved_key
        config_mod._global_config = saved_cfg


def test_rng_stability_and_frames():
    # frame counter changes samples; same frame twice gives identical output
    r = _renderer_with_box_scene(background="default_background")
    r.set_current_eye_samples_per_ommatidium(4)
    r.render_frame()
    d1 = r.get_camera_data().copy()
    # re-setting the sample count rewinds the RNG stream (reference re-inits
    # its curand states on every setSamplesPerOmmatidium call)
    r.set_current_eye_samples_per_ommatidium(4)
    r.render_frame()
    d2 = r.get_camera_data().copy()
    np.testing.assert_array_equal(d1, d2)
    r.render_frame()  # frame 1 now: different jitter
    d3 = r.get_camera_data()
    assert not np.array_equal(d1, d3)


def test_full_reference_scene(test_scene_path):
    r = EyeRenderer(verbose=False)
    r.load_gltf_scene(test_scene_path)
    assert r.get_camera_count() == 6
    # pinhole image render
    r.set_render_size(24, 18)
    r.render_frame()
    frame = r.get_frame_pointer()
    assert frame.shape == (18, 24, 4)
    assert frame.any()
    # compound camera
    assert r.goto_camera_by_name("insect-cam-2")
    assert r.is_compound_eye_active()
    r.set_current_eye_samples_per_ommatidium(2)
    r.render_frame()
    data = r.get_camera_data()
    assert data.shape == (100, 3)
    assert np.isfinite(data).all()
    assert data.max() > 0.0


def test_save_ppm(tmp_path):
    r = _renderer_with_box_scene(projection="spherical_orientationwise")
    r.set_render_size(8, 4)
    r.render_frame()
    p = tmp_path / "out.ppm"
    r.save_frame_as(str(p))
    blob = p.read_bytes()
    assert blob.startswith(b"P6\n8 4\n255\n")
    assert len(blob) == len(b"P6\n8 4\n255\n") + 8 * 4 * 3


def test_set_get_lights_roundtrip_and_validation():
    r = _renderer_with_box_scene()
    full = r.get_lights()
    assert full.shape == (4, 7) and full.dtype == np.float32
    full[0, 3] = 99.0  # the getter returns a copy, not the live array
    assert r._lights[0, 3] != 99.0
    r.set_lights(r.get_lights()[:2])
    assert r.get_lights().shape == (2, 7)
    with pytest.raises(ValueError):
        r.set_lights(np.zeros((3, 6), np.float32))
    with pytest.raises(ValueError):
        r.set_lights(np.zeros((0, 7), np.float32))
    # a lit frame renders under the reduced light set
    r.set_lights(np.asarray(
        [[1.0, 1.0, 1.0, 5.0, 0.0, 50.0, 0.0]], np.float32))
    r.set_lighting(True)
    r.current_camera().set_position((0.0, 100.0, 0.0))
    r.render_frame()
    assert r.get_camera_data().shape == (64, 3)


def test_geometry_bounds_multi_primitive_mesh():
    # a multi-primitive glTF mesh stores one MeshRecord per primitive, all
    # sharing the mesh name; the reported bounds must cover ALL of them
    # (reference computes the whole-mesh world AABB)
    from compound_ray_tpu.scene.flat import MeshRecord

    r = _renderer_with_box_scene()
    r.scene.mesh_records = [
        MeshRecord("tree", np.array([0.0, 0.0, 0.0]),
                   np.array([1.0, 2.0, 1.0])),
        MeshRecord("tree", np.array([-1.0, 1.0, 0.0]),
                   np.array([0.5, 5.0, 1.0])),
    ]
    np.testing.assert_allclose(r.get_geometry_min_bounds("tree"),
                               [-1.0, 0.0, 0.0])
    np.testing.assert_allclose(r.get_geometry_max_bounds("tree"),
                               [1.0, 5.0, 1.0])
    np.testing.assert_allclose(r.get_geometry_min_bounds("absent"), 0.0)


def test_camera_cycling_empty_scene_is_noop():
    from compound_ray_tpu.api.renderer import EyeRenderer

    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene()
    r.scene.cameras = []
    r.next_camera()  # must not raise ZeroDivisionError
    r.previous_camera()
    assert r.get_current_camera_index() == 0
