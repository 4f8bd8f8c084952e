"""ctypes-shim conformance: the primary-example / minimumSampleRateFinder
call patterns must work verbatim (SURVEY.md §3.5)."""

import ctypes
from ctypes import c_bool, c_char_p, c_double, c_float, c_int, c_size_t, c_ubyte

import numpy as np
import pytest
from numpy.ctypeslib import ndpointer

from compound_ray_tpu import eye_tools as eyeTools
from compound_ray_tpu.api.shim import load_eye_renderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye


@pytest.fixture()
def shim():
    s = load_eye_renderer(verbose=False)
    s.renderer.scene = make_box_scene(background="simple_sky")
    s.renderer.scene.cameras.append(
        CompoundEyeCamera("eye", "single_dimension_fast", make_sphere_eye(32))
    )
    from compound_ray_tpu.trace.lighting import default_lights

    s.renderer._lights = default_lights(
        s.renderer.scene.aabb_min, s.renderer.scene.aabb_max
    )
    return s


def test_configure_and_calls(shim):
    eyeTools.configureFunctions(shim)
    assert shim.getCameraCount() == 1
    assert shim.getCurrentCameraName() == b"eye"  # c_char_p restype -> bytes
    assert shim.isCompoundEyeActive() is True
    assert shim.gotoCameraByName(c_char_p(b"eye")) is True
    assert shim.gotoCameraByName(b"missing") is False


def test_render_and_frame_pointer(shim):
    eyeTools.configureFunctions(shim)
    eyeTools.setRenderSize(shim, 32, 4)
    ms = shim.renderFrame()
    assert isinstance(ms, float) and ms > 0
    frame = shim.getFramePointer()
    assert isinstance(frame, np.ndarray)
    assert frame.shape == (4, 32, 4)
    assert frame.dtype == np.uint8


def test_samples_and_ommatidium_controls(shim):
    shim.setCurrentEyeSamplesPerOmmatidium(c_int(4))
    assert shim.getCurrentEyeSamplesPerOmmatidium() == 4
    shim.changeCurrentEyeSamplesPerOmmatidiumBy(-3)
    assert shim.getCurrentEyeSamplesPerOmmatidium() == 1
    omms = eyeTools.getIcoOmmatidia()
    eyeTools.setOmmatidiaFromOmmatidiumList(shim, omms)
    assert shim.getCurrentEyeOmmatidialCount() == 12
    shim.renderFrame()
    data = shim.getCameraData()
    assert data.shape == (12, 3)


def test_pose_functions(shim):
    shim.setCameraPosition(c_float(1.0), c_float(2.0), c_float(3.0))
    pos = shim.getCameraPosition()
    np.testing.assert_allclose(pos.reshape(3), [1, 2, 3])
    shim.setCameraPose(0.0, 0.0, 0.0, 0.0, 0.5, 0.0)
    shim.rotateCameraAround(0.25, 0.0, 1.0, 0.0)
    shim.translateCameraLocally(0.0, 0.0, 1.0)
    shim.resetCameraPose()
    np.testing.assert_allclose(shim.getCameraPosition().reshape(3), 0.0)


def test_geometry_bounds_cfloat3(shim):
    v = shim.getGeometryMaxBounds(b"box-scene")
    assert hasattr(v, "x") and hasattr(v, "toNumpy")
    assert v.toNumpy().shape == (3,)


def test_save_frame(shim, tmp_path):
    eyeTools.setRenderSize(shim, 8, 2)
    shim.renderFrame()
    p = str(tmp_path / "x.ppm")
    shim.saveFrameAs(c_char_p(p.encode()))
    assert (tmp_path / "x.ppm").read_bytes().startswith(b"P6")
    shim.displayFrame()  # no-op hook must exist
    shim.stop()


def test_eye_tools_roundtrip(tmp_path):
    omms = eyeTools.getIcoOmmatidia()
    assert np.isclose(omms[0].getSolidAngle(), 1.0, rtol=1e-6)
    p = str(tmp_path / "a.eye")
    eyeTools.saveEyeFile(p, omms)
    back = eyeTools.readEyeFile(p)
    assert len(back) == 12
    assert np.isclose(back[3].acceptanceAngle, omms[3].acceptanceAngle)


def test_id_decode():
    assert eyeTools.decodeProjectionMapID([0, 0, 1, 4]) == 260
    assert eyeTools.decodeProjectionMapID([1, 0, 0, 0]) == 1 << 24
