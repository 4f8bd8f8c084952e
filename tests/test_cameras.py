"""Camera pose math parity (DataRecordCamera.h:26-101, libEyeRenderer.cpp:441-450)."""

import math

import numpy as np

from compound_ray_tpu.cameras.types import (
    CompoundEyeCamera,
    PerspectiveCamera,
    rotate_point,
)
from compound_ray_tpu.scene.eye_io import icosphere_eye


def test_rotate_point_quarter_turn():
    p = np.array([1.0, 0.0, 0.0])
    out = rotate_point(p, math.pi / 2, np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-12)


def test_rotate_point_unnormalised_axis():
    # host-side rotate_point normalises its axis
    p = np.array([1.0, 0.0, 0.0])
    a = rotate_point(p, 0.3, np.array([0.0, 5.0, 0.0]))
    b = rotate_point(p, 0.3, np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_rotate_point_zero_axis_is_identity():
    # a zero axis is ill-defined; we return the point unchanged rather than
    # NaN-ing (reference divides by 0) or scaling by cos(angle)
    p = np.array([1.0, 2.0, 3.0])
    out = rotate_point(p, 0.7, np.zeros(3))
    np.testing.assert_allclose(out, p, atol=0)
    assert np.all(np.isfinite(out))


def test_camera_rotate_preserves_orthonormal():
    cam = PerspectiveCamera("c")
    cam.rotate_around(0.7, (1.0, 2.0, 0.5))
    cam.rotate_locally_around(-1.2, (0.0, 1.0, 0.0))
    ls = cam.local_space
    np.testing.assert_allclose(ls @ ls.T, np.eye(3), atol=1e-12)


def test_set_pose_order():
    cam = PerspectiveCamera("c")
    cam.set_pose(1.0, 2.0, 3.0, 0.1, 0.2, 0.3)
    # manual composition: reset, Rx, Ry, Rz (world axes), translate
    expect = PerspectiveCamera("m")
    expect.reset_pose()
    expect.rotate_around(0.1, (1, 0, 0))
    expect.rotate_around(0.2, (0, 1, 0))
    expect.rotate_around(0.3, (0, 0, 1))
    expect.move((1.0, 2.0, 3.0))
    np.testing.assert_allclose(cam.local_space, expect.local_space, atol=1e-14)
    np.testing.assert_allclose(cam.position, [1, 2, 3])


def test_move_locally():
    cam = PerspectiveCamera("c")
    cam.rotate_around(math.pi / 2, (0, 1, 0))  # x -> -z
    cam.move_locally((1.0, 0.0, 0.0))
    np.testing.assert_allclose(cam.position, [0.0, 0.0, -1.0], atol=1e-12)


def test_fov_math():
    cam = PerspectiveCamera("c")
    cam.set_y_fov(90.0)
    assert np.isclose(cam.scale[1], 1.0)
    assert np.isclose(cam.scale[0], 1.0)  # aspect 1
    cam.set_aspect_ratio(2.0)
    assert np.isclose(cam.scale[0], 2.0)
    assert np.isclose(cam.scale[1], 1.0)


def test_set_x_fov_mirrors_set_y_fov():
    cam = PerspectiveCamera("c")
    cam.set_aspect_ratio(2.0)
    cam.set_x_fov(90.0)
    assert np.isclose(cam.scale[0], 1.0)
    assert np.isclose(cam.scale[1], 0.5)  # y = x / aspect
    # idempotent: repeated calls must not keep shrinking y
    cam.set_x_fov(90.0)
    assert np.isclose(cam.scale[1], 0.5)
    # round-trips with set_y_fov at the same implied fov pair
    other = PerspectiveCamera("o")
    other.set_aspect_ratio(2.0)
    other.set_y_fov(math.degrees(2.0 * math.atan(0.5)))
    np.testing.assert_allclose(cam.scale, other.scale, atol=1e-12)


def test_compound_sample_reset():
    cam = CompoundEyeCamera("e", "single_dimension_fast", icosphere_eye())
    cam.rng_frame = 5
    cam.set_samples_per_ommatidium(32)
    assert cam.samples_per_ommatidium == 32
    assert cam.rng_frame == 0
    # reference re-inits curand on EVERY setSamplesPerOmmatidium call, even
    # at the unchanged count (CompoundEye.cpp:271-277)
    cam.rng_frame = 7
    cam.set_samples_per_ommatidium(32)
    assert cam.rng_frame == 0
    cam.change_samples_per_ommatidium_by(-31)
    assert cam.samples_per_ommatidium == 1
    # floor at 1
    cam.change_samples_per_ommatidium_by(-10)
    assert cam.samples_per_ommatidium == 1


def test_set_ommatidia_resets_rng_only_on_count_change():
    cam = CompoundEyeCamera("e", "single_dimension_fast", icosphere_eye())
    same = cam.ommatidia.copy()
    cam.rng_frame = 3
    cam.set_ommatidia(same)  # same count: streams keep running
    assert cam.rng_frame == 3
    cam.set_ommatidia(same[: len(same) // 2])  # count change: reset
    assert cam.rng_frame == 0


def test_set_pose_matrix_columns():
    cam = PerspectiveCamera("c")
    m = np.eye(4)
    m[:3, 0] = [0, 0, 1]
    m[:3, 1] = [0, 1, 0]
    m[:3, 2] = [-1, 0, 0]
    m[:3, 3] = [5, 6, 7]
    cam.set_pose_matrix(m)
    np.testing.assert_allclose(cam.local_space[0], [0, 0, 1])
    np.testing.assert_allclose(cam.local_space[2], [-1, 0, 0])
    np.testing.assert_allclose(cam.position, [5, 6, 7])
