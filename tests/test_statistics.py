"""RNG conformance: sampling statistics must match the reference's
quantified-experiment behaviour (SURVEY.md §4, §7 hard part 3).

The cone-jitter estimator is an unbiased mean of iid samples, so the
per-ommatidium standard deviation of repeated renders must fall as
1/sqrt(samples) and independent frames must decorrelate.
"""

import numpy as np
import pytest

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye


@pytest.fixture(scope="module")
def renderer():
    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene(background="simple_sky")
    cam = CompoundEyeCamera(
        "eye", "single_dimension_fast", make_sphere_eye(24, acceptance_deg=25.0)
    )
    r.scene.cameras.append(cam)
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    cam.set_position((2.0, 1.5, 0.0))  # near the cube: edges in view
    return r


def _sd_at(renderer, samples, repeat=24):
    renderer.set_current_eye_samples_per_ommatidium(samples)
    stack = []
    for _ in range(repeat):
        renderer.render_frame()
        renderer._camera_data = None
        stack.append(renderer.get_camera_data().copy())
    stack = np.stack(stack)
    return stack.std(axis=0).mean()


def test_variance_falls_as_inverse_sqrt_n(renderer):
    sd1 = _sd_at(renderer, 1)
    sd4 = _sd_at(renderer, 4)
    sd16 = _sd_at(renderer, 16)
    assert sd1 > 0.01  # real sampling noise present
    # ratios ~2x per 4x samples, generous tolerance for 24-repeat estimates
    assert 1.3 < sd1 / sd4 < 3.2, (sd1, sd4)
    assert 1.3 < sd4 / sd16 < 3.2, (sd4, sd16)


def test_mean_is_stable_across_frames(renderer):
    """Means over many samples converge: two 64-sample renders agree far
    better than two 1-sample renders."""
    renderer.set_current_eye_samples_per_ommatidium(64)
    renderer.render_frame()
    renderer._camera_data = None
    a = renderer.get_camera_data().copy()
    renderer.render_frame()
    renderer._camera_data = None
    b = renderer.get_camera_data().copy()
    assert np.abs(a - b).mean() < 0.05


def test_frames_decorrelate(renderer):
    renderer.set_current_eye_samples_per_ommatidium(1)
    renderer.render_frame()
    renderer._camera_data = None
    a = renderer.get_camera_data().copy()
    renderer.render_frame()
    renderer._camera_data = None
    b = renderer.get_camera_data().copy()
    assert not np.array_equal(a, b)
