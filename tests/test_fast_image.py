"""Tile-culled camera image path vs the brute-force image oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.cameras.fast_image import render_camera_image_fast
from compound_ray_tpu.cameras.raygen import render_camera_image
from compound_ray_tpu.testing import make_big_scene
from compound_ray_tpu.trace.shade import miss_id


@pytest.mark.parametrize("kind,param", [
    ("pinhole", [0.6, 0.6, 1.0]),
    ("panoramic", [0.0]),
    ("orthographic", [30.0, 20.0]),
])
def test_fast_image_matches_oracle(kind, param):
    scene = make_big_scene(n_boxes=80, seed=9)
    dev = scene.device_triangles()
    bg = miss_id(scene.background_shader)
    pos = jnp.asarray([0.0, 3.0, 40.0], jnp.float32)
    ls = jnp.asarray(np.diag([1.0, 1.0, -1.0]), jnp.float32)  # look along -z

    ref = np.asarray(render_camera_image(
        dev, kind, pos, ls, jnp.asarray(param, jnp.float32), 40, 24, bg,
    ))
    got = np.asarray(render_camera_image_fast(
        scene, dev, kind, np.asarray(pos), np.asarray(ls),
        np.asarray(param), 40, 24, bg,
    ))
    assert got.shape == ref.shape
    # uint8 images: allow a tiny number of differing pixels from f32
    # tie-breaks on coincident geometry, but the images must agree overall
    diff = (got[..., :3].astype(int) - ref[..., :3].astype(int))
    frac_off = (np.abs(diff).max(axis=-1) > 2).mean()
    assert frac_off < 0.01, frac_off


def test_renderer_uses_fast_image_path():
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import PerspectiveCamera

    r = EyeRenderer(verbose=False)
    r.scene = make_big_scene(n_boxes=80, seed=9)
    cam = PerspectiveCamera("view")
    cam.set_y_fov(60.0)
    cam.set_position((0.0, 3.0, 40.0))
    cam.set_local_space((1, 0, 0), (0, 1, 0), (0, 0, -1))
    r.scene.cameras.append(cam)
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    r.set_render_size(32, 24)
    r.render_frame()
    frame = r.get_frame_pointer()
    assert frame.shape == (24, 32, 4)
    assert frame[..., :3].any()
