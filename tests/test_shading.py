"""Shading + miss-program semantics (parity: shaders.cu:745-882, 180-189)."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.trace.shade import make_color, miss_color, miss_id


def test_miss_ids():
    assert miss_id("default_background") == 0
    assert miss_id("__miss__white") == 1
    assert miss_id("black") == 2
    assert miss_id("simple_sky") == 3
    assert miss_id("nonexistent") == 0


def test_white_black():
    d = jnp.asarray([[1.0, 0.3, 0.2], [0.0, -1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(miss_color(d, 1)), 1.0)
    np.testing.assert_array_equal(np.asarray(miss_color(d, 2)), 0.0)


def test_simple_sky_gradient():
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    horiz = jnp.asarray([[1.0, 0.0, 0.0]])
    upper = np.array([1.0, 31.0, 117.0]) / 255.0
    lower = np.array([143.0, 179.0, 203.0]) / 255.0 * 0.8
    np.testing.assert_allclose(np.asarray(miss_color(up, 3))[0], upper, atol=1e-6)
    # downward rays: mix clamps at 0 -> lower colour
    np.testing.assert_allclose(np.asarray(miss_color(down, 3))[0], lower, atol=1e-6)
    np.testing.assert_allclose(np.asarray(miss_color(horiz, 3))[0], lower, atol=1e-6)


def test_default_background_axis_lines():
    # near-axis directions are black
    d = jnp.asarray([[1.0, 0.005, 0.005]])
    np.testing.assert_array_equal(np.asarray(miss_color(d, 0))[0], 0.0)
    # off-axis: uv encoding, blue channel 0
    d = jnp.asarray([[0.5, 0.5, 0.70710678]])
    c = np.asarray(miss_color(d, 0))[0]
    assert c[2] == 0.0
    assert 0.0 < c[0] < 1.0 and 0.0 < c[1] < 1.0


def test_make_color_gamma():
    rgb = jnp.asarray([[0.0, 1.0, 0.5], [2.0, -1.0, 0.2176376]])
    out = np.asarray(make_color(rgb))
    assert out.shape == (2, 4)
    assert out[0, 0] == 0 and out[0, 1] == 255
    # 0.5^(1/2.2)*255 = 186.52... -> truncates to 186
    assert out[0, 2] == 186
    # clamped
    assert out[1, 0] == 255 and out[1, 1] == 0
    # 0.2176376^(1/2.2) = 0.5 -> 127.5 -> 127
    assert out[1, 2] == 127
    assert (out[:, 3] == 255).all()


def test_shade_vertex_color_priority(box_scene):
    import jax

    from compound_ray_tpu.trace.intersect import intersect_rays
    from compound_ray_tpu.trace.shade import shade_rays

    dev = box_scene.device_triangles()
    # ray at the red cube (+x face from outside)
    o = jnp.asarray([[5.0, 0.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    assert bool(hit["hit"][0])
    rgb = np.asarray(shade_rays(dev, d, hit, background=3))
    # vertex colour (0.9, 0.2, 0.1) linearized by pow 2.2
    np.testing.assert_allclose(rgb[0], np.power([0.9, 0.2, 0.1], 2.2), atol=1e-5)


def test_shade_material_fallback():
    from compound_ray_tpu.scene.flat import build_scene_from_arrays
    from compound_ray_tpu.trace.intersect import intersect_rays
    from compound_ray_tpu.trace.shade import shade_rays
    from compound_ray_tpu.testing import box_mesh

    v, f = box_mesh((0, 0, 0), (1, 1, 1))
    scene = build_scene_from_arrays(v, f, base_color=(0.8, 0.8, 0.8))
    dev = scene.device_triangles()
    o = jnp.asarray([[5.0, 0.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    rgb = np.asarray(shade_rays(dev, d, hit, background=3))
    # no vertex colours, no texture -> baseColorFactor as-is (NOT linearized)
    np.testing.assert_allclose(rgb[0], [0.8, 0.8, 0.8], atol=1e-6)
