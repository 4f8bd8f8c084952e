"""Grayscale quad-table texture path.

Big GRAYSCALE single textures (the ofstad arena's 3072x1024 patterning,
R == G == B on every texel) sample through a single-channel (P, 4) quad
table: 1/4 the bytes of the colour (P, 16) table keeps the gather under
the ~64-100 MB residency cliff, one gather/ray instead of four texel
gathers.  The arithmetic order matches quad_bilinear_c exactly, so the
path is bit-identical to the colour quad path on grayscale input.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.eye.pipeline import render_means_pallas, scene_plan
from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array
from compound_ray_tpu.testing import make_textured_quad_scene
from compound_ray_tpu.trace.shade import (
    build_quad_table,
    build_quad_table_gray,
    miss_id,
    quad_bilinear_c,
    quad_bilinear_gray_c,
)


def _gray_scene(tex_size: int = 16, wrap=(0, 0)):
    scene = make_textured_quad_scene(tex_size)
    # make the checker grayscale: R = G = B (keep alpha)
    tex = np.asarray(scene.tex_data).copy()
    lum = 0.25 + 0.5 * tex[:, 0]
    tex[:, 0] = tex[:, 1] = tex[:, 2] = lum
    scene.tex_data = tex
    scene.tex_wrap_s = np.array([wrap[0]], np.int32)
    scene.tex_wrap_t = np.array([wrap[1]], np.int32)
    return scene


def test_gray_table_matches_color_channel0():
    # all three wrap modes: gray rows must equal channel 0 of the colour
    # quads [c00 | c10 | c01 | c11] -> columns 0, 4, 8, 12
    for wrap in ((0, 0), (1, 1), (2, 2), (0, 2)):
        dev = _gray_scene(8, wrap).device_triangles()
        color = np.asarray(build_quad_table(dev))
        gray = np.asarray(build_quad_table_gray(dev))
        np.testing.assert_array_equal(gray, color[:, [0, 4, 8, 12]])


def test_gray_bilinear_matches_color():
    rng = np.random.default_rng(7)
    color = jnp.asarray(rng.random((64, 16), np.float32))
    gray = color[:, [0, 4, 8, 12]]
    fx = jnp.asarray(rng.random(64, np.float32))
    fy = jnp.asarray(rng.random(64, np.float32))
    r, _, _ = quad_bilinear_c(color, fx, fy)
    v = quad_bilinear_gray_c(gray, fx, fy)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(r))


def _down_eye(n: int = 12):
    # sample TEXEL CENTERS of the 16-texel checker over the 20-unit quad
    # (cell 1.25, centers at -10 + 1.25*j + 0.625): z = 0 would land on the
    # v = 0.5 texel boundary where bilinear blends opposite rows to 0.5
    xs = -6.875 + 1.25 * np.arange(n)
    omms = [
        Ommatidium(np.array([x, 0.0, 0.625]),
                   np.array([0.0, -1.0, 0.0]), 1e-6, np.radians(1.0))
        for x in xs
    ]
    return ommatidia_to_array(omms)


def test_gray_frame_path_bit_identical():
    """Force quad_gray onto a small scene's plan: the frame must match the
    colour quad path bit-for-bit (same coords, same blend order)."""
    scene = _gray_scene(16)
    dev = scene.device_triangles()
    omms_np = _down_eye()
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    bg = miss_id(scene.background_shader)

    plan = scene_plan(scene)
    assert plan.tex_static is not None  # single texture -> static sampler
    assert plan.quad_gray is None  # tiny texture: gray table not built
    base = np.asarray(
        render_means_pallas(scene, dev, omms_np, pos, ls, key, 8, bg)
    )
    assert base.std() > 0.01  # the checker was actually sampled

    plan.quad_gray = build_quad_table_gray(dev)
    got = np.asarray(
        render_means_pallas(scene, dev, omms_np, pos, ls, key, 8, bg)
    )
    np.testing.assert_array_equal(got, base)


def test_scene_plan_skips_gray_for_color_textures():
    # a genuinely coloured texture must never take the gray path even if
    # someone lowers the size threshold: scene_plan checks exact equality
    scene = make_textured_quad_scene(8)
    tex = np.asarray(scene.tex_data)
    assert not np.array_equal(tex[:, 0], tex[:, 1])
    plan = scene_plan(scene)
    assert plan.quad_gray is None
