"""Exact cone-vs-triangle refine (round-3 VERDICT #1).

The level-2 refine now tests the acceptance cone against the TRIANGLE
itself (spherical-projection test) instead of its bounding sphere — the
lever that makes closed arenas tractable (a full-height wall sliver's
bounding sphere spans the arena, so sphere refine kept ~every sliver).
These tests pin (a) exact == sphere results on renders, (b) the sliver-
arena case where the eye sits INSIDE most triangle bounding spheres, and
(c) that the exact mode actually culls harder there.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.config import get_config, set_config
from compound_ray_tpu.eye.pipeline import render_means_pallas
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.scene.flat import build_scene_from_arrays
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye
from compound_ray_tpu.trace.shade import miss_id


def make_sliver_arena(n_wall=64, radius=12.0, height=24.0):
    """Ofstad-like closed arena: a cylinder of full-height wall slivers plus
    floor/ceiling fans — every triangle's bounding sphere contains the
    centre, the adversarial case for sphere-based refine."""
    ang = np.linspace(0.0, 2.0 * np.pi, n_wall, endpoint=False)
    x, z = radius * np.cos(ang), radius * np.sin(ang)
    verts, faces, cols = [], [], []

    def add_quad(p0, p1, p2, p3, col):
        b = len(verts)
        verts.extend([p0, p1, p2, p3])
        faces.append([b, b + 1, b + 2])
        faces.append([b, b + 2, b + 3])
        cols.extend([list(col) + [1.0]] * 4)

    rng = np.random.default_rng(0)
    for i in range(n_wall):
        j = (i + 1) % n_wall
        col = rng.uniform(0.2, 1.0, 3)
        add_quad(
            [x[i], -height / 2, z[i]], [x[j], -height / 2, z[j]],
            [x[j], height / 2, z[j]], [x[i], height / 2, z[i]], col,
        )
    # floor + ceiling fans from the axis (huge close-range triangles)
    for y, col in ((-height / 2, (0.6, 0.5, 0.3)), (height / 2, (0.8, 0.8, 0.9))):
        c = len(verts)
        verts.append([0.0, y, 0.0])
        cols.append(list(col) + [1.0])
        for i in range(n_wall):
            j = (i + 1) % n_wall
            b = len(verts)
            verts.extend([[x[i], y, z[i]], [x[j], y, z[j]]])
            cols.extend([list(col) + [1.0]] * 2)
            faces.append([c, b, b + 1])
    return build_scene_from_arrays(
        np.asarray(verts), np.asarray(faces),
        vertex_colors=np.asarray(cols, np.float32),
        background_shader="simple_sky", name="sliver-arena",
    )


def _render_both_modes(scene, omms_np, pos, ls, key, samples, bg):
    base = get_config()
    out = {}
    for mode in ("exact", "sphere"):
        set_config(dataclasses.replace(base, refine_mode=mode))
        try:
            # fresh plan per mode so nothing is served across configs
            scene._kernel_plan = None
            out[mode] = np.asarray(
                render_means_pallas(scene, scene.device_triangles(),
                                    omms_np, pos, ls, key, samples, bg)
            )
        finally:
            set_config(base)
    scene._kernel_plan = None
    return out["exact"], out["sphere"]


def test_exact_equals_sphere_on_open_scene():
    scene = make_big_scene(n_boxes=120, seed=4)
    omms_np = ommatidia_to_array(make_sphere_eye(40, acceptance_deg=1e-5))
    pos = np.asarray((3.0, 2.0, -5.0), np.float32)
    ls = np.eye(3, dtype=np.float32)
    key = jax.random.PRNGKey(1)
    ex, sp = _render_both_modes(scene, omms_np, pos, ls, key, 2, 0)
    np.testing.assert_allclose(ex, sp, atol=2e-5)


def test_sliver_arena_matches_oracle():
    """Eye at the arena centre (inside every sliver's bounding sphere):
    exact refine must keep every triangle a deterministic ray hits."""
    scene = make_sliver_arena()
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=1e-5))
    pos = np.asarray((0.3, 0.4, -0.2), np.float32)  # off-centre
    ls = np.eye(3, dtype=np.float32)
    key = jax.random.PRNGKey(2)
    bg = miss_id(scene.background_shader)
    got = np.asarray(
        render_means_pallas(scene, dev, omms_np, pos, ls, key, 2, bg)
    )
    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 2, bg)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_sliver_arena_jittered_matches_sphere_mode():
    """Real cone jitter: exact vs sphere refine agree within the
    cull_sigmas truncation budget (same RNG -> same rays)."""
    scene = make_sliver_arena()
    omms_np = ommatidia_to_array(make_sphere_eye(48, acceptance_deg=3.0))
    pos = np.asarray((0.0, 1.0, 0.0), np.float32)
    ls = np.eye(3, dtype=np.float32)
    key = jax.random.PRNGKey(3)
    ex, sp = _render_both_modes(scene, omms_np, pos, ls, key, 64, 0)
    # identical rays; only beyond-4-sigma tails can differ
    assert np.mean(np.abs(ex - sp)) < 1e-3
    np.testing.assert_allclose(ex, sp, atol=0.06)


def test_exact_culls_harder_in_arena():
    """The point of the exercise: exact refine must shrink the packed
    payload in the sliver arena (sphere mode saturates there)."""
    from compound_ray_tpu.eye import pipeline

    scene = make_sliver_arena()
    omms_np = ommatidia_to_array(make_sphere_eye(48, acceptance_deg=3.0))
    pos = np.asarray((0.0, 1.0, 0.0), np.float32)
    ls = np.eye(3, dtype=np.float32)
    key = jax.random.PRNGKey(4)
    base = get_config()
    rows = {}
    for mode in ("exact", "sphere"):
        set_config(dataclasses.replace(base, refine_mode=mode))
        try:
            scene._kernel_plan = None
            render_means_pallas(scene, scene.device_triangles(), omms_np,
                                pos, ls, key, 8, 0)
            splan = scene._kernel_plan
            (row_counts, _packed) = next(iter(splan.packed_store.values()))
            rows[mode] = float(np.asarray(jax.device_get(row_counts)).mean())
        finally:
            set_config(base)
    scene._kernel_plan = None
    assert rows["exact"] <= 0.7 * rows["sphere"], rows
