"""Sharding tests on the 8-device virtual CPU mesh (v5e-8 stand-in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.parallel.sharding import make_eye_mesh, render_means_sharded
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye
from compound_ray_tpu.trace.shade import miss_id


@pytest.fixture(scope="module")
def setup():
    scene = make_box_scene(background="white")
    dev = scene.device_triangles()
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(40)))
    pos = jnp.asarray([0.0, 0.9, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    return scene, dev, omms, pos, ls


def test_devices_available():
    assert len(jax.devices()) == 8


def test_omm_sharded_means(setup):
    scene, dev, omms, pos, ls = setup
    mesh = make_eye_mesh(8, sample_parallel=1)
    key = jax.random.PRNGKey(3)
    bg = miss_id(scene.background_shader)
    out = np.asarray(render_means_sharded(dev, omms, pos, ls, key, 4, bg, mesh))
    assert out.shape == (40, 3)
    # statistical agreement with the single-device render: with a white
    # background + unlit colours, values live in [0, 1.01]
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-5


def test_omm_sample_2d_mesh(setup):
    scene, dev, omms, pos, ls = setup
    mesh = make_eye_mesh(8, sample_parallel=2)
    key = jax.random.PRNGKey(3)
    bg = miss_id(scene.background_shader)
    out = np.asarray(render_means_sharded(dev, omms, pos, ls, key, 8, bg, mesh))
    assert out.shape == (40, 3)
    assert np.isfinite(out).all()


def test_sharded_agrees_with_dense_on_deterministic_eye(setup):
    # with a tiny acceptance angle the jitter is negligible: every sample ray
    # points down the ommatidial axis, so sharded and dense must agree closely
    scene, dev, _, pos, ls = setup
    omms = jnp.asarray(
        ommatidia_to_array(make_sphere_eye(40, acceptance_deg=1e-5))
    )
    bg = miss_id(scene.background_shader)
    key = jax.random.PRNGKey(0)
    mesh = make_eye_mesh(8, sample_parallel=2)
    sharded = np.asarray(render_means_sharded(dev, omms, pos, ls, key, 4, bg, mesh))
    dense = np.asarray(render_compound_means(dev, omms, pos, ls, key, 4, bg))
    np.testing.assert_allclose(sharded, dense, atol=1e-4)


def test_uneven_ommatidia_padding(setup):
    scene, dev, _, pos, ls = setup
    # 37 is not divisible by 8 -> padding path
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(37)))
    mesh = make_eye_mesh(8)
    bg = miss_id(scene.background_shader)
    out = np.asarray(
        render_means_sharded(dev, omms, pos, ls, jax.random.PRNGKey(1), 2, bg, mesh)
    )
    assert out.shape == (37, 3)
    assert np.isfinite(out).all()


def test_sharded_fast_matches_dense(setup):
    """The production sharded path must match the single-device culled path
    exactly (same globally drawn jitter)."""
    from compound_ray_tpu.parallel.sharding import render_means_sharded_fast
    from compound_ray_tpu.testing import make_big_scene

    scene = make_big_scene(n_boxes=120, seed=6)
    dev = scene.device_triangles()
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(48, acceptance_deg=5.0)))
    pos = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(9)
    bg = miss_id(scene.background_shader)

    mesh = make_eye_mesh(8, sample_parallel=2)
    sharded = np.asarray(render_means_sharded_fast(
        scene, dev, omms, pos, ls, key, 8, bg, mesh,
    ))

    from compound_ray_tpu.eye.render import render_compound_means as dense_means

    dense = np.asarray(dense_means(dev, omms, pos, ls, key, 8, bg))
    # identical ray set (global draw) -> only float-order differences
    np.testing.assert_allclose(sharded, dense, atol=1e-4)


def test_sharded_packed_matches_dense_kernel(setup):
    """The packed-MXU sharded path (the production multi-chip path) must
    equal the dense packed-kernel pipeline on the same globally drawn
    angles — only float summation order may differ."""
    from compound_ray_tpu.eye.pipeline import (
        _ceil_to, _packed_plan, _plan_widths, _trace_shade_angles,
        eye_plan, scene_plan,
    )
    from compound_ray_tpu.parallel.sharding import (
        _draw_angles, render_means_sharded_packed,
    )
    from compound_ray_tpu.testing import make_big_scene

    scene = make_big_scene(n_boxes=120, seed=6)
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(48, acceptance_deg=5.0))
    pos = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(9)
    bg = miss_id(scene.background_shader)
    samples = 8

    mesh = make_eye_mesh(8, sample_parallel=2)
    sharded = np.asarray(render_means_sharded_packed(
        scene, dev, omms_np, pos, ls, key, samples, bg, mesh,
    ))

    # dense replay of the same prelude on one device: same eye plan
    # (ng_multiple=8), same pose plan, same angle draw
    splan = scene_plan(scene)
    eplan = eye_plan(omms_np, samples, ng_multiple=mesh.shape["omm"])
    omms_p = eplan.omms_p_dev
    pose_sig = (np.asarray(pos).tobytes(), np.asarray(ls).tobytes())
    kcand, rmax = _plan_widths(
        splan, eplan, omms_p, pos, ls,
        (eplan.sig, samples, pose_sig, "mesh"),
    )
    row_counts, packed_mm = _packed_plan(
        splan, eplan, omms_p, pos, ls, pose_sig, samples, kcand, rmax,
    )
    splay, spin = _draw_angles(key, omms_p, samples)
    dense = _trace_shade_angles(
        packed_mm, row_counts, splan.attr_table, dev,
        splan.quad_table,
        omms_p, pos, ls, splay, spin,
        samples=samples, background=bg, ng=eplan.ng, g=eplan.g, nrb=1,
        rb_size=eplan.rb_size, rmax=rmax, textured=splan.textured,
        tex_only=splan.tex_only,
    )
    dense = np.asarray(dense[eplan.inv_valid_dev])
    np.testing.assert_allclose(sharded, dense, atol=2e-6)


def test_sharded_packed_statistical_agreement(setup):
    """Sanity: the sharded packed means agree with the single-device Pallas
    pipeline statistically (different angle realisation, same estimator)."""
    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.parallel.sharding import render_means_sharded_packed

    scene, dev, omms, pos, ls = setup
    omms_np = np.asarray(omms)
    bg = miss_id(scene.background_shader)
    mesh = make_eye_mesh(8, sample_parallel=2)
    sharded = np.asarray(render_means_sharded_packed(
        scene, dev, omms_np, pos, ls, jax.random.PRNGKey(1), 64, bg, mesh,
    ))
    dense = np.asarray(render_means_pallas(
        scene, dev, omms_np, pos, ls, jax.random.PRNGKey(2), 64, bg,
    ))
    assert sharded.shape == dense.shape == (40, 3)
    assert np.isfinite(sharded).all()
    np.testing.assert_allclose(sharded.mean(), dense.mean(), atol=0.05)
