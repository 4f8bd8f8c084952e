"""GGX direct-lighting path tests (shaders.cu:826-881 semantics)."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.scene.flat import build_scene_from_arrays
from compound_ray_tpu.testing import box_mesh
from compound_ray_tpu.trace.intersect import intersect_rays
from compound_ray_tpu.trace.lighting import default_lights
from compound_ray_tpu.trace.shade import shade_rays


def _floor_scene():
    v, f = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))
    return build_scene_from_arrays(v, f, base_color=(0.5, 0.5, 0.5),
                                   background_shader="black")


def test_default_lights_layout():
    lights = default_lights(np.zeros(3), np.ones(3) * 10)
    assert lights.shape == (4, 7)
    # intensities 5, 3, 5, 0.5 (libEyeRenderer.cpp:130-148)
    np.testing.assert_allclose(lights[:, 3], [5.0, 3.0, 5.0, 0.5])
    # first light offset by maxExtent on every axis from the centre
    np.testing.assert_allclose(lights[0, 4:7], [15.0, 15.0, 15.0])


def test_lighting_adds_to_base_color():
    scene = _floor_scene()
    dev = scene.device_triangles()
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    assert bool(hit["hit"][0])
    unlit = np.asarray(shade_rays(dev, d, hit, background=2))
    lights = jnp.asarray(default_lights(scene.aabb_min, scene.aabb_max))
    lit = np.asarray(
        shade_rays(dev, d, hit, background=2,
                   lighting={"lights": lights}, origins=o)
    )
    # result = base + sum(light contributions) -> strictly brighter
    np.testing.assert_allclose(unlit[0], [0.5, 0.5, 0.5], atol=1e-6)
    assert (lit[0] > unlit[0]).all()


def test_lighting_shadowing():
    # occluder between the floor point and all 4 lights dims the result
    v1, f1 = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))
    v2, f2 = box_mesh((0.0, 3.0, 0.0), (40.0, 0.2, 40.0))  # big canopy
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    scene = build_scene_from_arrays(verts, faces, base_color=(0.5, 0.5, 0.5),
                                    background_shader="black")
    dev = scene.device_triangles()
    o = jnp.asarray([[0.0, 1.0, 0.0]])  # below the canopy
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    lights = default_lights(scene.aabb_min, scene.aabb_max)
    lights[:, 6] = np.abs(lights[:, 6]) + 30.0  # push lights above the canopy
    lights[:, 5] = 20.0
    lit = np.asarray(
        shade_rays(dev, d, hit, background=2,
                   lighting={"lights": jnp.asarray(lights)}, origins=o)
    )
    # all lights occluded by the canopy: only the base colour remains
    np.testing.assert_allclose(lit[0], [0.5, 0.5, 0.5], atol=1e-5)


def test_packed_lighting_matches_brute_oracle():
    """GGX + shadow rays on the packed-kernel backend must reproduce the
    brute-force oracle (deterministic eye: no RNG differences).  Scene has
    mixed occlusion: a canopy shadows some lights, a wall others."""
    import jax

    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.eye.render import render_compound_means
    from compound_ray_tpu.scene.eye_io import Ommatidium

    v1, f1 = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))  # floor
    v2, f2 = box_mesh((3.0, 3.0, 0.0), (4.0, 0.2, 4.0))  # partial canopy
    v3, f3 = box_mesh((-4.0, 1.0, 0.0), (0.2, 4.0, 6.0))  # side wall
    verts = np.concatenate([v1, v2, v3])
    faces = np.concatenate([f1, f2 + len(v1), f3 + len(v1) + len(v2)])
    scene = build_scene_from_arrays(verts, faces, base_color=(0.4, 0.5, 0.6),
                                    background_shader="black")
    dev = scene.device_triangles()
    lights = default_lights(scene.aabb_min, scene.aabb_max)

    # deterministic fan of downward/sideways ommatidia over the floor
    omms = []
    for ix in range(6):
        for iz in range(5):
            p = np.array([ix - 2.5, 2.0, iz - 2.0])
            d = np.array([0.15 * (ix - 2.5), -1.0, 0.1 * (iz - 2.0)])
            omms.append(Ommatidium(p, d / np.linalg.norm(d), 1e-6, 0.0))
    from compound_ray_tpu.scene.eye_io import ommatidia_to_array

    omms_np = ommatidia_to_array(omms)
    pos = jnp.zeros(3)
    ls = jnp.eye(3)
    key = jax.random.PRNGKey(3)
    ref = np.asarray(render_compound_means(
        dev, jnp.asarray(omms_np), pos, ls, key, 2, 2, True,
        jnp.asarray(lights),
    ))
    got = np.asarray(render_means_pallas(
        scene, dev, omms_np, pos, ls, key, 2, 2, lights=lights,
    ))
    # lighting must actually do something on this scene
    assert ref.max() > 0.7
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_renderer_lighting_flag():
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import CompoundEyeCamera
    from compound_ray_tpu.scene.eye_io import Ommatidium

    r = EyeRenderer(verbose=False)
    r.scene = _floor_scene()
    omm = [Ommatidium(np.zeros(3), np.array([0.0, -1.0, 0.0]), 1e-6, 0.0)] * 4
    r.scene.cameras.append(CompoundEyeCamera("e", "single_dimension_fast", omm))
    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    r.current_camera().set_position((0.0, 5.0, 0.0))
    r.render_frame()
    unlit = r.get_camera_data().copy()
    r.set_lighting(True)
    r.current_camera().rng_frame = 0  # rewind the RNG stream
    r._camera_data = None
    r.render_frame()
    lit = r.get_camera_data()
    assert (lit > unlit).all()


# ---------------------------------------------------------------------------
# metallic-roughness texture + normal map modulation (shaders.cu:831-852)
# ---------------------------------------------------------------------------


def test_device_dict_mr_keys_conditional():
    """mat_mr_tex/mat_normal_tex appear in the device dict ONLY when a
    material references one — the static jit gate for the modulation."""
    from compound_ray_tpu.testing import make_mr_normal_scene, make_textured_quad_scene

    plain = make_textured_quad_scene().device_triangles()
    assert "mat_mr_tex" not in plain and "mat_normal_tex" not in plain
    mod = make_mr_normal_scene().device_triangles()
    assert "mat_mr_tex" in mod and "mat_normal_tex" in mod


def test_triangle_dpduv_known_quad():
    from compound_ray_tpu.testing import make_mr_normal_scene
    from compound_ray_tpu.trace.lighting import triangle_dpduv

    dev = make_mr_normal_scene().device_triangles()
    dpdu, dpdv = triangle_dpduv(dev, jnp.array([0, 1]))
    # quad spans x,z in [-10,10] with u along +x and v along +z
    np.testing.assert_allclose(np.asarray(dpdu), [[20, 0, 0]] * 2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dpdv), [[0, 0, 20]] * 2, atol=1e-4)


def test_apply_material_textures_semantics():
    """Left half of the MR map halves roughness / quarters metallic and the
    normal map tilts the normal toward +x; right half is identity."""
    from compound_ray_tpu.testing import make_mr_normal_scene
    from compound_ray_tpu.trace.lighting import apply_material_textures

    dev = make_mr_normal_scene().device_triangles()
    # hit points: one on the left half (u=0.25), one on the right (u=0.75)
    uv = jnp.array([[0.25, 0.5], [0.75, 0.5]], jnp.float32)
    tri = jnp.array([0, 0])
    n = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (2, 1))
    metallic = jnp.full((2,), 0.8)
    roughness = jnp.full((2,), 0.6)
    n2, m2, r2 = apply_material_textures(dev, tri, uv, n, metallic, roughness)
    n2, m2, r2 = np.asarray(n2), np.asarray(m2), np.asarray(r2)
    np.testing.assert_allclose(r2, [0.6 * 0.5, 0.6], atol=1e-5)
    np.testing.assert_allclose(m2, [0.8 * 0.25, 0.8], atol=1e-5)
    # right half: flat normal map leaves n unchanged
    np.testing.assert_allclose(n2[1], [0.0, 1.0, 0.0], atol=1e-5)
    # left half: NN = (0.4, 0, 1) -> n = normalize(0.4*x_hat + 1*y_hat)
    expect = np.array([0.4, 1.0, 0.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(n2[0], expect, atol=1e-5)


def test_mr_normal_textures_change_lit_result():
    """The modulation must actually alter shading vs the scalar-only path."""
    from compound_ray_tpu.testing import make_mr_normal_scene
    from compound_ray_tpu.trace.shade import shade_rays

    scene = make_mr_normal_scene()
    dev = scene.device_triangles()
    lights = jnp.asarray(default_lights(scene.aabb_min, scene.aabb_max))
    o = jnp.asarray([[-5.0, 5.0, 0.0], [5.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    lit_mod = np.asarray(
        shade_rays(dev, d, hit, background=2,
                   lighting={"lights": lights}, origins=o)
    )
    # same scene with the modulation slots cleared
    import dataclasses

    plain = dataclasses.replace(
        scene,
        mat_mr_tex=np.array([-1], np.int32),
        mat_normal_tex=np.array([-1], np.int32),
        _device_cache=None, _accel_cache=None,
    )
    lit_plain = np.asarray(
        shade_rays(plain.device_triangles(), d, hit, background=2,
                   lighting={"lights": lights}, origins=o)
    )
    # left-half ray (index 0) sees different roughness/metallic/normal
    assert np.abs(lit_mod[0] - lit_plain[0]).max() > 1e-3
    # right-half ray: MR map is identity there, flat normal map -> equal
    np.testing.assert_allclose(lit_mod[1], lit_plain[1], atol=1e-5)


def test_packed_mr_normal_matches_brute_oracle():
    """Pallas lit frame == brute oracle on the MR+normal-mapped scene."""
    import jax

    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.eye.render import render_compound_means
    from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array
    from compound_ray_tpu.testing import make_mr_normal_scene

    scene = make_mr_normal_scene()
    dev = scene.device_triangles()
    lights = default_lights(scene.aabb_min, scene.aabb_max)

    omms = []
    for ix in range(6):
        for iz in range(5):
            p = np.array([2.0 * ix - 5.0, 3.0, 2.0 * iz - 4.0])
            d = np.array([0.2 * (ix - 2.5), -1.0, 0.15 * (iz - 2.0)])
            omms.append(Ommatidium(p, d / np.linalg.norm(d), 1e-6, 0.0))
    omms_np = ommatidia_to_array(omms)
    pos = jnp.zeros(3)
    ls = jnp.eye(3)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(render_compound_means(
        dev, jnp.asarray(omms_np), pos, ls, key, 2, 2, True,
        jnp.asarray(lights),
    ))
    got = np.asarray(render_means_pallas(
        scene, dev, omms_np, pos, ls, key, 2, 2, lights=lights,
    ))
    assert ref.max() > 0.1
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_shadow_plan_chunk_invariance():
    """The lit shadow plan chunks its probe refine and per-light pack over
    the group axis (pipeline._shadow_plan / _shadow_probe) so plan-time HBM
    is bounded; the chunking must be invisible in the output — frames
    rendered under a tiny chunk (many chunks + tail padding) and a huge one
    (single chunk) must be BIT-identical.  Fresh scene objects per setting:
    the shadow plan is memoised on the scene and its key does not (and
    should not) include the chunk size."""
    import dataclasses

    import jax

    from compound_ray_tpu import config as C
    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array

    v1, f1 = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))
    v2, f2 = box_mesh((3.0, 3.0, 0.0), (4.0, 0.2, 4.0))
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])

    omms = []
    for ix in range(6):
        for iz in range(5):
            p = np.array([ix - 2.5, 2.0, iz - 2.0])
            d = np.array([0.15 * (ix - 2.5), -1.0, 0.1 * (iz - 2.0)])
            omms.append(Ommatidium(p, d / np.linalg.norm(d), 1e-6, 0.0))
    omms_np = ommatidia_to_array(omms)
    pos = jnp.zeros(3)
    ls = jnp.eye(3)
    key = jax.random.PRNGKey(11)

    base = C.get_config()
    outs = []
    try:
        for chunk in (8, 1 << 20):
            C.set_config(dataclasses.replace(base, shadow_pack_chunk=chunk))
            scene = build_scene_from_arrays(
                verts, faces, base_color=(0.4, 0.5, 0.6),
                background_shader="black")
            dev = scene.device_triangles()
            lights = default_lights(scene.aabb_min, scene.aabb_max)
            outs.append(np.asarray(render_means_pallas(
                scene, dev, omms_np, pos, ls, key, 2, 2, lights=lights,
            )))
    finally:
        C.set_config(base)
    assert outs[0].max() > 0.0
    np.testing.assert_array_equal(outs[0], outs[1])


def test_shadow_rpb_frame_invariance():
    """Lit frames must be BIT-identical for every shadow_rpb: the kernel's
    rows-per-block packing (pipeline._shadow_plan / run_rows_occlusion)
    only regroups the same occluder rows into wider MXU dots, and the
    per-group zero-row tail padding can never report a hit.  Fresh scene
    objects per setting keep the memoised shadow stores independent (rpb
    is in the plan key, but a stale eye-plan cache must not couple runs)."""
    import dataclasses

    import jax

    from compound_ray_tpu import config as C
    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array

    v1, f1 = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))
    v2, f2 = box_mesh((3.0, 3.0, 0.0), (4.0, 0.2, 4.0))
    v3, f3 = box_mesh((-4.0, 1.0, 0.0), (0.2, 4.0, 6.0))
    verts = np.concatenate([v1, v2, v3])
    faces = np.concatenate([f1, f2 + len(v1), f3 + len(v1) + len(v2)])

    omms = []
    for ix in range(6):
        for iz in range(5):
            p = np.array([ix - 2.5, 2.0, iz - 2.0])
            d = np.array([0.15 * (ix - 2.5), -1.0, 0.1 * (iz - 2.0)])
            omms.append(Ommatidium(p, d / np.linalg.norm(d), 1e-6, 0.0))
    omms_np = ommatidia_to_array(omms)
    pos = jnp.zeros(3)
    ls = jnp.eye(3)
    key = jax.random.PRNGKey(17)

    base = C.get_config()
    outs = []
    try:
        for rpb in (1, 4):
            C.set_config(dataclasses.replace(base, shadow_rpb=rpb))
            scene = build_scene_from_arrays(
                verts, faces, base_color=(0.4, 0.5, 0.6),
                background_shader="black")
            dev = scene.device_triangles()
            lights = default_lights(scene.aabb_min, scene.aabb_max)
            outs.append(np.asarray(render_means_pallas(
                scene, dev, omms_np, pos, ls, key, 2, 2, lights=lights,
            )))
    finally:
        C.set_config(base)
    assert outs[0].max() > 0.0
    np.testing.assert_array_equal(outs[0], outs[1])


def test_shadow_rpb_validation():
    """shadow_rpb values that don't divide the 64-row shard padding
    quantum must fail loudly at plan time, not mis-pack the table."""
    import dataclasses

    import jax
    import pytest

    from compound_ray_tpu import config as C
    from compound_ray_tpu.eye.pipeline import render_means_pallas
    from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array

    v1, f1 = box_mesh((0.0, -1.0, 0.0), (20.0, 0.2, 20.0))
    omms = [Ommatidium(np.array([0.0, 2.0, 0.0]),
                       np.array([0.0, -1.0, 0.0]), 1e-6, 0.0)]
    omms_np = ommatidia_to_array(omms)
    base = C.get_config()
    try:
        C.set_config(dataclasses.replace(base, shadow_rpb=3))
        scene = build_scene_from_arrays(
            v1, f1, base_color=(0.4, 0.5, 0.6), background_shader="black")
        dev = scene.device_triangles()
        lights = default_lights(scene.aabb_min, scene.aabb_max)
        with pytest.raises(ValueError, match="shadow_rpb"):
            render_means_pallas(
                scene, dev, omms_np, jnp.zeros(3), jnp.eye(3),
                jax.random.PRNGKey(0), 2, 2, lights=lights)
    finally:
        C.set_config(base)


def test_ggx_planar_matches_aos():
    """ggx_light_contrib_planar (the component-planar lit epilogue's BRDF,
    full VPU lane occupancy) must agree with ggx_light_contrib (the AoS
    form the brute-oracle path uses) to f32 rounding on random inputs —
    same maths, different layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from compound_ray_tpu.trace.lighting import (
        ggx_light_contrib,
        ggx_light_contrib_planar,
    )

    rng = np.random.default_rng(11)
    r = 4096

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    n = unit(rng.normal(size=(r, 3))).astype(np.float32)
    view = unit(rng.normal(size=(r, 3))).astype(np.float32)
    light = unit(rng.normal(size=(r, 3))).astype(np.float32)
    base = rng.uniform(0.0, 1.0, size=(r, 3)).astype(np.float32)
    metallic = rng.uniform(0.0, 1.0, size=(r,)).astype(np.float32)
    rough = rng.uniform(0.05, 1.0, size=(r,)).astype(np.float32)
    lcol = jnp.asarray([1.0, 0.9, 0.8], jnp.float32)
    lint = jnp.float32(4.0)

    contrib, facing = jax.jit(ggx_light_contrib)(
        jnp.asarray(n), jnp.asarray(view), jnp.asarray(light),
        jnp.asarray(base), jnp.asarray(metallic), jnp.asarray(rough),
        lcol, lint)
    (cr, cg, cb), facing_p = jax.jit(ggx_light_contrib_planar)(
        tuple(jnp.asarray(n[:, i]) for i in range(3)),
        tuple(jnp.asarray(view[:, i]) for i in range(3)),
        tuple(jnp.asarray(light[:, i]) for i in range(3)),
        tuple(jnp.asarray(base[:, i]) for i in range(3)),
        jnp.asarray(metallic), jnp.asarray(rough), lcol, lint)
    np.testing.assert_array_equal(np.asarray(facing), np.asarray(facing_p))
    got = np.stack([cr, cg, cb], axis=-1)
    want = np.asarray(contrib)
    m = np.asarray(facing)  # non-facing rows are discarded by callers
    # rtol 1e-3, not f32-ulp: the GGX D term alpha^2/(pi x^2) with
    # x = n_dot_h^2 (alpha^2 - 1) + 1 -> 0 near specular peaks amplifies
    # the 1-ulp dot-reduction-order difference between einsum and the
    # planar a*b+c*d+e*f form without bound (observed max 4e-4 relative
    # on 4096 random rows); both forms are within the conformance
    # tolerance of the reference maths
    np.testing.assert_allclose(got[m], want[m], rtol=1e-3, atol=2e-6)


def test_unpack_shading_cols_matches_rows():
    """unpack_shading_cols on the transposed slab must reproduce
    shading_basis_from_rows' values component-for-component."""
    import jax.numpy as jnp
    import numpy as np

    from compound_ray_tpu.trace.lighting import (
        shading_basis_from_rows,
        unpack_shading_cols,
    )

    rng = np.random.default_rng(5)
    rows = jnp.asarray(rng.normal(size=(257, 18)).astype(np.float32))
    e1, e2, n0, n1, n2, has_n, met, rgh = shading_basis_from_rows(rows)
    (e1p, e2p, n0p, n1p, n2p, has_np_, metp, rghp) = (
        unpack_shading_cols(rows.T))
    for aos, planar in ((e1, e1p), (e2, e2p), (n0, n0p), (n1, n1p),
                        (n2, n2p)):
        np.testing.assert_array_equal(
            np.asarray(aos), np.stack([np.asarray(c) for c in planar], -1))
    np.testing.assert_array_equal(np.asarray(has_n), np.asarray(has_np_))
    np.testing.assert_array_equal(np.asarray(met), np.asarray(metp))
    np.testing.assert_array_equal(np.asarray(rgh), np.asarray(rghp))
