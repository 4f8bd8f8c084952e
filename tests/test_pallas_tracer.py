"""Pallas fused tracer vs the XLA oracle (interpret mode on CPU)."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.eye.pipeline import render_means_pallas
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_box_scene, make_sphere_eye
from compound_ray_tpu.trace.shade import miss_id


def _setup(scene, n_omms=24, acceptance=1e-5, pos=(0.0, 1.5, 0.0)):
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(n_omms, acceptance_deg=acceptance))
    return (
        dev,
        omms_np,
        jnp.asarray(pos, jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
    )


def test_pallas_matches_oracle_deterministic_eye():
    # acceptance ~ 0: every sample looks straight down the axis, so RNG
    # differences between paths vanish and results must match closely
    scene = make_box_scene(background="simple_sky")
    dev, omms_np, pos, ls = _setup(scene)
    key = jax.random.PRNGKey(0)
    bg = miss_id(scene.background_shader)
    got = np.asarray(
        render_means_pallas(scene, dev, omms_np, pos, ls, key, 4, bg)
    )
    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 4, bg)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_big_scene_deterministic_eye():
    scene = make_big_scene(n_boxes=120, seed=4)
    dev, omms_np, pos, ls = _setup(scene, n_omms=40, pos=(3.0, 2.0, -5.0))
    key = jax.random.PRNGKey(1)
    bg = miss_id(scene.background_shader)
    got = np.asarray(
        render_means_pallas(scene, dev, omms_np, pos, ls, key, 2, bg)
    )
    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 2, bg)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_jittered_statistics():
    # real cone jitter: different RNG streams, so compare loosely via many
    # samples on smooth geometry
    scene = make_box_scene(background="white")
    dev, omms_np, pos, ls = _setup(scene, acceptance=4.0, pos=(0.0, 50.0, 0.0))
    key = jax.random.PRNGKey(2)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls, key, 64, 1))
    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 64, 1)
    )
    # high above the scene: upward omms see pure white in both
    up = omms_np[:, 4] > 0.3
    np.testing.assert_allclose(got[up], 1.0, atol=1e-6)
    np.testing.assert_allclose(ref[up], 1.0, atol=1e-6)
    # downward omms: statistical agreement
    np.testing.assert_allclose(got.mean(), ref.mean(), atol=0.05)


def test_pallas_occlusion_front_to_back():
    # a red box directly in front of a distant blue pillar: ordering must
    # keep the true nearest hit. Ommatidium looks down +x.
    from compound_ray_tpu.scene.eye_io import Ommatidium
    from compound_ray_tpu.scene.flat import build_scene_from_arrays
    from compound_ray_tpu.testing import box_mesh

    vs, fs, cs_ = [], [], []
    off = 0
    for center, color in [((5.0, 0, 0), (1.0, 0, 0)), ((20.0, 0, 0), (0, 0, 1.0))]:
        v, f = box_mesh(center, (1.0, 4.0, 4.0))
        vs.append(v)
        fs.append(f + off)
        cs_.append(np.tile(np.array([*color, 1.0], np.float32), (len(v), 1)))
        off += len(v)
    scene = build_scene_from_arrays(
        np.concatenate(vs), np.concatenate(fs),
        vertex_colors=np.concatenate(cs_), background_shader="black",
    )
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(
        [Ommatidium(np.zeros(3), np.array([1.0, 0, 0]), 1e-6, 0.0)] * 8
    )
    got = np.asarray(
        render_means_pallas(
            scene, dev, omms_np, jnp.zeros(3, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jax.random.PRNGKey(0), 2, 2,
        )
    )
    # must be the near red box (linearized vertex colour), not blue
    np.testing.assert_allclose(got[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(got[:, 2], 0.0, atol=1e-5)


def test_pallas_renderer_api_backend():
    import os

    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import CompoundEyeCamera

    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene(background="white")
    r.scene.cameras.append(
        CompoundEyeCamera("eye", "single_dimension_fast",
                          make_sphere_eye(16, acceptance_deg=1e-5))
    )
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    r.current_camera().set_position((0.0, 100.0, 0.0))
    r._backend = "pallas"
    r.render_frame()
    d_pallas = r.get_camera_data().copy()
    r._backend = "xla"
    r.current_camera().rng_frame = 0  # rewind the RNG stream
    r._camera_data = None
    r.render_frame()
    d_xla = r.get_camera_data()
    np.testing.assert_allclose(d_pallas, d_xla, atol=2e-4)


def test_pallas_raw_samples():
    from compound_ray_tpu.eye.pipeline import render_samples_pallas
    from compound_ray_tpu.eye.render import render_compound_samples

    scene = make_box_scene(background="simple_sky")
    dev, omms_np, pos, ls = _setup(scene, n_omms=16)
    key = jax.random.PRNGKey(3)
    bg = miss_id(scene.background_shader)
    got = np.asarray(
        render_samples_pallas(scene, dev, omms_np, pos, ls, key, 4, bg)
    )
    assert got.shape == (4, 16, 3)
    ref = np.asarray(
        render_compound_samples(dev, jnp.asarray(omms_np), pos, ls, key, 4, bg)
    )
    # deterministic eye: per-sample values match across backends
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_renderer_raw_projection_uses_fast_path():
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import CompoundEyeCamera

    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene(background="white")
    r.scene.cameras.append(
        CompoundEyeCamera("eye", "raw_ommatidial_samples",
                          make_sphere_eye(16, acceptance_deg=1e-5))
    )
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    r.current_camera().set_position((0.0, 100.0, 0.0))
    r.set_current_eye_samples_per_ommatidium(3)
    r.set_render_size(16, 3)
    r.render_frame()
    frame = r.get_frame_pointer()
    assert frame.shape == (3, 16, 4)
    up = r.current_camera().ommatidia[:, 4] > 0.3
    # white miss -> 255 after gamma for sky-facing ommatidia, all samples
    assert (frame[:, up, :3] == 255).all()


def test_farfield_cache_fidelity():
    """Hybrid far-field cache vs direct trace: bounded error on means."""
    import dataclasses

    from compound_ray_tpu import config as cr_config

    scene = make_big_scene(n_boxes=60, seed=11)
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    s = 64  # 64 omms x 64 samples = 4096 rays

    base = cr_config.RenderConfig(farfield="off")
    cr_config.set_config(base)
    try:
        direct = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, s, 3)
        )
        hybrid_cfg = dataclasses.replace(
            base, farfield="auto", farfield_cache_width=128,
        )
        # force the gate: tiny cache so samples*n >= 2*cache_px
        cr_config.set_config(hybrid_cfg)
        from compound_ray_tpu.eye import pipeline as P

        if hasattr(scene, "_kernel_plan"):
            scene._kernel_plan.kmax_cache.clear()
            scene._kernel_plan.cache_store.clear()
        hybrid = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, s, 3)
        )
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        if hasattr(scene, "_kernel_plan"):
            scene._kernel_plan.kmax_cache.clear()
            scene._kernel_plan.cache_store.clear()
    # same RNG stream -> same rays; differences come only from far-field
    # cache resolution + parallax, bounded well under the 1% budget
    err = np.abs(hybrid - direct).mean()
    assert err < 0.02, err
    assert np.isfinite(hybrid).all()


def test_tex_only_kernel_matches_oracle():
    """Fully-textured scene uses the trimmed payload kernel; results must
    match the brute-force textured oracle."""
    from compound_ray_tpu.eye.pipeline import scene_plan
    from compound_ray_tpu.scene.eye_io import Ommatidium
    from compound_ray_tpu.testing import make_textured_quad_scene

    scene = make_textured_quad_scene()
    assert scene.has_any_texture
    plan = scene_plan(scene)
    assert plan.tex_only
    dev = scene.device_triangles()
    # deterministic downward-looking ommatidia above different checker cells
    omms = []
    for x in (-5.0, -2.0, 1.0, 4.0):
        omms.append(Ommatidium(np.array([x / 10.0, 0.0, 0.02]),
                               np.array([0.0, -1.0, 0.0]), 1e-6, 0.0))
    omms_np = ommatidia_to_array(omms * 4)  # 16 omms
    pos = jnp.asarray([0.0, 5.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls, key, 2, 2))
    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 2, 2)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)
    assert got.max() > 0.3  # actually sampled the checker


def test_big_texture_4gather_matches_quad_path():
    """The big-texture fallback (four texel gathers,
    texture_bilinear4_single) must reproduce the quad-table path exactly —
    same wrap, same filter, same texel weights."""
    import jax

    from compound_ray_tpu.trace.shade import (
        build_quad_table,
        quad_bilinear_c,
        texture_bilinear4_single,
        texture_quad_coords_single,
    )

    rng = np.random.default_rng(5)
    w, h = 64, 32
    tex = rng.random((h * w, 4)).astype(np.float32)
    scene = {
        "tex_data": jnp.asarray(tex),
        "tex_offset": np.array([0], np.int32),
        "tex_width": np.array([w], np.int32),
        "tex_height": np.array([h], np.int32),
        "tex_wrap_s": np.array([0], np.int32),
        "tex_wrap_t": np.array([1], np.int32),
    }
    quads = build_quad_table(scene)
    for filt in (0, 1):
        ts = (0, w, h, 0, 1, filt)
        cu = jnp.asarray(rng.uniform(-0.3, 1.3, 500), jnp.float32)
        cv = jnp.asarray(rng.uniform(-0.3, 1.3, 500), jnp.float32)
        idx, fx, fy = texture_quad_coords_single(cu, cv, *ts)
        ref = quad_bilinear_c(quads[idx], fx, fy)
        got = texture_bilinear4_single(scene["tex_data"], cu, cv, *ts)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_multi_texture_atlas_all_backends():
    """Per-ray texture ids select the right atlas rows in the naive path,
    the Pallas epilogue, AND the unified texture+cache gather."""
    import dataclasses

    from compound_ray_tpu import config as cr_config
    from compound_ray_tpu.scene.eye_io import Ommatidium
    from compound_ray_tpu.testing import make_two_texture_scene

    scene = make_two_texture_scene()
    dev = scene.device_triangles()
    omms = []
    for x in (-10.0, 10.0):  # one omm over each quad
        omms.append(Ommatidium(np.array([x / 100.0, 0.0, 0.0]),
                               np.array([0.0, -1.0, 0.0]), 1e-6, 0.0))
    omms_np = ommatidia_to_array(omms * 8)  # 16 omms alternating
    pos = jnp.asarray([0.0, 5.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    ref = np.asarray(
        render_compound_means(dev, jnp.asarray(omms_np), pos, ls, key, 2, 2)
    )
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls, key, 2, 2))
    np.testing.assert_allclose(got, ref, atol=2e-4)
    left = omms_np[:, 0] < 0
    red = np.broadcast_to([1.0, 0.0, 0.0], got[left].shape)
    blue = np.broadcast_to([0.0, 0.0, 1.0], got[~left].shape)
    np.testing.assert_allclose(got[left], red, atol=1e-4)    # red tex
    np.testing.assert_allclose(got[~left], blue, atol=1e-4)  # blue tex

    # force the unified texture+cache gather (tiny cache, low gate)
    base = cr_config.RenderConfig(farfield="auto", farfield_cache_width=128,
                                  farfield_tolerance=5.0)
    cr_config.set_config(base)
    try:
        if hasattr(scene, "_kernel_plan"):
            scene._kernel_plan.kmax_cache.clear()
            scene._kernel_plan.cache_store.clear()
        # need samples*n >= cache px (8192): 16 omms * 512 samples
        got2 = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, 512, 2)
        )
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        if hasattr(scene, "_kernel_plan"):
            scene._kernel_plan.kmax_cache.clear()
            scene._kernel_plan.cache_store.clear()
    np.testing.assert_allclose(got2[left], red, atol=1e-3)
    np.testing.assert_allclose(got2[~left], blue, atol=1e-3)


@pytest.mark.parametrize("emit", ["bary", "uv", "uvs", "flat"])
def test_packed_tracer_unroll_bit_identical(emit):
    """Batch-unrolled kernels (unroll_b > 1) must be bit-identical to the
    single-chain kernel: chains touch disjoint ray batches, so the winner
    sequences are unchanged.  nb=3 batches exercises super-steps AND the
    static single-chain tail at ub=2."""
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    samples = 640  # g=1, rg=640 -> rb_size 768 = 3 ray batches of 256
    eplan = P.eye_plan(omms_np, samples)
    assert eplan.rb_size // 256 == 3
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"unroll-test"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)

    def run(ub):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit=emit, unroll_b=ub))

    base = run(1)
    assert np.isfinite(base[0]).any(), "test must produce real hits"
    for ub in (2, 3):
        np.testing.assert_array_equal(base, run(ub))


@pytest.mark.parametrize("emit", ["bary", "uv", "uvs", "flat"])
def test_packed_tracer_direct1_bit_identical(emit):
    """The cnt == 1 SSA fast path (mm_tracer._make_packed_kernel direct1)
    must be bit-identical to the standard loop: identical candidate
    algebra, winner order, and miss-ray init values.  The plan must mix
    cnt == 1 groups (which take the new branch) with cnt > 1 groups and
    empty groups (which must keep standard behavior) for the contract to
    mean anything — asserted below.  The tools/tpu_session.py direct1
    A/B adopts on speed alone on the strength of this test."""
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    # 20 deg acceptance: the 16-omm plan mixes empty, 1-row and 2-row
    # groups (asserted below) so every branch of the kernel executes
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=20.0))
    samples = 640
    eplan = P.eye_plan(omms_np, samples)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"direct1-test"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)
    rc_np = np.asarray(rc)
    assert (rc_np == 1).any(), "plan must exercise the direct branch"
    assert (rc_np > 1).any(), "plan must exercise the loop fallback"
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)

    def run(d1, ub=1, precision=None):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit=emit, unroll_b=ub,
            direct1=d1, precision=precision))

    base = run(False)
    assert np.isfinite(base[0]).any(), "test must produce real hits"
    assert (~np.isfinite(base[0])).any(), "test must produce miss rays"
    np.testing.assert_array_equal(base, run(True))
    # unrolled chains and the f32x1 stacked-split prologue share the
    # direct branch -- pin those shapes too
    np.testing.assert_array_equal(base, run(True, ub=2))
    np.testing.assert_array_equal(
        run(False, precision="f32x1"), run(True, precision="f32x1"))


def test_packed_tracer_direct1_affine_bit_identical():
    """direct1 under the affine ray path (ray_feats=8, origin folded into
    the payload): same bit-identity contract as the planar path."""
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    samples = 640
    eplan = P.eye_plan(omms_np, samples)
    assert eplan.g == 1, "affine path needs one omm per group"
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls,
        (eplan.sig, samples, b"direct1-affine"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl, affine=True)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size,
        affine=True)
    assert rays.shape[0] == 8

    def run(d1):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit="uv",
            ray_feats=8, direct1=d1))

    base = run(False)
    assert np.isfinite(base[0]).any(), "test must produce real hits"
    np.testing.assert_array_equal(base, run(True))


def test_packed_tracer_batch_rays_bit_identical(monkeypatch):
    """BATCH_RAYS only regroups rays into in-kernel step sizes (rb_size
    rounds up to it, so plans differ); every REAL ray's winner sequence is
    unchanged, so its outputs must be bit-identical across batch sizes —
    the contract that lets tools/tpu_session.py's batch_rays A/B adopt on
    speed alone.  Padded tail rays differ between layouts and are sliced
    off before comparing (the epilogue discards them the same way)."""
    import compound_ray_tpu.trace.mm_tracer as mm
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    scene = make_big_scene(n_boxes=60, seed=5)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    samples = 640  # rs=256 -> rb_size 768 (3 steps); rs=512 -> 1024 (2)
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)

    def _ceil(x, m):
        return -(-x // m) * m

    def run(rs):
        monkeypatch.setattr(mm, "BATCH_RAYS", rs)
        monkeypatch.setattr(P, "MM_BATCH_RAYS", rs)
        P._eye_plans.clear()  # plan keys exclude rb_size
        splan = P.scene_plan(scene)
        eplan = P.eye_plan(omms_np, samples)
        assert eplan.rb_size == _ceil(640, rs)
        omms_p = jnp.asarray(omms_np[eplan.perm])
        kcand, rmax = P._plan_widths(
            splan, eplan, omms_p, pos, ls,
            (eplan.sig, samples, b"batch-rays-test"))
        rc, pmm, _, _ = P._pack_fused(
            splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
            splan.half_center, splan.half_radius, omms_p, pos, ls,
            g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
            tri_cl=splan.slot_tri_cl)
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        sd = omms_p[:, 6] / P.FWHM_SD_RATIO
        splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
        spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
        rays, _, _ = P._gen_ray_features(
            omms_p, pos, ls, splay, spin, samples=samples,
            ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)
        out = np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit="bary"))
        # keep only real rays: planar (8, NG*rb_size), group-major
        rg = eplan.g * samples
        return out.reshape(out.shape[0], eplan.ng, eplan.rb_size)[:, :, :rg]

    try:
        base = run(256)
        assert np.isfinite(base[0]).any(), "test must produce real hits"
        np.testing.assert_array_equal(base, run(512))
    finally:
        P._eye_plans.clear()  # stale rs-keyed plans must not leak out


def test_occlusion_block_bit_identical():
    """run_rows_occlusion any-hit output must be identical for every
    (unroll_b, rows-per-block) combination: ub chains cover disjoint ray
    batches, and rpb only repacks rows into wider blocks whose all-zero
    tail-padding rows (den == 0) can never pass the d > 0 guard."""
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_rows_occlusion

    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    samples = 640  # rb_size 768 = 3 ray batches
    eplan = P.eye_plan(omms_np, samples)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"occl-unroll"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)
    rc_np = np.asarray(rc)
    pmm_np = np.asarray(pmm)
    assert int(rc_np.sum()) >= 3, "need a non-trivial row table"

    def build(rpb):
        rows, r2v, flag = [], [], []
        for g in range(eplan.ng):
            c = int(rc_np[g])
            if not c:
                continue
            grows = [pmm_np[g, j] for j in range(c)]
            while len(grows) % rpb:  # per-group zero-row tail padding
                grows.append(np.zeros_like(grows[0]))
            nb = len(grows) // rpb
            rows += grows
            r2v += [g] * nb
            flag += [2] + [1] * (nb - 1)
        while (len(rows) // rpb) % 4:  # dead tail blocks exercise flag 0
            rows += [np.zeros_like(rows[0])] * rpb
            r2v.append(r2v[-1])
            flag.append(0)
        flat = (np.stack(rows).reshape(-1, rpb, 16, 512)
                .transpose(0, 2, 1, 3).reshape(-1, 16, rpb * 512))
        return (jnp.asarray(flat), jnp.asarray(np.asarray(r2v, np.int32)),
                jnp.asarray(np.asarray(flag, np.int32)))

    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)
    # unit directions make t = 1 land one world unit out; scale the
    # direction-linear feature rows (d and o x d) so the any-hit window
    # covers the whole scene and the test sees both outcomes
    rays = rays.at[0:6, :].multiply(50.0)

    live = np.repeat(rc_np > 0, eplan.rb_size)  # mask uninitialised groups

    def run(ub, rpb, rs=None):
        flat, r2v, flag = build(rpb)
        out = np.asarray(run_rows_occlusion(
            r2v, flag, flat, rays, nrb=eplan.nrb, rb_size=eplan.rb_size,
            unroll_b=ub, batch_rays=rs))
        return out[0, live]

    base = run(1, 1)
    assert set(np.unique(base)) <= {0.0, 1.0}
    assert base.sum() > 0, "test must produce real occlusions"
    assert (base == 0.0).any(), "test must leave some rays clear"
    for ub, rpb in ((2, 1), (3, 1), (1, 2), (1, 4), (2, 4)):
        np.testing.assert_array_equal(base, run(ub, rpb))
    # shadow-only batch width: batches partition the rays, so every rs
    # dividing rb_size (768 here) is bit-identical — the knob the
    # tpu_session "shadow_rs" stage A/Bs (no winner state -> no register
    # cliff, unlike the primary kernel's BATCH_RAYS)
    for rs in (128, 384, 768):
        np.testing.assert_array_equal(base, run(1, 1, rs))
    np.testing.assert_array_equal(base, run(2, 4, 384))
    with pytest.raises(AssertionError, match="multiple"):
        run(1, 1, 512)  # 512 does not divide 768
    with pytest.raises(AssertionError, match="multiple of 128"):
        run(1, 1, 96)

@pytest.mark.parametrize("precision", ["bf16x3", "f32x1"])
def test_occlusion_lossy_precision_matches_highest(precision):
    """The reduced-pass occlusion precisions ("bf16x3": three one-pass
    hi/lo-split dots, ~1.5e-5 relative product error; "f32x1": ONE
    stacked-K dot over mask-split operands, ~2^-20 — see
    mm_tracer._stack6_a) must reproduce the HIGHEST any-hit decisions
    exactly on geometry whose decision margins dominate those errors (the
    flip set is confined to rays grazing within ~1e-5 of a triangle edge
    / the t window ends).  The casts/mask-splits are explicit in the
    kernel, so CPU interpret mode exercises the real split numerics, not
    an f32 shortcut."""
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_rows_occlusion

    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    samples = 640
    eplan = P.eye_plan(omms_np, samples)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"occl-bf16x3"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)
    rc_np = np.asarray(rc)
    pmm_np = np.asarray(pmm)

    rows, r2v, flag = [], [], []
    for g in range(eplan.ng):
        c = int(rc_np[g])
        if not c:
            continue
        rows += [pmm_np[g, j] for j in range(c)]
        r2v += [g] * c
        flag += [2] + [1] * (c - 1)
    while len(rows) % 4:
        rows.append(np.zeros_like(rows[0]))
        r2v.append(r2v[-1])
        flag.append(0)
    flat = jnp.asarray(np.stack(rows))
    r2v = jnp.asarray(np.asarray(r2v, np.int32))
    flag = jnp.asarray(np.asarray(flag, np.int32))

    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)
    rays = rays.at[0:6, :].multiply(50.0)
    live = np.repeat(rc_np > 0, eplan.rb_size)

    def run(precision):
        out = np.asarray(run_rows_occlusion(
            r2v, flag, flat, rays, nrb=eplan.nrb, rb_size=eplan.rb_size,
            unroll_b=1, precision=precision))
        return out[0, live]

    base = run("highest")
    assert base.sum() > 0 and (base == 0.0).any()
    np.testing.assert_array_equal(base, run(precision))


def test_split3_exact_reconstruction():
    """mm_tracer._split3: x == h + m + l EXACTLY, with h and m
    bf16-representable (so the MXU's DEFAULT operand rounding is a no-op
    on them) — the foundation of the f32x1 stacked-K mode.  Uses the
    mask-based truncation precisely because astype round-trips are
    foldable by XLA's allow-excess-precision pass (measured on hardware,
    tools/microbench_k.py)."""
    from compound_ray_tpu.trace import mm_tracer as mm

    rng = np.random.default_rng(7)
    # residuals sit ~2^-16 below the value, so keep |x| above ~1e-33:
    # backends flush subnormal residuals to zero (measured: a 1.2e-38
    # input lost its 6e-41 residual to FTZ), which is harmless for
    # geometry (decision scales are >> 1e-33) but breaks exactness here
    x = np.concatenate([
        (rng.standard_normal(4096)
         * 10.0 ** rng.uniform(-25, 25, 4096)).astype(np.float32),
        np.asarray([0.0, -0.0, 1.0, -1.0, 3.0e38], np.float32),
    ])
    h, m, l = jax.jit(mm._split3)(jnp.asarray(x))
    h, m, l = np.asarray(h), np.asarray(m), np.asarray(l)
    np.testing.assert_array_equal(h + m + l, x)  # exact split
    for part in (h, m):
        bits = part.view(np.uint32)
        assert (bits & np.uint32(0xFFFF) == 0).all(), (
            "h/m must be bf16-representable (low mantissa bits clear)")


def test_shadow_precision_validation():
    """bf16x3 is shadow-only: run_rows_occlusion accepts it, the primary
    tracer's precision map does not contain it, and the env plumbing
    rejects unknown values."""
    import compound_ray_tpu.trace.mm_tracer as mm

    assert "bf16x3" in mm._SHADOW_PRECISIONS
    assert "bf16x3" not in mm._PRECISIONS
    assert "bf16x3" not in mm._PREC_MAP
    old = os.environ.get("CR_TPU_SHADOW_PRECISION")
    try:
        os.environ["CR_TPU_SHADOW_PRECISION"] = "bf16x3"
        assert mm._default_shadow_precision() == "bf16x3"
        os.environ["CR_TPU_SHADOW_PRECISION"] = "fast"
        with pytest.raises(AssertionError, match="SHADOW_PRECISION"):
            mm._default_shadow_precision()
    finally:
        if old is None:
            os.environ.pop("CR_TPU_SHADOW_PRECISION", None)
        else:
            os.environ["CR_TPU_SHADOW_PRECISION"] = old
