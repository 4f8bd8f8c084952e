"""Affine ray factorisation (trace/mm_tracer.transform_payload_affine).

Every 16-feature ray row is affine in the unit direction d when the origin
is constant per group (g == 1), so the origin can be pre-folded into the
pose-memoised payload and the hot path traces [d, 1] rays.  Numerically
equivalent (one extra pack-time f32 rounding), not bit-identical — these
tests pin the algebra, the end-to-end frame agreement, and the g > 1 /
lighting gating."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu import config as C
from compound_ray_tpu.eye import pipeline as P
from compound_ray_tpu.eye.pipeline import render_means_pallas
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye
from compound_ray_tpu.trace.mm_tracer import (
    pack_rays_affine,
    pack_rays_mm,
    run_packed_tracer,
    transform_payload_affine,
)
from compound_ray_tpu.trace.shade import miss_id


@pytest.fixture
def cfg_guard():
    base = C.get_config()
    yield base
    C.set_config(base)


def _affine_cfg(on: bool):
    C.set_config(dataclasses.replace(C.RenderConfig(), affine_rays=on))


def test_transform_algebra_matches_full_features():
    # structure-agnostic: for ANY payload P and rays F = [d, m, -o', 1, 0x6]
    # with a shared per-group origin, F.P == [d,1,0..] . (B^T P) up to f32
    # rounding, and the metadata rows 8:16 are preserved byte-for-byte
    rng = np.random.default_rng(0)
    ng, rmax, r = 3, 2, 64
    pm = jnp.asarray(rng.normal(size=(ng, rmax, 16, 512)).astype(np.float32))
    o_g = jnp.asarray(rng.normal(size=(ng, 3)).astype(np.float32) * 5.0)
    tmin = jnp.asarray(rng.uniform(0.0, 0.3, size=(ng,)).astype(np.float32))
    q = transform_payload_affine(pm, o_g, tmin)
    assert q.shape == pm.shape
    np.testing.assert_array_equal(np.asarray(q[:, :, 8:16]),
                                  np.asarray(pm[:, :, 8:16]))
    d = rng.normal(size=(ng, r, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    for g in range(ng):
        origins = jnp.broadcast_to(o_g[g], (r, 3))
        tmins = jnp.full((r,), tmin[g])
        f16 = pack_rays_mm(d[g], origins, tmins)  # (16, r)
        f8 = pack_rays_affine(d[g])  # (8, r)
        for j in range(rmax):
            full = np.asarray(f16.T @ pm[g, j])  # (r, 512)
            aff = np.asarray(f8.T @ q[g, j, 0:8])
            # rows 10:15 of F are zero, so payload metadata rows never
            # contribute; the affine fold rounds (ec + ed x o) once in f32
            scale = np.abs(full).max() + 1.0
            np.testing.assert_allclose(aff, full, atol=3e-5 * scale)


def _setup_scene(n_omms=48):
    scene = make_big_scene(n_boxes=120, seed=4)
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(n_omms, acceptance_deg=2.6))
    pos = jnp.asarray((3.0, 2.0, -5.0), jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    return scene, dev, omms_np, pos, ls


def test_affine_frame_matches_standard(cfg_guard):
    scene, dev, omms_np, pos, ls = _setup_scene()
    key = jax.random.PRNGKey(3)
    bg = miss_id(scene.background_shader)
    assert P.eye_plan(omms_np, 128).g == 1  # the affine path really runs
    _affine_cfg(False)
    ref = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg))
    _affine_cfg(True)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg))
    # same RNG stream, same winners up to f32 rounding at triangle edges:
    # means must agree to well under the 1% fidelity budget
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert np.abs(got - ref).mean() < 2e-5


def test_affine_raw_samples_match(cfg_guard):
    from compound_ray_tpu.eye.pipeline import render_samples_pallas

    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=24)
    key = jax.random.PRNGKey(5)
    bg = miss_id(scene.background_shader)
    _affine_cfg(False)
    assert P.eye_plan(omms_np, 128).g == 1
    ref = np.asarray(render_samples_pallas(scene, dev, omms_np, pos, ls,
                                           key, 128, bg))
    _affine_cfg(True)
    got = np.asarray(render_samples_pallas(scene, dev, omms_np, pos, ls,
                                           key, 128, bg))
    # per-sample: identical rays, so any disagreement is a winner flip at
    # a shared-edge/grazing ray — allow a tiny fraction
    same = np.isclose(got, ref, atol=2e-3).mean()
    assert same > 0.999, f"per-sample agreement {same}"


def test_affine_kernel_direct_vs_full(cfg_guard):
    """run_packed_tracer(ray_feats=8) on the transformed payload agrees
    with the 16-feature kernel on the plain payload for the same rays."""
    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=32)
    samples = 128
    splan = P.scene_plan(scene)
    eplan = P.eye_plan(omms_np, samples)
    assert eplan.g == 1
    omms_p = jnp.asarray(omms_np[eplan.perm])
    cfg = C.get_config()
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"affine-test"))
    packs = {}
    for affine in (False, True):
        rc, pmm, _, _ = P._pack_fused(
            splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
            splan.half_center, splan.half_radius, omms_p, pos, ls,
            g=eplan.g, kcand=kcand, rmax=rmax,
            cull_sigmas=cfg.cull_sigmas, tri_cl=splan.slot_tri_cl,
            affine=affine)
        packs[affine] = (rc, pmm)
    np.testing.assert_array_equal(np.asarray(packs[False][0]),
                                  np.asarray(packs[True][0]))
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    outs = {}
    for affine in (False, True):
        rays, _, _ = P._gen_ray_features(
            omms_p, pos, ls, splay, spin, samples=samples,
            ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size,
            affine=affine)
        assert rays.shape[0] == (8 if affine else 16)
        outs[affine] = np.asarray(run_packed_tracer(
            packs[affine][0], packs[affine][1], rays,
            ng=eplan.ng, nrb=eplan.nrb, rb_size=eplan.rb_size, rmax=rmax,
            emit="bary", ray_feats=(8 if affine else 16)))
    t0, t1 = outs[False][0], outs[True][0]
    hit0, hit1 = t0 < 1e30, t1 < 1e30
    both = hit0 & hit1
    assert (hit0 == hit1).mean() > 0.999
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-4)
    # winner slot ids match wherever both hit the same surface
    slot_match = (outs[False][3][both] == outs[True][3][both]).mean()
    assert slot_match > 0.995


def test_affine_gated_off_for_grouped_eyes(cfg_guard):
    """samples small enough that g > 1: the flag must fall back to the
    16-feature path bit-identically (same program, same results)."""
    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=24)
    eplan = P.eye_plan(omms_np, 1)
    assume_grouped = eplan.g > 1
    key = jax.random.PRNGKey(11)
    bg = miss_id(scene.background_shader)
    _affine_cfg(False)
    ref = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 1, bg))
    _affine_cfg(True)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 1, bg))
    if assume_grouped:
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_affine_sharded_matches_dense(cfg_guard):
    """The origin fold is per group and groups shard whole over "omm", so
    the sharded affine frame must match the dense affine frame on the same
    angle set (same contract as the 16-feature sharded path)."""
    from compound_ray_tpu.parallel.sharding import (
        make_eye_mesh,
        render_means_sharded_packed,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=32)
    key = jax.random.PRNGKey(13)
    bg = miss_id(scene.background_shader)
    _affine_cfg(True)
    dense = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                           key, 128, bg))
    mesh = make_eye_mesh(4, sample_parallel=2)
    sharded = np.asarray(render_means_sharded_packed(
        scene, dev, omms_np, pos, ls, key, 128, bg, mesh))
    np.testing.assert_allclose(sharded, dense, atol=2e-5)


def test_affine_lit_frame_matches(cfg_guard):
    """Lit frames ride affine too: the primary trace and the shadow-plan
    probe use the folded payload; shadow rays keep 16-feature payloads."""
    from compound_ray_tpu.trace.lighting import default_lights

    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=24)
    lights = default_lights(scene.aabb_min, scene.aabb_max)
    key = jax.random.PRNGKey(17)
    bg = miss_id(scene.background_shader)
    assert P.eye_plan(omms_np, 128).g == 1
    _affine_cfg(False)
    ref = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg, lights=lights))
    _affine_cfg(True)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg, lights=lights))
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert np.abs(got - ref).mean() < 5e-5


def test_affine_textured_uvs_emit(cfg_guard):
    """The bench scenes trace emit="uvs" (single-texture tex_only): the
    texture-coordinate affine constants live in the metadata rows the fold
    preserves byte-for-byte, so the textured frame must agree too — this is
    the exact (emit, affine) combination the TPU A/B measures."""
    from compound_ray_tpu.testing import make_textured_quad_scene

    scene = make_textured_quad_scene(16)
    dev = scene.device_triangles()
    splan = P.scene_plan(scene)
    assert splan.tex_only and splan.tex_static is not None  # emit == "uvs"
    omms_np = ommatidia_to_array(make_sphere_eye(24, acceptance_deg=2.6))
    pos = jnp.asarray((0.0, 2.0, 0.0), jnp.float32)
    ls = jnp.asarray([[1, 0, 0], [0, -1, 0], [0, 0, 1]], jnp.float32)
    key = jax.random.PRNGKey(19)
    bg = miss_id(scene.background_shader)
    assert P.eye_plan(omms_np, 128).g == 1
    _affine_cfg(False)
    ref = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg))
    _affine_cfg(True)
    got = np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                         key, 128, bg))
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert np.abs(got - ref).mean() < 5e-5


def test_affine_stacked_burst_bit_identical(cfg_guard):
    """Stacked frame bursts (F*S on one sample axis) under affine must stay
    bit-identical to sequential affine frames — same kernel, same draws."""
    from compound_ray_tpu.eye.pipeline import render_means_pallas_frames

    scene, dev, omms_np, pos, ls = _setup_scene(n_omms=24)
    bg = miss_id(scene.background_shader)
    key = jax.random.PRNGKey(23)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(2))
    _affine_cfg(True)
    seq = np.stack([
        np.asarray(render_means_pallas(scene, dev, omms_np, pos, ls,
                                       k, 128, bg)) for k in keys
    ])
    burst = np.asarray(render_means_pallas_frames(
        scene, dev, omms_np, pos, ls, keys, 128, bg))
    np.testing.assert_array_equal(burst, seq)
