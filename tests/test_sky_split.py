"""Sky split (eye/pipeline SKY SPLIT notes): zero-row groups served their
pose-memoised far-field-cache expectation while live groups compact.

The split is statistically interchangeable with the dense path but not
bit-identical (live groups draw different RNG rows; sky groups lose their
sampling noise), so these tests pin (a) the quadrature against a
Monte-Carlo mean, (b) end-to-end agreement with the dense path within
sample noise, (c) the sky groups' values against a high-sample dense
render (the estimator's own limit), and (d) the config gates.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compound_ray_tpu import config as cr_config
from compound_ray_tpu.eye import pipeline as P
from compound_ray_tpu.eye.pipeline import render_means_pallas
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye


def _clear_plans(scene):
    if hasattr(scene, "_kernel_plan"):
        for store in ("kmax_cache", "cache_store", "packed_store",
                      "shadow_store", "sky_store"):
            getattr(scene._kernel_plan, store).clear()
    P._eye_plans.clear()


def _setup():
    # 200 boxes -> 32 clusters (the farfield gate needs > 8) with 16 far
    # at this pose; 15/64 groups cull to zero rows, so the split engages
    scene = make_big_scene(n_boxes=200, seed=11)
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    return scene, dev, omms_np, pos, ls


def _cfg(**kw):
    return dataclasses.replace(
        cr_config.RenderConfig(),
        farfield="auto", farfield_cache_width=64, **kw)


def test_sky_expectation_matches_monte_carlo():
    """The quantile-midpoint quadrature must agree with a high-S MC mean of
    the same cache lookups (same sampling distribution, same bilinear
    path) to well under the 1% conformance budget."""
    from compound_ray_tpu.eye.sampling import (
        cone_offset_components,
        sample_angles_ns,
    )
    from compound_ray_tpu.trace.shade import quad_bilinear_c

    rng = np.random.default_rng(3)
    h, w = 32, 64
    # a smooth random cache image (RGB: build_equirect_quads appends alpha)
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for c, f in enumerate(((1, 2), (3, 1), (2, 3))):
        img[:, :, c] = 0.5 + 0.3 * np.sin(2 * np.pi * f[0] * yy / h) \
            * np.cos(2 * np.pi * f[1] * xx / w)
    from compound_ray_tpu.eye.pipeline import build_equirect_quads

    cache = build_equirect_quads(jnp.asarray(img))  # (h, w, 16)

    omms = np.zeros((8, 8), np.float32)
    d = rng.normal(size=(8, 3))
    omms[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    omms[:, 6] = np.deg2rad([2, 4, 8, 15, 2, 4, 8, 15])
    omms_p = jnp.asarray(omms)
    ls = jnp.eye(3, dtype=jnp.float32)

    exp = np.asarray(P._sky_expectation(
        cache, omms_p, ls, nq_splay=16, nq_spin=8,
        cache_shape=(h, w), row_offset=0))

    # Monte-Carlo with the production sampler at high S
    s = 50_000
    splay, spin = sample_angles_ns(
        jax.random.PRNGKey(0), omms_p[:, 6] / P.FWHM_SD_RATIO, s)
    ax, ay, az = omms_p[:, 3:4], omms_p[:, 4:5], omms_p[:, 5:6]
    rdx, rdy, rdz = cone_offset_components(ax, ay, az, splay, spin)
    inv = jax.lax.rsqrt(jnp.maximum(rdx**2 + rdy**2 + rdz**2, 1e-60))
    idx, fx, fy = P._equirect_coords_c(
        h, w, (rdx * inv).reshape(-1), (rdy * inv).reshape(-1),
        (rdz * inv).reshape(-1))
    r, g, b = quad_bilinear_c(cache.reshape(-1, 16)[idx], fx, fy)
    mc = np.stack([np.asarray(c).reshape(8, s).mean(axis=1)
                   for c in (r, g, b)], axis=-1)
    err = np.abs(exp - mc)
    # this image is adversarially high-frequency for a 15-degree cone (the
    # real 1024-wide cache under a 2.6-degree acceptance is far smoother):
    # tight bar on the narrow omms, looser on the wide ones
    narrow = omms[:, 6] < np.deg2rad(5)
    assert err[narrow].max() < 5e-3, err[narrow].max()
    assert err.max() < 3e-2, err.max()


def test_sky_split_end_to_end_matches_dense():
    scene, dev, omms_np, pos, ls = _setup()
    key = jax.random.PRNGKey(7)
    s = 128  # 64 omms x 128 samples = 8192 >= cache_px 64*32
    try:
        cr_config.set_config(_cfg(sky_split=False))
        _clear_plans(scene)
        dense = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, s, 3))
        # converged reference for the sky groups' limit value
        dense_hi = np.asarray(render_means_pallas(
            scene, dev, omms_np, pos, ls, jax.random.PRNGKey(8), 1024, 3))

        cr_config.set_config(_cfg(sky_split=True))
        _clear_plans(scene)
        split = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, s, 3))
        split2 = np.asarray(render_means_pallas(
            scene, dev, omms_np, pos, ls, jax.random.PRNGKey(9), s, 3))

        splan = P.scene_plan(scene)
        plans = [v for v in splan.sky_store.values() if v is not None]
        assert plans, "the split must have engaged on this scene/pose"
        scatter = np.asarray(plans[0][3])
        eplan = P.eye_plan(omms_np, s)
        ng = eplan.ng
        live_perm = np.unique(scatter[scatter < ng])
        sky_perm = np.setdiff1d(np.arange(ng), live_perm)
        assert sky_perm.size > 0
        # permuted group j (g == 1) is original ommatidium perm[j]
        sky_orig = eplan.perm[sky_perm]
        live_orig = eplan.perm[live_perm]
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        _clear_plans(scene)

    assert np.isfinite(split).all()
    # whole-frame agreement within sample noise at 128 samples
    assert np.abs(split - dense).mean() < 0.02, np.abs(split - dense).mean()
    # sky groups: the expectation must match the high-sample dense mean
    # (MC error ~ sd/sqrt(1024)) much tighter than the frame tolerance
    sky_err = np.abs(split[sky_orig] - dense_hi[sky_orig])
    assert sky_err.max() < 0.03, sky_err.max()
    # sky values are deterministic across frames; live groups keep noise
    assert np.array_equal(split[sky_orig], split2[sky_orig])
    assert np.abs(split[live_orig] - dense[live_orig]).mean() < 0.05


def test_sky_split_burst_matches_sequential():
    """With the split active, the scanned/stacked frame bursts must stay
    bit-identical to sequential single frames (same keys, same compacted
    plan, same scatter)."""
    from compound_ray_tpu.eye.pipeline import render_means_pallas_frames

    scene, dev, omms_np, pos, ls = _setup()
    keys = jnp.stack([jax.random.PRNGKey(i) for i in (3, 4, 5)])
    s = 128
    try:
        cr_config.set_config(_cfg(sky_split=True))
        _clear_plans(scene)
        seq = np.stack([
            np.asarray(render_means_pallas(
                scene, dev, omms_np, pos, ls, keys[i], s, 3))
            for i in range(3)
        ])
        burst = np.asarray(render_means_pallas_frames(
            scene, dev, omms_np, pos, ls, keys, s, 3))
        assert P.scene_plan(scene).sky_store  # the split was active
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        _clear_plans(scene)
    np.testing.assert_array_equal(seq, burst)


def test_sky_split_supersedes_dense_pack(monkeypatch):
    """Memory contract (the round-4 conformance-gate OOM): once a sky
    plan exists for a pose, the dense packed payload is evicted and
    steady-state frames short-circuit dense planning entirely — the pose
    holds ONLY the compacted plan."""
    scene, dev, omms_np, pos, ls = _setup()
    try:
        cr_config.set_config(_cfg(sky_split=True))
        _clear_plans(scene)
        render_means_pallas(scene, dev, omms_np, pos, ls,
                            jax.random.PRNGKey(1), 128, 3)
        splan = P.scene_plan(scene)
        assert any(v is not None for v in splan.sky_store.values())
        assert len(splan.packed_store) == 0  # dense pack evicted
        calls = []
        orig = P._plan_widths_pack

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(P, "_plan_widths_pack", counting)
        out = np.asarray(render_means_pallas(
            scene, dev, omms_np, pos, ls, jax.random.PRNGKey(2), 128, 3))
        assert not calls  # steady state short-circuits dense planning
        assert np.isfinite(out).all()
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        _clear_plans(scene)


def test_sky_split_gates():
    scene, dev, omms_np, pos, ls = _setup()
    key = jax.random.PRNGKey(7)
    try:
        # farfield off -> no cache -> split must not engage
        cr_config.set_config(dataclasses.replace(
            cr_config.RenderConfig(), farfield="off", sky_split=True))
        _clear_plans(scene)
        out = np.asarray(
            render_means_pallas(scene, dev, omms_np, pos, ls, key, 128, 3))
        assert np.isfinite(out).all()
        assert not P.scene_plan(scene).sky_store
    finally:
        cr_config.set_config(cr_config.RenderConfig())
        _clear_plans(scene)
