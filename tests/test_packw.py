"""packw (packed-winner) kernel variant tests — mm_tracer module PACKW
notes.  packw carries the winner as two packed int32 buffers (key =
t-bits | row, uv = 16+16-bit fixed point of the WRAPPED texture
coordinates) instead of the uvs emit's three f32 buffers, attacking the
measured 1.46 us/step winner-select register cost (docs/performance.md
"Per-step kernel dissection").  It is NOT bit-identical — t truncates 4
mantissa bits (2^-19 relative) and cu/cv wrap + quantize (1/65535) — so
these tests pin the ERROR ENVELOPE and the wrap equivalence rather than
equality, mirroring the precision-mode contract (adoption on hardware is
same-seed-conformance-gated by tools/tpu_session.py run_packw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import (
    make_big_scene,
    make_sphere_eye,
    make_textured_quad_scene,
)


def _kernel_io(scene, samples=640, seed=3):
    """Shared payload/ray builder (test_pallas_tracer unroll-test shape:
    rb_size 768 = 3 ray batches, exercising super-steps and tails)."""
    from compound_ray_tpu.eye import pipeline as P

    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    eplan = P.eye_plan(omms_np, samples)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"packw-test"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    sd = omms_p[:, 6] / P.FWHM_SD_RATIO
    splay = jax.random.normal(k1, (omms_p.shape[0], samples)) * sd[:, None]
    spin = jax.random.uniform(k2, (omms_p.shape[0], samples)) * jnp.pi
    rays, _, _ = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=samples,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)
    return eplan, rc, pmm, rays, rmax


def _wrapped(c, mode):
    """Reference wrap normalisation: the kernel's _prewrap followed by the
    finalize dequantization scale (mirror stores half-scale, dequants x2 —
    the value the epilogue actually receives is the mod-2 coordinate)."""
    if mode == 1:
        return np.clip(c, 0.0, 1.0)
    if mode == 2:
        return c - np.floor(c * 0.5) * 2.0
    return c - np.floor(c)


def _circular_err(a, b, mode):
    """|a-b| in wrapped space; repeat/mirror are periodic at span 1."""
    d = np.abs(a - b)
    if mode == 1:
        return d
    return np.minimum(d, 1.0 - d)


@pytest.mark.parametrize("precision", [None, "f32x1"])
def test_packw_matches_standard_uvs(precision):
    """packw's (t, cu, cv) must match the standard uvs kernel within the
    documented envelope: identical hit masks, t within the 4-bit mantissa
    truncation, cu/cv within the 16-bit fixed-point quantum after wrap
    normalisation.  Exact-t ties (shared box edges) may legitimately pick
    a different winner under the packed key order — bounded here to a
    tiny fraction of rays."""
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    scene = make_big_scene(n_boxes=60, seed=5)
    eplan, rc, pmm, rays, rmax = _kernel_io(scene)

    def run(pw):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit="uvs",
            precision=precision,
            packw=pw, packw_wrap=(0, 0)))

    base = run(False)
    got = run(True)
    hit_b = np.isfinite(base[0])
    hit_g = np.isfinite(got[0])
    assert hit_b.any() and (~hit_b).any()
    np.testing.assert_array_equal(hit_b, hit_g)
    tb, tg = base[0][hit_b], got[0][hit_b]
    # t truncation: t_packw in (t*(1 - 2^-19), t] for t > 0
    assert (tg <= tb + 1e-30).all()
    np.testing.assert_allclose(tg, tb, rtol=2 ** -18)
    # the variant must have ENGAGED: real t values have nonzero low
    # mantissa bits almost surely, so truncation strictly reduces some
    assert (tg < tb).any(), "packw did not engage (outputs bit-equal)"
    # winners agree wherever t is not within the truncation quantum of a
    # tie; allow the tie flips but bound them
    cu_b = _wrapped(base[1][hit_b], 0)
    cv_b = _wrapped(base[2][hit_b], 0)
    eu = _circular_err(got[1][hit_b], cu_b, 0)
    ev = _circular_err(got[2][hit_b], cv_b, 0)
    tol = 1.5 / 65535.0  # quantization + wrap rounding
    mismatch = (eu > tol) | (ev > tol)
    assert mismatch.mean() < 1e-3, (
        f"{mismatch.sum()} of {mismatch.size} winners differ beyond the "
        f"quantization envelope")


def test_packw_fallback_paths_are_standard():
    """Out-of-envelope calls (no wrap modes, fat rmax, non-uvs emit) must
    fall back to the standard kernel bit-for-bit even with packw=True."""
    import compound_ray_tpu.trace.mm_tracer as mm

    scene = make_big_scene(n_boxes=60, seed=5)
    eplan, rc, pmm, rays, rmax = _kernel_io(scene)

    def run(**kw):
        return np.asarray(mm.run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, **kw))

    base_uvs = run(emit="uvs", packw=False)
    # no packw_wrap -> standard
    np.testing.assert_array_equal(base_uvs, run(emit="uvs", packw=True))
    # non-uvs emit -> standard
    base_bary = run(emit="bary", packw=False)
    np.testing.assert_array_equal(
        base_bary, run(emit="bary", packw=True, packw_wrap=(0, 0)))
    # fat rmax -> standard (shrink the envelope under the test payload)
    old = mm._PACKW_MAX_ROWS
    try:
        mm._PACKW_MAX_ROWS = 0
        np.testing.assert_array_equal(
            base_uvs, run(emit="uvs", packw=True, packw_wrap=(0, 0)))
    finally:
        mm._PACKW_MAX_ROWS = old


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_prewrap_equivalent_to_epilogue_addressing(mode):
    """The kernel-side pre-wrap must be equivalent under the epilogue's
    texel-space addressing (texture_quad_coords_single): same texel index
    and same bilinear fraction for coordinates across the wrap range.
    This is the claim that lets packw emit wrapped coordinates — the
    epilogue's wrap has period w and is idempotent on wrapped inputs."""
    from compound_ray_tpu.trace.shade import texture_quad_coords_single

    w = h = 16
    rng = np.random.default_rng(7)
    c = np.concatenate([
        rng.uniform(-3.0, 4.0, 4096),
        np.array([0.0, 1.0, -1.0, 2.0, 0.999999, 1.000001, -0.000001]),
    ]).astype(np.float32)
    cw = _wrapped(c, mode).astype(np.float32)
    zeros = np.zeros_like(c)
    for filt in (0, 1):
        idx_a, fx_a, _ = texture_quad_coords_single(
            jnp.asarray(c), jnp.asarray(zeros), 0, w, h, mode, mode, filt)
        idx_b, fx_b, _ = texture_quad_coords_single(
            jnp.asarray(cw), jnp.asarray(zeros), 0, w, h, mode, mode, filt)
        idx_a, idx_b = np.asarray(idx_a), np.asarray(idx_b)
        fx_a, fx_b = np.asarray(fx_a), np.asarray(fx_b)
        # clamp collapses out-of-range coordinates onto the edge texel,
        # where the bilinear fraction is irrelevant (both neighbours are
        # the same texel) — compare fractions only where they matter
        in_range = (c >= 0.0) & (c <= 1.0) if mode == 1 else \
            np.ones_like(c, bool)
        # float rounding at a texel boundary may shift the base texel by
        # one with fx flipping 0 <-> 1 (the same sample point) — require
        # exact texel+fraction agreement for all but a boundary sliver
        same = (idx_a == idx_b) & (np.abs(fx_a - fx_b) < 2e-3)
        frac = 1.0 - same[in_range].mean()
        assert frac < 5e-3, (mode, filt, frac)


def test_packw_end_to_end_frame():
    """Full-frame render of the single-texture quad scene with packw
    forced on vs off: per-ommatidium means must agree to well under a u8
    LSB, and the packw path must actually engage (emit=uvs scene)."""
    import compound_ray_tpu.trace.mm_tracer as mm
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.eye.pipeline import render_means_pallas

    scene = make_textured_quad_scene(8)
    splan = P.scene_plan(scene)
    assert splan.tex_static is not None, "scene must take the uvs path"
    dev = scene.device_triangles()
    omms_np = ommatidia_to_array(make_sphere_eye(32, acceptance_deg=6.0))
    pos = jnp.asarray([0.0, 3.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(11)

    def render():
        return np.asarray(render_means_pallas(
            scene, dev, omms_np, pos, ls, key, 256, 1))

    old = mm.PACKW
    try:
        mm.PACKW = False
        base = render()
        mm.PACKW = True
        jax.clear_caches()
        got = render()
    finally:
        mm.PACKW = old
        jax.clear_caches()
    assert np.isfinite(base).all()
    err = np.abs(got - base).max()
    assert err < 2e-3, f"packw frame deviates {err} (> half a u8 LSB)"
