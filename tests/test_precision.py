"""Intersection-matmul precision knob (trace/mm_tracer PRECISION).

"default" (one bf16 MXU pass) is a TPU-only approximation adopted by the
tools/tpu_session.py precision A/B under a conformance gate; on CPU the
interpreted kernel computes exact f32 either way, so these tests pin the
PLUMBING (static-arg threading, env/tuning precedence) — the accuracy
contract itself is measured on hardware (reference exactness analog:
OptiX traversal is always full f32, shaders.cu __intersection__ built-in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.eye import pipeline as P
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye


def _kernel_inputs(samples=640, seed=3):
    scene = make_big_scene(n_boxes=60, seed=5)
    splan = P.scene_plan(scene)
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    eplan = P.eye_plan(omms_np, samples)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, samples, b"prec-test"))
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


@pytest.mark.parametrize("emit", ["bary", "uvs"])
def test_packed_tracer_precision_plumbing(emit):
    """precision="default" must thread through to a runnable kernel whose
    output matches "highest" to the mode's documented tolerance.  The CPU
    interpreter emulates the approximate reciprocal (measured median
    ~1.5e-3 relative t error — the same order as the bf16 matmul on
    hardware), so this pins the accuracy CONTRACT, not bit-identity:
    identical hit/miss mask and t within 1e-2 relative on this
    well-separated test scene."""
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    eplan, rc, pmm, rays, rmax = _kernel_inputs()

    def run(prec):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit=emit, precision=prec))

    base = run("highest")
    assert np.isfinite(base[0]).any(), "test must produce real hits"
    # None resolves the ADOPTED module default — "highest" until a TPU
    # batch adopts another mode into artifacts/tuning.json (f32x1 since
    # round-4 session 18), after which test processes legitimately import
    # that default.  The contract is None == PRECISION, not None ==
    # "highest".
    from compound_ray_tpu.trace import mm_tracer as mm
    np.testing.assert_array_equal(run(mm.PRECISION), run(None))
    fast = run("default")
    hit_b, hit_f = np.isfinite(base[0]), np.isfinite(fast[0])
    np.testing.assert_array_equal(hit_b, hit_f)
    t_b, t_f = base[0][hit_b], fast[0][hit_b]
    rel = np.abs(t_b - t_f) / np.maximum(np.abs(t_b), 1e-6)
    assert float(rel.max()) < 1e-2, f"t rel err {rel.max():.2e}"


@pytest.mark.parametrize("emit", ["bary", "uvs"])
def test_packed_tracer_f32x1_matches_highest(emit):
    """"f32x1" (one stacked-K dot over mask-split operands — f32-class
    ~2^-20 product error at one MXU pass, mm_tracer._stack6_a) must
    reproduce HIGHEST's hit/miss decisions exactly on this well-separated
    scene and match t to f32-rounding tolerance.  Unlike "default" it
    keeps the exact divide, so the only deviation is the dropped
    sub-2^-20 product terms; the mask splits are explicit ops, so CPU
    interpret mode exercises the real stacked numerics."""
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    eplan, rc, pmm, rays, rmax = _kernel_inputs()

    def run(prec):
        return np.asarray(run_packed_tracer(
            rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax, emit=emit, precision=prec))

    base = run("highest")
    assert np.isfinite(base[0]).any(), "test must produce real hits"
    acc = run("f32x1")
    hit_b, hit_a = np.isfinite(base[0]), np.isfinite(acc[0])
    np.testing.assert_array_equal(hit_b, hit_a)
    t_b, t_a = base[0][hit_b], acc[0][hit_b]
    rel = np.abs(t_b - t_a) / np.maximum(np.abs(t_b), 1e-6)
    assert float(rel.max()) < 1e-4, f"t rel err {rel.max():.2e}"
    # winner attributes must agree wherever the winning slot agrees
    # (guards the metadata rows 8:16 staying un-split)
    np.testing.assert_allclose(base[1:], acc[1:], rtol=1e-4, atol=1e-5)


def test_f32x1_no_scratch_fallback_matches():
    """rmax above mm_tracer._F32X1_SCRATCH_ROWS disables the stacked-split
    VMEM scratch (a 76-row conformance scene blew the 16 MB scoped-vmem
    limit on hardware) and splits in-loop instead.  Padding the payload
    with dead rows past the cap must not change a single output bit —
    rows beyond row_counts are never read, and the in-loop split computes
    the same ops as the prologue."""
    from compound_ray_tpu.trace import mm_tracer as mm
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    eplan, rc, pmm, rays, rmax = _kernel_inputs()
    assert rmax <= mm._F32X1_SCRATCH_ROWS, "scene grew; pick a smaller one"
    fat = mm._F32X1_SCRATCH_ROWS + 4
    pmm_fat = jnp.concatenate(
        [pmm, jnp.zeros(
            (pmm.shape[0], fat - rmax) + pmm.shape[2:], jnp.float32)],
        axis=1)

    def run(p, r):
        return np.asarray(run_packed_tracer(
            rc, p, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=r, emit="uvs", precision="f32x1"))

    base = run(pmm, rmax)        # scratch-prologue path
    fallback = run(pmm_fat, fat)  # in-loop split path
    assert np.isfinite(base[0]).any()
    np.testing.assert_array_equal(base, fallback)


def test_default_precision_precedence(monkeypatch):
    """Env override > tuning.json > "highest"; invalid values fail loudly
    (env) or fall back (tuning file — it is machine-written)."""
    import compound_ray_tpu.trace.mm_tracer as mm

    monkeypatch.delenv("CR_TPU_PRECISION", raising=False)
    monkeypatch.setattr(
        "compound_ray_tpu.trace.mm_tracer.load_tuning", lambda: {})
    assert mm._default_precision() == "highest"
    monkeypatch.setattr(
        "compound_ray_tpu.trace.mm_tracer.load_tuning",
        lambda: {"precision": "default"})
    assert mm._default_precision() == "default"
    monkeypatch.setattr(
        "compound_ray_tpu.trace.mm_tracer.load_tuning",
        lambda: {"precision": "bogus"})
    assert mm._default_precision() == "highest"
    monkeypatch.setenv("CR_TPU_PRECISION", "HIGHEST")
    assert mm._default_precision() == "highest"
    monkeypatch.setenv("CR_TPU_PRECISION", "default")
    assert mm._default_precision() == "default"
    monkeypatch.setenv("CR_TPU_PRECISION", "high")
    with pytest.raises(AssertionError):
        mm._default_precision()


def test_scene_precision_resolution(monkeypatch):
    """Per-scene precision (pipeline._scene_precision): tuning's
    precision_by_scene entry for the scene's geometry hash wins over the
    module default for UNLIT frames; an explicit CR_TPU_PRECISION env var
    makes it stand down (env governs everything); invalid/missing values
    fall back to None (module default)."""
    monkeypatch.delenv("CR_TPU_PRECISION", raising=False)
    monkeypatch.setattr(
        "compound_ray_tpu.eye.pipeline.load_tuning", lambda: {})
    assert P._scene_precision("abc") is None
    monkeypatch.setattr(
        "compound_ray_tpu.eye.pipeline.load_tuning",
        lambda: {"precision_by_scene": {"abc": "default"}})
    assert P._scene_precision("abc") == "default"
    assert P._scene_precision("other") is None
    monkeypatch.setattr(
        "compound_ray_tpu.eye.pipeline.load_tuning",
        lambda: {"precision_by_scene": {"abc": "bogus"}})
    assert P._scene_precision("abc") is None
    monkeypatch.setenv("CR_TPU_PRECISION", "highest")
    monkeypatch.setattr(
        "compound_ray_tpu.eye.pipeline.load_tuning",
        lambda: {"precision_by_scene": {"abc": "default"}})
    assert P._scene_precision("abc") is None  # env stands it down


def test_scene_precision_threads_into_plan(monkeypatch):
    """scene_plan stamps the per-scene mode and _plan_frame serves it to
    unlit frames only (the gate's evidence is the unlit conformance set)."""
    monkeypatch.delenv("CR_TPU_PRECISION", raising=False)
    scene = make_big_scene(n_boxes=60, seed=5)
    sig = P.scene_sig(scene)
    monkeypatch.setattr(
        "compound_ray_tpu.eye.pipeline.load_tuning",
        lambda: {"precision_by_scene": {sig: "default"}})
    splan = P.scene_plan(scene)
    assert splan.precision == "default"
    omms_np = ommatidia_to_array(make_sphere_eye(16, acceptance_deg=4.0))
    pos = np.asarray([0.0, 2.0, 0.0], np.float32)
    ls = np.eye(3, dtype=np.float32)
    kwargs, _, _ = P._plan_frame(
        scene, scene.device_triangles(), omms_np, pos, ls,
        jax.random.PRNGKey(0), 64, 0, None)
    assert kwargs["precision"] == "default"
    lights = np.zeros((1, 7), np.float32)
    lights[0, 3] = 1.0
    lights[0, 4:7] = (0.0, 5.0, 0.0)
    kwargs_lit, _, _ = P._plan_frame(
        scene, scene.device_triangles(), omms_np, pos, ls,
        jax.random.PRNGKey(0), 64, 0, lights)
    assert kwargs_lit["precision"] is None  # lit frames keep the default
    # the unlit frame actually runs under the threaded mode
    out = P._render_frame(key=jax.random.PRNGKey(0), **kwargs)
    assert np.isfinite(np.asarray(out)).all()
