"""Plan-cache robustness: pose-alternating sweeps must not re-pack.

VERDICT r2 weak #6: the packed/shadow stores had hard-coded sizes (2 / 1), so
a GA loop alternating 3+ poses re-ran the full cull+refine+gather every
frame.  The sizes are now config-driven (RenderConfig.packed_store_size /
shadow_store_size) and these tests pin the steady-state behaviour.
"""

import dataclasses

import jax
import numpy as np
import pytest

from compound_ray_tpu.config import RenderConfig, get_config, set_config
from compound_ray_tpu.eye import pipeline
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye


@pytest.fixture()
def small_setup():
    scene = make_big_scene(n_boxes=60, seed=3)
    scene_dev = scene.device_triangles()
    eye = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    return scene, scene_dev, eye


def _poses():
    ls = np.eye(3, dtype=np.float32)
    return [
        (np.array([0.0, 2.0, 0.0], np.float32), ls),
        (np.array([1.5, 2.0, 0.0], np.float32), ls),
        (np.array([0.0, 2.0, 1.5], np.float32), ls),
    ]


def _render_cycle(scene, scene_dev, eye, key):
    for pos, ls in _poses():
        pipeline.render_means_pallas(
            scene, scene_dev, eye, pos, ls, key, 8, 0
        )


def test_pose_alternation_no_repack(small_setup, monkeypatch):
    """Cycling 3 poses twice packs exactly 3 times (cycle 2 = cache hits)."""
    scene, scene_dev, eye = small_setup
    calls = []
    orig = pipeline._pack_fused

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pipeline, "_pack_fused", counting)
    key = jax.random.PRNGKey(0)
    _render_cycle(scene, scene_dev, eye, key)
    assert len(calls) == 3
    _render_cycle(scene, scene_dev, eye, key)
    assert len(calls) == 3, "second pose cycle must be served from packed_store"


def test_packed_store_size_is_config_driven(small_setup, monkeypatch):
    """Shrinking packed_store_size below the pose count forces re-packs."""
    scene, scene_dev, eye = small_setup
    base = get_config()
    set_config(dataclasses.replace(base, packed_store_size=2))
    try:
        calls = []
        orig = pipeline._pack_fused

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(pipeline, "_pack_fused", counting)
        key = jax.random.PRNGKey(0)
        _render_cycle(scene, scene_dev, eye, key)
        _render_cycle(scene, scene_dev, eye, key)
        assert len(calls) > 3, "a 2-entry store cannot hold a 3-pose cycle"
    finally:
        set_config(base)


def _sweep_means(scene, eye, key, samples=8):
    scene_dev = scene.device_triangles()
    return [
        np.asarray(pipeline.render_means_pallas(
            scene, scene_dev, eye, pos, ls, key, samples, 0))
        for pos, ls in _poses()
    ]


def test_speculative_widths_bit_identical():
    """The speculative pack (high-water widths + need-check) must give the
    same bits as the exact two-dispatch width measure on every pose of a
    sweep — it only removes planning round trips."""
    eye = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    key = jax.random.PRNGKey(2)
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=True))
    try:
        spec = _sweep_means(make_big_scene(n_boxes=60, seed=3), eye, key)
    finally:
        set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        exact = _sweep_means(make_big_scene(n_boxes=60, seed=3), eye, key)
    finally:
        set_config(base)
    for a, b in zip(spec, exact):
        np.testing.assert_array_equal(a, b)


def test_speculative_skips_width_measure(small_setup, monkeypatch):
    """After the first measured pose, unseen poses whose needs fit the
    high-water widths must not run the two-dispatch width measure."""
    scene, scene_dev, eye = small_setup
    key = jax.random.PRNGKey(0)
    pos0, ls = _poses()[0]
    pipeline.render_means_pallas(scene, scene_dev, eye, pos0, ls, key, 8, 0)

    calls = []
    orig = pipeline._plan_widths

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pipeline, "_plan_widths", counting)
    # a NEARBY pose: needs fit the measured high-water widths
    near = pos0 + np.float32([0.05, 0.0, 0.0])
    pipeline.render_means_pallas(scene, scene_dev, eye, near, ls, key, 8, 0)
    assert calls == [], "nearby unseen pose must take the speculative path"


def test_speculative_overflow_falls_back(small_setup, monkeypatch):
    """Force tiny high-water hints: the speculative pack truncates, the
    need check catches it, and the exact measure re-plans — output must
    equal a clean exact render."""
    scene, scene_dev, eye = small_setup
    key = jax.random.PRNGKey(0)
    pos, ls = _poses()[0]
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        want = np.asarray(pipeline.render_means_pallas(
            scene, scene_dev, eye, pos, ls, key, 8, 0))
    finally:
        set_config(base)

    scene2 = make_big_scene(n_boxes=60, seed=3)
    eplan = pipeline.eye_plan(eye, 8)
    splan2 = pipeline.scene_plan(scene2)
    splan2.kmax_cache[("hints", eplan.sig)] = (8, 1)  # far too small

    calls = []
    orig = pipeline._plan_widths

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pipeline, "_plan_widths", counting)
    got = np.asarray(pipeline.render_means_pallas(
        scene2, scene2.device_triangles(), eye, pos, ls, key, 8, 0))
    assert calls, "overflow must fall back to the exact width measure"
    np.testing.assert_array_equal(want, got)


def _sweep_raw(scene, eye, key, samples=8):
    scene_dev = scene.device_triangles()
    return [
        np.asarray(pipeline.render_samples_pallas(
            scene, scene_dev, eye, pos, ls, key, samples, 0))
        for pos, ls in _poses()
    ]


def test_speculative_raw_samples_bit_identical():
    """render_samples_pallas rides the same deferred speculative planning
    as the means path (minimumSampleRateFinder sweeps render a new pose
    every frame); results must match the exact measure bit-for-bit."""
    eye = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    key = jax.random.PRNGKey(2)
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=True))
    try:
        spec = _sweep_raw(make_big_scene(n_boxes=60, seed=3), eye, key)
    finally:
        set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        exact = _sweep_raw(make_big_scene(n_boxes=60, seed=3), eye, key)
    finally:
        set_config(base)
    for a, b in zip(spec, exact):
        np.testing.assert_array_equal(a, b)


def test_speculative_raw_overflow_falls_back(small_setup, monkeypatch):
    """Truncating speculative pack on the raw path must re-plan exactly and
    re-render — output equal to a clean exact render."""
    scene, scene_dev, eye = small_setup
    key = jax.random.PRNGKey(0)
    pos, ls = _poses()[0]
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        want = np.asarray(pipeline.render_samples_pallas(
            scene, scene_dev, eye, pos, ls, key, 8, 0))
    finally:
        set_config(base)

    scene2 = make_big_scene(n_boxes=60, seed=3)
    eplan = pipeline.eye_plan(eye, 8)
    splan2 = pipeline.scene_plan(scene2)
    splan2.kmax_cache[("hints", eplan.sig)] = (8, 1)  # far too small

    calls = []
    orig = pipeline._plan_widths

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pipeline, "_plan_widths", counting)
    got = np.asarray(pipeline.render_samples_pallas(
        scene2, scene2.device_triangles(), eye, pos, ls, key, 8, 0))
    assert calls, "overflow must fall back to the exact width measure"
    np.testing.assert_array_equal(want, got)


def test_cull_sigmas_change_invalidates_plan(small_setup):
    """A cull-width change at a seen pose must not serve stale payloads
    (ADVICE r2: cache keys omitted cfg.cull_sigmas)."""
    scene, scene_dev, eye = small_setup
    key = jax.random.PRNGKey(1)
    pos, ls = _poses()[0]
    pipeline.render_means_pallas(scene, scene_dev, eye, pos, ls, key, 8, 0)
    n_before = len(scene._kernel_plan.packed_store)
    base = get_config()
    set_config(dataclasses.replace(base, cull_sigmas=2.0))
    try:
        pipeline.render_means_pallas(scene, scene_dev, eye, pos, ls, key, 8, 0)
        assert len(scene._kernel_plan.packed_store) == n_before + 1, (
            "sigma change must create a NEW packed entry, not reuse the old"
        )
    finally:
        set_config(base)
