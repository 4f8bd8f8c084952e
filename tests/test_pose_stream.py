"""Deferred speculative-plan confirms at the renderer level.

Round-4 VERDICT #4: a fresh pose paid TWO tunnel round trips (the
speculative-pack width check synced inside render_means_pallas, then the
frame sync) plus a full per-pose sync in any pose sweep.  The renderer now
collects the width check as a pending confirm and resolves it inside the
frame's own sync transfer (api.renderer._sync_one), and an UNSYNCED pose
stream (render_frame(sync=False) per pose + one terminal sync()) resolves
every outstanding confirm in one fetch — the per-pose analogue of the
pipelined headline protocol.  These tests pin:
  * stream == synced results (same RNG keys => bit-identical frames)
  * overflow replay: a truncated speculative pack at the latest pose is
    re-rendered exactly inside the sync
  * same-pose revisit with an in-flight confirm resolves first (no
    duplicate speculative packs of one pose)
"""

import dataclasses

import numpy as np

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.config import RenderConfig, get_config, set_config
from compound_ray_tpu.eye import pipeline
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye


def _renderer(samples=8):
    r = EyeRenderer(verbose=False)
    r.scene = make_big_scene(n_boxes=60, seed=3)
    cam = CompoundEyeCamera("eye", "single_dimension_fast",
                            make_sphere_eye(64, acceptance_deg=4.0))
    r.scene.cameras.append(cam)
    r.set_render_size(64, 1)
    r.require_noncompound_pipeline = False  # means-only (no projection)
    # the 8-virtual-device CPU test env would route to the sharded path;
    # the deferred-confirm machinery under test is the single-chip
    # pallas pipeline
    r._backend = "pallas"
    cam.set_samples_per_ommatidium(samples)
    return r


def _poses(n, seed=0):
    rng = np.random.default_rng(seed)
    return [(0.0, 2.0, 0.0)] + [
        tuple(np.float64([0.0, 2.0, 0.0]) + rng.uniform(-0.5, 0.5, 3))
        for _ in range(n - 1)
    ]


def test_pose_stream_matches_synced():
    """sync=False per pose + terminal sync() must produce the same final
    frame as the synced per-pose loop (same keys, same plans)."""
    poses = _poses(4)

    r1 = _renderer()
    cam = r1.current_camera()
    for p in poses:
        cam.set_position(p)
        r1.render_frame()  # synced every pose
    want = r1.get_camera_data().copy()

    r2 = _renderer()
    cam = r2.current_camera()
    for p in poses:
        cam.set_position(p)
        r2.render_frame(sync=False)
    r2.sync()
    assert not r2._plan_confirms, "terminal sync must resolve every confirm"
    got = r2.get_camera_data()
    np.testing.assert_array_equal(want, got)


def test_stream_overflow_replays_latest_pose():
    """Force tiny high-water hints so the stream's speculative packs
    truncate: the terminal sync must replay the LATEST pose exactly and
    match a clean exact render; earlier (overwritten) frames just stay
    uncommitted."""
    poses = _poses(3, seed=1)

    # exact reference for the last pose
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        rx = _renderer()
        cam = rx.current_camera()
        for p in poses:
            cam.set_position(p)
            rx.render_frame()
        want = rx.get_camera_data().copy()
    finally:
        set_config(base)

    r = _renderer()
    cam = r.current_camera()
    # seed ABSURDLY small high-water hints so every speculative pack
    # truncates (the hint key is scene-scoped)
    eye = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    eplan = pipeline.eye_plan(eye, 8)
    splan = pipeline.scene_plan(r.scene)
    splan.kmax_cache[("hints", eplan.sig)] = (8, 1)
    for p in poses:
        cam.set_position(p)
        r.render_frame(sync=False)
    r.sync()
    got = r.get_camera_data()
    np.testing.assert_array_equal(want, got)


def test_synced_fresh_pose_overflow_replays():
    """The synced path folds the width check into the frame sync; an
    overflow must re-render before render_frame returns control to a
    caller that reads camera data."""
    base = get_config()
    set_config(dataclasses.replace(base, speculative_widths=False))
    try:
        rx = _renderer()
        rx.current_camera().set_position((0.2, 2.1, 0.3))
        rx.render_frame()
        want = rx.get_camera_data().copy()
    finally:
        set_config(base)

    r = _renderer()
    eye = ommatidia_to_array(make_sphere_eye(64, acceptance_deg=4.0))
    eplan = pipeline.eye_plan(eye, 8)
    splan = pipeline.scene_plan(r.scene)
    splan.kmax_cache[("hints", eplan.sig)] = (8, 1)
    r.current_camera().set_position((0.2, 2.1, 0.3))
    r.render_frame()
    np.testing.assert_array_equal(want, r.get_camera_data())


def test_same_pose_revisit_resolves_inflight_confirm(monkeypatch):
    """An unsynced dispatch leaves its width check in flight; re-rendering
    the SAME pose must resolve it first (committing the memo) so the
    revisit is served from the packed store instead of re-packing."""
    r = _renderer()
    cam = r.current_camera()
    cam.set_position((0.1, 2.0, 0.1))
    r.render_frame()  # seeds the high-water hints (exact measure)

    calls = []
    orig = pipeline._pack_fused

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pipeline, "_pack_fused", counting)
    cam.set_position((0.15, 2.0, 0.1))  # fresh pose -> speculative pack
    r.render_frame(sync=False)
    assert len(calls) == 1 and len(r._plan_confirms) == 1
    r.render_frame(sync=False)  # same pose again, confirm still in flight
    assert len(calls) == 1, (
        "revisit must resolve the in-flight confirm and hit the store")
    r.sync()
