"""render_frames_pipelined's one-dispatch scanned burst must be
bit-identical to n sequential render_frame calls (same per-frame keys,
same plan) — the burst only removes the per-dispatch transport latency."""

import numpy as np

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.testing import make_box_scene, make_sphere_eye


def _renderer(backend: str, lighting: bool = False) -> EyeRenderer:
    r = EyeRenderer(verbose=False)
    r.scene = make_box_scene()
    cam = CompoundEyeCamera("eye", "spherical_positionwise", make_sphere_eye(64))
    cam.set_samples_per_ommatidium(7)
    r.scene.cameras.append(cam)
    r.goto_camera(len(r.scene.cameras) - 1)
    r._backend = backend
    if lighting:
        from compound_ray_tpu.trace.lighting import default_lights

        r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
        r.set_lighting(True)
    return r


def test_scanned_burst_matches_sequential_frames():
    seq = _renderer("pallas")
    assert seq._scan_frames_ok()
    for _ in range(3):
        seq.render_frame()
    d_seq = np.asarray(seq.get_camera_data())

    burst = _renderer("pallas")
    burst.render_frames_pipelined(3)
    d_burst = np.asarray(burst.get_camera_data())
    np.testing.assert_array_equal(d_seq, d_burst)
    assert (burst.current_camera().rng_frame
            == seq.current_camera().rng_frame == 3)


def test_scanned_burst_matches_sequential_lit():
    seq = _renderer("pallas", lighting=True)
    for _ in range(2):
        seq.render_frame()
    d_seq = np.asarray(seq.get_camera_data())

    burst = _renderer("pallas", lighting=True)
    burst.render_frames_pipelined(2)
    np.testing.assert_array_equal(d_seq, np.asarray(burst.get_camera_data()))


def test_burst_then_sequential_keeps_rng_stream():
    # frame keys keep advancing across the burst: burst(2) + 1 sequential
    # frame == 3 sequential frames
    seq = _renderer("pallas")
    for _ in range(3):
        seq.render_frame()
    d_seq = np.asarray(seq.get_camera_data())

    mixed = _renderer("pallas")
    mixed.render_frames_pipelined(2)
    mixed.render_frame()
    np.testing.assert_array_equal(d_seq, np.asarray(mixed.get_camera_data()))


def test_stacked_burst_matches_scanned():
    # small bursts route through _render_frames_stacked (one kernel call,
    # frames on the sample axis); forcing the scan must give the same bits
    from compound_ray_tpu.eye import pipeline

    stacked = _renderer("pallas")
    stacked.render_frames_pipelined(3)
    d_stacked = np.asarray(stacked.get_camera_data())

    orig = pipeline.STACK_BURST_MAX_SAMPLES
    pipeline.STACK_BURST_MAX_SAMPLES = 0
    try:
        scanned = _renderer("pallas")
        scanned.render_frames_pipelined(3)
        d_scanned = np.asarray(scanned.get_camera_data())
    finally:
        pipeline.STACK_BURST_MAX_SAMPLES = orig
    np.testing.assert_array_equal(d_stacked, d_scanned)


# the mesh burst draws its angles INSIDE the scan body (the sequential
# sharded path draws them eagerly), and XLA's fusion inside the loop body
# contracts the draw arithmetic differently — measured 1-ULP differences
# on a handful of values.  The frames are the same samples to f32 fusion;
# exact bit-identity is asserted on the single-device paths above.
_ULP = dict(rtol=3e-7, atol=1e-7)


def test_sharded_burst_matches_sequential():
    # multi-device default routing takes the mesh-scanned one-dispatch burst
    import jax

    seq = _renderer("auto")
    if len(jax.devices()) > 1:
        assert seq._burst_route() == "sharded"
    for _ in range(2):
        seq.render_frame()
    d_seq = np.asarray(seq.get_camera_data())
    assert d_seq.shape == (64, 3)

    burst = _renderer("auto")
    burst.render_frames_pipelined(2)
    np.testing.assert_allclose(
        d_seq, np.asarray(burst.get_camera_data()), **_ULP)


def test_sharded_burst_matches_sequential_lit():
    seq = _renderer("auto", lighting=True)
    for _ in range(2):
        seq.render_frame()
    d_seq = np.asarray(seq.get_camera_data())

    burst = _renderer("auto", lighting=True)
    burst.render_frames_pipelined(2)
    np.testing.assert_allclose(
        d_seq, np.asarray(burst.get_camera_data()), **_ULP)
