"""Compound projection schema tests (parity: shaders.cu:354-642)."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.projection.project import (
    decode_projection_map_id,
    project_frame,
    voronoi_index_map,
)
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_sphere_eye


def _eye_arrays(n=50):
    arr = ommatidia_to_array(make_sphere_eye(n))
    means = jnp.asarray(np.linspace(0, 1, n * 3).reshape(n, 3), jnp.float32)
    samples = jnp.tile(means[None], (4, 1, 1))
    return arr, means, samples


def test_single_dimension_fast_layout():
    arr, means, samples = _eye_arrays(50)
    frame = np.asarray(
        project_frame("single_dimension_fast", means, samples,
                      jnp.asarray(arr[:, 0:3]), jnp.asarray(arr[:, 3:6]), 50, 4)
    )
    assert frame.shape == (4, 50, 4)
    # row 0 written, other rows zero
    assert frame[0].any()
    assert not frame[1:].any()
    # pixel x == make_color(mean[x])
    from compound_ray_tpu.trace.shade import make_color

    expect = np.asarray(make_color(means))
    np.testing.assert_array_equal(frame[0], expect)


def test_single_dimension_scaling():
    arr, means, samples = _eye_arrays(10)
    frame = np.asarray(
        project_frame("single_dimension", means, samples,
                      jnp.asarray(arr[:, 0:3]), jnp.asarray(arr[:, 3:6]), 20, 3)
    )
    # ommatidiumIndex = x*N/W: pixel 0,1 -> omm 0; pixel 2,3 -> omm 1...
    assert (frame[0, 0] == frame[0, 1]).all()
    assert (frame[0] == frame[2]).all()  # every row identical


def test_raw_samples_layout():
    arr, means, samples = _eye_arrays(8)
    frame = np.asarray(
        project_frame("raw_ommatidial_samples", means, samples,
                      jnp.asarray(arr[:, 0:3]), jnp.asarray(arr[:, 3:6]), 8, 4)
    )
    from compound_ray_tpu.trace.shade import make_color

    expect = np.asarray(make_color(samples))  # (4,8,4)
    np.testing.assert_array_equal(frame, expect)


def test_voronoi_ids_roundtrip():
    arr, means, samples = _eye_arrays(300)
    frame = np.asarray(
        project_frame("spherical_orientationwise_ids", means, samples,
                      jnp.asarray(arr[:, 0:3]), jnp.asarray(arr[:, 3:6]), 64, 32)
    )
    ids = set()
    for y in range(32):
        for x in range(64):
            i = decode_projection_map_id(frame[y, x])
            assert 0 <= i < 300
            ids.add(i)
    assert len(ids) > 50  # many cells visible on a full sphere


def test_voronoi_map_is_nearest():
    arr, _, _ = _eye_arrays(40)
    dirs = jnp.asarray(arr[:, 3:6])
    idx = np.asarray(voronoi_index_map(dirs, 16, 8))
    # verify one pixel against brute force in numpy
    from compound_ray_tpu.projection.project import _pixel_sphere_dirs

    sphere = np.asarray(_pixel_sphere_dirs(16, 8))
    d = np.asarray(dirs)
    for (y, x) in [(0, 0), (3, 7), (7, 15)]:
        cos = (sphere[y, x] @ d.T) / (
            np.linalg.norm(d, axis=1) * np.linalg.norm(sphere[y, x])
        )
        ang = np.arccos(np.clip(cos, -1, 1))
        assert idx[y, x] == int(np.argmin(ang))


def test_split_projection_sides():
    n = 60
    arr = ommatidia_to_array(make_sphere_eye(n))
    means = jnp.asarray(np.random.default_rng(0).uniform(size=(n, 3)), jnp.float32)
    samples = jnp.tile(means[None], (1, 1, 1))
    idx = np.asarray(
        voronoi_index_map(
            jnp.asarray(arr[:, 3:6]), 32, 16, split=True,
            positions_x=jnp.asarray(arr[:, 0]),
        )
    )
    pos_x = arr[:, 0]
    # left-half pixels (uv.x < 0.5) should map to omms with pos.x < 0 (or omm 0)
    left_ids = np.unique(idx[:, :16])
    for i in left_ids:
        assert pos_x[i] < 0 or i == 0
    right_ids = np.unique(idx[:, 16:])
    for i in right_ids:
        assert pos_x[i] > 0 or i == 0


def test_voronoi_chunked_matches_monolithic():
    """The chunked ommatidium-axis path (memory bound for huge eye x frame
    products) must match the monolithic computation; disagreements are only
    permitted on razor-thin Voronoi-boundary ties (XLA tiling ulps)."""
    import numpy as np

    import jax.numpy as jnp

    from compound_ray_tpu.projection import project as P

    rng = np.random.default_rng(0)
    refs = rng.normal(size=(700, 3)).astype(np.float32)
    px = refs[:, 0].copy()
    W = H = 96
    mono = np.asarray(P._voronoi_index_map_impl(
        jnp.asarray(refs), W, H, True, jnp.asarray(px), 1 << 62))
    for chunk_elems in (W * H * 97, W * H * 256):  # 8 and 3 chunks
        chunked = np.asarray(P._voronoi_index_map_impl(
            jnp.asarray(refs), W, H, True, jnp.asarray(px), chunk_elems))
        diff = chunked != mono
        assert diff.mean() < 1e-4, f"{diff.sum()} disagreements"
        if diff.any():
            # every disagreement must be an equal-angle boundary tie
            sphere = np.asarray(P._pixel_sphere_dirs(W, H))
            for y, x in zip(*np.nonzero(diff)):
                a = refs[chunked[y, x]] / np.linalg.norm(refs[chunked[y, x]])
                b = refs[mono[y, x]] / np.linalg.norm(refs[mono[y, x]])
                d = sphere[y, x] / np.linalg.norm(sphere[y, x])
                ang_a = np.arccos(np.clip(np.dot(a, d), -1, 1))
                ang_b = np.arccos(np.clip(np.dot(b, d), -1, 1))
                assert abs(ang_a - ang_b) < 1e-4


def test_voronoi_default_budget_is_single_chunk():
    # every realistic config must ride the historical monolithic path
    # (bit-identical goldens): 400x400 display x 3000 omms fits one chunk
    from compound_ray_tpu.projection import project as P

    assert 400 * 400 * 3000 <= P._VORONOI_CHUNK_ELEMS
