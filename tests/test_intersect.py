"""Ray-triangle intersection unit tests (oracle for all accelerated paths)."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.trace.intersect import intersect_rays, moller_trumbore


def _tri(v0, v1, v2):
    v0 = np.asarray(v0, np.float32)
    return (
        jnp.asarray([v0]),
        jnp.asarray([np.asarray(v1, np.float32) - v0]),
        jnp.asarray([np.asarray(v2, np.float32) - v0]),
    )


def test_single_hit():
    v0, e1, e2 = _tri([-1, -1, 5], [1, -1, 5], [0, 1, 5])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    res = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16)
    assert bool(res["hit"][0])
    assert np.isclose(float(res["t"][0]), 5.0, atol=1e-5)


def test_both_sided():
    # hit from behind (reversed winding relative to ray) must still count
    v0, e1, e2 = _tri([-1, -1, 5], [0, 1, 5], [1, -1, 5])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    res = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16)
    assert bool(res["hit"][0])


def test_miss_outside():
    v0, e1, e2 = _tri([-1, -1, 5], [1, -1, 5], [0, 1, 5])
    o = jnp.asarray([[5.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    res = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16)
    assert not bool(res["hit"][0])


def test_tmin_tmax_window():
    v0, e1, e2 = _tri([-1, -1, 5], [1, -1, 5], [0, 1, 5])
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    res = intersect_rays(o, d, v0, e1, e2,
                         jnp.asarray([0.0, 6.0, 0.0]),
                         jnp.asarray([1e16, 1e16, 4.0]))
    assert bool(res["hit"][0])
    assert not bool(res["hit"][1])  # tmin beyond the triangle
    assert not bool(res["hit"][2])  # tmax before the triangle


def test_unnormalised_direction_t_units():
    v0, e1, e2 = _tri([-1, -1, 5], [1, -1, 5], [0, 1, 5])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 2.0]])  # |d| = 2 -> t = 2.5
    res = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16)
    assert np.isclose(float(res["t"][0]), 2.5, atol=1e-5)


def test_closest_of_many():
    tris_v0 = jnp.asarray([[-1, -1, z] for z in (9.0, 3.0, 6.0)], jnp.float32)
    e1 = jnp.asarray([[2, 0, 0]] * 3, jnp.float32)
    e2 = jnp.asarray([[1, 2, 0]] * 3, jnp.float32)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    res = intersect_rays(o, d, tris_v0, e1, e2, 0.0, 1e16)
    assert int(res["tri_id"][0]) == 1
    assert np.isclose(float(res["t"][0]), 3.0, atol=1e-5)


def test_chunking_consistency():
    # results must not depend on chunk sizes
    rng = np.random.default_rng(0)
    n_tris, n_rays = 333, 77
    v0 = jnp.asarray(rng.uniform(-5, 5, (n_tris, 3)), jnp.float32)
    e1 = jnp.asarray(rng.uniform(-1, 1, (n_tris, 3)), jnp.float32)
    e2 = jnp.asarray(rng.uniform(-1, 1, (n_tris, 3)), jnp.float32)
    o = jnp.asarray(rng.uniform(-6, 6, (n_rays, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
    a = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16, ray_chunk=512, tri_chunk=2048)
    b = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16, ray_chunk=16, tri_chunk=64)
    np.testing.assert_array_equal(np.asarray(a["tri_id"]), np.asarray(b["tri_id"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-6)


def test_barycentrics():
    v0, e1, e2 = _tri([0, 0, 5], [2, 0, 5], [0, 2, 5])
    o = jnp.asarray([[0.5, 0.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    res = intersect_rays(o, d, v0, e1, e2, 0.0, 1e16)
    # P = v0 + u*e1 + v*e2 -> u = 0.25, v = 0.25
    assert np.isclose(float(res["u"][0]), 0.25, atol=1e-6)
    assert np.isclose(float(res["v"][0]), 0.25, atol=1e-6)
