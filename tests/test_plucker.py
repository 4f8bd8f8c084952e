"""Plücker matmul intersector must agree with the Möller-Trumbore oracle."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.testing import make_big_scene
from compound_ray_tpu.trace.intersect import intersect_rays
from compound_ray_tpu.trace.plucker import (
    plucker_closest_hit,
    triangle_constants,
)


def _random_rays(n, seed=0, span=60.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_plucker_matches_mt_on_scene():
    scene = make_big_scene(n_boxes=60, seed=5)
    dev = scene.device_triangles()
    tri = triangle_constants(dev["v0"], dev["e1"], dev["e2"])
    tri_id = jnp.arange(scene.num_triangles, dtype=jnp.int32)

    o, d = _random_rays(500, seed=1)
    ref = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], 0.0, 1e16)
    t, u, v, tid, hit = plucker_closest_hit(o, d, tri, tri_id, 0.0, 1e16)

    ref_hit = np.asarray(ref["hit"])
    got_hit = np.asarray(hit)
    # identical hit/miss classification except possible boundary grazing
    disagree = np.flatnonzero(ref_hit != got_hit)
    assert len(disagree) <= 2, disagree[:10]
    both = ref_hit & got_hit
    np.testing.assert_allclose(
        np.asarray(t)[both], np.asarray(ref["t"])[both], rtol=2e-4, atol=1e-4
    )
    # same winning triangle (modulo exact ties)
    same = np.asarray(tid)[both] == np.asarray(ref["tri_id"])[both]
    assert same.mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(u)[both][same], np.asarray(ref["u"])[both][same],
        rtol=5e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(v)[both][same], np.asarray(ref["v"])[both][same],
        rtol=5e-3, atol=2e-4,
    )


def test_plucker_tmin_tmax():
    v0 = jnp.asarray([[-1, -1, 5]], jnp.float32)
    e1 = jnp.asarray([[2, 0, 0]], jnp.float32)
    e2 = jnp.asarray([[1, 2, 0]], jnp.float32)
    tri = triangle_constants(v0, e1, e2)
    tid = jnp.asarray([0], jnp.int32)
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    t, u, v, i, hit = plucker_closest_hit(
        tri=tri, tri_id=tid, o=o, d=d,
        tmin=jnp.asarray([0.0, 6.0, 0.0]), tmax=1e16,
    )
    assert bool(hit[0]) and not bool(hit[1])


def test_plucker_padding_misses():
    v0 = jnp.zeros((4, 3), jnp.float32)
    e1 = jnp.zeros((4, 3), jnp.float32)
    e2 = jnp.zeros((4, 3), jnp.float32)
    tri = triangle_constants(v0, e1, e2)
    tid = jnp.full((4,), -1, jnp.int32)
    o, d = _random_rays(16)
    t, u, v, i, hit = plucker_closest_hit(o, d, tri, tid, 0.0)
    assert not np.asarray(hit).any()
