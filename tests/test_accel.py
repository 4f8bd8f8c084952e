"""Acceleration structure correctness: the culled path must match the
brute-force oracle (the analogue of validating LBVH traversal vs brute force,
SURVEY.md §7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compound_ray_tpu.accel.clusters import build_clusters, scene_clusters
from compound_ray_tpu.accel.cull import (
    cone_cull_clusters,
    eye_world_geometry,
    shortlist_from_mask,
)
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye
from compound_ray_tpu.trace.culled import render_means_culled
from compound_ray_tpu.trace.dispatch import render_means_fast
from compound_ray_tpu.trace.shade import miss_id


def test_cluster_build_covers_all_triangles():
    scene = make_big_scene(n_boxes=50)
    cs = build_clusters(scene.v0, scene.e1, scene.e2, leaf_size=16)
    ids = cs.tri_id[cs.tri_id >= 0]
    assert sorted(ids.tolist()) == list(range(scene.num_triangles))
    # every triangle's vertices inside its cluster AABB
    c, l = cs.tri_id.shape
    v0 = cs.v0.reshape(c, l, 3)
    for ci in range(c):
        k = (cs.tri_id[ci] >= 0).sum()
        assert (v0[ci, :k] >= cs.aabb_min[ci][None] - 1e-4).all()
        assert (v0[ci, :k] <= cs.aabb_max[ci][None] + 1e-4).all()


def test_cluster_padding_degenerate():
    scene = make_big_scene(n_boxes=3)
    cs = build_clusters(scene.v0, scene.e1, scene.e2, leaf_size=32)
    pad = cs.tri_id.reshape(-1) < 0
    assert (cs.e1[pad] == 0).all() and (cs.e2[pad] == 0).all()


def test_cone_cull_conservative():
    """Every triangle a sample ray actually hits must be in the shortlist."""
    scene = make_big_scene(n_boxes=120, seed=3)
    cs = scene_clusters(scene, leaf_size=32)
    cdev = cs.device_arrays()
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(40, acceptance_deg=8.0)))
    pos = jnp.asarray([0.0, 3.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    cull = cone_cull_clusters(omms, pos, ls, cdev["sphere_center"],
                              cdev["sphere_radius"], 5.0)
    mask = np.asarray(cull["mask"])

    # brute force trace to find triangles hit per omm
    from compound_ray_tpu.eye.sampling import ommatidial_rays
    from compound_ray_tpu.trace.intersect import intersect_rays

    key = jax.random.PRNGKey(0)
    s = 16
    o, d, tmin = ommatidial_rays(omms, pos, ls, s, key)
    dev = scene.device_triangles()
    hit = intersect_rays(o, d, dev["v0"], dev["e1"], dev["e2"], tmin, 1e16)
    tri_ids = np.asarray(hit["tri_id"]).reshape(s, 40)
    # map triangle -> cluster
    tri_to_cluster = np.full(scene.num_triangles, -1)
    for ci in range(cs.num_clusters):
        for t in cs.tri_id[ci]:
            if t >= 0:
                tri_to_cluster[t] = ci
    for si in range(s):
        for oi in range(40):
            t = tri_ids[si, oi]
            if t >= 0:
                assert mask[oi, tri_to_cluster[t]], (si, oi, t)


def test_culled_matches_bruteforce_means():
    scene = make_big_scene(n_boxes=120, seed=1)
    dev = scene.device_triangles()
    cs = scene_clusters(scene, leaf_size=32)
    cdev = cs.device_arrays()
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(48, acceptance_deg=6.0)))
    pos = jnp.asarray([2.0, 2.5, -1.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    s = 8
    bg = miss_id(scene.background_shader)

    ref = np.asarray(render_compound_means(dev, omms, pos, ls, key, s, bg))

    cull = cone_cull_clusters(omms, pos, ls, cdev["sphere_center"],
                              cdev["sphere_radius"], 5.0)
    k = int(np.asarray(cull["count"]).max())
    ids, valid = shortlist_from_mask(cull["mask"], max(k, 1))
    got = np.asarray(
        render_means_culled(dev, cdev, omms, pos, ls, key, ids, valid, s, bg,
                            omm_chunk=16, sample_chunk=4)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_dispatch_smoke():
    scene = make_big_scene(n_boxes=120, seed=2)
    dev = scene.device_triangles()
    omms = jnp.asarray(ommatidia_to_array(make_sphere_eye(32)))
    pos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    ls = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    bg = miss_id(scene.background_shader)
    out = render_means_fast(scene, dev, omms, pos, ls, key, 4, bg)
    ref = render_compound_means(dev, omms, pos, ls, key, 4, bg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_eye_world_geometry_focal_retraction():
    omms = np.zeros((1, 8), np.float32)
    omms[0, 0:3] = [1.0, 0.0, 0.0]
    omms[0, 3:6] = [0.0, 0.0, 2.0]  # non-unit axis
    omms[0, 6] = 0.1
    omms[0, 7] = 0.5  # focal offset
    apex, axis = eye_world_geometry(
        jnp.asarray(omms), jnp.asarray([10.0, 0.0, 0.0]), jnp.eye(3)
    )
    np.testing.assert_allclose(np.asarray(apex)[0], [11.0, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(axis)[0], [0.0, 0.0, 1.0], atol=1e-6)


def test_subdivide_large_triangles_preserves_shading():
    """Subdivision must be render-exact: same hits, same interpolated
    attributes (barycentric interpolation is affine)."""
    import jax

    from compound_ray_tpu.scene.flat import subdivide_large_triangles
    from compound_ray_tpu.testing import make_box_scene
    from compound_ray_tpu.trace.intersect import intersect_rays
    from compound_ray_tpu.trace.shade import shade_rays

    scene = make_box_scene()
    sub = subdivide_large_triangles(scene, 3.0)
    assert sub.num_triangles > scene.num_triangles
    d1, d2 = scene.device_triangles(), sub.device_triangles()
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-8, 8, (64, 3)), jnp.float32)
    dr = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    h1 = intersect_rays(o, dr, d1["v0"], d1["e1"], d1["e2"], 0.0, 1e16)
    h2 = intersect_rays(o, dr, d2["v0"], d2["e1"], d2["e2"], 0.0, 1e16)
    np.testing.assert_array_equal(np.asarray(h1["hit"]), np.asarray(h2["hit"]))
    np.testing.assert_allclose(
        np.asarray(h1["t"])[np.asarray(h1["hit"])],
        np.asarray(h2["t"])[np.asarray(h2["hit"])], rtol=1e-4,
    )
    r1 = np.asarray(shade_rays(d1, dr, h1, background=2))
    r2 = np.asarray(shade_rays(d2, dr, h2, background=2))
    np.testing.assert_allclose(r1, r2, atol=1e-5)
