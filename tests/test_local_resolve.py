"""One-hot local winner resolve (emit="loc" + pipeline._local_resolve).

Round-5 lit lever: the lit epilogue paid TWO descriptor-rate-bound global
row gathers per ray (winner attributes ~16 ms + shading basis ~16.6 ms per
1e6 rays — docs/performance.md gather table).  Both tables are GROUP-LOCAL
(every winner is one of the group's own <= rmax*128 packed slots), so the
resolve becomes a one-hot MXU contraction against pose-memoised per-group
tables: the kernel emits the winner's LOCAL index (row*128 + lane) and
_local_resolve recovers the combined attribute+shading row exactly (every
product is 1.0 * value; sums have at most one nonzero term).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compound_ray_tpu.config import RenderConfig, get_config, set_config
from compound_ray_tpu.eye import pipeline
from compound_ray_tpu.scene.eye_io import ommatidia_to_array
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye
from compound_ray_tpu.trace.lighting import default_lights


def test_local_resolve_matches_gather_exactly():
    """_local_resolve == table[loc] bitwise, with -1 resolving to zeros."""
    rng = np.random.default_rng(3)
    ng, rmax, leaf, c = 7, 3, 128, 11
    rg_pad = 256
    tab = jnp.asarray(rng.standard_normal((ng, rmax, leaf, c)), jnp.float32)
    loc = rng.integers(-1, rmax * leaf, size=(ng, rg_pad))
    loc_f = jnp.asarray(loc.reshape(-1), jnp.float32)
    got = np.asarray(pipeline._local_resolve(loc_f, tab, ng=ng,
                                             rg_pad=rg_pad))
    flat = np.asarray(tab).reshape(ng, rmax * leaf, c)
    want = np.zeros((ng, rg_pad, c), np.float32)
    for g in range(ng):
        m = loc[g] >= 0
        want[g, m] = flat[g, loc[g][m]]
    np.testing.assert_array_equal(got, want.reshape(ng * rg_pad, c))


@pytest.mark.parametrize("scene_kw", [
    dict(n_boxes=60, seed=5),  # textured+vertex-colour mix
])
def test_lit_frame_local_resolve_matches_gather(scene_kw):
    """A lit frame under the one-hot local resolve must equal the gather
    path exactly: same kernel winners (emit loc only changes the reported
    index), bit-identical resolved attribute/shading values, identical
    masking of miss rays."""
    eye = ommatidia_to_array(make_sphere_eye(32, acceptance_deg=6.0))
    key = jax.random.PRNGKey(11)
    pos = np.asarray([0.0, 2.0, 0.0], np.float32)
    ls = np.eye(3, dtype=np.float32)
    base = get_config()

    def render(local):
        scene = make_big_scene(**scene_kw)
        lights = default_lights(scene.aabb_min, scene.aabb_max)
        set_config(dataclasses.replace(RenderConfig.from_env(),
                                       lit_local_resolve=local))
        try:
            return np.asarray(pipeline.render_means_pallas(
                scene, scene.device_triangles(), eye, pos, ls, key, 24, 0,
                lights=lights))
        finally:
            set_config(base)

    got = render(True)
    want = render(False)
    assert np.isfinite(want).all()
    np.testing.assert_array_equal(want, got)


def test_unlit_frames_unaffected_by_flag():
    """lit_local_resolve only engages on lit frames: unlit planning must
    not build tables or change the emit."""
    scene = make_big_scene(n_boxes=60, seed=5)
    eye = ommatidia_to_array(make_sphere_eye(32, acceptance_deg=6.0))
    key = jax.random.PRNGKey(1)
    pos = np.asarray([0.0, 2.0, 0.0], np.float32)
    ls = np.eye(3, dtype=np.float32)
    out = pipeline.render_means_pallas(
        scene, scene.device_triangles(), eye, pos, ls, key, 16, 0)
    splan = pipeline.scene_plan(scene)
    assert not splan.loctab_store, "unlit frame must not build loc tables"
    assert np.isfinite(out).all()
