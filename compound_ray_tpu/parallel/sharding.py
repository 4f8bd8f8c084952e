"""Multi-chip sharding for the compound pipeline (jax.sharding + shard_map).

The reference is single-GPU (SURVEY.md §2.6: its only parallelism is the SIMT
launch grid; multi-GPU hooks are dead code).  Here scaling is first-class:

  * ommatidium axis ("omm"): pure data parallelism — each device traces its
    slice of the eye against the replicated scene.  No communication except
    the output all-gather.
  * sample axis ("sample"): each device draws a disjoint subset of every
    ommatidium's cone samples (RNG key folded with the device's sample-axis
    index) and the per-ommatidium partial sums are combined with a psum over
    ICI — the collective replacement for summing_kernel.cu's warp shuffles.

Both axes compose in a 2-D mesh; scene arrays are replicated (they are the
"weights" of this workload and fit in HBM at reference-scene scale).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compound_ray_tpu.eye.render import render_compound_samples
from compound_ray_tpu.eye.sampling import sample_angles


def make_eye_mesh(
    n_devices: Optional[int] = None,
    sample_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Mesh over ("omm", "sample"); sample_parallel=1 gives pure omm-DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % sample_parallel == 0
    grid = devices.reshape(n_devices // sample_parallel, sample_parallel)
    return Mesh(grid, ("omm", "sample"))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("samples", "background", "mesh", "n_omms"),
)
def _sharded_impl(
    scene: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (Np, 8) padded to omm-axis multiple
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    mesh: Mesh,
    n_omms: int,
) -> jnp.ndarray:
    omm_axis = mesh.shape["omm"]
    sample_axis = mesh.shape["sample"]
    assert samples % sample_axis == 0, "samples must divide over the sample axis"
    local_samples = samples // sample_axis

    def shard_fn(scene_l, omms_l, pos_l, ls_l, key_l):
        # fold both mesh coordinates into the key: every (omm-shard,
        # sample-shard) pair draws an independent stream
        oi = jax.lax.axis_index("omm")
        si = jax.lax.axis_index("sample")
        k = jax.random.fold_in(jax.random.fold_in(key_l, oi), si)
        rgb = render_compound_samples(
            scene_l, omms_l, pos_l, ls_l, k, local_samples, background
        )  # (local_samples, n_local, 3)
        partial = jnp.sum(rgb, axis=0) / samples
        # combine sample-axis partial sums over ICI
        return jax.lax.psum(partial, axis_name="sample")

    from jax import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("omm", None), P(), P(), P()),
        out_specs=P("omm", None),
        check_vma=False,
    )
    means = fn(scene, ommatidia, position, local_space, key)
    return means[:n_omms]


def render_means_sharded(
    scene: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """Per-ommatidium means over the device mesh.

    Note: the multi-device noise realisation differs from single-device runs
    (independent per-shard streams) but is statistically identical — the same
    caveat the reference documents for its curand re-seeding
    (libEyeRenderer.h:94-96)."""
    n = ommatidia.shape[0]
    omm_axis = mesh.shape["omm"]
    n_pad = _ceil_to(max(n, omm_axis), omm_axis)
    omms_p = jnp.zeros((n_pad, 8), ommatidia.dtype).at[:n].set(ommatidia)
    # padded rows need a nonzero axis so normalisation stays finite
    omms_p = omms_p.at[n:, 5].set(1.0)
    return _sharded_impl(
        scene, omms_p, position, local_space, key, samples, background, mesh, n
    )


def _draw_angles(key: jax.Array, omms_p: jnp.ndarray, samples: int):
    """Global (Np, S) cone-jitter draw — identical to the dense frame's, so
    sharded results can be validated exactly against the dense kernel path
    (the same angles sliced over the mesh)."""
    from compound_ray_tpu.eye.sampling import FWHM_SD_RATIO

    n_pad = omms_p.shape[0]
    k_splay, k_spin = jax.random.split(key)
    sd = omms_p[:, 6] / FWHM_SD_RATIO
    splay = jax.random.normal(k_splay, (n_pad, samples)) * sd[:, None]
    spin = jax.random.uniform(k_spin, (n_pad, samples)) * jnp.pi
    return splay, spin


def render_means_sharded_packed(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia: np.ndarray,  # (N,8) host
    position,
    local_space,
    key: jax.Array,
    samples: int,
    background: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """Production multi-chip path on the PACKED MXU tracer (the same kernel
    pipeline as single-chip rendering — VERDICT round 2 #3).

    Planning (cluster build, cone cull, triangle refine, payload pack)
    happens globally, memoised per pose; the GROUP axis of the packed
    payload then shards over "omm" (pure data parallelism, scene tables
    replicated) and the sample axis over "sample" with a psum combining the
    per-ommatidium partial means over ICI.  Angles are drawn globally, so
    the result equals the dense kernel path on the same angle set exactly
    (up to f32 summation order)."""
    from compound_ray_tpu.config import get_config
    from compound_ray_tpu.eye.pipeline import (
        _ceil_to as ceil_to,
        _packed_plan,
        _plan_widths,
        _trace_shade_angles,
        eye_plan,
        scene_plan,
    )
    from compound_ray_tpu.trace.mm_tracer import BATCH_RAYS

    omm_axis = mesh.shape["omm"]
    sample_axis = mesh.shape["sample"]
    assert samples % sample_axis == 0, "samples must divide the sample axis"
    omms_np = np.asarray(ommatidia)

    splan = scene_plan(scene_flat)
    eplan = eye_plan(omms_np, samples, ng_multiple=omm_axis)
    if eplan.omms_p_dev is None:
        eplan.omms_p_dev = jnp.asarray(omms_np[eplan.perm])
        eplan.inv_valid_dev = jnp.asarray(eplan.inv_valid)
    omms_p = eplan.omms_p_dev

    pos_np = np.asarray(jax.device_get(position), np.float32)
    ls_np = np.asarray(jax.device_get(local_space), np.float32)
    position = jnp.asarray(pos_np)
    local_space = jnp.asarray(ls_np)
    pose_sig = (pos_np.tobytes(), ls_np.tobytes())
    kcand, rmax = _plan_widths(
        splan, eplan, omms_p, position, local_space,
        (eplan.sig, samples, pose_sig, "mesh"),
    )
    row_counts, packed_mm = _packed_plan(
        splan, eplan, omms_p, position, local_space, pose_sig, samples,
        kcand, rmax,
    )
    splay, spin = _draw_angles(key, omms_p, samples)

    s_local = samples // sample_axis
    ng_local = eplan.ng // omm_axis
    rb_local = ceil_to(eplan.g * s_local, BATCH_RAYS)
    means_p = _sharded_packed_impl(
        splan.attr_table, scene_dev, splan.quad_table, packed_mm,
        row_counts, omms_p, splay, spin, position, local_space,
        samples=samples, s_local=s_local, background=background,
        ng_local=ng_local, g=eplan.g, rb_local=rb_local, rmax=rmax,
        textured=splan.textured, tex_only=splan.tex_only,
        tex_static=splan.tex_static, mesh=mesh,
    )
    return means_p[eplan.inv_valid_dev]


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "s_local", "background", "ng_local", "g", "rb_local",
        "rmax", "textured", "tex_only", "tex_static", "mesh",
    ),
)
def _sharded_packed_impl(
    attr_table, scene_dev, quad_table, packed_mm, row_counts,
    omms_p, splay, spin, position, local_space,
    samples: int, s_local: int, background: int, ng_local: int, g: int,
    rb_local: int, rmax: int, textured: bool, tex_only: bool,
    tex_static, mesh: Mesh,
):
    """jit-of-shard_map: ONE compiled executable per (widths, mesh) combo.
    An eager shard_map runs its body primitive-by-primitive through the
    impl path (~500 separate pjit dispatches per frame — measured 40 s on
    the 8-device CPU mesh); under jit it lowers to a single SPMD program."""

    def shard_fn(attr_l, sdev_l, quad_l, pmm_l, rc_l, omms_l,
                 splay_l, spin_l, pos_l, ls_l):
        from compound_ray_tpu.eye.pipeline import _trace_shade_angles

        partial = _trace_shade_angles(
            pmm_l, rc_l, attr_l, sdev_l, quad_l, omms_l, pos_l, ls_l,
            splay_l, spin_l,
            samples=s_local, background=background, ng=ng_local, g=g,
            nrb=1, rb_size=rb_local, rmax=rmax, textured=textured,
            tex_only=tex_only, tex_static=tex_static,
        )  # (Np_local, 3) mean over the LOCAL sample slice
        # combine sample-axis partial means over ICI (the collective
        # replacement for summing_kernel.cu's warp shuffles)
        return jax.lax.psum(partial * (s_local / samples), axis_name="sample")

    from jax import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P("omm", None, None, None), P("omm"),
            P("omm", None),
            P("omm", "sample"), P("omm", "sample"),
            P(), P(),
        ),
        out_specs=P("omm", None),
        check_vma=False,
    )
    return fn(
        attr_table, scene_dev, quad_table, packed_mm,
        row_counts, omms_p, splay, spin, position, local_space,
    )


def render_means_sharded_fast(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """Production multi-chip path: the cone-culled sweep under shard_map.

    Planning (cluster build, cone cull, shortlist width K) happens globally;
    the ommatidium axis and the sample axis then shard across the mesh, each
    device runs the culled Plücker sweep on its slice, and sample-axis
    partial sums combine with a psum over ICI.  The jitter angles are drawn
    ONCE globally, so results are identical across topologies (unlike the
    naive per-shard streams of render_means_sharded).
    """
    from compound_ray_tpu.accel.clusters import scene_clusters
    from compound_ray_tpu.accel.cull import cone_cull_clusters, shortlist_from_mask
    from compound_ray_tpu.config import get_config
    from compound_ray_tpu.trace.culled import render_means_culled_angles

    cfg = get_config()
    n = ommatidia.shape[0]
    omm_axis = mesh.shape["omm"]
    sample_axis = mesh.shape["sample"]
    assert samples % sample_axis == 0

    clusters = scene_clusters(scene_flat, cfg.xla_leaf_size)
    cdev = clusters.device_arrays()
    cull = cone_cull_clusters(
        ommatidia, position, local_space,
        cdev["sphere_center"], cdev["sphere_radius"], cfg.cull_sigmas,
    )
    k = int(jax.device_get(jnp.max(cull["count"])))
    k = max(1, min(clusters.num_clusters, -(-k // 8) * 8))
    ids, valid = shortlist_from_mask(cull["mask"], k)

    n_pad = -(-max(n, omm_axis) // omm_axis) * omm_axis
    def pad_n(x, fill=0.0):
        return jnp.full((n_pad,) + x.shape[1:], fill, x.dtype).at[:n].set(x)

    omms_p = pad_n(ommatidia).at[n:, 5].set(1.0)
    ids_p = pad_n(ids)
    valid_p = pad_n(valid, fill=False)

    splay, spin = sample_angles(key, n_pad, samples, omms_p[:, 6])  # (S,Np)

    def shard_fn(scene_l, cl_l, omms_l, ids_l, valid_l, splay_l, spin_l,
                 pos_l, ls_l):
        partial = render_means_culled_angles(
            scene_l, cl_l, omms_l, pos_l, ls_l, splay_l, spin_l,
            ids_l, valid_l, background,
            omm_chunk=get_config().omm_chunk,
            sample_chunk=get_config().sample_chunk,
        ) * (splay_l.shape[0] / samples)
        return jax.lax.psum(partial, axis_name="sample")

    from jax import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(),
            P("omm", None), P("omm", None), P("omm", None),
            P("sample", "omm"), P("sample", "omm"),
            P(), P(),
        ),
        out_specs=P("omm", None),
        check_vma=False,
    )
    means = fn(scene_dev, cdev, omms_p, ids_p, valid_p, splay, spin,
               jnp.asarray(position, jnp.float32),
               jnp.asarray(local_space, jnp.float32))
    return means[:n]
