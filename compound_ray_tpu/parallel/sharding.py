"""Multi-chip sharding for the compound pipeline (jax.sharding + shard_map).

The reference is single-GPU (SURVEY.md §2.6: its only parallelism is the SIMT
launch grid; multi-GPU hooks are dead code).  Here scaling is first-class:

  * ommatidium axis ("omm"): pure data parallelism — each device traces its
    slice of the eye against the replicated scene.  No communication except
    the output all-gather.
  * sample axis ("sample"): each device draws a disjoint slice of every
    ommatidium's cone samples and the per-ommatidium partial sums are
    combined with a psum over ICI — the collective replacement for
    summing_kernel.cu's warp shuffles.

ONE production path (round-3 VERDICT #8): the packed MXU tracer pipeline
under jit-of-shard_map, for unlit means, LIT means (per-shard in-frame
shadow packs), and raw per-sample output.  Planning (cluster build, cone
cull, exact triangle refine, payload pack, shadow widths) happens globally
and memoises per pose; only the trace/shade work shards.  Angles are drawn
globally, so results equal the dense single-device path on the same angle
set exactly (up to f32 summation order).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def pick_sample_parallel(samples: int, n_devices: Optional[int] = None) -> int:
    """Sample-axis width for the ("omm", "sample") mesh: 2 when the device
    count is even AND the sample count divides it (the sharded impls require
    samples % sample_axis == 0, see _plan_for_mesh), else 1 (pure omm-DP).
    The single source of truth for every dispatch site in api/renderer.py —
    by construction the returned sp always divides `samples`."""
    if n_devices is None:
        n_devices = len(jax.devices())
    return 2 if n_devices % 2 == 0 and samples % 2 == 0 else 1


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


def _draw_angles(key: jax.Array, omms_p: jnp.ndarray, samples: int):
    """Global (Np, S) cone-jitter draw — the dense frame's exact
    implementation (eye.sampling.sample_angles_ns), so sharded results can
    be validated bit-exactly against the dense kernel path (the same
    angles sliced over the mesh)."""
    from compound_ray_tpu.eye.sampling import FWHM_SD_RATIO, sample_angles_ns

    return sample_angles_ns(key, omms_p[:, 6] / FWHM_SD_RATIO, samples)


def _plan_for_mesh(scene_flat, scene_dev, ommatidia, position, local_space,
                   samples, mesh: Mesh, lights_np=None, key=None,
                   background: int = 0, allow_cache: bool = True):
    """Global planning for a sharded frame: eye layout padded to the mesh,
    pose-memoised packed payload, far-field cache split, sky-split
    compaction, optional shadow widths.  Returns a dict of everything the
    sharded impl needs.

    The cache and sky plans are the SAME pose-memoised machinery the
    single-chip path uses (pipeline._farfield_plan / _sky_build — the sky
    quantum is lcm(64, omm axis) so the compacted group count splits
    evenly over the mesh); each shard then renders its slice of the
    compacted live groups against the replicated cache, and the impl
    scatters the shard-gathered means over the replicated sky
    expectations."""
    from compound_ray_tpu.config import get_config
    from compound_ray_tpu.eye import pipeline as P_
    from compound_ray_tpu.eye.pipeline import (
        _packed_plan,
        _plan_widths,
        _shadow_plan,
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
    cfg = get_config()
    if allow_cache:
        use_cache, near_mask, cache, d_thresh = P_._farfield_plan(
            splan, eplan, scene_dev, omms_np, pos_np, ls_np,
            samples, background, lights_np, cfg)
    else:
        use_cache, near_mask, cache, d_thresh = False, None, None, 0.0
    kcand, rmax = _plan_widths(
        splan, eplan, omms_p, position, local_space,
        (eplan.sig, samples, pose_sig, "mesh"),
    )
    # affine ray factorisation shards transparently: the origin fold is
    # per GROUP, and groups shard whole over "omm" — each shard's local
    # payload slice is exactly what its local [d, 1] rays expect (lit
    # frames included; the shadow plan's probe is affine-aware)
    affine = bool(cfg.affine_rays) and eplan.g == 1
    row_counts, packed_mm = _packed_plan(
        splan, eplan, omms_p, position, local_space, pose_sig, samples,
        kcand, rmax, near_mask=near_mask, use_cache=use_cache,
        d_thresh=d_thresh if use_cache else 0.0, affine=affine,
    )
    # sky split over the mesh: compact live groups globally, shard the
    # compacted set.  The memoised entry supersedes the dense pack (the
    # same memory contract as the single-chip short-circuit).
    sky = None
    ng_eff = eplan.ng
    sky_means = sky_scatter = None
    if (cfg.sky_split and use_cache and lights_np is None
            and eplan.g == 1):
        sk = P_._sky_key(eplan, samples, pose_sig, d_thresh, affine,
                         cfg) + (omm_axis,)
        hit, sky = P_._sky_probe(splan, sk)
        if not hit:
            sky = P_._sky_build(
                splan, eplan, omms_p, local_space, samples,
                kcand, rmax, cache, row_counts, packed_mm,
                ng_quantum=int(np.lcm(64, omm_axis)))
            P_._sky_put(splan, sk, sky, cfg)
            if sky is not None:
                splan.packed_store.pop(P_._packed_key(
                    eplan, samples, pose_sig, kcand, rmax, use_cache,
                    d_thresh if use_cache else 0.0, cfg, affine), None)
    if sky is not None:
        (packed_mm, row_counts, omms_p, sky_scatter, sky_means,
         ng_eff, _, _) = sky
    out = dict(
        splan=splan, eplan=eplan, omms_p=omms_p,
        position=position, local_space=local_space,
        row_counts=row_counts, packed_mm=packed_mm, rmax=rmax,
        affine=affine,
        use_cache=use_cache, cache=cache,
        cache_shape=(cfg.farfield_cache_width // 2,
                     cfg.farfield_cache_width),
        sky_means=sky_means, sky_scatter=sky_scatter,
        s_local=samples // sample_axis,
        ng_local=ng_eff // omm_axis,
        rb_local=_ceil_to(eplan.g * (samples // sample_axis), BATCH_RAYS),
        lights_dev=None, shadow_counts=None,
        shadow_r2v=None, shadow_flag=None, shadow_flat=None,
    )
    if lights_np is not None:
        # the shadow plan is computed GLOBALLY (probe over the full sample
        # set) but laid out SHARD-MAJOR (shards=omm_axis, equal per-shard
        # row padding, shard-local virtual groups), so the ragged row
        # table, r2v, and flag split over "omm" on the row axis exactly
        # like the primary payload — each shard traces only its own
        # groups' occluder rows
        # (the trailing element is the audit shaft-sphere table, used only
        # by the dense path's shadow_audit epilogue)
        shadow_counts, shadow_r2v, shadow_flag, shadow_flat, _ = (
            _shadow_plan(
                splan, eplan, omms_p, position, local_space, pose_sig,
                lights_np, samples, key, packed_mm, row_counts, rmax,
                shards=omm_axis, affine=affine,
            )
        )
        out.update(
            shadow_counts=shadow_counts, shadow_r2v=shadow_r2v,
            shadow_flag=shadow_flag, shadow_flat=shadow_flat,
            lights_dev=jnp.asarray(lights_np),
        )
    return out


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
    lights: Optional[np.ndarray] = None,  # (L,7) host rows enable lighting
) -> jnp.ndarray:
    """Production multi-chip frame on the packed MXU tracer: per-ommatidium
    means, lit or unlit, over an ("omm", "sample") mesh.

    Known gap vs the dense path: the out-of-shaft shadow AUDIT
    (pipeline shadow_audit -> renderer '[PyEye] warning: ... hit outside
    their memoised shadow shaft') is not threaded through the shard_fn, so
    multi-device lit frames render the same documented shaft approximation
    WITHOUT the runtime leak warning.  Plumb shadow_sph + the audit
    reduction through the shard signature if multi-chip lit accuracy
    monitoring is needed."""
    splan_args = _plan_for_mesh(
        scene_flat, scene_dev, ommatidia, position, local_space, samples,
        mesh,
        lights_np=(np.asarray(lights, np.float32)
                   if lights is not None else None),
        key=key, background=background,
    )
    eplan = splan_args["eplan"]
    splan = splan_args["splan"]
    splay, spin = _draw_angles(key, splan_args["omms_p"], samples)
    means_p = _sharded_packed_impl(
        splan.attr_table, scene_dev, splan.quad_table,
        splan_args["packed_mm"], splan_args["row_counts"],
        splan_args["omms_p"], splay, spin,
        splan_args["position"], splan_args["local_space"],
        splan_args["lights_dev"], splan.slot_tri,
        splan_args["shadow_counts"], splan_args["shadow_r2v"],
        splan_args["shadow_flag"], splan_args["shadow_flat"],
        splan.quad_gray,
        samples=samples, s_local=splan_args["s_local"],
        background=background,
        ng_local=splan_args["ng_local"], g=eplan.g,
        rb_local=splan_args["rb_local"], rmax=splan_args["rmax"],
        textured=splan.textured, tex_only=splan.tex_only,
        tex_static=splan.tex_static, mesh=mesh,
        affine=splan_args["affine"],
        cache=splan_args["cache"], use_cache=splan_args["use_cache"],
        cache_shape=splan_args["cache_shape"],
        sky_means=splan_args["sky_means"],
        sky_scatter=splan_args["sky_scatter"],
    )
    return means_p[eplan.inv_valid_dev]


def _packed_mesh_call(
    mesh, samples, s_local, background, ng_local, g, rb_local, rmax,
    textured, tex_only, tex_static,
    attr_table, scene_dev, quad_table, packed_mm, row_counts,
    omms_p, splay, spin, position, local_space, lights, slot_tri,
    shadow_counts, shadow_r2v, shadow_flag, shadow_flat, quad_gray,
    affine=False, cache=None, use_cache=False, cache_shape=(0, 0),
):
    """The shard-mapped packed frame core (trace + shade + sample-psum) —
    shared by the single-frame and scanned-burst jitted wrappers.

    The lit path shards cleanly because the memoised shadow plan is laid
    out shard-major (_shadow_plan(shards=...)): counts (L, NG) shard over
    "omm" on the group axis, and the ragged row table + r2v/flag split
    over "omm" on the ROW axis (equal per-shard padding, shard-local
    virtual groups) — no cross-shard state."""

    def shard_fn(attr_l, sdev_l, quad_l, pmm_l, rc_l, omms_l,
                 splay_l, spin_l, pos_l, ls_l, lights_l, slot_tri_l,
                 scnt_l, sr2v_l, sflag_l, sflat_l, qgray_l, cache_l):
        from compound_ray_tpu.eye.pipeline import _trace_shade_angles

        partial = _trace_shade_angles(
            pmm_l, rc_l, attr_l, sdev_l, quad_l, omms_l, pos_l, ls_l,
            splay_l, spin_l,
            samples=s_local, background=background, ng=ng_local, g=g,
            nrb=1, rb_size=rb_local, rmax=rmax, textured=textured,
            tex_only=tex_only, tex_static=tex_static,
            lights=lights_l, slot_tri=slot_tri_l,
            shadow_counts=scnt_l, shadow_r2v=sr2v_l,
            shadow_flag=sflag_l, shadow_flat=sflat_l, quad_gray=qgray_l,
            affine=affine,
            # far-field cache: replicated table, same unified epilogue as
            # the single-chip path (each shard gathers for its own rays)
            cache=cache_l, use_cache=use_cache, cache_shape=cache_shape,
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
            P(), P(), P(), P(),
            P(None, "omm"), P("omm"), P("omm"), P("omm", None, None),
            P(), P(),
        ),
        out_specs=P("omm", None),
        check_vma=False,
    )
    return fn(
        attr_table, scene_dev, quad_table, packed_mm,
        row_counts, omms_p, splay, spin, position, local_space,
        lights, slot_tri, shadow_counts, shadow_r2v, shadow_flag,
        shadow_flat, quad_gray, cache,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "s_local", "background", "ng_local", "g", "rb_local",
        "rmax", "textured", "tex_only", "tex_static", "mesh", "affine",
        "use_cache", "cache_shape",
    ),
)
def _sharded_packed_impl(
    attr_table, scene_dev, quad_table, packed_mm, row_counts,
    omms_p, splay, spin, position, local_space, lights, slot_tri,
    shadow_counts, shadow_r2v, shadow_flag, shadow_flat, quad_gray,
    samples: int, s_local: int, background: int, ng_local: int, g: int,
    rb_local: int, rmax: int, textured: bool, tex_only: bool,
    tex_static, mesh: Mesh, affine: bool = False,
    cache=None, use_cache: bool = False, cache_shape=(0, 0),
    sky_means=None, sky_scatter=None,
):
    """jit-of-shard_map: ONE compiled executable per (widths, mesh) combo.
    An eager shard_map runs its body primitive-by-primitive through the
    impl path (~500 separate pjit dispatches per frame — measured 40 s on
    the 8-device CPU mesh); under jit it lowers to a single SPMD program.

    With the sky split active, the shard_map covers only the COMPACTED
    live groups; the scatter over the replicated sky expectations happens
    here in the enclosing jit (XLA inserts the gather collective)."""
    out = _packed_mesh_call(
        mesh, samples, s_local, background, ng_local, g, rb_local, rmax,
        textured, tex_only, tex_static,
        attr_table, scene_dev, quad_table, packed_mm, row_counts,
        omms_p, splay, spin, position, local_space, lights, slot_tri,
        shadow_counts, shadow_r2v, shadow_flag, shadow_flat, quad_gray,
        affine=affine, cache=cache, use_cache=use_cache,
        cache_shape=cache_shape,
    )
    if sky_means is not None:
        out = sky_means.at[sky_scatter].set(out, mode="drop")
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "s_local", "background", "ng_local", "g", "rb_local",
        "rmax", "textured", "tex_only", "tex_static", "mesh", "affine",
        "use_cache", "cache_shape",
    ),
)
def _sharded_packed_frames_impl(
    attr_table, scene_dev, quad_table, packed_mm, row_counts,
    omms_p, keys, position, local_space, lights, slot_tri,
    shadow_counts, shadow_r2v, shadow_flag, shadow_flat, quad_gray,
    samples: int, s_local: int, background: int, ng_local: int, g: int,
    rb_local: int, rmax: int, textured: bool, tex_only: bool,
    tex_static, mesh: Mesh, affine: bool = False,
    cache=None, use_cache: bool = False, cache_shape=(0, 0),
    sky_means=None, sky_scatter=None,
):
    """F consecutive frames over the mesh in ONE dispatch: lax.scan over
    the stacked per-frame keys around the shard-mapped frame core — the
    multi-chip twin of pipeline._render_frames_scanned.  Each step draws
    the GLOBAL angle set from its frame key (same draw as the dense path)
    and shard_map slices it over the mesh; frames equal sequential sharded
    frames up to f32 fusion (XLA contracts the in-loop angle draw
    differently from the eager one — measured 1-ULP differences on a few
    values; tests/test_pipelined_scan.py)."""
    def step(carry, key):
        splay, spin = _draw_angles(key, omms_p, samples)
        means = _packed_mesh_call(
            mesh, samples, s_local, background, ng_local, g, rb_local,
            rmax, textured, tex_only, tex_static,
            attr_table, scene_dev, quad_table, packed_mm, row_counts,
            omms_p, splay, spin, position, local_space, lights, slot_tri,
            shadow_counts, shadow_r2v, shadow_flag, shadow_flat, quad_gray,
            affine=affine, cache=cache, use_cache=use_cache,
            cache_shape=cache_shape,
        )
        if sky_means is not None:
            means = sky_means.at[sky_scatter].set(means, mode="drop")
        return carry, means

    _, out = jax.lax.scan(step, 0, keys)
    return out  # (F, Np, 3)


def render_means_sharded_packed_frames(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia: np.ndarray,  # (N,8) host
    position,
    local_space,
    keys: jax.Array,  # (F, ...) stacked per-frame PRNG keys
    samples: int,
    background: int,
    mesh: Mesh,
    lights: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """(F, N, 3) means for F consecutive frames over the mesh in one
    dispatch — the multi-chip render_frames_pipelined backend (lit or
    unlit); the shared plan is built once per pose."""
    splan_args = _plan_for_mesh(
        scene_flat, scene_dev, ommatidia, position, local_space, samples,
        mesh,
        lights_np=(np.asarray(lights, np.float32)
                   if lights is not None else None),
        key=keys[0], background=background,
    )
    eplan = splan_args["eplan"]
    splan = splan_args["splan"]
    out = _sharded_packed_frames_impl(
        splan.attr_table, scene_dev, splan.quad_table,
        splan_args["packed_mm"], splan_args["row_counts"],
        splan_args["omms_p"], keys,
        splan_args["position"], splan_args["local_space"],
        splan_args["lights_dev"], splan.slot_tri,
        splan_args["shadow_counts"], splan_args["shadow_r2v"],
        splan_args["shadow_flag"], splan_args["shadow_flat"],
        splan.quad_gray,
        samples=samples, s_local=splan_args["s_local"],
        background=background,
        ng_local=splan_args["ng_local"], g=eplan.g,
        rb_local=splan_args["rb_local"], rmax=splan_args["rmax"],
        textured=splan.textured, tex_only=splan.tex_only,
        tex_static=splan.tex_static, mesh=mesh,
        affine=splan_args["affine"],
        cache=splan_args["cache"], use_cache=splan_args["use_cache"],
        cache_shape=splan_args["cache_shape"],
        sky_means=splan_args["sky_means"],
        sky_scatter=splan_args["sky_scatter"],
    )
    return out[:, eplan.inv_valid_dev]


def render_samples_sharded_packed(
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
    """Raw per-sample radiance (S, N, 3) over the mesh (the reference's
    compound sample buffer layout) — the sharded twin of
    pipeline.render_samples_pallas.  Each (omm, sample) shard emits its
    (Np_local, S_local, 3) slice; shard_map reassembles the global array."""
    # raw samples keep the dense semantics: no far-field cache (the dense
    # raw path renders without it) and no sky split (per-sample values
    # must be actual samples, not expectations)
    args = _plan_for_mesh(
        scene_flat, scene_dev, ommatidia, position, local_space, samples,
        mesh, allow_cache=False,
    )
    eplan = args["eplan"]
    splan = args["splan"]
    splay, spin = _draw_angles(key, args["omms_p"], samples)
    raw_p = _sharded_samples_impl(
        splan.attr_table, scene_dev, splan.quad_table,
        args["packed_mm"], args["row_counts"], args["omms_p"], splay, spin,
        args["position"], args["local_space"],
        s_local=args["s_local"], background=background,
        ng_local=args["ng_local"], g=eplan.g,
        rb_local=args["rb_local"], rmax=args["rmax"],
        textured=splan.textured, tex_only=splan.tex_only,
        tex_static=splan.tex_static, mesh=mesh,
        affine=args["affine"],
    )  # (Np, S, 3)
    return jnp.transpose(raw_p[eplan.inv_valid_dev], (1, 0, 2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "s_local", "background", "ng_local", "g", "rb_local",
        "rmax", "textured", "tex_only", "tex_static", "mesh", "affine",
    ),
)
def _sharded_samples_impl(
    attr_table, scene_dev, quad_table, packed_mm, row_counts,
    omms_p, splay, spin, position, local_space,
    s_local: int, background: int, ng_local: int, g: int,
    rb_local: int, rmax: int, textured: bool, tex_only: bool,
    tex_static, mesh: Mesh, affine: bool = False,
):
    def shard_fn(attr_l, sdev_l, quad_l, pmm_l, rc_l, omms_l,
                 splay_l, spin_l, pos_l, ls_l):
        from compound_ray_tpu.eye.pipeline import _trace_shade_angles

        return _trace_shade_angles(
            pmm_l, rc_l, attr_l, sdev_l, quad_l, omms_l, pos_l, ls_l,
            splay_l, spin_l,
            samples=s_local, background=background, ng=ng_local, g=g,
            nrb=1, rb_size=rb_local, rmax=rmax, textured=textured,
            tex_only=tex_only, tex_static=tex_static,
            want_samples=True, affine=affine,
        )  # (Np_local, S_local, 3)

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
        out_specs=P("omm", "sample", None),
        check_vma=False,
    )
    return fn(
        attr_table, scene_dev, quad_table, packed_mm,
        row_counts, omms_p, splay, spin, position, local_space,
    )
