"""Pallas frame pipeline: plan caching + prep + kernel + epilogue.

Per frame (2 device dispatches + 1 small host sync):
  1. cull dispatch: cone-vs-cluster masks, per-group counts, distance bounds.
     The max surviving count (Kmax) comes to the host to size the kernel's
     ragged shortlist scratch; a high-water mark avoids recompiles.
  2. render dispatch (one jit): sample-angle draw -> world rays -> Pallas
     tracer kernel -> epilogue (vertex-colour linearisation, texture-atlas
     resolve, miss shading, per-ommatidium mean).

Ommatidia are permuted by view direction so that groups of G neighbours
share coherent cluster shortlists (G shrinks to 1 as samples/omm grows —
with many samples a single ommatidium already fills the kernel's ray
blocks); results are inverse-permuted on the way out.

The eye geometry is normalised for the kernel: ray directions are unit
length and tmin is rescaled by |relative direction| so that the kernel's
t values are world distances — required by the front-to-back early-exit
comparison against cluster distance bounds.  Radiance outputs are
identical to the reference semantics (shaders.cu:666-736) because only
the t parameterisation changes, not the ray set.
"""

from __future__ import annotations

import functools
import hashlib
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.accel.clusters import ClusterSet, build_clusters
from compound_ray_tpu.accel.cull import eye_world_geometry
from compound_ray_tpu.config import get_config, load_tuning
from compound_ray_tpu.eye.sampling import (
    FWHM_SD_RATIO,
    cone_offset_components,
    cone_offset_directions,
    sample_angles,
    sample_angles_ns,
)
from compound_ray_tpu.trace.pallas_tracer import (
    ATTR_COMPS_FLAT,
    BATCH_RAYS,
    KERNEL_LEAF,
    OUT_COMPS,
    build_attr_table,
    build_kernel_payload,
    pack_rays,
    run_tracer_kernel,
)
from compound_ray_tpu.trace.mm_tracer import (
    BATCH_RAYS as MM_BATCH_RAYS,
    MM_BLOCKS,
    MM_COLS,
    MM_FEATS,
    build_mm_features,
    run_packed_tracer,
    run_rows_occlusion,
    slot_spheres,
)
from compound_ray_tpu.trace.shade import (
    build_quad_table,
    build_quad_table_gray,
    quad_bilinear_gray_c,
    miss_color,
    miss_color_c,
    quad_bilinear,
    quad_bilinear_c,
    sample_texture_quad,
    texture_quad_coords,
    texture_bilinear4_single,
    texture_quad_coords_c,
    texture_quad_coords_single,
)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# Inflation applied to the per-group hit-bound spheres the shadow plan is
# built from: the probe samples ONE frame's hit cloud, later frames jitter
# within the same acceptance cones, so the memoised occluder payloads must
# cover a neighbourhood of the probed bounds (a hit outside the shaft
# would silently skip SOME of its occluders -> partial light leak on that
# sample).  KNOWN APPROXIMATION: the inflate covers radial growth of the
# hit cloud but not hit-DISTANCE discontinuities — a later frame's ray
# that crosses a silhouette edge the probe frame never crossed (e.g.
# grazing past a near pillar onto a far wall) lands outside the shaft and
# its shadow ray only sees the shaft-local occluder rows.  The Gaussian
# splay is unbounded, so a sound bound would need the group's full
# candidate-triangle extent (the round-2 cluster strips — measured 16x
# slower).  With probe samples >= the frame's samples the probe covers
# the splay distribution to ~3.4 sigma; a leaked sample biases a
# 1000-sample mean by <= 1/samples of the light term.
SHADOW_BOUND_INFLATE = 1.25
# reverse-affine shadow rows carry only the matmul feature rows [Q_d, Q_c,
# 0 x 4] — occlusion never reads the metadata rows 8:16
SHADOW_FEATS = 8


@dataclass
class ScenePlan:
    """Per-scene kernel payload (built once, like the reference's GAS)."""

    payload: jnp.ndarray  # (C, 16, 128) intersection constants
    attr_table: jnp.ndarray = None  # (C*128, A) deferred winner attributes
    sphere_center: jnp.ndarray = None  # (C, 3)
    sphere_radius: jnp.ndarray = None  # (C,)
    num_clusters: int = 0
    textured: bool = False
    quad_table: jnp.ndarray = None  # (P, 16) texel 2x2 quads (textured only)
    half_center: jnp.ndarray = None  # (C, 2, 3)
    half_radius: jnp.ndarray = None  # (C, 2)
    sphere_center_np: np.ndarray = None  # host copies for far-field split
    sphere_radius_np: np.ndarray = None
    tex_only: bool = False  # every triangle textured, no vertex colours
    # packed MXU tracer tables (trace/mm_tracer.py): per-slot matmul feature
    # columns + per-slot triangle bounding spheres for the cone refine
    mm_flat: jnp.ndarray = None  # (S+128, 64) flattened feature columns
    slot_center_cl: jnp.ndarray = None  # (C, 128, 3)
    slot_radius_cl: jnp.ndarray = None  # (C, 128); -1 on padding slots
    slot_tri_cl: jnp.ndarray = None  # (C, 128, 9) [v0|e1|e2] for exact refine
    slot_tri: jnp.ndarray = None  # (S,) int32 global slot -> triangle id
    tex_static: Tuple = None  # (off,w,h,ws,wt,filt) when exactly 1 texture
    quad_gray: jnp.ndarray = None  # (P, 4) single-channel quads: big
    #   GRAYSCALE single textures sample with ONE in-cliff gather (the
    #   colour quad table would be 4x the bytes, past the residency cliff)
    # per-plan caches (kept on the plan, NOT keyed by id(scene): CPython
    # recycles object ids after GC, which would alias stale plans)
    kmax_cache: Dict = None
    cache_store: Dict = None
    packed_store: Dict = None  # pose -> (row_counts, packed_mm), bounded
    shadow_store: Dict = None  # (pose, lights) -> per-light shadow payloads
    loctab_store: Dict = None  # pose/widths -> per-group local resolve tables
    shadow_sound_all: bool = False  # leak detected: use guaranteed bounds
    shadow_unsound_groups: set = None  # per-GROUP corrective (see
    #   mark_shadow_unsound): only these groups get candidate-extent
    #   shafts — group indices are eye-plan-permutation positions, which
    #   are pose-independent for a given eye
    sky_store: Dict = None  # pose -> sky-split plan (_sky_plan), bounded
    scene_sig: str = ""  # geometry content hash (per-scene adoptions)
    precision: Optional[str] = None  # per-scene adopted mode (or None)
    direct1: Optional[bool] = None  # per-scene adopted cnt==1 fast path


def scene_sig(scene_flat) -> str:
    """Stable content signature of the scene geometry — the key for
    per-SCENE measured adoptions (tuning.json "precision_by_scene").
    Hashing the triangle soup means any geometry change re-keys the scene
    to the safe default; materials/textures are deliberately excluded
    (the intersection math the adoption governs never reads them)."""
    h = hashlib.blake2b(digest_size=12)
    for a in (scene_flat.v0, scene_flat.e1, scene_flat.e2):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _scene_precision(sig: str) -> Optional[str]:
    """Per-scene intersection precision from tuning.json, or None (module
    default).  The tools/tpu_session.py precision stage adopts a lossy
    mode per scene signature when that scene's conformance configs pass
    the same-seed gate even though the GLOBAL gate failed (round 4: the
    one-pass bf16 matmul holds on the natural scene at 0.17% vs-control
    but errs 0.92% on the ofstad arena).  An explicit CR_TPU_PRECISION
    env var overrides everything — including this — via the module
    default, so per-scene resolution must stand down then."""
    if os.environ.get("CR_TPU_PRECISION", "").strip():
        return None
    per_scene = load_tuning().get("precision_by_scene", {})
    p = per_scene.get(sig) if isinstance(per_scene, dict) else None
    from compound_ray_tpu.trace.mm_tracer import _PRECISIONS

    return p if p in _PRECISIONS else None


def _scene_direct1(sig: str):
    """Per-scene direct1 (the cnt==1 SSA fast path) from tuning.json
    "direct1_by_scene" — bit-identical to the standard loop, so adoption
    is by measured speed per scene (the ofstad arena gains ~4% kernel
    while the natural scene is a wash; tools/tpu_session run_direct1).
    None = the module default (tuning "direct1")."""
    if os.environ.get("CR_TPU_DIRECT1", "").strip():
        return None
    per_scene = load_tuning().get("direct1_by_scene", {})
    v = per_scene.get(sig) if isinstance(per_scene, dict) else None
    return bool(v) if v is not None else None


def scene_plan(scene_flat) -> ScenePlan:
    plan = getattr(scene_flat, "_kernel_plan", None)
    if plan is None:
        # NOTE: subdividing oversized triangles (scene.flat.
        # subdivide_large_triangles) was evaluated here for the closed-arena
        # case: it tightens cluster bounds but does NOT reduce tests/ray —
        # at close range every cluster is angularly large regardless, so the
        # arena needs per-packet traversal (PLAN.md) rather than finer soup.
        cs = build_clusters(scene_flat.v0, scene_flat.e1, scene_flat.e2,
                            leaf_size=KERNEL_LEAF)
        payload = build_kernel_payload(cs)
        textured = scene_flat.has_any_texture
        used_mats = np.maximum(np.asarray(scene_flat.mat_id), 0)
        tex_only = bool(
            textured
            and not np.asarray(scene_flat.has_color).any()
            and (np.asarray(scene_flat.mat_tex)[used_mats] >= 0).all()
        )
        attr = build_attr_table(
            {
                "has_color": scene_flat.has_color,
                "mat_id": scene_flat.mat_id,
                "mat_base_color": scene_flat.mat_base_color,
                "mat_tex": scene_flat.mat_tex,
                "c0": scene_flat.c0,
                "c1": scene_flat.c1,
                "c2": scene_flat.c2,
                "uv0": scene_flat.uv0,
                "uv1": scene_flat.uv1,
                "uv2": scene_flat.uv2,
            },
            cs,
            tex_only,
        )
        # single-texture scenes get STATIC sampler constants: the epilogue
        # then skips six per-ray sampler-table gathers and the three-mode
        # wrap select (texture_quad_coords_single)
        tex_static = None
        if textured and len(np.asarray(scene_flat.tex_width)) == 1:
            tex_static = (
                int(np.asarray(scene_flat.tex_offset)[0]),
                int(np.asarray(scene_flat.tex_width)[0]),
                int(np.asarray(scene_flat.tex_height)[0]),
                int(np.asarray(scene_flat.tex_wrap_s)[0]),
                int(np.asarray(scene_flat.tex_wrap_t)[0]),
                int(np.asarray(scene_flat.tex_filter)[0]),
            )
        quad_gray = None
        if textured:
            # quad tables are HOST-side precomputes: feed them the host
            # tex_data copy (identical texels to the device copy — the
            # linearize happened at _build_textures) rather than the
            # device dict, whose np.asarray blocks on a device->host
            # transfer through the tunnel (~2 s for a 50 MB atlas)
            host_tex = {
                "tex_data": np.asarray(scene_flat.tex_data),
                "tex_offset": scene_flat.tex_offset,
                "tex_width": scene_flat.tex_width,
                "tex_height": scene_flat.tex_height,
                "tex_wrap_s": scene_flat.tex_wrap_s,
                "tex_wrap_t": scene_flat.tex_wrap_t,
            }
            # big GRAYSCALE single textures (e.g. the ofstad arena's
            # 3072x1024 patterning, R == G == B on every texel): a
            # single-channel (P, 4) quad table stays under the gather
            # residency cliff, so bilinear costs ONE gather/ray instead of
            # four texel gathers — bit-identical results (same linearized
            # texels, same blend order)
            if (tex_static is not None
                    and host_tex["tex_data"].shape[0] * 64 > 100_000_000):
                tex_np = host_tex["tex_data"]
                if (np.array_equal(tex_np[:, 0], tex_np[:, 1])
                        and np.array_equal(tex_np[:, 0], tex_np[:, 2])):
                    quad_gray = build_quad_table_gray(host_tex)
            # the 16-wide colour quad table is dead weight when the gray
            # path serves every textured ray — skip the 4x-bytes build
            quad = (jnp.zeros((1, 16), jnp.float32) if quad_gray is not None
                    else build_quad_table(host_tex))
        else:
            quad = jnp.zeros((1, 16), jnp.float32)
        tid_s = cs.tri_id.reshape(-1)
        safe_s = np.maximum(tid_s, 0)
        mat_id_slot = np.maximum(np.asarray(scene_flat.mat_id)[safe_s], 0)
        texid_slot = np.asarray(scene_flat.mat_tex)[mat_id_slot]
        flat_attrs = attr.shape[1] == ATTR_COMPS_FLAT
        mm_feats = build_mm_features(
            cs,
            uv=(np.asarray(scene_flat.uv0), np.asarray(scene_flat.uv1),
                np.asarray(scene_flat.uv2)),
            texid=texid_slot,
            rgb=(np.asarray(scene_flat.mat_base_color)[mat_id_slot][:, :3]
                 if flat_attrs else None),
        )  # (S+128, 4, 16)
        tri_c, tri_r, _ = slot_spheres(cs)
        c_cl = cs.tri_id.shape[0]
        plan = ScenePlan(
            mm_flat=jnp.asarray(mm_feats.reshape(mm_feats.shape[0], -1)),
            slot_center_cl=jnp.asarray(tri_c.reshape(c_cl, KERNEL_LEAF, 3)),
            slot_radius_cl=jnp.asarray(tri_r.reshape(c_cl, KERNEL_LEAF)),
            slot_tri_cl=jnp.asarray(
                np.concatenate([cs.v0, cs.e1, cs.e2], axis=1)
                .astype(np.float32)
                .reshape(c_cl, KERNEL_LEAF, 9)
            ),
            payload=jnp.asarray(payload),
            attr_table=jnp.asarray(attr),
            sphere_center=jnp.asarray(cs.sphere_center),
            sphere_radius=jnp.asarray(cs.sphere_radius),
            num_clusters=cs.num_clusters,
            textured=textured,
            quad_table=quad,
            half_center=jnp.asarray(cs.half_center),
            half_radius=jnp.asarray(cs.half_radius),
            sphere_center_np=np.asarray(cs.sphere_center),
            sphere_radius_np=np.asarray(cs.sphere_radius),
            tex_only=tex_only,
            tex_static=tex_static,
            quad_gray=quad_gray,
            slot_tri=jnp.asarray(
                cs.tri_id.reshape(-1).astype(np.int32)
            ),
            kmax_cache={},
            cache_store={},
            packed_store={},
            shadow_store={},
            sky_store={},
            loctab_store={},
            shadow_unsound_groups=set(),
        )
        plan.scene_sig = scene_sig(scene_flat)
        plan.precision = _scene_precision(plan.scene_sig)
        plan.direct1 = _scene_direct1(plan.scene_sig)
        scene_flat._kernel_plan = plan
    return plan


@dataclass
class EyePlan:
    """Per-(eye, samples) static layout: permutation + group geometry."""

    perm: np.ndarray  # (Np,) padded permutation into original omms
    inv_valid: np.ndarray  # (N,) position of omm i in permuted order
    n: int
    n_pad: int
    g: int  # omms per group
    ng: int
    rg_pad: int  # padded rays per group
    rb_size: int
    nrb: int
    kmax_hint: int = 8
    rmax_hint: int = 1  # packed payload rows per group (high-water)
    omms_p_dev: Any = None  # cached device copy of the permuted eye
    inv_valid_dev: Any = None
    sig: bytes = b""  # unique plan signature for pose/payload cache keys


_eye_plans: Dict[Tuple, EyePlan] = {}


def eye_plan(ommatidia: np.ndarray, samples: int,
             ng_multiple: int = 1) -> EyePlan:
    """Static layout for an (eye, samples) pair.  ng_multiple pads the
    GROUP count so the group axis shards evenly over a device mesh.

    Padding replicates the last ommatidium in the scan order (perm can
    only index real rows), so padded groups cull and trace like real
    ones — up to g*ng_multiple - 1 duplicate ommatidia of full-cost work
    on the last shard.  The bench/BASELINE configs pad zero (1000 omms,
    g == 1 at >=128 samples, 8 shards divides evenly); if a config with
    large padding matters, the fix is zero-row pad groups, which needs
    every reader of uninitialised out-blocks audited first (audit lanes,
    overflow confirm) — do not flip it casually.  Outputs of padded
    lanes are discarded via inv_valid either way."""
    h = hashlib.blake2b(np.ascontiguousarray(ommatidia).tobytes(),
                        digest_size=12).hexdigest()
    key = (h, samples, ng_multiple)
    plan = _eye_plans.get(key)
    if plan is not None:
        return plan

    n = ommatidia.shape[0]
    # group size: fill at least 128 rays per group
    g = max(1, min(32, _ceil_to(128, max(samples, 1)) // max(samples, 1)))
    # sort by direction: theta bands then phi, so groups look the same way
    d = ommatidia[:, 3:6].astype(np.float64)
    dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-30)
    theta = np.arccos(np.clip(dn[:, 1], -1, 1))
    phi = np.arctan2(dn[:, 2], dn[:, 0])
    band = np.floor(theta / 0.35).astype(np.int64)
    order = np.lexsort((phi, band))
    n_pad = _ceil_to(n, g) if ng_multiple == 1 else _ceil_to(
        n, g * ng_multiple
    )
    perm = np.concatenate([order, np.full(n_pad - n, order[-1])])
    inv_valid = np.empty(n, np.int64)
    inv_valid[order] = np.arange(n)

    ng = n_pad // g
    rg = g * samples
    # one ray block per group, padded to the kernel batch: fewer grid cells
    # and less padding than fixed 1024-ray blocks (rg=3200 into 896-blocks
    # padded 12%; one 3328 block pads 4%).  VMEM stays modest (a 10k-sample
    # block is ~650 KB of rays).
    nrb = 1
    rb_size = _ceil_to(rg, MM_BATCH_RAYS)
    rg_pad = nrb * rb_size
    plan = EyePlan(
        perm=perm, inv_valid=inv_valid, n=n, n_pad=n_pad, g=g, ng=ng,
        rg_pad=rg_pad, rb_size=rb_size, nrb=nrb,
        # NOT a perm.tobytes() prefix: plans that share an ommatidium order
        # but pad differently (e.g. sharded ng_multiple padding) must get
        # distinct pose-cache keys, or one plan's packed payload would be
        # served to the other's frame shapes
        sig=repr(key).encode() + np.int64(n_pad).tobytes(),
    )
    _eye_plans[key] = plan
    return plan


@functools.partial(jax.jit, static_argnames=("cull_sigmas", "g"))
def _cull_groups(
    omms_p: jnp.ndarray,  # (Np,8) permuted+padded
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    centers: jnp.ndarray,  # (C, H, 3) half-sphere (or sub-sphere) table
    radii: jnp.ndarray,  # (C, H)
    cull_sigmas: float,
    g: int,
):
    apex, axis = eye_world_geometry(omms_p, position, local_space)
    half = jnp.minimum(omms_p[:, 6] / FWHM_SD_RATIO * cull_sigmas, jnp.pi)
    # COMPONENT-PLANAR and 2-D (Np, H*C): halves and clusters together on
    # lanes, ommatidia on sublanes (see the layout note in _refine_mask)
    c = centers.shape[0]
    h = centers.shape[1]
    cx = centers[:, :, 0].reshape(1, c * h)
    cy = centers[:, :, 1].reshape(1, c * h)
    cz = centers[:, :, 2].reshape(1, c * h)
    rad = radii.reshape(1, c * h)
    tx = cx - apex[:, 0][:, None]
    ty = cy - apex[:, 1][:, None]
    tz = cz - apex[:, 2][:, None]  # (Np, C*H)
    dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    inv_d = 1.0 / jnp.maximum(dist, 1e-30)
    inside = dist <= rad
    # a cluster survives if EITHER half-sphere intersects the cone — tighter
    # than one loose sphere for elongated clusters
    cos_a = (
        tx * axis[:, 0][:, None]
        + ty * axis[:, 1][:, None]
        + tz * axis[:, 2][:, None]
    ) * inv_d
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    beta = jnp.arcsin(jnp.clip(rad * inv_d, 0.0, 1.0))
    hit = inside | (alpha <= half[:, None] + beta)  # (Np, C*H)
    np_ = omms_p.shape[0]
    mask = hit.reshape(np_, c, h).any(axis=2)  # (Np, C)

    ng = np_ // g
    gmask = mask.reshape(ng, g, c).any(axis=1)
    counts = jnp.sum(gmask, axis=-1).astype(jnp.int32)

    # front-to-back bound: min over the group's members and halves of the
    # apex-to-sphere-surface distance (exact per member — tighter than the
    # round-1 centroid-minus-spread bound)
    surf = dist - rad  # (Np, C*H)
    dmin_all = jnp.maximum(
        jnp.min(surf.reshape(ng, g, c, h), axis=(1, 3)), 0.0
    )
    return gmask, counts, dmin_all


@functools.partial(jax.jit, static_argnames=("kmax",))
def _shortlist_sorted(gmask, dmin_all, kmax: int):
    # columns padded to a 128 multiple: Mosaic DMA slices must be lane-aligned
    kp = _ceil_to(kmax, 128)
    masked = jnp.where(gmask, dmin_all, jnp.inf)
    ng, c = masked.shape
    if kp > c:
        masked = jnp.concatenate(
            [masked, jnp.full((ng, kp - c), jnp.inf, masked.dtype)], axis=-1
        )
    order = jnp.argsort(masked, axis=-1)[:, :kp].astype(jnp.int32)
    dmin_s = jnp.take_along_axis(masked, order, axis=-1)
    dmin_s = jnp.where(jnp.isfinite(dmin_s), dmin_s, 3e38).astype(jnp.float32)
    # out-of-range padding ids point at cluster 0 (never dereferenced: counts
    # bound the kernel loop)
    order = jnp.where(order < c, order, 0)
    return order, dmin_s


def _refine_mask(
    omms_p: jnp.ndarray,  # (Np, 8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    ids: jnp.ndarray,  # (NG, kcand) shortlisted cluster ids
    cl_counts: jnp.ndarray,  # (NG,) surviving clusters per group
    center_cl: jnp.ndarray,  # (C, 128, 3) per-slot triangle spheres
    radius_cl: jnp.ndarray,  # (C, 128); -1 on padding slots
    g: int,
    cull_sigmas: float,
    dmax: Optional[jnp.ndarray] = None,  # (Np,) apex-distance bound
    tri_cl: Optional[jnp.ndarray] = None,  # (C, 128, 9) exact-test geometry
):
    """Level-2 cull: cone-vs-triangle-sphere over the shortlisted clusters'
    individual triangles (see trace/mm_tracer.py docstring), sharpened by an
    EXACT cone-vs-triangle test when tri_cl is given.  Returns
    (mask (NG, kcand*128) bool, dmin (NG, kcand*128) group min distance,
    slots (NG, kcand*128) global slot ids).

    The exact test works on the unit sphere around the cone apex: a triangle
    intersects the cone iff its spherical projection (vertices u_i =
    unit(v_i - apex), edges = minor great-circle arcs) meets the angular cap
    of radius `half` around the axis — cap contains a vertex, OR an edge arc
    passes within `half` of the axis, OR the axis ray pierces the triangle
    interior.  This is what makes closed arenas tractable: the arena's
    full-height wall slivers have bounding spheres as large as the arena
    (docs/performance.md 'why sphere culling saturates'), so the sphere
    refine keeps ~every nearby sliver while the exact test keeps only the
    handful a cone actually grazes.  Conservative w.r.t. the sampling
    contract: every triangle intersecting the cull_sigmas cone is kept
    (plus a 1e-3 rad slack absorbing f32 sign noise at arcs/vertices)."""
    apex, axis = eye_world_geometry(omms_p, position, local_space)
    half = jnp.minimum(omms_p[:, 6] / FWHM_SD_RATIO * cull_sigmas, jnp.pi)
    kcand = ids.shape[1]
    np_ = omms_p.shape[0]
    ng = np_ // g
    kc = kcand * KERNEL_LEAF
    # COMPONENT-PLANAR and strictly 2-D (Np, kc): the candidate axis on
    # lanes, ommatidia on sublanes.  Both the AoS form ((NG, g, kc, 3) with
    # norms over the trailing 3) and a 3-D (NG, 1, kc) form measured 10s of
    # ms/frame at NG=1000 — trailing dims of 1-3 waste 125/128 lanes, and a
    # second-minor dim of 1 wastes 7/8 sublanes.
    cx = center_cl[:, :, 0][ids].reshape(ng, kc)  # contiguous row gathers
    cy = center_cl[:, :, 1][ids].reshape(ng, kc)
    cz = center_cl[:, :, 2][ids].reshape(ng, kc)
    r = radius_cl[ids].reshape(ng, kc)

    def po(x):  # (Np,) -> (Np, 1)
        return x[:, None]

    def pc(x):  # per-group (NG, kc) -> (Np, kc) member view
        if g == 1:
            return x
        return jnp.broadcast_to(x[:, None, :], (ng, g, kc)).reshape(np_, kc)

    tx = pc(cx) - po(apex[:, 0])
    ty = pc(cy) - po(apex[:, 1])
    tz = pc(cz) - po(apex[:, 2])  # (Np, kc)
    dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    inv_d = 1.0 / jnp.maximum(dist, 1e-30)
    rb = pc(r)
    inside = dist <= rb
    cos_a = (tx * po(axis[:, 0]) + ty * po(axis[:, 1])
             + tz * po(axis[:, 2])) * inv_d
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    beta = jnp.arcsin(jnp.clip(rb * inv_d, 0.0, 1.0))
    m = inside | (alpha <= half[:, None] + beta)  # (Np, kc)
    if tri_cl is not None:
        slack = 1e-3  # rad; absorbs f32 sign noise at arc/vertex boundaries
        hs = jnp.minimum(half + slack, jnp.pi)[:, None]  # (Np, 1)
        cosh = jnp.cos(hs)
        sinh = jnp.sin(jnp.minimum(hs, jnp.pi / 2.0))
        wide = hs >= jnp.pi / 2.0

        def gat(comp):  # slot component -> (NG, kc) candidate-major rows
            return tri_cl[:, :, comp][ids].reshape(ng, kc)

        wxp = po(axis[:, 0])
        wyp = po(axis[:, 1])
        wzp = po(axis[:, 2])
        # spherical projections of the three vertices (member-broadcast)
        d0x = pc(gat(0)) - po(apex[:, 0])
        d0y = pc(gat(1)) - po(apex[:, 1])
        d0z = pc(gat(2)) - po(apex[:, 2])
        d1x, d1y, d1z = d0x + pc(gat(3)), d0y + pc(gat(4)), d0z + pc(gat(5))
        d2x, d2y, d2z = d0x + pc(gat(6)), d0y + pc(gat(7)), d0z + pc(gat(8))

        def unit3(x, y, z):
            l2 = x * x + y * y + z * z
            inv = jax.lax.rsqrt(jnp.maximum(l2, 1e-24))
            return x * inv, y * inv, z * inv, l2

        u0x, u0y, u0z, l0 = unit3(d0x, d0y, d0z)
        u1x, u1y, u1z, l1 = unit3(d1x, d1y, d1z)
        u2x, u2y, u2z, l2_ = unit3(d2x, d2y, d2z)
        vert_in = (
            (u0x * wxp + u0y * wyp + u0z * wzp >= cosh)
            | (u1x * wxp + u1y * wyp + u1z * wzp >= cosh)
            | (u2x * wxp + u2y * wyp + u2z * wzp >= cosh)
        )

        def edge_test(uix, uiy, uiz, ujx, ujy, ujz):
            # minor arc u_i -> u_j: the projection of the edge segment.
            # Distance from the axis to the arc's great circle is
            # asin(|w . n|); the comparison |w . n| <= sin(half) is exact
            # for half <= pi/2 and `wide` covers the rest.
            cxx = uiy * ujz - uiz * ujy
            cyy = uiz * ujx - uix * ujz
            czz = uix * ujy - uiy * ujx
            cl2 = cxx * cxx + cyy * cyy + czz * czz
            invc = jax.lax.rsqrt(jnp.maximum(cl2, 1e-24))
            nx, ny, nz = cxx * invc, cyy * invc, czz * invc
            sind = wxp * nx + wyp * ny + wzp * nz
            # closest great-circle point to the axis; in-arc = positive span
            ccx = wxp - sind * nx
            ccy = wyp - sind * ny
            ccz = wzp - sind * nz
            in1 = ((uiy * ccz - uiz * ccy) * nx + (uiz * ccx - uix * ccz) * ny
                   + (uix * ccy - uiy * ccx) * nz) >= 0.0
            in2 = ((ccy * ujz - ccz * ujy) * nx + (ccz * ujx - ccx * ujz) * ny
                   + (ccx * ujy - ccy * ujx) * nz) >= 0.0
            # u_i ~ -u_j: the apex lies ON the edge segment -> intersects
            dotij = uix * ujx + uiy * ujy + uiz * ujz
            deg = (cl2 < 1e-12) & (dotij < 0.0)
            return (in1 & in2 & ((jnp.abs(sind) <= sinh) | wide)) | deg, (
                cxx, cyy, czz)

        e01, n01 = edge_test(u0x, u0y, u0z, u1x, u1y, u1z)
        e12, n12 = edge_test(u1x, u1y, u1z, u2x, u2y, u2z)
        e20, n20 = edge_test(u2x, u2y, u2z, u0x, u0y, u0z)

        def same_side(n, px, py, pz):  # axis and opposite vertex agree on n
            nx, ny, nz = n
            return ((wxp * nx + wyp * ny + wzp * nz)
                    * (px * nx + py * ny + pz * nz)) >= 0.0

        axis_in = (
            same_side(n01, u2x, u2y, u2z)
            & same_side(n12, u0x, u0y, u0z)
            & same_side(n20, u1x, u1y, u1z)
        )
        # apex within f32 range of a vertex: projection undefined -> keep.
        # NOTE: the sphere-containment `inside` term must NOT join this OR —
        # an arena apex sits inside most wall slivers' bounding spheres,
        # which would void the exact test exactly where it matters.  Apex
        # ON a triangle is covered by deg_len + the antipodal edge guard
        # (the projection otherwise always fits an open hemisphere, so the
        # minor-arc / sign tests are exact).
        deg_len = (l0 < 1e-12) | (l1 < 1e-12) | (l2_ < 1e-12)
        m = m & (vert_in | e01 | e12 | e20 | axis_in | deg_len)
    if dmax is not None:
        # shadow refine: occluders past the target bound sphere cannot
        # block any light->hit segment — drop the cone's far tail
        m = m & (dist - rb <= dmax[:, None])
    if g > 1:
        m = m.reshape(ng, g, kc).any(axis=1)
        dist = dist.reshape(ng, g, kc).min(axis=1)
    cand_valid = jnp.broadcast_to(
        (jnp.arange(kcand)[None, :] < cl_counts[:, None])[:, :, None],
        (ng, kcand, KERNEL_LEAF),
    ).reshape(ng, kc)
    # r < 0 marks padding slots: their zero centroid could otherwise pass
    # the angular test whenever the cone looks at the origin
    mask = m & cand_valid & (r >= 0.0)
    slots = (
        ids[:, :, None] * KERNEL_LEAF
        + jnp.arange(KERNEL_LEAF, dtype=ids.dtype)[None, None, :]
    ).reshape(ng, kc)
    return mask, dist, slots


@functools.partial(
    jax.jit, static_argnames=("g", "kcand", "cull_sigmas")
)
def _refine_counts(
    omms_p, position, local_space, half_center, half_radius,
    center_cl, radius_cl, g: int, kcand: int, cull_sigmas: float,
    dmax: Optional[jnp.ndarray] = None,
    tri_cl: Optional[jnp.ndarray] = None,
):
    """Planning dispatch: packed payload rows per group at this pose."""
    gmask, counts, dmin_all = _cull_groups(
        omms_p, position, local_space, half_center, half_radius,
        cull_sigmas, g,
    )
    ids, _ = _shortlist_sorted(gmask, dmin_all, kcand)
    cl_counts = jnp.minimum(counts, kcand)
    mask, _, _ = _refine_mask(
        omms_p, position, local_space, ids[:, :kcand], cl_counts,
        center_cl, radius_cl, g, cull_sigmas, dmax=dmax, tri_cl=tri_cl,
    )
    refined = jnp.sum(mask, axis=-1)
    return ((refined + KERNEL_LEAF - 1) // KERNEL_LEAF).astype(jnp.int32)


def _refine_pack(
    omms_p, position, local_space, ids, cl_counts,
    center_cl, radius_cl, mm_flat,
    g: int, kcand: int, rmax: int, cull_sigmas: float,
    dmax: Optional[jnp.ndarray] = None,
    tri_cl: Optional[jnp.ndarray] = None,
):
    """Refine + compact: gather the surviving triangles' matmul feature
    columns into per-group (rmax, 16, 512) payload blocks, near-to-far.
    Returns (row_counts (NG,) int32, packed_mm (NG, rmax, 16, 512),
    need_r scalar int32 = the UNCLAMPED max rows any group wanted — > rmax
    means the pack truncated and the speculative-widths path must
    re-measure)."""
    mask, dmin_g, slots = _refine_mask(
        omms_p, position, local_space, ids, cl_counts,
        center_cl, radius_cl, g, cull_sigmas, dmax=dmax, tri_cl=tri_cl,
    )
    ng = mask.shape[0]
    refined = jnp.sum(mask, axis=-1)
    row_counts = ((refined + KERNEL_LEAF - 1) // KERNEL_LEAF).astype(jnp.int32)
    need_r = jnp.max(row_counts)
    # structural contract with the kernel: its fori_loop reads row_counts[g]
    # rows of a (rmax, 16, 512) block, so the count must never exceed rmax
    # even if _refine_counts (a separately-jitted program) rounded
    # differently at a 128-multiple boundary
    row_counts = jnp.minimum(row_counts, rmax)
    # one co-sort of (key, slot) — cheaper than argsort + take_along_axis
    key = jnp.where(mask, dmin_g, jnp.inf)
    sk, ss = jax.lax.sort((key, slots), dimension=-1, num_keys=1)
    sk = sk[:, : rmax * KERNEL_LEAF]
    ss = ss[:, : rmax * KERNEL_LEAF]
    # compaction padding points at the all-zero PAD rows appended to the
    # feature table (den = 0 -> self-masking in the kernel)
    pad_slot = mm_flat.shape[0] - 1
    packed_slot = jnp.where(jnp.isfinite(sk), ss, pad_slot)
    gathered = mm_flat[packed_slot]  # (NG, rmax*128, 64)
    packed_mm = (
        gathered.reshape(ng, rmax, KERNEL_LEAF, MM_BLOCKS, MM_FEATS)
        .transpose(0, 1, 4, 3, 2)
        .reshape(ng, rmax, MM_FEATS, MM_COLS)
    )
    return row_counts, packed_mm, need_r


def _attrs_from_rows(attr, u, v, tex_only: bool, flat_attrs: bool):
    """The resolve_kernel_hits attribute math on an already-materialised
    (R, A) attr slab (shared by the gather path and the one-hot local
    resolve so the two stay formula-identical)."""
    w0n = 1.0 - u - v
    cu = w0n * attr[:, 0] + u * attr[:, 2] + v * attr[:, 4]
    cv = w0n * attr[:, 1] + u * attr[:, 3] + v * attr[:, 5]
    texid = attr[:, 6].astype(jnp.int32)
    if tex_only:
        rgb = None
    elif flat_attrs:
        rgb = (attr[:, 7], attr[:, 8], attr[:, 9])
    else:
        lin = attr[:, 7] > 0.5
        rgb = tuple(
            jnp.where(lin, jnp.power(jnp.maximum(ch, 0.0), 2.2), ch)
            for ch in (
                w0n * attr[:, 8] + u * attr[:, 11] + v * attr[:, 14],
                w0n * attr[:, 9] + u * attr[:, 12] + v * attr[:, 15],
                w0n * attr[:, 10] + u * attr[:, 13] + v * attr[:, 16],
            )
        )
    return cu, cv, texid, rgb


# group chunk for the one-hot local resolve: bounds the materialised
# one-hot operand at chunk * rg_pad * 128 f32 (~9 MB at 16 x 1064)
_LOC_RESOLVE_CHUNK = 16


@functools.partial(jax.jit, static_argnames=("ng", "rg_pad"))
def _local_resolve(loc_f, loc_tab, ng: int, rg_pad: int):
    """(R, C) winner-attribute rows via a one-hot MXU contraction against
    per-group LOCAL tables — the TPU-native replacement for the
    descriptor-rate-bound global row gather (~16.6 ms per 1e6 rays,
    docs/performance.md gather table; the contraction streams ~10x fewer
    HBM bytes and its MACs are noise).

    loc_f: (R,) f32 winner LOCAL index (emit "loc": payload row j, lane l
    -> j*128 + l; -1 on miss).  loc_tab: (NG, rmax, 128, C) per-group
    tables (_build_local_tables).  Two-level one-hot — lanes (128) via a
    HIGHEST-precision batched matmul, payload rows (rmax, tiny) via a
    second exact contraction — keeps the materialised one-hot at
    (chunk, rg_pad, 128) instead of (R, rmax*128).  Every product is
    1.0 * value or 0.0 and each sum has at most one nonzero term, so the
    result is BIT-IDENTICAL to the gathered rows (miss rays resolve to
    exact zeros)."""
    rmax_l, leaf, c = loc_tab.shape[1], loc_tab.shape[2], loc_tab.shape[3]
    hp = jax.lax.Precision.HIGHEST
    loc = loc_f.reshape(ng, rg_pad).astype(jnp.int32)
    cs = min(_LOC_RESOLVE_CHUNK, ng)
    nch = -(-ng // cs)
    pad = nch * cs - ng
    if pad:
        loc = jnp.pad(loc, ((0, pad), (0, 0)), constant_values=-1)
        loc_tab = jnp.pad(loc_tab, ((0, pad), (0, 0), (0, 0), (0, 0)))
    locc = loc.reshape(nch, cs, rg_pad)
    tabc = loc_tab.reshape(nch, cs, rmax_l, leaf, c)

    def one(args):
        l, tb = args  # (cs, rg_pad), (cs, rmax, 128, C)
        lane = jax.lax.broadcasted_iota(jnp.int32, (cs, rg_pad, leaf), 2)
        ohl = jnp.where((lane == (l % leaf)[..., None])
                        & (l >= 0)[..., None], 1.0, 0.0)
        a = jnp.einsum("gsl,gjlc->gsjc", ohl, tb, precision=hp)
        jix = jax.lax.broadcasted_iota(jnp.int32, (cs, rg_pad, rmax_l), 2)
        ohj = jnp.where(jix == (l // leaf)[..., None], 1.0, 0.0)
        return jnp.einsum("gsjc,gsj->gsc", a, ohj, precision=hp)

    rows = jax.lax.map(one, (locc, tabc))  # (nch, cs, rg_pad, C)
    return rows.reshape(-1, rg_pad, c)[:ng].reshape(ng * rg_pad, c)


@functools.partial(jax.jit, static_argnames=("with_shading",))
def _build_local_tables(packed_mm, attr_table, scene_dev,
                        slot_tri, with_shading: bool = True):
    """(NG, rmax, 128, A [+ Cs]) per-group local attribute tables for the
    one-hot resolve: the packed payload's OWN slot ids (feature row 10 of
    the w1 block — byte-identical under the affine transform) gathered
    against the global attr table and, for lit frames, the per-triangle
    shading rows.  One (NG * rmax * 128)-row gather at PLAN time
    (pose-memoised via _loc_tab_plan) replaces one-to-two per-RAY gathers
    every frame."""
    from compound_ray_tpu.trace.lighting import build_shading_rows

    ids = packed_mm[:, :, 10, 0:KERNEL_LEAF].astype(jnp.int32)
    ids = jnp.clip(ids, 0, attr_table.shape[0] - 1)
    parts = [attr_table[ids]]
    if with_shading:
        tid = jnp.maximum(slot_tri[ids], 0)
        parts.append(build_shading_rows(scene_dev)[tid])
    return jnp.concatenate(parts, axis=-1)


def _loc_tab_plan(splan, pk, packed_mm, scene_dev, with_shading: bool):
    """Memoised _build_local_tables (keyed alongside the packed plan —
    same widths/pose => same payload => same tables).  Bounded like the
    shadow store."""
    cfg = get_config()
    key = (pk, with_shading)
    hit = splan.loctab_store.get(key)
    if hit is not None:
        splan.loctab_store[key] = splan.loctab_store.pop(key)
        return hit
    tab = _build_local_tables(packed_mm, splan.attr_table, scene_dev,
                              splan.slot_tri, with_shading=with_shading)
    while len(splan.loctab_store) >= max(1, cfg.shadow_store_size):
        splan.loctab_store.pop(next(iter(splan.loctab_store)))
    splan.loctab_store[key] = tab
    return tab


def resolve_kernel_hits(
    out: jnp.ndarray,  # (R, 8) kernel rows [t, u, v, cluster-id, lane, ...]
    attr_table: jnp.ndarray,  # (C*128, A) build_attr_table rows
    tex_only: bool,
    packed: bool = False,  # True: out[:, 3] is already the global slot id
    emit: str = "bary",  # packed kernel output layout (run_packed_tracer)
):
    """Deferred-attribute epilogue: resolve the winning triangle's shading
    inputs with ONE row gather per ray.

    The kernel reports the winner as (global cluster id, lane); the attr
    row is id * 128 + lane.  Returns (t, cu, cv, texid, rgb) flattened over
    rays — rgb is a planar (r, g, b) tuple of the linearised vertex/material
    colour (None for tex_only scenes), cu/cv the interpolated texture
    coordinates.  Everything is (R,)-shaped: keeping the ray axis on the
    minor (lane) dim is what makes this run at full VPU width — (R, 1) and
    (R, 3) shapes lower to 1-3 used lanes out of 128.  Rows for
    missed/padded rays are clamped garbage; callers must mask with
    (t < 1e30) & group-liveness."""
    if packed:
        out_t = out  # the packed tracer already emits planar (8, R)
        if emit == "uv":
            # the emit_uv kernel interpolated texture coordinates and the
            # texture id in-register: no attribute gather at all (each
            # 3.3M-row gather costs a flat ~25 ms — docs/performance.md)
            return (out_t[0], out_t[1], out_t[2],
                    out_t[3].astype(jnp.int32), None)
        if emit == "uvs":
            # single-texture slim rows [t, cu, cv]: every triangle uses
            # texture 0, so texid is 0 on hits / -1 on misses by
            # construction (matching the uv variant's -1 winner init)
            texid = jnp.where(out_t[0] < 1e30, 0, -1).astype(jnp.int32)
            return (out_t[0], out_t[1], out_t[2], texid, None)
        if emit == "flat":
            # polymorphic rows: (a0, a1) are (cu, cv) for textured winners
            # and (r, g) for untextured — texid >= 0 disambiguates, and the
            # texture stage overwrites rgb exactly where (cu, cv) is live
            return (out_t[0], out_t[1], out_t[2],
                    out_t[4].astype(jnp.int32),
                    (out_t[1], out_t[2], out_t[3]))
    else:
        # one transpose to planar (8, R): column extracts from the (R, 8)
        # AoS kernel output cost ~23 ms/frame at 3.2M rays
        out_t = jnp.transpose(out, (1, 0))
    t = out_t[0]
    u = out_t[1]
    v = out_t[2]
    n_rows = attr_table.shape[0]
    if packed:
        row = jnp.clip(out_t[3].astype(jnp.int32), 0, n_rows - 1)
    else:
        cluster = jnp.clip(out_t[3].astype(jnp.int32), 0,
                           n_rows // KERNEL_LEAF - 1)
        lane = jnp.clip(out_t[4].astype(jnp.int32), 0, KERNEL_LEAF - 1)
        row = cluster * KERNEL_LEAF + lane
    attr = attr_table[row]  # (R, A)
    # flat-attr scenes: the non-texture colour is the material base
    # colour used raw (shaders.cu:813-815); vertex-colour scenes
    # interpolate + linearize — shared math in _attrs_from_rows
    cu, cv, texid, rgb = _attrs_from_rows(
        attr, u, v, tex_only, attr_table.shape[1] == ATTR_COMPS_FLAT)
    return t, cu, cv, texid, rgb


@functools.partial(
    jax.jit,
    static_argnames=("g", "kcand", "rmax", "cull_sigmas", "use_cache",
                     "affine"),
)
def _pack_fused(
    mm_flat: jnp.ndarray,  # (S+128, 64) matmul feature columns
    slot_center_cl: jnp.ndarray,  # (C, 128, 3)
    slot_radius_cl: jnp.ndarray,  # (C, 128)
    half_center: jnp.ndarray,  # (C, H, 3) HALF-sphere table, not (C, 3)
    half_radius: jnp.ndarray,  # (C, H) — _cull_groups flattens C*H lanes
    omms_p: jnp.ndarray,  # (Np,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    g: int,
    kcand: int,
    rmax: int,
    cull_sigmas: float,
    near_mask: Optional[jnp.ndarray] = None,  # (C,) bool: clusters to trace
    use_cache: bool = False,
    dmax: Optional[jnp.ndarray] = None,  # (Np,) refine distance bound
    tri_cl: Optional[jnp.ndarray] = None,  # (C, 128, 9) exact-refine geometry
    affine: bool = False,  # fold per-group origin/tmin into the payload
):
    """Pose-dependent plan: cull -> shortlist -> triangle refine -> packed
    per-group payload.  Depends only on (scene, eye, pose, widths) — NOT on
    the RNG or samples count — so callers memoise it per pose.

    affine=True (requires g == 1) applies transform_payload_affine so the
    frame can trace with [d, 1] rays — the trade is pose-plan-time work
    (this memoised function) for per-ray feature width in the hot path.

    Returns (row_counts, packed_mm, need_k, need_r): the need scalars are
    the widths THIS pose actually wanted (max clusters per group before the
    kcand shortlist truncation; max payload rows before the rmax clamp).
    need_k <= kcand and need_r <= rmax certify the pack is exact — the
    speculative-widths path checks them with one host sync instead of
    running the two-dispatch width measure."""
    gmask, counts, dmin_all = _cull_groups(
        omms_p, position, local_space, half_center, half_radius,
        cull_sigmas, g,
    )
    if use_cache:
        # far clusters are served by the radiance cache; only near ones trace
        gmask = gmask & near_mask[None, :]
        counts = jnp.sum(gmask, axis=-1).astype(jnp.int32)
    need_k = jnp.max(counts)
    ids, _ = _shortlist_sorted(gmask, dmin_all, kcand)
    cl_counts = jnp.minimum(counts, kcand)
    row_counts, packed_mm, need_r = _refine_pack(
        omms_p, position, local_space, ids[:, :kcand], cl_counts,
        slot_center_cl, slot_radius_cl, mm_flat,
        g, kcand, rmax, cull_sigmas, dmax=dmax, tri_cl=tri_cl,
    )
    if affine:
        assert g == 1, "affine payloads need one ommatidium per group"
        from compound_ray_tpu.trace.mm_tracer import transform_payload_affine

        (ox, oy, oz), tmin_w, _, _ = _omm_world_origins(
            omms_p, position, local_space)
        packed_mm = transform_payload_affine(
            packed_mm, jnp.stack([ox, oy, oz], axis=-1), tmin_w)
    return row_counts, packed_mm, need_k, need_r


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "background", "ng", "g", "nrb", "rb_size", "rmax",
        "textured", "want_samples", "use_cache", "tex_only", "cache_shape",
        "tex_static", "affine", "shadow_audit", "precision", "direct1",
    ),
)
def _render_frame(
    packed_mm: jnp.ndarray,  # (NG, rmax, 16, 512)
    row_counts: jnp.ndarray,  # (NG,) int32
    attr_table: jnp.ndarray,
    scene_dev: Dict[str, Any],
    quad_table: jnp.ndarray,
    omms_p: jnp.ndarray,  # (Np,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    ng: int,
    g: int,
    nrb: int,
    rb_size: int,
    rmax: int,
    textured: bool,
    want_samples: bool = False,
    cache: Optional[jnp.ndarray] = None,
    use_cache: bool = False,
    tex_only: bool = False,
    cache_shape: Tuple[int, int] = (0, 0),
    lights: Optional[jnp.ndarray] = None,
    slot_tri: Optional[jnp.ndarray] = None,
    shadow_counts=None,  # (L, NG) memoised occluder row counts (lit frames)
    shadow_r2v=None,  # (T,) row -> virtual group (light*NG + group)
    shadow_flag=None,  # (T,) 2 first-of-group / 1 live / 0 padding
    shadow_flat=None,  # (T, 16, 512) shared ragged payload (_shadow_plan)
    tex_static: Optional[Tuple] = None,
    quad_gray=None,  # (P, 4) single-channel quads (grayscale textures)
    affine: bool = False,  # packed_mm is transform_payload_affine'd
    shadow_sph=None,  # (NG, 4) memoised shaft spheres (lit frames)
    shadow_audit: bool = False,  # lit frames also return leak counts
    sky_means=None,  # sky-split base output (SKY SPLIT notes)
    sky_scatter=None,
    precision: Optional[str] = None,  # per-scene adopted mode (or module)
    loc_tab=None,  # (NG, rmax, 128, C) one-hot local-resolve tables
    direct1: Optional[bool] = None,
) -> jnp.ndarray:
    # draw jitter directly in (N, S) layout: the (S,N)->(N,S) transpose of
    # three 38 MB tensors was a measurable fraction of the frame
    n_pad = omms_p.shape[0]
    splay, spin = sample_angles_ns(key, omms_p[:, 6] / FWHM_SD_RATIO,
                                   samples)
    return _trace_shade_angles(
        packed_mm, row_counts, attr_table, scene_dev, quad_table, omms_p,
        position, local_space, splay, spin,
        samples=samples, background=background, ng=ng, g=g, nrb=nrb,
        rb_size=rb_size, rmax=rmax, textured=textured,
        want_samples=want_samples, cache=cache, use_cache=use_cache,
        tex_only=tex_only, cache_shape=cache_shape,
        lights=lights, slot_tri=slot_tri,
        shadow_counts=shadow_counts, shadow_r2v=shadow_r2v,
        shadow_flag=shadow_flag, shadow_flat=shadow_flat,
        tex_static=tex_static, quad_gray=quad_gray, affine=affine,
        shadow_sph=shadow_sph, shadow_audit=shadow_audit,
        sky_means=sky_means, sky_scatter=sky_scatter,
        precision=precision, loc_tab=loc_tab, direct1=direct1,
    )


def _omm_world_origins(omms_p, position, local_space):
    """Per-ommatidium world ray origin (focal-retracted) and world tmin.

    Returns ((ox, oy, oz), tmin, (ax, ay, az), axis_len) with everything
    (Np,)-shaped — the same math _gen_ray_features bakes into the ray
    features, shared with the affine payload transform (_pack_fused) so the
    origin folded into the payload is the one the rays would have carried."""
    ax, ay, az = omms_p[:, 3], omms_p[:, 4], omms_p[:, 5]  # (Np,)
    axis_len = jnp.sqrt(ax * ax + ay * ay + az * az)
    inv_al = 1.0 / jnp.maximum(axis_len, 1e-30)
    focal = omms_p[:, 7]
    rx = omms_p[:, 0] - ax * inv_al * focal
    ry = omms_p[:, 1] - ay * inv_al * focal
    rz = omms_p[:, 2] - az * inv_al * focal
    L = local_space  # rows are the eye's world x/y/z axes
    ox = position[0] + rx * L[0, 0] + ry * L[1, 0] + rz * L[2, 0]  # (Np,)
    oy = position[1] + rx * L[0, 1] + ry * L[1, 1] + rz * L[2, 1]
    oz = position[2] + rx * L[0, 2] + ry * L[1, 2] + rz * L[2, 2]
    return (ox, oy, oz), focal * axis_len, (ax, ay, az), axis_len


def _gen_ray_features(
    omms_p: jnp.ndarray,  # (Np, 8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    splay: jnp.ndarray,  # (Np, S)
    spin: jnp.ndarray,  # (Np, S)
    samples: int,
    ng: int,
    g: int,
    nrb: int,
    rb_size: int,
    affine: bool = False,
):
    """Sample angles -> world rays -> kernel feature planes.

    Returns (rays, (dx, dy, dz), neg_o): rays is feature-major planar —
    (16, NG*rg_pad) [d, m, -o', 1, 0 x 6] by default, or (8, NG*rg_pad)
    [d, 1, 0 x 4] when `affine` (the origin/tmin live in the
    transform_payload_affine'd payload, so the moment and origin features
    vanish from the hot path entirely).  (dx, dy, dz) are (Np, S) unit
    world directions; neg_o the 3-tuple of (Np, S) = -(o + tmin d)
    tmin-shifted origins (computed either way — XLA dead-code-eliminates it
    inside the frame jit when no consumer exists)."""
    n_pad = omms_p.shape[0]
    (ox, oy, oz), tmin_w, (ax, ay, az), _ = _omm_world_origins(
        omms_p, position, local_space)
    L = local_space

    rdx, rdy, rdz = cone_offset_components(
        ax[:, None], ay[:, None], az[:, None], splay, spin
    )  # (Np, S)
    wdx = rdx * L[0, 0] + rdy * L[1, 0] + rdz * L[2, 0]
    wdy = rdx * L[0, 1] + rdy * L[1, 1] + rdz * L[2, 1]
    wdz = rdx * L[0, 2] + rdy * L[1, 2] + rdz * L[2, 2]
    # normalise for the kernel: t becomes world distance, tmin scales by |axis|
    inv_n = jax.lax.rsqrt(
        jnp.maximum(wdx * wdx + wdy * wdy + wdz * wdz, 1e-60)
    )
    dx, dy, dz = wdx * inv_n, wdy * inv_n, wdz * inv_n  # (Np, S)
    tmin = tmin_w[:, None]  # (Np, 1) world units

    oxb, oyb, ozb = ox[:, None], oy[:, None], oz[:, None]
    # -o' = -(o + tmin d): consumed by the 16-feature rows and the lit
    # branch's hit-point reconstruction; dead-code-eliminated otherwise
    neg_o = (-(oxb + tmin * dx), -(oyb + tmin * dy), -(ozb + tmin * dz))

    rg = g * samples
    rg_pad = nrb * rb_size
    zeros = jnp.zeros((n_pad, samples), jnp.float32)
    ones = jnp.ones((n_pad, samples), jnp.float32)
    if affine:
        # origin/moment/tmin live in the transformed payload: the ray is
        # [d, 1, 0 x 4] (trace/mm_tracer.pack_rays_affine) — half the
        # planar stack, no cross products
        comps = [dx, dy, dz, ones] + [zeros] * 4
    else:
        # Plücker moment m = o x d (origin broadcast over samples)
        mx = oyb * dz - ozb * dy
        my = ozb * dx - oxb * dz
        mz = oxb * dy - oyb * dx
        # kernel ray features [d, m, -o', 1, 0 x 6] with tmin folded into
        # the origin (o' = o + tmin d; the moment is tmin-invariant) — see
        # trace/mm_tracer.pack_rays_mm
        comps = [dx, dy, dz, mx, my, mz, neg_o[0], neg_o[1], neg_o[2], ones]
        comps += [zeros] * (16 - len(comps))

    # planar stack straight into the kernel's feature-major layout: NO
    # (R, 16) transpose (it measured 10s of ms at 3.3M rays)
    rays_pl = jnp.stack([c.reshape(ng, rg) for c in comps])
    if rg_pad != rg:
        # edge-pad (replicate the last real ray) so padded rays stay
        # finite; their kernel results are discarded by unpad
        rays_pl = jnp.pad(rays_pl, ((0, 0), (0, 0), (0, rg_pad - rg)),
                          mode="edge")
    return rays_pl.reshape(len(comps), ng * rg_pad), (dx, dy, dz), neg_o


def _trace_shade_angles(
    packed_mm: jnp.ndarray,  # (NG, rmax, 16, 512)
    row_counts: jnp.ndarray,  # (NG,) int32
    attr_table: jnp.ndarray,
    scene_dev: Dict[str, Any],
    quad_table: jnp.ndarray,
    omms_p: jnp.ndarray,  # (Np,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    splay: jnp.ndarray,  # (Np, S) pre-drawn Gaussian splay angles
    spin: jnp.ndarray,  # (Np, S) pre-drawn half-turn spin angles
    samples: int,
    background: int,
    ng: int,
    g: int,
    nrb: int,
    rb_size: int,
    rmax: int,
    textured: bool,
    want_samples: bool = False,
    cache: Optional[jnp.ndarray] = None,
    use_cache: bool = False,
    tex_only: bool = False,
    cache_shape: Tuple[int, int] = (0, 0),
    lights: Optional[jnp.ndarray] = None,  # (L,7) enables GGX direct light
    slot_tri: Optional[jnp.ndarray] = None,  # (S,) slot -> triangle id
    shadow_counts=None,  # (L, NG) int32 memoised occluder row counts
    shadow_r2v=None,  # (T,) int32 row -> virtual group (light*NG + group)
    shadow_flag=None,  # (T,) int32 2 first-of-group / 1 live / 0 padding
    shadow_flat=None,  # (T, 16, 512) shared ragged payload (_shadow_plan)
    tex_static: Optional[Tuple] = None,  # static single-texture sampler
    quad_gray=None,  # (P, 4) single-channel quads (grayscale textures)
    frames: int = 1,  # >1: samples = frames*S stacked burst, (Np, F, 3) out
    affine: bool = False,  # packed_mm is transform_payload_affine'd
    shadow_sph=None,  # (NG, 4) memoised shaft spheres [c, r] (lit frames)
    shadow_audit: bool = False,  # also return the out-of-shaft hit counts
    sky_means=None,  # (N0, 3) sky-split base output (SKY SPLIT notes)
    sky_scatter=None,  # (Np,) int32 live -> original group; N0 = padding
    precision: Optional[str] = None,  # per-scene adopted mode (or module)
    loc_tab=None,  # (NG, rmax, 128, C) tables -> emit "loc" + one-hot
    #   resolve instead of per-ray global row gathers (_local_resolve)
    direct1: Optional[bool] = None,  # per-scene adopted cnt==1 fast path
) -> jnp.ndarray:
    """Angle-parameterised frame core (trace + shade + reduce): the sharded
    path draws angles GLOBALLY and feeds per-device slices here, so results
    are identical across mesh topologies.

    `affine` requires a payload built with _pack_fused(affine=True) (the
    per-group origin/tmin folded in — g must be 1); rays shrink to [d, 1]
    planes and the kernel contracts K = 8 instead of 16.  Lit frames work
    too: hit points reconstruct from neg_o (raygen returns it either way)
    and the shadow-ray kernel keeps its own 16-feature payloads.

    Everything per-ray is COMPONENT-PLANAR: (Np, S) or (R,) arrays per
    x/y/z channel, never (R, 3)/(R, 1).  Keeping the ray axis on the lane
    (minor) dim is worth ~70 ms/frame at 3.2M rays: AoS norms/crosses lower
    to per-element cross-lane shuffles."""
    n_pad = omms_p.shape[0]
    rg = g * samples
    rg_pad = nrb * rb_size
    zeros = jnp.zeros((n_pad, samples), jnp.float32)
    rays, (dx, dy, dz), neg_o = _gen_ray_features(
        omms_p, position, local_space, splay, spin,
        samples=samples, ng=ng, g=g, nrb=nrb, rb_size=rb_size,
        affine=affine,
    )
    # kernel output layout: lit frames need barycentrics for the shading
    # basis; unlit tex_only scenes resolve texture coords in-register;
    # unlit flat-attr scenes (constant material colours) resolve EVERYTHING
    # in-register — no epilogue attribute gather in either case
    flat_attrs = attr_table.shape[1] == ATTR_COMPS_FLAT
    if loc_tab is not None:
        # the winner resolves via per-group one-hot contraction tables —
        # the kernel only needs the LOCAL winner index (3+1 buffers)
        emit = "loc"
    elif lights is None:
        if tex_only:
            emit = "uvs" if tex_static is not None else "uv"
        else:
            emit = "flat" if flat_attrs else "bary"
    else:
        emit = "bary"
    out = run_packed_tracer(
        row_counts, packed_mm, rays,
        ng=ng, nrb=nrb, rb_size=rb_size, rmax=rmax,
        emit=emit, ray_feats=(8 if affine else 16),
        precision=precision, direct1=direct1,
    )
    loc_rows = None
    if emit == "loc":
        loc_rows = _local_resolve(out[3], loc_tab, ng=ng, rg_pad=rg_pad)
        t_f = out[0]
        cu_f, cv_f, texid_f, rgb_f = _attrs_from_rows(
            loc_rows[:, :attr_table.shape[1]], out[1], out[2],
            tex_only, flat_attrs)
    else:
        t_f, cu_f, cv_f, texid_f, rgb_f = resolve_kernel_hits(
            out, attr_table, tex_only, packed=True, emit=emit,
        )

    def unpad(x):
        return x.reshape(ng, rg_pad)[:, :rg].reshape(n_pad, samples)

    t = unpad(t_f)
    # groups with empty payloads skip the kernel entirely; their rows are
    # garbage and the whole group is a miss
    group_live = jnp.repeat(row_counts > 0, g)[:, None]  # (n_pad, 1)
    hit = (t < 1e30) & group_live
    if tex_only:
        rr = gg = bb = zeros
    else:
        rr, gg, bb = (unpad(c) for c in rgb_f)
    texid = unpad(texid_f)
    cu = unpad(cu_f)
    cv = unpad(cv_f)

    def flat(x):
        return x.reshape(-1)

    if textured and use_cache:
        # unified single-gather epilogue: gathers are count-bound on TPU, so
        # texture-quad rows and cache-quad rows live in ONE combined table
        # (`cache` here) and each ray issues exactly one row gather
        hit_f2 = flat(hit)
        texid_f2 = flat(texid)
        if tex_static is not None:
            tex_idx, tfx, tfy = texture_quad_coords_single(
                flat(cu), flat(cv), *tex_static
            )
        else:
            tex_idx, tfx, tfy = texture_quad_coords_c(
                scene_dev, jnp.maximum(texid_f2, 0), flat(cu), flat(cv)
            )
        ch, cw = cache_shape
        tex_rows = cache.shape[0] - ch * cw
        c_idx, cfx, cfy = _equirect_coords_c(
            ch, cw, flat(dx), flat(dy), flat(dz)
        )
        sel_tex = hit_f2 & (texid_f2 >= 0)
        idx = jnp.where(sel_tex, tex_idx, tex_rows + c_idx)
        fx = jnp.where(sel_tex, tfx, cfx)
        fy = jnp.where(sel_tex, tfy, cfy)
        qr, qg, qb = quad_bilinear_c(cache[idx], fx, fy)
        # hit rays on untextured triangles keep the interpolated colour
        keep = hit & (texid < 0)
        rr = jnp.where(keep, rr, qr.reshape(n_pad, samples))
        gg = jnp.where(keep, gg, qg.reshape(n_pad, samples))
        bb = jnp.where(keep, bb, qb.reshape(n_pad, samples))
    else:
        if textured:
            # big single textures: the (P, 16) quad table falls out of
            # on-chip residency past ~100 MB and its row gather slows ~10x
            # — four gathers from the 4x-smaller texel table win there,
            # and GRAYSCALE textures beat both with one (P, 4) gray-quad
            # gather (scene_plan builds quad_gray when exact)
            if tex_static is not None and quad_gray is not None:
                tex_idx, tfx, tfy = texture_quad_coords_single(
                    flat(cu), flat(cv), *tex_static
                )
                qv = quad_bilinear_gray_c(quad_gray[tex_idx], tfx, tfy)
                qr = qg = qb = qv
            elif tex_static is not None and quad_table.nbytes > 100_000_000:
                qr, qg, qb = texture_bilinear4_single(
                    scene_dev["tex_data"], flat(cu), flat(cv), *tex_static
                )
            elif tex_static is not None:
                tex_idx, tfx, tfy = texture_quad_coords_single(
                    flat(cu), flat(cv), *tex_static
                )
                qr, qg, qb = quad_bilinear_c(quad_table[tex_idx], tfx, tfy)
            else:
                tex_idx, tfx, tfy = texture_quad_coords_c(
                    scene_dev, jnp.maximum(flat(texid), 0),
                    flat(cu), flat(cv)
                )
                qr, qg, qb = quad_bilinear_c(quad_table[tex_idx], tfx, tfy)
            sel = (texid >= 0) & hit
            rr = jnp.where(sel, qr.reshape(n_pad, samples), rr)
            gg = jnp.where(sel, qg.reshape(n_pad, samples), gg)
            bb = jnp.where(sel, qb.reshape(n_pad, samples), bb)
        if lights is not None:
            # GGX direct lighting (__closesthit__radiance, shaders.cu:
            # 826-881).  Shadow rays traverse each (light, group)'s OWN
            # rows of a shared ragged occluder table memoised by
            # _shadow_plan from the groups' actual (probe-frame) hit
            # points; the row-major kernel grid equals the table's actual
            # row count and every light rides ONE dispatch — the
            # steady-state lit frame only builds the shadow rays and runs
            # one occlusion kernel + the GGX math.
            from compound_ray_tpu.trace.lighting import (
                build_shading_rows,
                ggx_light_contrib_planar,
                unpack_shading_cols,
            )

            def repad(x):  # (Np, S) -> (R,) flat in kernel ray order
                x2 = x.reshape(ng, rg)
                if rg_pad != rg:
                    x2 = jnp.pad(x2, ((0, 0), (0, rg_pad - rg)))
                return x2.reshape(-1)

            eps = jnp.float32(1e-3)  # traceOcclusion tmin (shaders.cu:875)
            hit_f2 = repad(hit)
            dxf, dyf, dzf = repad(dx), repad(dy), repad(dz)
            audit = None
            # hit point p = o' + t d (o' is the tmin-shifted origin the
            # ray features carry negated in rows 6-8).  Missed rays
            # (t = inf) clamp to t = 0 so every shadow-ray feature stays
            # finite; their lighting result is discarded by the hit mask.
            t_c = jnp.where(hit_f2, t_f, 0.0)
            pxf = -repad(jnp.broadcast_to(neg_o[0], (n_pad, samples))) + t_c * dxf
            pyf = -repad(jnp.broadcast_to(neg_o[1], (n_pad, samples))) + t_c * dyf
            pzf = -repad(jnp.broadcast_to(neg_o[2], (n_pad, samples))) + t_c * dzf
            if shadow_audit and shadow_sph is not None:
                # out-of-shaft detector (the memoised-shadow-plan known
                # approximation, SHADOW_BOUND_INFLATE above): a hit outside
                # its group's probed+inflated sphere saw only shaft-local
                # occluders, so its shadow test may have leaked light.
                # Cheap planar VPU work; the caller rate-limits the warn.
                hm2 = hit_f2.reshape(ng, rg_pad)
                ddx = pxf.reshape(ng, rg_pad) - shadow_sph[:, 0:1]
                ddy = pyf.reshape(ng, rg_pad) - shadow_sph[:, 1:2]
                ddz = pzf.reshape(ng, rg_pad) - shadow_sph[:, 2:3]
                d2 = ddx * ddx + ddy * ddy + ddz * ddz
                r_s = shadow_sph[:, 3:4]
                # r < 0 marks "group hit nothing in the probe": ANY
                # steady-state hit there traced zero occluder rows
                leak = hm2 & ((d2 > r_s * r_s) | (r_s < 0.0))
                # [leaked_total, hits_total, per-group leak counts]:
                # the per-group tail lets the corrective response flip
                # ONLY the leaking groups to guaranteed bounds
                # (mark_shadow_unsound) instead of fattening every shaft
                leak_g = jnp.sum(leak.astype(jnp.int32), axis=1)
                audit = jnp.concatenate([
                    jnp.stack([jnp.sum(leak_g),
                               jnp.sum(hm2.astype(jnp.int32))]),
                    leak_g])
            u_b = out[1]
            v_b = out[2]
            if loc_rows is not None:
                # shading rows came out of the same one-hot contraction
                # that resolved the colour attributes — zero per-ray
                # gathers on the whole lit path
                rows_g = loc_rows[:, attr_table.shape[1]:]
            else:
                row_s = jnp.clip(out[3].astype(jnp.int32), 0,
                                 slot_tri.shape[0] - 1)
                tid = jnp.maximum(slot_tri[row_s], 0)
                # ONE wide row gather replaces the ~10 narrow per-triangle
                # gathers (descriptor-rate-bound at R ~= 1e6 — see
                # build_shading_rows); the O(T) table pack hoists out of
                # the per-ray work.  The slab then transposes ONCE to
                # (C, R) so all downstream basis/GGX math is
                # COMPONENT-PLANAR (R,) — the (R, 3) layout runs at 3/128
                # VPU lane occupancy (the module docstring's AoS warning).
                rows_g = build_shading_rows(scene_dev)[tid]
            cols_g = rows_g.T  # (C, R) planar relayout
            (e1g, e2g, n0g, n1g, n2g, has_n, metallic, roughness) = (
                unpack_shading_cols(cols_g)
            )
            w_b = 1.0 - u_b - v_b
            gx = e1g[1] * e2g[2] - e1g[2] * e2g[1]
            gy = e1g[2] * e2g[0] - e1g[0] * e2g[2]
            gz = e1g[0] * e2g[1] - e1g[1] * e2g[0]
            nx = jnp.where(has_n,
                           w_b * n0g[0] + u_b * n1g[0] + v_b * n2g[0], gx)
            ny = jnp.where(has_n,
                           w_b * n0g[1] + u_b * n1g[1] + v_b * n2g[1], gy)
            nz = jnp.where(has_n,
                           w_b * n0g[2] + u_b * n1g[2] + v_b * n2g[2], gz)
            n_inv = 1.0 / jnp.maximum(
                jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
            nx, ny, nz = nx * n_inv, ny * n_inv, nz * n_inv
            if "mat_mr_tex" in scene_dev:
                # metallic-roughness / normal-map modulation (shaders.cu:
                # 831-852).  Key presence is static pytree structure: the
                # device dict carries these slots only when some material
                # references such a texture (scene/flat.py), so ordinary
                # lit scenes skip the extra gathers entirely.  This branch
                # stacks the planar normal for the (rare) textured-material
                # path — AoS cost only where the feature is used.
                from compound_ray_tpu.trace.lighting import (
                    apply_material_textures_from_rows,
                )

                n_vec, metallic, roughness = (
                    apply_material_textures_from_rows(
                        scene_dev, rows_g,
                        jnp.stack([nx, ny, nz], axis=-1),
                        metallic, roughness, u_b, v_b,
                    )
                )
                nx, ny, nz = n_vec[:, 0], n_vec[:, 1], n_vec[:, 2]
            base_p = (repad(rr), repad(gg), repad(bb))
            res_r, res_g, res_b = base_p
            n_lights = lights.shape[0]
            r_per_light = ng * rg_pad
            ray_parts, ldirs = [], []
            for li in range(n_lights):
                lpos = lights[li, 4:7]
                tox = lpos[0] - pxf
                toy = lpos[1] - pyf
                toz = lpos[2] - pzf
                ldist = jnp.sqrt(tox * tox + toy * toy + toz * toz)
                inv_ld = 1.0 / jnp.maximum(ldist, 1e-20)
                lx, ly, lz = tox * inv_ld, toy * inv_ld, toz * inv_ld
                # REVERSE affine shadow ray: origin at the LIGHT (folded
                # into the payload once per light by _shadow_pack_one's
                # transform_payload_affine), unnormalised direction
                # D = (p + eps*l) - light, so "anything strictly between
                # the light and the surface's epsilon band" is exactly
                # t in [0, 1] in the ray's own parameterisation — the
                # any-hit kernel needs no per-ray bounds and no division
                # (u, v, t are scale-invariant in |D|; run_rows_occlusion)
                # and the steady-state stack is [D, 1, 0 x 4]: half the
                # planar rows, no per-ray cross products.  vs the
                # forward form (tmin eps, tmax ldist - 2eps,
                # shaders.cu:875): the surface-side epsilon band is
                # identical; occluders within eps of the light itself now
                # occlude — physically sensible for point lights and
                # below every test tolerance.
                drx = eps * lx - tox
                dry = eps * ly - toy
                drz = eps * lz - toz
                one_f = jnp.ones_like(lx)
                zero_f = jnp.zeros_like(lx)
                ray_parts.append(jnp.stack(
                    [drx, dry, drz, one_f, zero_f, zero_f, zero_f, zero_f]
                ))
                ldirs.append((lx, ly, lz))
            # ONE row-block occlusion dispatch covers every light: the ray
            # vector stacks each light's group-major block so virtual group
            # light*NG + g addresses its own rays (trace/mm_tracer.py
            # run_rows_occlusion).  shadow_batch_rays is read at TRACE time
            # (like the other tuning toggles): a mid-process config flip
            # needs jax.clear_caches(), the run_rebench contract.
            _srs = get_config().shadow_batch_rays
            occ_all = run_rows_occlusion(
                shadow_r2v, shadow_flag, shadow_flat,
                jnp.concatenate(ray_parts, axis=1),
                nrb=nrb, rb_size=rb_size,
                batch_rays=_srs if (_srs and rb_size % _srs == 0) else None,
            )[0]
            for li in range(n_lights):
                lcol = lights[li, 0:3]
                lint = lights[li, 3]
                o_l = occ_all[li * r_per_light:(li + 1) * r_per_light]
                # zero-row virtual groups are never visited by the kernel:
                # their lanes hold garbage — mask to unobstructed
                cnt_ray = jnp.broadcast_to(
                    shadow_counts[li][:, None], (ng, rg_pad)
                ).reshape(-1)
                occ = (o_l > 0.0) & (cnt_ray > 0)
                (c_r, c_g, c_b), facing = ggx_light_contrib_planar(
                    (nx, ny, nz), (-dxf, -dyf, -dzf), ldirs[li],
                    base_p, metallic, roughness, lcol, lint,
                )
                sel_l = facing & ~occ & hit_f2
                res_r = res_r + jnp.where(sel_l, c_r, 0.0)
                res_g = res_g + jnp.where(sel_l, c_g, 0.0)
                res_b = res_b + jnp.where(sel_l, c_b, 0.0)

            def unpad_f(x):  # (R,) -> (Np, S)
                return x.reshape(ng, rg_pad)[:, :rg].reshape(n_pad, samples)

            rr = unpad_f(res_r)
            gg = unpad_f(res_g)
            bb = unpad_f(res_b)
        if use_cache:
            # the cache already encodes the miss shader for directions that
            # hit nothing at all
            c_idx, cfx, cfy = _equirect_coords_c(
                cache.shape[0], cache.shape[1], flat(dx), flat(dy), flat(dz)
            )
            mr, mg, mb = quad_bilinear_c(
                cache.reshape(-1, 16)[c_idx], cfx, cfy
            )
        else:
            mr, mg, mb = miss_color_c(flat(dx), flat(dy), flat(dz), background)
        rr = jnp.where(hit, rr, mr.reshape(n_pad, samples))
        gg = jnp.where(hit, gg, mg.reshape(n_pad, samples))
        bb = jnp.where(hit, bb, mb.reshape(n_pad, samples))
    if want_samples:
        return jnp.stack([rr, gg, bb], axis=-1)  # (Np, S, 3)
    if frames > 1:
        # stacked burst (_render_frames_stacked): `samples` is frames * S
        # and column f*S+s is frame f's sample s, so per-frame means are a
        # reshape away — same S-length contiguous reductions as a
        # sequential frame, hence bit-identical means
        s1 = samples // frames
        out = jnp.stack(
            [jnp.mean(rr.reshape(n_pad, frames, s1), axis=2),
             jnp.mean(gg.reshape(n_pad, frames, s1), axis=2),
             jnp.mean(bb.reshape(n_pad, frames, s1), axis=2)],
            axis=-1,
        )  # (Np, F, 3)
        if sky_means is not None:
            # sky-split: Np here is the compacted live count; scatter the
            # live means over the (frame-invariant) sky expectations
            base = jnp.broadcast_to(
                sky_means[:, None, :], (sky_means.shape[0], frames, 3))
            out = base.at[sky_scatter].set(out, mode="drop")
        return out
    means = jnp.stack(
        [jnp.mean(rr, axis=1), jnp.mean(gg, axis=1), jnp.mean(bb, axis=1)],
        axis=-1,
    )  # (Np, 3)
    if sky_means is not None:
        means = sky_means.at[sky_scatter].set(means, mode="drop")
    if shadow_audit and lights is not None:
        return means, audit  # audit = [out-of-shaft hits, total hits]
    return means


# NOTE: plan/kmax/cache stores live on the FlatScene/ScenePlan objects (see
# scene_plan) to avoid id-recycling aliasing.


def _plan_widths(splan, eplan, omms_p, position, local_space, cache_key):
    """Static kernel widths for a (scene, eye, samples, pose) combination:
    kcand (candidate clusters for the refine) and rmax (packed payload rows
    per group).  Measured with two small planning dispatches + host syncs
    only the first time a pose is seen; high-water rounding lets nearby
    poses reuse the compiled frame."""
    cfg = get_config()
    sig = cfg.cull_sigmas
    # widths depend on the cull width AND the refine mode — neither may
    # serve a stale cached value after a config change
    cache_key = cache_key + (sig, cfg.refine_mode)
    cached = splan.kmax_cache.get(cache_key)
    if cached is not None:
        return cached
    _, counts, _ = _cull_groups(
        omms_p, position, local_space,
        splan.half_center, splan.half_radius, sig, eplan.g,
    )
    k_needed = int(np.asarray(jax.device_get(jnp.max(counts))))
    kcand = min(
        splan.num_clusters,
        max(eplan.kmax_hint, _ceil_to(max(k_needed, 1), 8)),
    )
    row_counts = _refine_counts(
        omms_p, position, local_space,
        splan.half_center, splan.half_radius,
        splan.slot_center_cl, splan.slot_radius_cl,
        eplan.g, kcand, sig,
        tri_cl=(splan.slot_tri_cl if cfg.refine_mode == "exact" else None),
    )
    r_needed = int(np.asarray(jax.device_get(jnp.max(row_counts))))
    rmax = min(max(eplan.rmax_hint, _ceil_to(max(r_needed, 1), 2)), kcand)
    eplan.kmax_hint = kcand  # high-water: nearby poses reuse the compile
    eplan.rmax_hint = rmax
    # scene-scoped high-water marks: the speculative-pack fast path keys off
    # these (eplan hints are shared across scenes, whose widths differ)
    splan.kmax_cache[("hints", eplan.sig)] = (kcand, rmax)
    cached = (kcand, rmax)
    splan.kmax_cache[cache_key] = cached
    return cached


def _packed_plan(
    splan, eplan, omms_p, position, local_space, pose_sig, samples,
    kcand, rmax, near_mask=None, use_cache=False, d_thresh=0.0,
    affine=False,
):
    """Memoised _pack_fused: the packed payload depends only on
    (scene, eye, pose, widths, far-field split) — not on the RNG — so
    fixed-pose rendering (the speedTest protocol, GA pose loops) pays the
    refine+pack once.  Bounded store: pose sweeps evict oldest."""
    cfg = get_config()
    pk = _packed_key(eplan, samples, pose_sig, kcand, rmax, use_cache,
                     d_thresh, cfg, affine)
    hit = splan.packed_store.get(pk)
    if hit is not None:
        splan.packed_store[pk] = splan.packed_store.pop(pk)  # LRU refresh
        return hit
    rc, pmm, _, _ = _pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius,
        omms_p, position, local_space,
        g=eplan.g, kcand=kcand, rmax=rmax,
        cull_sigmas=cfg.cull_sigmas,
        near_mask=near_mask, use_cache=use_cache,
        tri_cl=(splan.slot_tri_cl if cfg.refine_mode == "exact" else None),
        affine=affine,
    )
    out = (rc, pmm)
    _packed_put(splan, pk, out, cfg)
    return out


def _packed_key(eplan, samples, pose_sig, kcand, rmax, use_cache, d_thresh,
                cfg, affine=False):
    # affine payloads are origin-transformed — never interchangeable with
    # plain ones, even at the same pose/widths
    return (eplan.sig, samples, pose_sig, kcand, rmax,
            use_cache, d_thresh, cfg.cull_sigmas, cfg.refine_mode, affine)


def _packed_put(splan, pk, out, cfg):
    # bounded LRU (packed_mm can be 100s of MB); size >= the pose-alternation
    # width of GA-style sweeps so steady-state frames never re-pack
    while len(splan.packed_store) >= max(1, cfg.packed_store_size):
        splan.packed_store.pop(next(iter(splan.packed_store)))
    splan.packed_store[pk] = out


def _confirm_pending(splan, pending, need_host=None) -> bool:
    """Resolve a deferred speculative-pack check: fetch the pack's need
    counters (ONE host sync — issued after the frame dispatch, so it
    overlaps frame execution) and commit the width/payload memo entries on
    success.  False = the pack truncated; the caller must re-plan exactly
    and re-render.

    need_host: the already-fetched counter pair, for callers that folded
    the fetch into another transfer (api.renderer._sync_one batches every
    outstanding confirm plus the frame sync into ONE ~26 ms round trip).

    When the frame was served through a provisional SKY plan
    (pending["sky_commit"], set by _plan_frame), a validated pack commits
    the COMPACTED plan instead of the dense payload: the steady state at
    that pose never touches packed_store again (the short-circuit), so
    persisting the dense pack would only double the pose's HBM footprint
    — exactly the round-4 conformance-gate OOM."""
    if need_host is None:
        need_host = jax.device_get(pending["need"])
    nk, nr = (int(v) for v in np.asarray(need_host))
    if nk <= pending["kcand"] and nr <= pending["rmax"]:
        splan.kmax_cache[pending["wkey"]] = (pending["kcand"],
                                             pending["rmax"])
        sky_c = pending.get("sky_commit")
        if sky_c is not None and sky_c[1] is not None:
            _sky_put(splan, sky_c[0], sky_c[1], get_config())
        else:
            if sky_c is not None:  # memoise the not-worth-splitting call
                _sky_put(splan, sky_c[0], None, get_config())
            _packed_put(splan, pending["pk"], pending["out"], get_config())
        return True
    return False


def _plan_widths_pack(splan, eplan, omms_p, position, local_space,
                      pose_sig, samples, near_mask=None, use_cache=False,
                      d_thresh=0.0, defer=False, force_exact=False,
                      affine=False):
    """Widths + packed payload for a pose, minimising planning round trips.
    Returns (kcand, rmax, (row_counts, packed_mm), pending).

    Exact path (first pose of an eye, speculative overflow, or
    force_exact): the two-dispatch two-sync _plan_widths measure, then the
    pack; pending is None.  Fast path (every later unseen pose,
    cfg.speculative_widths): pack directly at the scene's high-water widths
    and validate the pack's own need counters — the pack is bit-identical
    to the measured one whenever it fits (same widths => same compaction),
    and overflow falls back to the exact measure, so results never change,
    only the number of ~26 ms round trips per unseen pose.  With
    defer=False the check syncs here (3 -> 2 round trips incl. the frame's
    own sync); with defer=True it returns `pending` and the caller calls
    _confirm_pending AFTER dispatching the frame, overlapping the check
    with frame execution (~1 round trip per unseen pose) and re-rendering
    on overflow.

    The width memo key includes (use_cache, d_thresh): speculative widths
    are validated against the near-masked cull, so they must not be served
    to a pack with a different far-field split."""
    cfg = get_config()
    wkey = (eplan.sig, samples, pose_sig, cfg.cull_sigmas, cfg.refine_mode,
            use_cache, d_thresh)
    tri_cl = splan.slot_tri_cl if cfg.refine_mode == "exact" else None
    cached = splan.kmax_cache.get(wkey)
    hints = splan.kmax_cache.get(("hints", eplan.sig))
    if (cached is None and cfg.speculative_widths and hints is not None
            and not force_exact):
        kcand = min(hints[0], splan.num_clusters)
        rmax = min(hints[1], kcand)
        pk = _packed_key(eplan, samples, pose_sig, kcand, rmax, use_cache,
                         d_thresh, cfg, affine)
        hit = splan.packed_store.get(pk)
        if hit is not None:  # packed+validated at these widths earlier
            splan.packed_store[pk] = splan.packed_store.pop(pk)
            splan.kmax_cache[wkey] = (kcand, rmax)
            return kcand, rmax, hit, None
        rc, pmm, need_k, need_r = _pack_fused(
            splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
            splan.half_center, splan.half_radius,
            omms_p, position, local_space,
            g=eplan.g, kcand=kcand, rmax=rmax,
            cull_sigmas=cfg.cull_sigmas,
            near_mask=near_mask, use_cache=use_cache, tri_cl=tri_cl,
            affine=affine,
        )
        out = (rc, pmm)
        pending = dict(wkey=wkey, pk=pk, kcand=kcand, rmax=rmax, out=out,
                       need=jnp.stack([need_k, need_r]))
        if defer:
            return kcand, rmax, out, pending
        if _confirm_pending(splan, pending):
            return kcand, rmax, out, None
        # overflow: the speculative pack truncated — discard it and raise
        # the high-water marks via the exact measure below (they only grow,
        # so overflow gets rarer as a sweep progresses)
    if cached is not None:
        kcand, rmax = cached
    else:
        kcand, rmax = _plan_widths(
            splan, eplan, omms_p, position, local_space,
            (eplan.sig, samples, pose_sig),
        )
        splan.kmax_cache[wkey] = (kcand, rmax)
    out = _packed_plan(
        splan, eplan, omms_p, position, local_space, pose_sig, samples,
        kcand, rmax, near_mask=near_mask, use_cache=use_cache,
        d_thresh=d_thresh, affine=affine,
    )
    return kcand, rmax, out, None


# ----------------------------------------------------------------- SKY SPLIT
# A zero-row group is a shaft the CONSERVATIVE cull proved empty of near
# geometry: every one of its samples misses the kernel and its radiance is a
# pure far-field-cache lookup along the sample direction.  At the natural
# bench pose that is 614/1000 groups — which still pay the RNG draw, the
# planar raygen stack, and (dominating the epilogue) one count-bound table
# gather PER SAMPLE.  The split serves those groups their pose-memoised
# acceptance-distribution EXPECTATION of the cache instead (a deterministic
# quadrature, ~128 lookups per group ONCE per pose), and compacts the live
# groups with STATIC pose-memoised index arrays so raygen/kernel/epilogue
# shrink to the live fraction — no dynamic shapes, one recompile per
# 64-rounded live-count high-water mark.
#
# Semantics: the sky value is the exact mean the per-sample estimator
# converges to, so frames are statistically interchangeable with the dense
# path but NOT bit-identical (live groups draw different RNG rows; sky
# groups lose their sampling noise).  Config-gated off by default;
# tools/tpu_session.py's "sky" stage adopts it only under the
# full-conformance gate.  Unlit single-chip means paths only (raw samples,
# lit frames, and the sharded path stay dense).


@functools.partial(
    jax.jit,
    static_argnames=("nq_splay", "nq_spin", "cache_shape", "row_offset"))
def _sky_expectation(
    cache: jnp.ndarray,  # (rows, 16) unified table or (H, W, 16) equirect
    omms_p: jnp.ndarray,  # (Np, 8)
    local_space: jnp.ndarray,
    nq_splay: int,
    nq_spin: int,
    cache_shape: Tuple[int, int],
    row_offset: int,
) -> jnp.ndarray:
    """(Np, 3) expectation of the far-field cache radiance under the
    acceptance sampling distribution (sample_angles_ns: splay ~ N(0, sd),
    spin ~ U[0, pi)), by quantile-midpoint quadrature: splay nodes
    sd * Phi^-1((i+0.5)/n), spin nodes pi*(j+0.5)/m.  The node directions
    go through the same cone_offset_components -> world transform ->
    equirect-bilinear path as real samples, so the only error is the
    quadrature rule's on a smooth cache (tests/test_sky_split.py pins it
    against a high-S Monte-Carlo mean)."""
    n_pad = omms_p.shape[0]
    sd = omms_p[:, 6] / FWHM_SD_RATIO  # (Np,)
    p = (jnp.arange(nq_splay, dtype=jnp.float32) + 0.5) / nq_splay
    z = jnp.sqrt(jnp.float32(2.0)) * jax.scipy.special.erfinv(2.0 * p - 1.0)
    nq = nq_splay * nq_spin
    splay = jnp.broadcast_to(
        (sd[:, None] * z[None, :])[:, :, None], (n_pad, nq_splay, nq_spin)
    ).reshape(n_pad, nq)
    spin_nodes = jnp.pi * (jnp.arange(nq_spin, dtype=jnp.float32) + 0.5) / nq_spin
    spin = jnp.broadcast_to(
        spin_nodes[None, None, :], (n_pad, nq_splay, nq_spin)
    ).reshape(n_pad, nq)
    ax, ay, az = omms_p[:, 3:4], omms_p[:, 4:5], omms_p[:, 5:6]
    rdx, rdy, rdz = cone_offset_components(ax, ay, az, splay, spin)
    L = local_space
    wdx = rdx * L[0, 0] + rdy * L[1, 0] + rdz * L[2, 0]
    wdy = rdx * L[0, 1] + rdy * L[1, 1] + rdz * L[2, 1]
    wdz = rdx * L[0, 2] + rdy * L[1, 2] + rdz * L[2, 2]
    inv_n = jax.lax.rsqrt(
        jnp.maximum(wdx * wdx + wdy * wdy + wdz * wdz, 1e-60))
    ch, cw = cache_shape
    c_idx, fx, fy = _equirect_coords_c(
        ch, cw,
        (wdx * inv_n).reshape(-1), (wdy * inv_n).reshape(-1),
        (wdz * inv_n).reshape(-1))
    rows = cache.reshape(-1, cache.shape[-1])[row_offset + c_idx]
    r, g, b = quad_bilinear_c(rows, fx, fy)
    return jnp.stack(
        [r.reshape(n_pad, nq).mean(axis=1),
         g.reshape(n_pad, nq).mean(axis=1),
         b.reshape(n_pad, nq).mean(axis=1)], axis=-1).astype(jnp.float32)


@jax.jit
def _compact_live(packed_mm, row_counts, omms_p, gidx, real):
    """Gather the live groups' plan rows (coherent group-axis gathers, one
    plan-time dispatch).  Padding entries (real == 0) duplicate a live
    group but get row_counts 0 — the kernel skips them and their means are
    scatter-dropped (out-of-range scatter index)."""
    return packed_mm[gidx], row_counts[gidx] * real, omms_p[gidx]


def _sky_key(eplan, samples, pose_sig, d_thresh, affine, cfg):
    """sky_store key.  Deliberately EXCLUDES (kcand, rmax): the entry is
    the steady-state serving plan for the pose, and serving it must not
    require re-deriving the widths (that would need the dense pack, whose
    eviction is the point — see _plan_frame's short-circuit).  Width
    consistency is handled at commit time instead: a speculative build is
    committed only after _confirm_pending validates its pack, and an
    overflow re-plan rebuilds the entry from the exact pack."""
    return ("sky", eplan.sig, samples, pose_sig, cfg.cull_sigmas,
            cfg.refine_mode, d_thresh, affine,
            cfg.sky_quad_splay, cfg.sky_quad_spin)


def _sky_probe(splan, sk):
    """(hit, entry) with LRU refresh; entry None = memoised
    not-worth-splitting (the pose stays on the dense path)."""
    if sk in splan.sky_store:
        hit = splan.sky_store.pop(sk)
        splan.sky_store[sk] = hit
        return True, hit
    return False, None


def _sky_put(splan, sk, entry, cfg):
    while len(splan.sky_store) >= max(1, cfg.packed_store_size):
        splan.sky_store.pop(next(iter(splan.sky_store)))
    splan.sky_store[sk] = entry


def _sky_build(splan, eplan, omms_p, local_space, samples,
               kcand, rmax, cache, row_counts, packed_mm,
               ng_quantum: int = 64):
    """Build a sky-split plan from a validated-or-provisional pack
    (SKY SPLIT notes above).  Returns
    (packed_live, rc_live, omms_live, scatter_idx, sky_means, ngl,
    kcand, rmax) or None when the pose isn't worth splitting (live
    fraction > 0.9 — a closed arena would only add the scatter).  The
    liveness fetch is ONE host sync per unseen pose; memoised poses (the
    steady-state serving regime) pay nothing.  Liveness is
    overflow-invariant (kcand/rmax truncation clamps row magnitudes,
    never whether a count is zero) but row CONTENT is not — which is why
    a speculative build must not be committed before its pack validates
    (_confirm_pending's sky_commit hook)."""
    cfg = get_config()
    rc_np = np.asarray(jax.device_get(row_counts))
    ng = rc_np.shape[0]
    live = np.flatnonzero(rc_np > 0)
    if live.size > 0.9 * ng:
        return None
    # quantum-rounded high-water live count: nearby poses reuse the
    # compile.  The sharded planner passes lcm(64, mesh omm axis) so the
    # compacted group count splits evenly over the mesh.
    hint_key = ("sky_ngl", eplan.sig, samples, ng_quantum)
    ngl = max(_ceil_to(max(int(live.size), 1), ng_quantum),
              splan.kmax_cache.get(hint_key, 0))
    ngl = min(ngl, ng)
    if ngl % ng_quantum:  # ng itself may not be quantum-aligned
        ngl = _ceil_to(ngl, ng_quantum)
    splan.kmax_cache[hint_key] = ngl
    pad = ngl - live.size
    gather = np.concatenate([live, np.zeros(pad, np.int64)])
    # padding scatters out of range -> mode="drop" discards it
    scatter = np.concatenate([live, np.full(pad, ng, np.int64)])
    packed_live, rc_live, omms_live = _compact_live(
        packed_mm, row_counts, omms_p,
        jnp.asarray(gather, jnp.int32),
        jnp.asarray((scatter < ng).astype(np.int32)))
    if cache.ndim == 2:  # unified (tex_quads | cache_quads) table
        ch = cfg.farfield_cache_width // 2
        cw = cfg.farfield_cache_width
        row_offset = cache.shape[0] - ch * cw
    else:  # plain (H, W, 16) equirect quad cache
        ch, cw = int(cache.shape[0]), int(cache.shape[1])
        row_offset = 0
    sky_means = _sky_expectation(
        cache, omms_p, local_space,
        nq_splay=cfg.sky_quad_splay, nq_spin=cfg.sky_quad_spin,
        cache_shape=(ch, cw), row_offset=row_offset)
    return (packed_live, rc_live, omms_live,
            jnp.asarray(scatter, jnp.int32), sky_means, ngl, kcand, rmax)


@functools.partial(jax.jit, static_argnames=("ratio",))
def _shadow_pseudo_omms(cg, rg, light_pos, ratio: float):
    """(NGS, 8) pseudo-ommatidium rows whose culling cone has its apex at
    the light and covers the supergroup bound sphere, plus the refine
    distance bound dmax (occluders past the sphere's far side are
    irrelevant).  ratio converts a half-angle into the omm[6] encoding
    (_cull_groups derives half = omm6 / FWHM_SD_RATIO * sigmas)."""
    d = cg - light_pos[None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    axis = d / jnp.maximum(dist, 1e-30)[:, None]
    sin_half = jnp.clip(rg / jnp.maximum(dist, 1e-30), 0.0, 1.0)
    half = jnp.where(dist > jnp.maximum(rg, 0.0),
                     jnp.arcsin(sin_half), jnp.pi)
    half = jnp.where(rg < 0.0, 0.0, half)  # empty supergroup: cull all
    n = cg.shape[0]
    out = jnp.zeros((n, 8), jnp.float32)
    out = out.at[:, 0:3].set(jnp.broadcast_to(light_pos, (n, 3)))
    out = out.at[:, 3:6].set(axis)
    out = out.at[:, 6].set(half * ratio)
    dmax = jnp.where(rg < 0.0, -1.0, dist + rg)
    return out, dmax


def _hit_bound_spheres(hit_f, px, py, pz, ng: int, rg_pad: int):
    """Per-group bounding sphere of the group's ACTUAL hit points (planar
    kernel-order inputs (R,)).  Returns (centers (NG, 3), radii (NG,);
    radius -1 = the group hit nothing)."""
    big = jnp.float32(3e38)
    hm = hit_f.reshape(ng, rg_pad)

    def mm(c):
        c2 = c.reshape(ng, rg_pad)
        return (jnp.min(jnp.where(hm, c2, big), axis=1),
                jnp.max(jnp.where(hm, c2, -big), axis=1))

    x0, x1 = mm(px)
    y0, y1 = mm(py)
    z0, z1 = mm(pz)
    any_h = jnp.any(hm, axis=1)
    cx = jnp.where(any_h, 0.5 * (x0 + x1), 0.0)
    cy = jnp.where(any_h, 0.5 * (y0 + y1), 0.0)
    cz = jnp.where(any_h, 0.5 * (z0 + z1), 0.0)
    dx_, dy_, dz_ = x1 - x0, y1 - y0, z1 - z0
    r = 0.5 * jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_) + 1e-3
    return (jnp.stack([cx, cy, cz], axis=-1),
            jnp.where(any_h, r, -1.0))


@jax.jit
def _sound_bound_spheres(packed_mm, sc_flat, sr_flat):
    """GUARANTEED per-group hit bounds from the packed payload itself:
    every hit lies on one of the group's candidate triangles, so the
    enclosing sphere of the candidates' bounding spheres covers every
    possible hit of every future frame at this pose — unlike the probe's
    inflated hit-cloud sphere, whose coverage is only statistical (the
    silhouette-edge leak, SHADOW_BOUND_INFLATE).  Used after the runtime
    audit observes an out-of-shaft hit (mark_shadow_unsound): bounds
    grow (more occluder rows per shaft), correctness becomes exact.

    Padding slots are all-zero payload columns — detected via the den
    block's normal rows, which the affine transform preserves bitwise
    (transform_payload_affine: Q_d = n exactly)."""
    leaf = KERNEL_LEAF
    ids = jnp.clip(packed_mm[:, :, 10, 0:leaf].astype(jnp.int32),
                   0, sr_flat.shape[0] - 1)  # (NG, rmax, 128)
    nmag = jnp.sum(jnp.abs(packed_mm[:, :, 0:3, 2 * leaf:3 * leaf]), axis=2)
    valid = nmag > 0.0
    c = sc_flat[ids]  # (NG, rmax, 128, 3)
    r = jnp.maximum(sr_flat[ids], 0.0)
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(valid[..., None], c - r[..., None], big),
                 axis=(1, 2))
    hi = jnp.max(jnp.where(valid[..., None], c + r[..., None], -big),
                 axis=(1, 2))
    any_v = jnp.any(valid, axis=(1, 2))
    ctr = jnp.where(any_v[:, None], 0.5 * (lo + hi), 0.0)
    rad = 0.5 * jnp.linalg.norm(hi - lo, axis=-1) + 1e-3
    return ctr, jnp.where(any_v, rad, -1.0)


def mark_shadow_unsound(scene_flat, leak_groups=None) -> bool:
    """Corrective response to the lit-frame shadow audit (round-4 VERDICT
    #7): groups whose hits landed outside their memoised probed shafts
    switch to GUARANTEED candidate-extent bounds (_sound_bound_spheres)
    and the memoised unsound plans are evicted so the next lit frame
    replans.  With `leak_groups` (an iterable of group indices — the
    audit's per-group tail) only those groups fatten; without it the
    whole scene flips (shadow_sound_all).  Per-group is the production
    default: leaks are silhouette-local (the natural bench pose audits
    0.009% of hits in a handful of groups), so correcting only the
    offenders keeps every other shaft at its probed tightness.  Returns
    True when this call changed the mode."""
    splan = scene_plan(scene_flat)
    if leak_groups is None:
        if splan.shadow_sound_all:
            return False
        splan.shadow_sound_all = True
        splan.shadow_store.clear()
        return True
    new = set(int(g) for g in leak_groups) - splan.shadow_unsound_groups
    if not new:
        return False
    splan.shadow_unsound_groups |= new
    splan.shadow_store.clear()
    return True


@functools.partial(
    jax.jit,
    static_argnames=("kcand_s", "rmax_s", "sig"),
)
def _shadow_pack_one(
    cg, rg_sph, lpos,
    mm_flat, slot_center_cl, slot_radius_cl, half_center, half_radius,
    tri_cl,
    kcand_s: int, rmax_s: int, sig: float,
):
    """One light's packed occluder payload, built ONCE per (pose, lights)
    from the probe's inflated hit-bound spheres: a pseudo-cone apexed at
    the light covers each group's sphere, clusters are culled against it
    (distance-bounded at the sphere's far side), candidate triangles
    exact-refined, and the survivors compacted and REVERSE-AFFINE
    transformed (transform_payload_affine with the LIGHT as the shared
    origin, tmin 0): shadow rays trace light -> hit point, so the origin
    is constant across every one of the light's virtual groups and the
    steady-state frame packs only [D, 1] rays — half the planar stack, no
    per-ray cross products.  Only the 8 feature rows survive (occlusion
    never reads the metadata rows), halving the table's HBM and the
    kernel's per-step block DMA.  Returns (rc_s (NG,) int32,
    packed_s (NG, rmax_s, 8, 512)).

    The caller immediately flattens the LIVE rows into the shared ragged
    table (_shadow_plan), so this dense intermediate is transient — one
    light at a time, freed before the next pack (stacking L dense payloads
    exhausted HBM on the 190-cluster natural scene)."""
    from compound_ray_tpu.trace.mm_tracer import transform_payload_affine

    ratio = FWHM_SD_RATIO / sig
    zero3 = jnp.zeros((3,), jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    ps, dm = _shadow_pseudo_omms(cg, rg_sph, lpos, ratio)
    gmask, _, dmin_all = _cull_groups(
        ps, zero3, eye3, half_center, half_radius, sig, 1,
    )
    gmask = gmask & (dmin_all <= dm[:, None])
    counts = jnp.sum(gmask, axis=-1).astype(jnp.int32)
    ids, _ = _shortlist_sorted(gmask, dmin_all, kcand_s)
    rc_s, packed_s, _ = _refine_pack(
        ps, zero3, eye3, ids[:, :kcand_s], jnp.minimum(counts, kcand_s),
        slot_center_cl, slot_radius_cl, mm_flat,
        1, kcand_s, rmax_s, sig, dmax=dm, tri_cl=tri_cl,
    )
    ng_c = packed_s.shape[0]
    packed_s = transform_payload_affine(
        packed_s, jnp.broadcast_to(lpos, (ng_c, 3)),
        jnp.zeros((ng_c,), jnp.float32),
    )[:, :, 0:SHADOW_FEATS, :]
    return rc_s, packed_s


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "ng", "g", "nrb", "rb_size", "rmax", "cull_sigmas",
        "kcand_probe", "affine", "probe_chunk",
    ),
)
def _shadow_probe(
    packed_mm, row_counts, omms_p, position, local_space, key, lights,
    half_center, half_radius, slot_center_cl, slot_radius_cl, tri_cl,
    samples: int, ng: int, g: int, nrb: int, rb_size: int, rmax: int,
    cull_sigmas: float, kcand_probe: int, affine: bool = False,
    probe_chunk: int = 128,
):
    """Planning dispatch for the lit frame's shadow plan: trace the
    primary rays once, bound each group's hit points (inflated by
    SHADOW_BOUND_INFLATE so later frames' RNG-jittered hit clouds stay
    covered), and measure per light the shaft's cluster count and refined
    payload rows.  Returns (kc_need (L,), rows_need (L,), cg (NG, 3),
    rg_sph (NG,)); the spheres feed _shadow_pack_one so the widths are
    measured on exactly the spheres that get packed."""
    n_pad = omms_p.shape[0]
    splay, spin = sample_angles_ns(key, omms_p[:, 6] / FWHM_SD_RATIO,
                                   samples)
    rays, (dx, dy, dz), neg_o = _gen_ray_features(
        omms_p, position, local_space, splay, spin,
        samples=samples, ng=ng, g=g, nrb=nrb, rb_size=rb_size,
        affine=affine,
    )
    out = run_packed_tracer(
        row_counts, packed_mm, rays,
        ng=ng, nrb=nrb, rb_size=rb_size, rmax=rmax,
        ray_feats=(8 if affine else 16),
    )
    t_f = out[0]
    rg = g * samples
    rg_pad = nrb * rb_size

    def repad(x):  # (Np, S) -> (R,) kernel ray order
        x2 = x.reshape(ng, rg)
        if rg_pad != rg:
            x2 = jnp.pad(x2, ((0, 0), (0, rg_pad - rg)))
        return x2.reshape(-1)

    live_f = jnp.repeat(row_counts > 0, rg_pad)
    hit_f = (t_f < 1e30) & live_f
    dxf, dyf, dzf = repad(dx), repad(dy), repad(dz)
    t_c = jnp.where(hit_f, t_f, 0.0)
    pxf = -repad(jnp.broadcast_to(neg_o[0], (n_pad, samples))) + t_c * dxf
    pyf = -repad(jnp.broadcast_to(neg_o[1], (n_pad, samples))) + t_c * dyf
    pzf = -repad(jnp.broadcast_to(neg_o[2], (n_pad, samples))) + t_c * dzf
    cg, rg_sph = _hit_bound_spheres(hit_f, pxf, pyf, pzf, ng, rg_pad)
    # inflate the probed bounds so later frames' RNG-jittered hit clouds
    # stay inside the memoised shafts (a hit outside the shaft would skip
    # its occluders -> light leak)
    rg_sph = jnp.where(rg_sph >= 0.0,
                       rg_sph * SHADOW_BOUND_INFLATE + 1e-2, rg_sph)
    return _shadow_probe_widths(
        cg, rg_sph, lights, half_center, half_radius,
        slot_center_cl, slot_radius_cl, tri_cl, ng,
        cull_sigmas, kcand_probe, probe_chunk)


@functools.partial(
    jax.jit,
    static_argnames=("ng", "cull_sigmas", "kcand_probe", "probe_chunk"),
)
def _shadow_probe_widths(
    cg, rg_sph, lights, half_center, half_radius,
    slot_center_cl, slot_radius_cl, tri_cl, ng: int,
    cull_sigmas: float, kcand_probe: int, probe_chunk: int = 128,
):
    """Per-light shaft width measure on GIVEN per-group bound spheres —
    the tail of _shadow_probe, callable directly with the guaranteed
    candidate-extent spheres (mark_shadow_unsound sound-bounds mode, which
    needs no probe trace at all)."""
    ratio = FWHM_SD_RATIO / cull_sigmas
    zero3 = jnp.zeros((3,), jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    # the exact refine materialises ~(groups, kcand*128) f32 temporaries; at
    # full probe width (kcand = all clusters) that is GBs per temp — chunk
    # the group axis through lax.map so peak HBM scales with probe_chunk
    cs = max(8, min(probe_chunk, ng))
    nch = -(-ng // cs)
    pad = nch * cs - ng

    def _chunked(x, fill=0.0):
        if pad:
            width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            x = jnp.pad(x, width, constant_values=fill)
        return x.reshape((nch, cs) + x.shape[1:])

    kc_list, row_list = [], []
    for li in range(lights.shape[0]):
        ps, dm = _shadow_pseudo_omms(cg, rg_sph, lights[li, 4:7], ratio)
        gmask, _, dmin_all = _cull_groups(
            ps, zero3, eye3, half_center, half_radius, cull_sigmas, 1,
        )
        gmask = gmask & (dmin_all <= dm[:, None])
        counts = jnp.sum(gmask, axis=-1).astype(jnp.int32)
        ids, _ = _shortlist_sorted(gmask, dmin_all, kcand_probe)

        def _rows_chunk(args):
            psn, idsn, cln, dmn = args
            mask, _, _ = _refine_mask(
                psn, zero3, eye3, idsn[:, :kcand_probe], cln,
                slot_center_cl, slot_radius_cl, 1, cull_sigmas,
                dmax=dmn, tri_cl=tri_cl,
            )
            rows = (jnp.sum(mask, axis=-1) + KERNEL_LEAF - 1) // KERNEL_LEAF
            return jnp.max(rows)

        # padding groups carry cl_counts 0 -> cand_valid all-False -> 0 rows
        row_max = jnp.max(jax.lax.map(_rows_chunk, (
            _chunked(ps), _chunked(ids),
            _chunked(jnp.minimum(counts, kcand_probe)),
            _chunked(dm, fill=-1.0),
        )))
        kc_list.append(jnp.max(counts))
        row_list.append(row_max)
    return jnp.stack(kc_list), jnp.stack(row_list), cg, rg_sph


def _shadow_plan(splan, eplan, omms_p, position, local_space, pose_sig,
                 lights_np: np.ndarray, samples: int, key,
                 packed_mm, row_counts, rmax: int, shards: int = 1,
                 affine: bool = False):
    """Memoised ROW-BLOCK shadow payload
    (counts (L, NG), r2v (TB,), flag (TB,), flat_rows (TB, 16, rpb*512))
    for a (eye, pose, lights, samples, mesh-shards, rpb) combination,
    rpb = cfg.shadow_rpb rows per kernel block.

    Per light, the probe's hit-bound shafts are exact-refined and packed
    (same triangle granularity as the primary payload — cluster-granular
    shortlists measured 16x unlit because shafts keep 10-40x more
    triangles than the refine), then the LIVE rows of the transient dense
    (NG, rmax_s, 16, 512) pack are flattened into one shared table sorted
    by VIRTUAL GROUP (light*NG + group): memory AND kernel grid equal the
    actual total row count (a per-group jmax grid measured ~40 ms/light of
    masked-step overhead; the dense per-light stack exhausted HBM), in
    BLOCKS of rpb rows packed side by side on the slot axis (one wide MXU
    dot per latency-bound grid step; per-group tails pad with zero rows
    that can never pass the any-hit test).  r2v maps each block to its
    virtual group, flag marks first-of-group (2) / live (1) / padding (0)
    blocks; run_rows_occlusion traces ALL lights in one dispatch.  Padding
    blocks inherit the last live block's virtual group so the revisited
    out block never changes on dead steps (a block change there would
    write back a stale buffer).  For `shards` > 1 the table is laid out
    shard-major with equal per-shard padding, and r2v holds SHARD-LOCAL
    virtual groups (light*NG_local + g_local), so shard_map can split it
    with P("omm") on the block axis.  Flatten indices are computed on the
    HOST at plan time (one sync per light); steady-state lit frames pay
    one occlusion kernel + the GGX math."""
    cfg = get_config()
    rpb = cfg.shadow_rpb
    if rpb < 1 or 64 % rpb:
        raise ValueError(
            f"shadow_rpb={rpb} must be a divisor of 64 (the shard "
            f"row-padding quantum)")
    # affine in the key: the probe traces the (affine or plain) primary
    # payload, and a config flip at a seen pose must not serve the other
    # mode's hit-bound shafts.  rpb in the key: the table's block layout
    # depends on it, and a config flip must not serve stale blocks
    sk = (eplan.sig, samples, pose_sig, lights_np.tobytes(),
          cfg.cull_sigmas, cfg.refine_mode, shards, affine, rpb,
          splan.shadow_sound_all,
          tuple(sorted(splan.shadow_unsound_groups)))
    hit = splan.shadow_store.get(sk)
    if hit is not None:
        splan.shadow_store[sk] = splan.shadow_store.pop(sk)  # LRU refresh
        return hit
    # probe over the FULL cluster set: _shadow_pack_one refines up to
    # shadow_kmax (<= num_clusters) clusters, so a narrower probe width
    # would under-measure rows_need and the pack's rmax clamp would drop
    # the farthest occluder rows (light leaks) on >128-cluster scenes
    kcand_probe = splan.num_clusters
    tri_cl = splan.slot_tri_cl if cfg.refine_mode == "exact" else None
    unsound = splan.shadow_unsound_groups
    if splan.shadow_sound_all:
        # corrective mode (mark_shadow_unsound): shafts derive from the
        # guaranteed candidate-triangle extent — no probe trace, no
        # statistical coverage gap, bigger shafts
        cg_s, rg_s = _sound_bound_spheres(
            packed_mm,
            splan.slot_center_cl.reshape(-1, 3),
            splan.slot_radius_cl.reshape(-1))
        kc_need, rows_need, cg, rg_sph = _shadow_probe_widths(
            cg_s, rg_s, jnp.asarray(lights_np),
            splan.half_center, splan.half_radius,
            splan.slot_center_cl, splan.slot_radius_cl, tri_cl,
            ng=eplan.ng, cull_sigmas=cfg.cull_sigmas,
            kcand_probe=kcand_probe, probe_chunk=cfg.shadow_pack_chunk,
        )
    elif unsound:
        # per-group corrective: probed bounds everywhere except the
        # groups the audit flagged, which get the guaranteed extent
        cg_s, rg_s = _sound_bound_spheres(
            packed_mm,
            splan.slot_center_cl.reshape(-1, 3),
            splan.slot_radius_cl.reshape(-1))
        kc_need, rows_need, cg, rg_sph = _shadow_probe(
            packed_mm, row_counts, omms_p, position, local_space, key,
            jnp.asarray(lights_np), splan.half_center, splan.half_radius,
            splan.slot_center_cl, splan.slot_radius_cl, tri_cl,
            samples=samples, ng=eplan.ng, g=eplan.g, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax,
            cull_sigmas=cfg.cull_sigmas, kcand_probe=kcand_probe,
            affine=affine, probe_chunk=cfg.shadow_pack_chunk,
        )
        um = np.zeros((eplan.ng,), bool)
        um[[g_ for g_ in unsound if g_ < eplan.ng]] = True
        um_d = jnp.asarray(um)
        cg = jnp.where(um_d[:, None], cg_s, cg)
        rg_sph = jnp.where(um_d, rg_s, rg_sph)
        # widths were measured on the probed spheres; re-measure on the
        # hybrid so the pack's rmax covers the fattened shafts
        kc2, rows2, _, _ = _shadow_probe_widths(
            cg, rg_sph, jnp.asarray(lights_np),
            splan.half_center, splan.half_radius,
            splan.slot_center_cl, splan.slot_radius_cl, tri_cl,
            ng=eplan.ng, cull_sigmas=cfg.cull_sigmas,
            kcand_probe=kcand_probe, probe_chunk=cfg.shadow_pack_chunk,
        )
        kc_need, rows_need = kc2, rows2
    else:
        kc_need, rows_need, cg, rg_sph = _shadow_probe(
            packed_mm, row_counts, omms_p, position, local_space, key,
            jnp.asarray(lights_np), splan.half_center, splan.half_radius,
            splan.slot_center_cl, splan.slot_radius_cl, tri_cl,
            samples=samples, ng=eplan.ng, g=eplan.g, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax,
            cull_sigmas=cfg.cull_sigmas, kcand_probe=kcand_probe,
            affine=affine, probe_chunk=cfg.shadow_pack_chunk,
        )
    kc = int(np.asarray(jax.device_get(jnp.max(kc_need))))
    rw_all = np.asarray(jax.device_get(rows_need))
    shadow_kmax = min(splan.num_clusters, _ceil_to(max(kc, 1), 8))
    ng = eplan.ng
    n_lights = lights_np.shape[0]
    ngl = ng // shards
    cnts_np = np.zeros((n_lights, ng), np.int32)
    shard_parts = [[] for _ in range(shards)]  # device row chunks, in order
    shard_rc = [[] for _ in range(shards)]  # per light: local (ngl,) counts
    # the dense per-light transient ((groups, rmax_li, 16, 512)) and the
    # full-width refine temporaries behind it scale with groups * clusters;
    # unchunked on a 256-cluster scene they want >15 GB of HBM (the round-4
    # lit OOM).  Chunk the group axis so peak plan-time HBM is bounded by
    # cfg.shadow_pack_chunk; the last chunk pads with rg < 0 groups (which
    # cull to zero rows), so each light compiles ONE chunk shape.
    cs = max(8, min(cfg.shadow_pack_chunk, ngl))
    nch = -(-ngl // cs)
    for li in range(n_lights):
        rmax_li = min(shadow_kmax, _ceil_to(max(int(rw_all[li]), 1), 2))
        light = jnp.asarray(lights_np[li, 4:7])
        for k in range(shards):
            rc_k = np.zeros((ngl,), np.int64)
            for ci in range(nch):
                lo = ci * cs
                n_in = min(cs, ngl - lo)
                gsl = slice(k * ngl + lo, k * ngl + lo + n_in)
                cgc, rgc = cg[gsl], rg_sph[gsl]
                if n_in < cs:
                    cgc = jnp.pad(cgc, ((0, cs - n_in), (0, 0)))
                    rgc = jnp.pad(rgc, (0, cs - n_in),
                                  constant_values=-1.0)
                rc_s, packed_s = _shadow_pack_one(
                    cgc, rgc, light,
                    splan.mm_flat, splan.slot_center_cl,
                    splan.slot_radius_cl, splan.half_center,
                    splan.half_radius, tri_cl,
                    kcand_s=shadow_kmax, rmax_s=rmax_li,
                    sig=cfg.cull_sigmas,
                )
                rc_np = np.minimum(
                    np.asarray(jax.device_get(rc_s), np.int64), rmax_li,
                )[:n_in]
                rc_k[lo:lo + n_in] = rc_np
                # each group's rows pad to an rpb multiple with ZERO rows
                # (index -1, fill 0.0) so the kernel's rpb-row blocks never
                # straddle groups; zero rows have den == 0 and can never
                # pass the any-hit test
                rp_np = -(-rc_np // rpb) * rpb
                if rp_np.sum():
                    # live-row gather indices into the chunk's dense
                    # transient, group-major
                    src = np.concatenate([
                        np.concatenate([
                            gl * rmax_li + np.arange(rc_np[gl]),
                            np.full(rp_np[gl] - rc_np[gl], -1, np.int64),
                        ])
                        for gl in range(n_in) if rp_np[gl]
                    ])
                    flat2 = packed_s.reshape(
                        cs * rmax_li, SHADOW_FEATS, MM_COLS)
                    shard_parts[k].append(jnp.take(
                        flat2, jnp.asarray(src, jnp.int32), axis=0,
                        mode="fill", fill_value=0.0))
                del packed_s  # transient dense pack: freed per chunk
            cnts_np[li, k * ngl:(k + 1) * ngl] = rc_k
            shard_rc[k].append(rc_k)
    # equal per-shard padding (SPMD needs one static grid), 64-row buckets
    # so nearby poses reuse the compiled kernel; rpb divides 64, so the
    # per-shard row count is always a whole number of kernel blocks
    def _padded_rows(rcl):
        return int(sum(int(((-(-r // rpb)) * rpb).sum()) for r in rcl))

    t_shard = _ceil_to(max(
        max(_padded_rows(rcl) for rcl in shard_rc), 1
    ), 64)
    tb_shard = t_shard // rpb
    r2v_np = np.zeros((shards * tb_shard,), np.int32)
    flag_np = np.zeros((shards * tb_shard,), np.int32)
    dev_parts = []
    for k in range(shards):
        base = k * tb_shard
        blocks_k = 0
        rows_k = 0
        for li in range(n_lights):
            rck = shard_rc[k][li]
            for gl in range(ngl):
                c = int(rck[gl])
                if c:
                    nb_g = -(-c // rpb)
                    r2v_np[base + blocks_k:
                           base + blocks_k + nb_g] = li * ngl + gl
                    flag_np[base + blocks_k] = 2
                    flag_np[base + blocks_k + 1:base + blocks_k + nb_g] = 1
                    blocks_k += nb_g
                    rows_k += nb_g * rpb
        if blocks_k:  # padding blocks revisit the last live out block
            r2v_np[base + blocks_k:
                   base + tb_shard] = r2v_np[base + blocks_k - 1]
        pad = t_shard - rows_k
        parts = shard_parts[k]
        if pad or not parts:
            parts = parts + [jnp.zeros((pad, SHADOW_FEATS, MM_COLS),
                                       jnp.float32)]
        dev_parts.append(parts[0] if len(parts) == 1
                         else jnp.concatenate(parts, axis=0))
    flat_rows = (dev_parts[0] if shards == 1
                 else jnp.concatenate(dev_parts, axis=0))
    # pack each block's rpb consecutive rows side by side on the slot axis
    # — ONE wide (RS, 16) x (16, rpb*512) MXU dot per latency-bound grid
    # step (run_rows_occlusion block layout)
    flat_rows = (flat_rows.reshape(-1, rpb, SHADOW_FEATS, MM_COLS)
                 .transpose(0, 2, 1, 3)
                 .reshape(-1, SHADOW_FEATS, rpb * MM_COLS))
    # the probed (inflated) per-group shaft spheres ride along so the
    # steady-state lit frame can AUDIT its hits against them: a hit outside
    # its group's sphere saw only shaft-local occluders (the documented
    # silhouette-edge approximation) — see the shadow_audit epilogue
    out = (jnp.asarray(cnts_np), jnp.asarray(r2v_np),
           jnp.asarray(flag_np), flat_rows,
           jnp.concatenate([cg, rg_sph[:, None]], axis=-1))
    while len(splan.shadow_store) >= max(1, cfg.shadow_store_size):
        splan.shadow_store.pop(next(iter(splan.shadow_store)))
    splan.shadow_store[sk] = out
    return out


def _farfield_plan(splan, eplan, scene_dev, ommatidia_np, pos_np, ls_np,
                   samples, background, lights, cfg):
    """Far-field radiance-cache planning for a frame: decide the near/far
    cluster split and build (or fetch) the pose-memoised cache.  Shared by
    the single-chip (_plan_frame) and sharded (_plan_for_mesh) planners so
    multi-chip frames ride the same cache + unified epilogue.  Returns
    (use_cache, near_mask, cache, d_thresh).

    quad_gray scenes skip the combined tex+cache table (it is built on
    the 16-wide colour quads, which the gray path deliberately never
    materialises); closed arenas — the gray path's target — have no far
    clusters anyway."""
    use_cache = False
    near_mask = None
    cache = None
    d_thresh = 0.0
    if not (lights is None and cfg.farfield == "auto"
            and splan.quad_gray is None and splan.num_clusters > 8):
        return use_cache, near_mask, cache, d_thresh
    cache_px = cfg.farfield_cache_width * (cfg.farfield_cache_width // 2)
    if samples * eplan.n < cache_px:
        return use_cache, near_mask, cache, d_thresh
    # reused at the pack call — the O(N) host pass over the ommatidia
    # must run once per frame, not twice
    d_thresh = _farfield_threshold(ommatidia_np, cfg.farfield_tolerance)
    # eye centre in world space (the cache viewpoint)
    rel_c = ommatidia_np[:, 0:3].mean(axis=0)
    center_np = np.asarray(pos_np, np.float64) + rel_c @ np.asarray(
        ls_np, np.float64
    )
    cdist = np.linalg.norm(
        splan.sphere_center_np - center_np[None, :], axis=1
    )
    far = (cdist - splan.sphere_radius_np) > d_thresh
    if not far.any():
        return use_cache, near_mask, cache, d_thresh
    use_cache = True
    near_mask = jnp.asarray(~far)
    # the cache depends only on (scene, eye centre, width, background) —
    # NOT on samples or the RNG — so it is memoised and reused across
    # frames at a fixed pose.  big_table_bf16_bytes is in the key: the
    # cached table's DTYPE depends on it, and a config flip between
    # frames must not serve a stale-precision table
    cache_key = (
        np.asarray(center_np, np.float32).tobytes(),
        cfg.farfield_cache_width, background, d_thresh,
        cfg.big_table_bf16_bytes,
    )
    cache = splan.cache_store.get(cache_key)
    if cache is None:
        cache = _render_cache(
            splan.payload, splan.attr_table, scene_dev,
            splan.quad_table,
            splan.half_center, splan.half_radius,
            jnp.asarray(np.asarray(center_np, np.float32)),
            jnp.asarray(far),
            width=cfg.farfield_cache_width, background=background,
            kmax=min(splan.num_clusters, 256),
            textured=splan.textured, tex_only=splan.tex_only,
        )
        cache = build_equirect_quads(cache)  # (H, W, 16)
        if splan.textured:
            # combined (tex_quads | cache_quads) table for the unified
            # single-gather epilogue
            cache = jnp.concatenate(
                [splan.quad_table, cache.reshape(-1, 16)], axis=0
            )
            bf16_at = cfg.big_table_bf16_bytes
            if bf16_at and cache.nbytes > bf16_at:
                # past the ~64 MB per-ray-gather cliff the cost grows
                # with table BYTES (docs/performance.md): halve them;
                # quad_bilinear_c promotes back to f32 in the blend
                cache = cache.astype(jnp.bfloat16)
        if len(splan.cache_store) > 64:  # bound for pose sweeps
            splan.cache_store.clear()
        splan.cache_store[cache_key] = cache
    return use_cache, near_mask, cache, d_thresh


def _plan_frame(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia_np: np.ndarray,  # (N,8) host copy (for plan hashing)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    lights: Optional[np.ndarray] = None,  # (L,7) host rows enable lighting
    defer_check: bool = False,
    force_exact: bool = False,
):
    """Shared frame planning (memoised widths/payload/cache/shadow plans):
    returns (kwargs, eplan, pending) where kwargs holds every _render_frame
    argument except the PRNG key — the single-frame and scanned multi-frame
    entry points both consume it.  pending (unlit speculative plans with
    defer_check) must be resolved with _confirm_pending AFTER dispatching
    the frame; False means re-plan with force_exact and re-render.  Lit
    frames never defer: the shadow plan probes the packed payload and its
    widths are memoised per pose, so they must come from a validated
    pack."""
    splan = scene_plan(scene_flat)
    eplan = eye_plan(ommatidia_np, samples)
    if eplan.omms_p_dev is None:
        eplan.omms_p_dev = jnp.asarray(ommatidia_np[eplan.perm])
        eplan.inv_valid_dev = jnp.asarray(eplan.inv_valid)
    omms_p = eplan.omms_p_dev

    # keep the pose on the host for the cache key: np.asarray on a device
    # array is a blocking transfer (~26 ms through the axon tunnel)
    pos_np = position if isinstance(position, np.ndarray) else np.asarray(position)
    ls_np = local_space if isinstance(local_space, np.ndarray) else np.asarray(local_space)
    position = jnp.asarray(np.asarray(pos_np, np.float32))
    local_space = jnp.asarray(np.asarray(ls_np, np.float32))
    pose_sig = (
        np.asarray(pos_np, np.float32).tobytes(),
        np.asarray(ls_np, np.float32).tobytes(),
    )
    cfg = get_config()
    (use_cache, near_mask, cache, d_thresh) = _farfield_plan(
        splan, eplan, scene_dev, ommatidia_np, pos_np, ls_np,
        samples, background, lights, cfg)

    # affine ray factorisation (transform_payload_affine): frames with one
    # ommatidium per group trace [d, 1] rays against an origin-folded
    # payload — half the planar ray stack, no cross products.  Lit frames
    # ride it too: the shadow probe traces the same payload (affine-aware),
    # hit points reconstruct from neg_o (computed either way), and the
    # shadow-ray occlusion kernel keeps its own 16-feature payloads
    # (per-ray origins — the affine trick needs a shared one).
    affine = bool(cfg.affine_rays) and eplan.g == 1
    # sky split (SKY SPLIT notes): compact the live groups, serve zero-row
    # groups their memoised cache expectation.  A memoised entry
    # SHORT-CIRCUITS dense planning entirely — the steady state at a
    # sky pose holds only the compacted payload (the dense pack is not
    # committed / is evicted below; keeping both doubled the pose's HBM
    # footprint and OOM'd the round-4 conformance gate on hetero/big).
    sky_eligible = (cfg.sky_split and use_cache and lights is None
                    and eplan.g == 1)
    sky = None
    sky_sk = None
    if sky_eligible:
        sky_sk = _sky_key(eplan, samples, pose_sig, d_thresh, affine, cfg)
        if not force_exact:
            hit, sky = _sky_probe(splan, sky_sk)
            if hit and sky is None:
                sky_eligible = False  # memoised not-worth-splitting
    ng_out = eplan.ng
    sky_means = sky_scatter = None
    if sky is not None:
        (packed_mm, row_counts, omms_p, sky_scatter, sky_means, ng_out,
         kcand, rmax) = sky
        pending = None
        shadow_counts = shadow_r2v = None
        shadow_flag = shadow_flat = lights_dev = None
        shadow_sph = None
        loc_tab = None
    else:
        loc_tab = None
        kcand, rmax, (row_counts, packed_mm), pending = _plan_widths_pack(
            splan, eplan, omms_p, position, local_space, pose_sig, samples,
            near_mask=near_mask, use_cache=use_cache,
            d_thresh=d_thresh if use_cache else 0.0,
            defer=(defer_check and lights is None),
            force_exact=force_exact,
            affine=affine,
        )
        # lighting disables the far-field radiance cache: cached radiance
        # is unlit, and the reference lights every hit (shaders.cu:
        # 826-881).  The shadow plan probes the PRIMARY hit clouds, so the
        # packed plan must exist first.
        if lights is not None:
            lights_np = np.asarray(lights, np.float32)
            (shadow_counts, shadow_r2v, shadow_flag, shadow_flat,
             shadow_sph) = _shadow_plan(
                splan, eplan, omms_p, position, local_space, pose_sig,
                lights_np, samples, key, packed_mm, row_counts, rmax,
                affine=affine,
            )
            lights_dev = jnp.asarray(lights_np)
            if cfg.lit_local_resolve:
                loc_tab = _loc_tab_plan(
                    splan,
                    _packed_key(eplan, samples, pose_sig, kcand, rmax,
                                use_cache, d_thresh if use_cache else 0.0,
                                cfg, affine),
                    packed_mm, scene_dev, with_shading=True)
        else:
            shadow_counts, shadow_r2v = None, None
            shadow_flag, shadow_flat, lights_dev = None, None, None
            shadow_sph = None
        if sky_eligible:
            sky = _sky_build(
                splan, eplan, omms_p, local_space, samples,
                kcand, rmax, cache, row_counts, packed_mm)
            if pending is not None:
                # commit only once the speculative pack validates
                # (_confirm_pending): a truncated pack's compacted COPY
                # would be missing payload rows
                pending["sky_commit"] = (sky_sk, sky)
            else:
                _sky_put(splan, sky_sk, sky, cfg)
                if sky is not None:
                    # the compacted plan supersedes the dense pack at
                    # this pose (see the short-circuit note above)
                    splan.packed_store.pop(_packed_key(
                        eplan, samples, pose_sig, kcand, rmax, use_cache,
                        d_thresh if use_cache else 0.0, cfg, affine), None)
            if sky is not None:
                (packed_mm, row_counts, omms_p, sky_scatter, sky_means,
                 ng_out, _, _) = sky
    kwargs = dict(
        packed_mm=packed_mm, row_counts=row_counts,
        attr_table=splan.attr_table, scene_dev=scene_dev,
        quad_table=splan.quad_table,
        omms_p=omms_p, position=position, local_space=local_space,
        samples=samples, background=background,
        ng=ng_out, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size,
        rmax=rmax, textured=splan.textured,
        sky_means=sky_means, sky_scatter=sky_scatter,
        # per-scene adopted intersection precision (scene_plan resolves it
        # from tuning's precision_by_scene under the same-seed gate).
        # UNLIT frames only: the gate's evidence is the unlit conformance
        # set; lit frames keep the module default everywhere.
        precision=(splan.precision if lights is None else None),
        cache=cache, use_cache=use_cache,
        tex_only=splan.tex_only,
        cache_shape=(cfg.farfield_cache_width // 2, cfg.farfield_cache_width),
        lights=lights_dev, slot_tri=splan.slot_tri,
        shadow_counts=shadow_counts, shadow_r2v=shadow_r2v,
        shadow_flag=shadow_flag, shadow_flat=shadow_flat,
        shadow_sph=shadow_sph,
        tex_static=splan.tex_static, quad_gray=splan.quad_gray,
        affine=affine, loc_tab=loc_tab,
        direct1=splan.direct1,
    )
    return kwargs, eplan, (splan, pending)


def render_means_pallas(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia_np: np.ndarray,  # (N,8) host copy (for plan hashing)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    lights: Optional[np.ndarray] = None,  # (L,7) host rows enable lighting
    shadow_audit: bool = False,  # lit frames: also return leak counts
    force_exact: bool = False,
    defer_confirm: bool = False,
) -> jnp.ndarray:
    """Full Pallas frame; returns (N,3) means in original ommatidium order.

    One device dispatch per frame in the steady state.  Unseen poses plan
    speculatively at the scene's high-water widths and the validity check
    resolves AFTER the frame dispatch (overlapped with frame execution) —
    an overflow (needs grew past the marks) re-plans exactly and
    re-renders the same key, so results never depend on the fast path.

    With `shadow_audit` and lighting on, returns (means, audit) where
    audit = [out-of-shaft hits, total hits] (int32 device scalars): hits
    outside their group's memoised shadow shaft saw only shaft-local
    occluders and may have leaked light (SHADOW_BOUND_INFLATE note).

    defer_confirm hands the speculative-pack check to the CALLER instead
    of resolving it here: the return becomes (means, handle) with handle
    None (nothing to confirm) or (splan, pending) to pass through
    _confirm_pending.  A False confirm means the means are truncated —
    the caller must re-render with force_exact=True and the same key.
    This is how api.renderer folds the check into the frame's own sync
    transfer, making a fresh pose cost ONE tunnel round trip instead of
    two (the closed-loop/GA sequential-pose path)."""
    audit_on = shadow_audit and lights is not None
    kwargs, eplan, (splan, pending) = _plan_frame(
        scene_flat, scene_dev, ommatidia_np, position, local_space, key,
        samples, background, lights, defer_check=(not force_exact),
        force_exact=force_exact,
    )
    means_p = _render_frame(key=key, shadow_audit=audit_on, **kwargs)
    if defer_confirm:
        handle = None if pending is None else (splan, pending)
        if audit_on:
            means_p, audit = means_p
            return (means_p[eplan.inv_valid_dev], audit), handle
        return means_p[eplan.inv_valid_dev], handle
    if pending is not None and not _confirm_pending(splan, pending):
        kwargs, eplan, _ = _plan_frame(
            scene_flat, scene_dev, ommatidia_np, position, local_space,
            key, samples, background, lights, force_exact=True,
        )
        means_p = _render_frame(key=key, shadow_audit=audit_on, **kwargs)
    if audit_on:
        means_p, audit = means_p
        return means_p[eplan.inv_valid_dev], audit
    return means_p[eplan.inv_valid_dev]


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "background", "ng", "g", "nrb", "rb_size", "rmax",
        "textured", "use_cache", "tex_only", "cache_shape", "tex_static",
        "affine", "precision", "direct1",
    ),
)
def _render_frames_scanned(
    packed_mm, row_counts, attr_table, scene_dev, quad_table,
    omms_p, position, local_space, keys,
    samples: int, background: int, ng: int, g: int, nrb: int,
    rb_size: int, rmax: int, textured: bool,
    cache=None, use_cache: bool = False, tex_only: bool = False,
    cache_shape: Tuple[int, int] = (0, 0),
    lights=None, slot_tri=None, shadow_counts=None, shadow_r2v=None,
    shadow_flag=None, shadow_flat=None, tex_static=None, quad_gray=None,
    affine: bool = False, shadow_sph=None, sky_means=None, sky_scatter=None,
    precision: Optional[str] = None, loc_tab=None,
    direct1: Optional[bool] = None,
):
    """F consecutive frames in ONE dispatch: a lax.scan over the stacked
    per-frame PRNG keys, each step drawing its own jitter and running the
    full fused frame.  Outputs (F, Np, 3) — bit-identical to F sequential
    _render_frame dispatches; only the per-dispatch transport round trip
    (~26 ms through the axon tunnel, the entire small-frame floor) is
    removed."""
    n_pad = omms_p.shape[0]
    sd = omms_p[:, 6] / FWHM_SD_RATIO

    def body(carry, key):
        splay, spin = sample_angles_ns(key, sd, samples)
        means = _trace_shade_angles(
            packed_mm, row_counts, attr_table, scene_dev, quad_table,
            omms_p, position, local_space, splay, spin,
            samples=samples, background=background, ng=ng, g=g, nrb=nrb,
            rb_size=rb_size, rmax=rmax, textured=textured,
            cache=cache, use_cache=use_cache, tex_only=tex_only,
            cache_shape=cache_shape, lights=lights, slot_tri=slot_tri,
            shadow_counts=shadow_counts, shadow_r2v=shadow_r2v,
            shadow_flag=shadow_flag, shadow_flat=shadow_flat,
            tex_static=tex_static, quad_gray=quad_gray, affine=affine,
            sky_means=sky_means, sky_scatter=sky_scatter,
            precision=precision, loc_tab=loc_tab, direct1=direct1,
        )
        return carry, means

    _, out = jax.lax.scan(body, 0, keys)
    return out


# past this many total rays-per-ommatidium the stacked burst stops paying
# (the kernel is marginal-cost-bound, not launch-bound) and its (Np, F*S)
# intermediates grow; the scanned burst takes over
STACK_BURST_MAX_SAMPLES = 4096


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples", "background", "ng", "g", "nrb", "rb_size", "rmax",
        "textured", "use_cache", "tex_only", "cache_shape", "tex_static",
        "affine", "precision", "direct1",
    ),
)
def _render_frames_stacked(
    packed_mm, row_counts, attr_table, scene_dev, quad_table,
    omms_p, position, local_space, keys,
    samples: int, background: int, ng: int, g: int, nrb: int,
    rb_size: int, rmax: int, textured: bool,
    cache=None, use_cache: bool = False, tex_only: bool = False,
    cache_shape: Tuple[int, int] = (0, 0),
    lights=None, slot_tri=None, shadow_counts=None, shadow_r2v=None,
    shadow_flag=None, shadow_flat=None, tex_static=None, quad_gray=None,
    affine: bool = False, shadow_sph=None, sky_means=None, sky_scatter=None,
    precision: Optional[str] = None, loc_tab=None,
    direct1: Optional[bool] = None,
):
    """F consecutive frames in ONE kernel call: per-frame jitter stacked on
    the sample axis (column f*S+s = frame f's sample s), so the packed
    geometry tables are streamed through VMEM once per burst instead of once
    per frame.  Small frames are table-read-bound (samples=1 costs almost
    the same as samples=100), so this divides the fixed kernel cost by F.
    Per-frame RNG streams and the S-length mean reductions are the same as
    the sequential path — outputs are bit-identical to F render_frame calls
    (asserted in tests/test_batched_and_gui.py)."""
    n_pad = omms_p.shape[0]
    f = keys.shape[0]
    sd = omms_p[:, 6] / FWHM_SD_RATIO

    def draw(key):
        return sample_angles_ns(key, sd, samples)

    splay_f, spin_f = jax.vmap(draw)(keys)  # (F, Np, S)
    splay = jnp.transpose(splay_f, (1, 0, 2)).reshape(n_pad, f * samples)
    spin = jnp.transpose(spin_f, (1, 0, 2)).reshape(n_pad, f * samples)
    # the burst's per-group ray run is F x the plan's, so it gets its own
    # block layout (same rule as eye_plan: blocks <= ~3328 rays, padded to
    # the kernel batch); groups/shortlists are untouched
    rg2 = g * f * samples
    nrb2 = max(1, -(-rg2 // 3328))
    rb_size2 = _ceil_to(-(-rg2 // nrb2), MM_BATCH_RAYS)
    out = _trace_shade_angles(
        packed_mm, row_counts, attr_table, scene_dev, quad_table,
        omms_p, position, local_space, splay, spin,
        samples=f * samples, background=background, ng=ng, g=g, nrb=nrb2,
        rb_size=rb_size2, rmax=rmax, textured=textured,
        cache=cache, use_cache=use_cache, tex_only=tex_only,
        cache_shape=cache_shape, lights=lights, slot_tri=slot_tri,
        shadow_counts=shadow_counts, shadow_r2v=shadow_r2v,
        shadow_flag=shadow_flag, shadow_flat=shadow_flat,
        tex_static=tex_static, quad_gray=quad_gray, frames=f, affine=affine,
        sky_means=sky_means, sky_scatter=sky_scatter,
        precision=precision, loc_tab=loc_tab, direct1=direct1,
    )  # (Np, F, 3) — N0 (the pre-compaction count) under the sky split
    return jnp.transpose(out, (1, 0, 2))


def render_means_pallas_frames(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia_np: np.ndarray,
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    keys: jax.Array,  # (F, ...) stacked per-frame PRNG keys
    samples: int,
    background: int,
    lights: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """(F, N, 3) means for F consecutive frames in one device dispatch —
    the steady-state serving mode for pose-static frame bursts (the shared
    plan is built once; each frame keeps its own RNG stream).

    Small bursts (F*S <= STACK_BURST_MAX_SAMPLES) run as ONE kernel call
    with the frames stacked on the sample axis — small frames are
    table-read-bound, so the scanned burst still pays the full fixed kernel
    cost per frame while the stacked one pays it once."""
    kwargs, eplan, (splan, pending) = _plan_frame(
        scene_flat, scene_dev, ommatidia_np, position, local_space,
        keys[0], samples, background, lights, defer_check=True,
    )
    f = int(keys.shape[0])
    stacked = 1 < f * samples <= STACK_BURST_MAX_SAMPLES
    burst = _render_frames_stacked if stacked else _render_frames_scanned
    out = burst(keys=keys, **kwargs)
    if pending is not None and not _confirm_pending(splan, pending):
        kwargs, eplan, _ = _plan_frame(
            scene_flat, scene_dev, ommatidia_np, position, local_space,
            keys[0], samples, background, lights, force_exact=True,
        )
        out = burst(keys=keys, **kwargs)
    return out[:, eplan.inv_valid_dev]


def render_samples_pallas(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia_np: np.ndarray,
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
) -> jnp.ndarray:
    """Raw per-sample radiance (S, N, 3) via the Pallas pipeline — the fast
    backend for the raw_ommatidial_samples projection (the reference's
    compound sample buffer layout: sample s of ommatidium o at row s)."""
    splan = scene_plan(scene_flat)
    eplan = eye_plan(ommatidia_np, samples)
    if eplan.omms_p_dev is None:
        eplan.omms_p_dev = jnp.asarray(ommatidia_np[eplan.perm])
        eplan.inv_valid_dev = jnp.asarray(eplan.inv_valid)
    omms_p = eplan.omms_p_dev

    pos_np = np.asarray(jax.device_get(position), np.float32)
    ls_np = np.asarray(jax.device_get(local_space), np.float32)
    pose_sig = (pos_np.tobytes(), ls_np.tobytes())

    affine = bool(get_config().affine_rays) and eplan.g == 1

    def dispatch(rmax, row_counts, packed_mm):
        return _render_frame(
            packed_mm, row_counts,
            splan.attr_table, scene_dev, splan.quad_table,
            omms_p, position, local_space, key,
            samples=samples, background=background,
            ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size,
            rmax=rmax, textured=splan.textured, want_samples=True,
            tex_only=splan.tex_only, tex_static=splan.tex_static,
            quad_gray=splan.quad_gray, affine=affine,
        )  # (Np, S, 3)

    # same deferred speculative planning as the means path: GA-style raw
    # sweeps (minimumSampleRateFinder protocol) render at a new pose every
    # frame, so unseen-pose round trips dominate
    kcand, rmax, (row_counts, packed_mm), pending = _plan_widths_pack(
        splan, eplan, omms_p, position, local_space, pose_sig, samples,
        defer=True, affine=affine,
    )
    raw_p = dispatch(rmax, row_counts, packed_mm)
    if pending is not None and not _confirm_pending(splan, pending):
        kcand, rmax, (row_counts, packed_mm), _ = _plan_widths_pack(
            splan, eplan, omms_p, position, local_space, pose_sig, samples,
            force_exact=True, affine=affine,
        )
        raw_p = dispatch(rmax, row_counts, packed_mm)
    return jnp.transpose(raw_p[eplan.inv_valid_dev], (1, 0, 2))


# --------------------------------------------------------------- far field
# Geometry beyond the parallax-safe distance D = eye_extent /
# (tolerance * sigma_min) subtends an angular error below a configured
# fraction of the cone-jitter sd when viewed from anywhere on the eye, so it
# is rendered ONCE per frame into a shared equirect radiance cache from the
# eye centre (0.5M coherent rays) and per-sample rays trace only the near
# clusters, falling back to the cache on miss.  The reference's raison
# d'être — near-field parallax across the eye (docs/README.md) — is exactly
# what the near-field trace preserves.


def _equirect_pixel_dirs(width: int, height: int) -> jnp.ndarray:
    """(W*H, 3) unit directions at pixel centres (projection convention of
    _pixel_sphere_dirs with half-pixel offsets)."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    gx, gy = jnp.meshgrid(2.0 * xs - 1.0, 2.0 * ys - 1.0)
    ax = gx * (-jnp.pi) + jnp.pi / 2.0
    ay = gy * (jnp.pi / 2.0)
    cos_y = jnp.cos(ay)
    return jnp.stack(
        [jnp.cos(ax) * cos_y, jnp.sin(ay), jnp.sin(ax) * cos_y], axis=-1
    ).reshape(-1, 3)


def build_equirect_quads(cache: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 16) per-texel 2x2 RGBA neighbourhood (wrap x, clamp y): one row
    gather per bilinear lookup, and the SAME c00|c10|c01|c11 x RGBA layout as
    the texture quad table so both can share a combined gather."""
    h = cache.shape[0]
    a = jnp.ones(cache.shape[:2] + (1,), cache.dtype)
    c4 = jnp.concatenate([cache, a], axis=-1)
    x1 = jnp.roll(c4, -1, axis=1)
    ydown = jnp.minimum(jnp.arange(h) + 1, h - 1)
    y1 = c4[ydown]
    y1x1 = jnp.roll(y1, -1, axis=1)
    return jnp.concatenate([c4, x1, y1, y1x1], axis=-1)


def _equirect_coords(h, w, dirs):
    """(index, fx, fy) into an equirect quad cache for unit dirs (R,3)."""
    return _equirect_coords_c(h, w, dirs[:, 0], dirs[:, 1], dirs[:, 2])


def _default_fast_equirect() -> bool:
    """Env override > measured-on-TPU tuning file > False."""
    v = os.environ.get("CR_TPU_FAST_EQUIRECT", "").strip().lower()
    if v:
        return v not in ("0", "false", "off")
    return bool(load_tuning().get("fast_equirect", False))


# Short-polynomial equirect addressing (tools/tpu_session.py "equirect"
# A/B adopts it via artifacts/tuning.json).  XLA's f32-exact atan2/asin
# lowerings are long VPU transcendental chains; cache addressing only
# needs half-texel accuracy (2*pi/width/2 ~ 3.1e-3 rad at width 1024),
# so a degree-11 atan / sqrt-damped degree-4 asin fit is 200-700x inside
# tolerance (max err 4.0e-6 / 1.4e-5 rad, pinned by
# tests/test_fast_equirect.py).  Index flips only happen within poly-err
# of a texel boundary, where quad-bilinear continuity makes them
# invisible.
FAST_EQUIRECT = _default_fast_equirect()

# near-minimax fits (Chebyshev-reweighted lsq, f64, hard-coded)
_ATAN_COEFFS = (9.9997935596e-01, -3.3267634549e-01, 1.9389718930e-01,
                -1.1736619303e-01, 5.3705611032e-02, -1.2145273844e-02)
_ASIN_COEFFS = (1.5707821176e+00, -2.1406855895e-01, 8.4577511495e-02,
                -3.5808514564e-02, 8.7517029102e-03)


def _fast_atan2(z, x):
    """atan2(z, x) to 4.0e-6 rad via octant reduction + odd deg-11 poly."""
    az, ax = jnp.abs(z), jnp.abs(x)
    mx = jnp.maximum(az, ax)
    t = jnp.minimum(az, ax) / jnp.maximum(mx, 1e-30)
    t2 = t * t
    r = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        r = r * t2 + c
    r = r * t
    r = jnp.where(az > ax, jnp.float32(jnp.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(jnp.pi) - r, r)
    return jnp.where(z < 0, -r, r)


def _fast_asin(y):
    """asin(y), y in [-1, 1], to 1.4e-5 rad: pi/2 - sqrt(1-|y|)*poly(|y|),
    odd-extended (exact at both poles where equirect rows clamp)."""
    a = jnp.abs(y)
    p = jnp.float32(_ASIN_COEFFS[-1])
    for c in _ASIN_COEFFS[-2::-1]:
        p = p * a + c
    r = jnp.float32(jnp.pi / 2) - jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * p
    return jnp.where(y < 0, -r, r)


def _equirect_coords_c(h, w, dx, dy, dz, fast: Optional[bool] = None):
    """Component-planar _equirect_coords (unit direction components (R,))."""
    if fast is None:
        fast = FAST_EQUIRECT  # trace-time read; adoption clears jit caches
    if fast:
        ax = _fast_atan2(dz, dx)
        ay = _fast_asin(jnp.clip(dy, -1.0, 1.0))
    else:
        ax = jnp.arctan2(dz, dx)
        ay = jnp.arcsin(jnp.clip(dy, -1.0, 1.0))
    u = 0.5 + (jnp.pi / 2.0 - ax) / (2.0 * jnp.pi)
    v = 0.5 + ay / jnp.pi
    x = u * w - 0.5
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi0 = jnp.mod(x0.astype(jnp.int32), w)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    return yi0 * w + xi0, fx, fy


def _bilinear16(q, fx, fy):
    fx = fx[:, None]
    fy = fy[:, None]
    c00, c10, c01, c11 = q[:, 0:4], q[:, 4:8], q[:, 8:12], q[:, 12:16]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def sample_equirect(quads: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect lookup over a (H, W, 16) quad cache: wrap in x,
    clamp in y.  dirs unit (R,3)."""
    h, w = quads.shape[0], quads.shape[1]
    idx, fx, fy = _equirect_coords(h, w, dirs)
    q = quads.reshape(-1, 16)[idx]
    return _bilinear16(q, fx, fy)[:, :3]


@functools.partial(
    jax.jit,
    static_argnames=("width", "background", "kmax", "textured", "tex_only"),
)
def _render_cache(
    payload, attr_table, scene_dev, quad_table, half_center, half_radius,
    center: jnp.ndarray,  # (3,) eye centre (cache viewpoint)
    far_mask: jnp.ndarray,  # (C,) bool
    width: int, background: int, kmax: int, textured: bool,
    tex_only: bool = False,
):
    """Equirect far-field radiance cache: (H, W, 3) linear RGB."""
    height = width // 2
    dirs = _equirect_pixel_dirs(width, height)  # (n,3) row-major
    n = dirs.shape[0]
    tile = 256
    # tile as 16x16 pixel BLOCKS (not scanline strips): a block subtends a
    # small solid angle, so its bounding cone culls tightly
    bs = 16
    assert width % bs == 0 and height % bs == 0, (
        f"farfield cache width {width} needs width and width//2 to be "
        f"multiples of {bs}")
    # the tile grouping below also needs the total pixel count to divide
    # into 256-direction tiles (ng = n // tile, then a hard reshape): fail
    # with the constraint named instead of a reshape-size error mid-trace
    assert n % tile == 0, (
        f"farfield cache width {width}: width * (width // 2) = {n} must "
        f"be a multiple of {tile}")
    blocked = (
        dirs.reshape(height // bs, bs, width // bs, bs, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 3)
    )
    dirs_p = blocked
    n_pad = n
    ng = n_pad // tile
    td = dirs_p.reshape(ng, tile, 3)

    # per-tile bounding cone from the fixed viewpoint
    centroid = jnp.sum(td, axis=1)
    centroid = centroid / jnp.maximum(
        jnp.linalg.norm(centroid, axis=-1, keepdims=True), 1e-30
    )
    cosmin = jnp.min(jnp.einsum("gtc,gc->gt", td, centroid,
                                precision=jax.lax.Precision.HIGHEST), axis=1)
    half_ang = jnp.arccos(jnp.clip(cosmin, -1.0, 1.0))

    to_c = half_center[None, :, :, :] - center[None, None, None, :]  # (1,C,2,3)
    dist = jnp.linalg.norm(to_c, axis=-1)  # (1,C,2)
    inside = dist <= half_radius[None, :, :]
    cos_a = jnp.einsum("chd,gd->gch", to_c[0], centroid,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-30)
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    beta = jnp.arcsin(
        jnp.clip(half_radius[None, :, :] / jnp.maximum(dist, 1e-30), 0.0, 1.0)
    )
    gmask = jnp.any(
        inside | (alpha <= half_ang[:, None, None] + beta), axis=-1
    )
    gmask = gmask & far_mask[None, :]
    counts = jnp.minimum(jnp.sum(gmask, axis=-1), kmax).astype(jnp.int32)
    dmin_all = jnp.maximum(jnp.min(dist - half_radius[None], axis=-1), 0.0)
    dmin_all = jnp.broadcast_to(dmin_all, gmask.shape)
    ids, dmin = _shortlist_sorted(gmask, dmin_all, kmax)

    rays = pack_rays(
        dirs_p,
        jnp.broadcast_to(center[None, :], (n_pad, 3)),
        jnp.zeros((n_pad,), jnp.float32),
    )
    out = run_tracer_kernel(
        counts, ids, dmin, payload, rays,
        ng=ng, nrb=1, rb_size=tile, kmax=kmax, early_exit=True,
    )
    t, cu, cv, texid, rgb_pl = resolve_kernel_hits(out, attr_table, tex_only)
    t, cu, cv, texid = t[:n], cu[:n], cv[:n], texid[:n]
    if tex_only:
        rr = gg = bb = jnp.zeros((n,), jnp.float32)
    else:
        rr, gg, bb = (c[:n] for c in rgb_pl)

    tile_live = jnp.repeat(counts > 0, tile)[:n]
    hit = (t < 1e30) & tile_live
    if textured:
        tex_idx, tfx, tfy = texture_quad_coords_c(
            scene_dev, jnp.maximum(texid, 0), cu, cv
        )
        qr, qg, qb = quad_bilinear_c(quad_table[tex_idx], tfx, tfy)
        sel = (texid >= 0) & hit
        rr = jnp.where(sel, qr, rr)
        gg = jnp.where(sel, qg, gg)
        bb = jnp.where(sel, qb, bb)
    dpn = dirs_p[:n]
    mr, mg, mb = miss_color_c(dpn[:, 0], dpn[:, 1], dpn[:, 2], background)
    rgb = jnp.stack([
        jnp.where(hit, rr, mr),
        jnp.where(hit, gg, mg),
        jnp.where(hit, bb, mb),
    ], axis=-1)
    # un-block back to row-major (H, W)
    return (
        rgb.reshape(height // bs, width // bs, bs, bs, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height, width, 3)
    )


def _farfield_threshold(ommatidia_np: np.ndarray, tol: float) -> float:
    """Parallax-safe distance D: eye extent / (tol * sigma_min)."""
    extent = float(
        np.max(np.linalg.norm(ommatidia_np[:, 0:3], axis=1)
               + np.abs(ommatidia_np[:, 7]))
    )
    sigma_min = float(np.min(ommatidia_np[:, 6])) / FWHM_SD_RATIO
    if sigma_min <= 0 or extent <= 0:
        return 0.0
    return extent / max(tol * sigma_min, 1e-9)
