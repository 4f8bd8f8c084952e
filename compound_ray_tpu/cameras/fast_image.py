"""Accelerated real-camera image rendering via the Pallas tracer.

The compound pipeline's cull-then-dense-sweep structure applies equally to
camera images: a tile of adjacent pixels forms a coherent ray bundle whose
bounding cone culls clusters exactly like an ommatidium's acceptance cone.
Each 256-pixel tile becomes one kernel "group"; the per-group shortlist is
derived from the tile's direction centroid + angular radius and origin
spread, then the SAME fused kernel traces it.

Replaces the brute-force sweep of cameras/raygen.py for large scenes (the
noncompound optixLaunch of libEyeRenderer.cpp:228-237).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.cameras.raygen import (
    orthographic_rays,
    panoramic_rays,
    pinhole_rays,
)
from compound_ray_tpu.config import get_config
from compound_ray_tpu.eye.pipeline import resolve_kernel_hits, scene_plan, _ceil_to
from compound_ray_tpu.trace.pallas_tracer import pack_rays, run_tracer_kernel
from compound_ray_tpu.trace.shade import (
    make_color,
    miss_color_c,
    quad_bilinear_c,
    texture_quad_coords_c,
)

TILE = 256  # pixels per kernel group


@functools.partial(
    jax.jit,
    static_argnames=("kind", "width", "height", "background", "kmax",
                     "textured", "tex_only"),
)
def _image_fused(
    payload, attr_table, scene_dev, quad_table, sphere_center, sphere_radius,
    position, local_space, cam_param,
    kind: str, width: int, height: int, background: int, kmax: int,
    textured: bool, tex_only: bool,
):
    if kind == "pinhole":
        origins, dirs, tmin = pinhole_rays(position, local_space, cam_param,
                                           width, height)
    elif kind == "panoramic":
        origins, dirs, tmin = panoramic_rays(position, local_space,
                                             cam_param[0], width, height)
    else:
        origins, dirs, tmin = orthographic_rays(position, local_space,
                                                cam_param, width, height)

    n = width * height
    n_pad = _ceil_to(n, TILE)
    dirs_n = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                                1e-30)
    # t is in |d| units in raygen; normalised dirs need tmin rescaled
    dlen = jnp.linalg.norm(dirs, axis=-1)
    tmin_w = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,)) * dlen

    def pad(x, fill=0.0):
        return jnp.full((n_pad,) + x.shape[1:], fill, x.dtype).at[:n].set(x)

    def pad_edge(x):
        # replicate the LAST real ray into the tail: zero-filled padding
        # rays would blow the last tile's bounding cone to >= 90 deg
        # (dot(0, centroid) = 0) and skew its apex/spread, disabling
        # culling for that tile on any width*height not a TILE multiple
        return jnp.broadcast_to(x[n - 1], (n_pad,) + x.shape[1:]
                                ).astype(x.dtype).at[:n].set(x)

    dirs_p = pad_edge(dirs_n)
    orig_p = pad_edge(jnp.broadcast_to(origins, (n, 3)))
    tmin_p = pad(tmin_w)

    ng = n_pad // TILE
    td = dirs_p.reshape(ng, TILE, 3)
    to = orig_p.reshape(ng, TILE, 3)

    # per-tile bounding cone
    centroid = jnp.sum(td, axis=1)
    centroid = centroid / jnp.maximum(
        jnp.linalg.norm(centroid, axis=-1, keepdims=True), 1e-30
    )  # (ng,3)
    cosmin = jnp.min(jnp.einsum("gtc,gc->gt", td, centroid,
                                precision=jax.lax.Precision.HIGHEST), axis=1)
    half = jnp.arccos(jnp.clip(cosmin, -1.0, 1.0))  # (ng,)
    apex = jnp.mean(to, axis=1)  # (ng,3)
    spread = jnp.max(jnp.linalg.norm(to - apex[:, None, :], axis=-1), axis=1)

    # cone-vs-sphere cull (same conservative test as accel.cull)
    to_c = sphere_center[None, :, :] - apex[:, None, :]  # (ng,C,3)
    dist = jnp.linalg.norm(to_c, axis=-1)
    radii_eff = sphere_radius[None, :] + spread[:, None]
    inside = dist <= radii_eff
    cos_a = jnp.einsum("gcd,gd->gc", to_c, centroid,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-30)
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    beta = jnp.arcsin(jnp.clip(radii_eff / jnp.maximum(dist, 1e-30), 0.0, 1.0))
    gmask = inside | (alpha <= half[:, None] + beta)
    counts = jnp.minimum(jnp.sum(gmask, axis=-1), kmax).astype(jnp.int32)

    dmin_all = jnp.maximum(dist - radii_eff, 0.0)
    kp = _ceil_to(kmax, 128)
    masked = jnp.where(gmask, dmin_all, jnp.inf)
    c = masked.shape[1]
    if kp > c:
        masked = jnp.concatenate(
            [masked, jnp.full((ng, kp - c), jnp.inf, masked.dtype)], axis=-1
        )
    order = jnp.argsort(masked, axis=-1)[:, :kp].astype(jnp.int32)
    dmin_s = jnp.take_along_axis(masked, order, axis=-1)
    dmin_s = jnp.where(jnp.isfinite(dmin_s), dmin_s, 3e38).astype(jnp.float32)
    ids = jnp.where(order < c, order, 0)

    rays = pack_rays(dirs_p, orig_p, tmin_p)
    out = run_tracer_kernel(
        counts, ids, dmin_s, payload, rays,
        ng=ng, nrb=1, rb_size=TILE, kmax=kmax, early_exit=True,
    )
    t, cu, cv, texid, rgb_pl = resolve_kernel_hits(out, attr_table, tex_only)
    t, cu, cv, texid = t[:n], cu[:n], cv[:n], texid[:n]
    if tex_only:
        rr = gg = bb = jnp.zeros((n,), jnp.float32)
    else:
        rr, gg, bb = (c[:n] for c in rgb_pl)

    tile_live = jnp.repeat(counts > 0, TILE)[:n]
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
    return make_color(rgb).reshape(height, width, 4)


def render_camera_image_fast(
    scene_flat, scene_dev, kind, position, local_space, cam_param,
    width, height, background,
):
    """Camera image via the Pallas tracer; kmax measured then cached."""
    splan = scene_plan(scene_flat)
    # image tiles can legitimately see much of the scene (horizon tiles), so
    # allow the full cluster list up to a VMEM-bounded cap; beyond that the
    # nearest-first shortlist truncates the farthest clusters per tile
    kmax = min(splan.num_clusters, 256)
    if splan.num_clusters > 256 and not getattr(splan, "_fastimg_cap_warned",
                                                False):
        # no silent caps: on >256-cluster scenes a tile whose cone admits
        # more keeps the 256 NEAREST — geometry visible only through a
        # dropped farther cluster renders as background in that tile.  The
        # slow path (CR_TPU_BACKEND=xla) is exact.
        splan._fastimg_cap_warned = True
        print(f"[PyEye] fast image path: per-tile cluster shortlist capped "
              f"at 256 of {splan.num_clusters} (nearest-first); distant "
              f"geometry may drop in wide-view tiles — set "
              f"CR_TPU_BACKEND=xla for the exact (slower) camera path")
    return _image_fused(
        splan.payload, splan.attr_table, scene_dev, splan.quad_table,
        splan.sphere_center, splan.sphere_radius,
        jnp.asarray(position, jnp.float32),
        jnp.asarray(local_space, jnp.float32),
        jnp.asarray(cam_param, jnp.float32),
        kind=kind, width=width, height=height, background=background,
        kmax=kmax, textured=splan.textured, tex_only=splan.tex_only,
    )
