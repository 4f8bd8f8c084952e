"""Compound projection schemas: ommatidial data -> display frame buffer.

Reimplements the eight __raygen__compound_projection_* programs of
shaders.cu:354-642 as jit-compiled image ops.  The Voronoi variants are the
same O(pixels x ommatidia) brute-force nearest-by-angle search as the
reference, expressed as a vectorised masked argmin (first-occurrence ties,
matching the sequential strictly-less scan).

Reference pixels the shader never writes (e.g. rows y>0 of
single_dimension_fast, out-of-range pixels of raw_ommatidial_samples) retain
stale buffer contents there; here they are deterministically zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.trace.shade import make_color

PROJECTIONS = (
    "raw_ommatidial_samples",
    "single_dimension",
    "single_dimension_fast",
    "spherical_positionwise",
    "spherical_orientationwise",
    "spherical_split_orientationwise",
    "spherical_positionwise_ids",
    "spherical_orientationwise_ids",
)


def _pixel_sphere_dirs(width: int, height: int) -> jnp.ndarray:
    """Per-pixel unit-sphere direction for the spherical projections
    (shaders.cu:420-428): d = 2*(x/W, y/H)-1, angles = d*(-pi, pi/2)+(pi/2, 0)."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    dx = 2.0 * xs / width - 1.0
    dy = 2.0 * ys / height - 1.0
    gx, gy = jnp.meshgrid(dx, dy)  # (H,W)
    ax = gx * (-jnp.pi) + jnp.pi / 2.0
    ay = gy * (jnp.pi / 2.0)
    cos_y = jnp.cos(ay)
    return jnp.stack(
        [jnp.cos(ax) * cos_y, jnp.sin(ay), jnp.sin(ax) * cos_y], axis=-1
    )  # (H,W,3)


def _angles_to(ref_vectors: jnp.ndarray, sphere_dirs: jnp.ndarray) -> jnp.ndarray:
    """(H,W,N) angle between each pixel dir and each ommatidial vector,
    computed as acos(dot/(|a||b|)) like the reference."""
    norm_r = jnp.linalg.norm(ref_vectors, axis=-1)  # (N,)
    norm_p = jnp.linalg.norm(sphere_dirs, axis=-1)  # (H,W)
    # HIGHEST: the TPU MXU default (one bf16 pass) gives ~4e-3 cosine error,
    # which arccos amplifies to ~5 degrees near |cos|=1 — adjacent-cell
    # Voronoi winners flip (measured 11.5/255 MAE vs CPU in high-contrast
    # bands at 1000 omms / ~6 degree spacing).  This matmul is tiny
    # (H*W*N*3 MACs), so full precision is free.
    dots = jnp.einsum("hwc,nc->hwn", sphere_dirs, ref_vectors,
                      precision=jax.lax.Precision.HIGHEST)
    cosang = dots / (norm_r[None, None, :] * norm_p[..., None])
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))


# single-chunk budget for the voronoi map's (H, W, chunk) angle tensor
# (elements, f32): 2^29 = 2 GB keeps every realistic config monolithic
_VORONOI_CHUNK_ELEMS = 1 << 29


@functools.partial(jax.jit, static_argnames=("width", "height", "split"))
def voronoi_index_map(
    ref_vectors: jnp.ndarray,  # (N,3) positions or directions
    width: int,
    height: int,
    split: bool = False,
    positions_x: jnp.ndarray | None = None,  # (N,) for the split predicate
) -> jnp.ndarray:
    """(H,W) int32 nearest-ommatidium index map.

    With `split`, pixels in the left half only consider ommatidia with
    position.x < 0 and right-half pixels only position.x > 0 — except
    ommatidium 0, which the reference's scan always starts from
    (shaders.cu:519-534)."""
    return _voronoi_index_map_impl(ref_vectors, width, height, split,
                                   positions_x, _VORONOI_CHUNK_ELEMS)


def _voronoi_index_map_impl(ref_vectors, width, height, split,
                            positions_x, chunk_elems):
    sphere = _pixel_sphere_dirs(width, height)
    n = ref_vectors.shape[0]
    # chunk the ommatidium axis: the full (H, W, N) angle tensor is
    # H*W*N*4 bytes (twice over — dots then angles), which is ~12 GB for a
    # 640x480 buffer against a 10k-ommatidium eye.  A running min over
    # index-ordered chunks bounds memory at O(H*W*chunk); strict `<`
    # across chunks preserves argmin's first-occurrence tie-breaking.
    # The 2^29-element budget (2 GB/chunk) keeps every realistic config
    # in ONE chunk — the historical monolithic path, bit-identical — and
    # chunks only where the old code would have OOMed.  (Chunked results
    # can flip razor-thin Voronoi-boundary ties by an XLA tiling ulp:
    # measured 1 px per 262k at equal angle to 6 decimals.)
    chunk = max(1, min(n, chunk_elems // max(1, width * height)))
    if split:
        xs = jnp.arange(width, dtype=jnp.float32) / width  # uv.x per column
        left = (xs < 0.5)[None, :, None]  # (1,W,1)
    best_ang = jnp.full((height, width), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((height, width), jnp.int32)
    for c0 in range(0, n, chunk):
        sub = ref_vectors[c0:c0 + chunk]
        ang = _angles_to(sub, sphere)  # (H,W,chunk)
        if split:
            px = positions_x[c0:c0 + chunk][None, None, :]  # (1,1,chunk)
            eligible = ((px > 0) & ~left) | ((px < 0) & left)
            # ommatidium 0 is globally always eligible (the reference's
            # scan starts from it, shaders.cu:519-534)
            always0 = (jnp.arange(sub.shape[0]) + c0) == 0
            eligible = eligible | always0[None, None, :]
            ang = jnp.where(eligible, ang, jnp.inf)
        idx = jnp.argmin(ang, axis=-1).astype(jnp.int32)
        amin = jnp.min(ang, axis=-1)
        upd = amin < best_ang
        best_idx = jnp.where(upd, idx + c0, best_idx)
        best_ang = jnp.where(upd, amin, best_ang)
    return best_idx


def _encode_ids(idx_map: jnp.ndarray) -> jnp.ndarray:
    """Base-256 RGBA encoding of ommatidium ids (shaders.cu:585-594)."""
    i = idx_map.astype(jnp.uint32)
    r = (i >> 24).astype(jnp.uint8)
    g = ((i >> 16) & 0xFF).astype(jnp.uint8)
    b = ((i >> 8) & 0xFF).astype(jnp.uint8)
    a = (i & 0xFF).astype(jnp.uint8)
    return jnp.stack([r, g, b, a], axis=-1)


def decode_projection_map_id(rgba) -> int:
    """Inverse of _encode_ids (eyeRendererHelperFunctions.py:153-160)."""
    r, g, b, a = (int(x) for x in rgba)
    return (r << 24) | (g << 16) | (b << 8) | a


@functools.partial(jax.jit, static_argnames=("projection", "width", "height"))
def project_frame(
    projection: str,
    omm_means: jnp.ndarray,  # (N,3) per-ommatidium mean radiance
    omm_samples: jnp.ndarray,  # (S,N,3) raw per-sample radiance (raw projection)
    positions: jnp.ndarray,  # (N,3) relative ommatidial positions
    directions: jnp.ndarray,  # (N,3) relative ommatidial directions
    width: int,
    height: int,
) -> jnp.ndarray:
    """Produce the (H, W, 4) uint8 display buffer for a compound projection."""
    n = omm_means.shape[0]
    if projection == "raw_ommatidial_samples":
        s = omm_samples.shape[0]
        frame = jnp.zeros((height, width, 4), jnp.uint8)
        h_copy = min(height, s)
        w_copy = min(width, n)
        block = make_color(omm_samples[:h_copy, :w_copy])
        return frame.at[:h_copy, :w_copy].set(block)

    if projection == "single_dimension":
        xs = jnp.arange(width)
        idx = (xs * n) // width
        row = make_color(omm_means[idx])  # (W,4)
        return jnp.broadcast_to(row[None, :, :], (height, width, 4))

    if projection == "single_dimension_fast":
        frame = jnp.zeros((height, width, 4), jnp.uint8)
        w_copy = min(width, n)
        return frame.at[0, :w_copy].set(make_color(omm_means[:w_copy]))

    if projection in ("spherical_positionwise", "spherical_positionwise_ids"):
        idx_map = voronoi_index_map(positions, width, height)
    elif projection in ("spherical_orientationwise", "spherical_orientationwise_ids"):
        idx_map = voronoi_index_map(directions, width, height)
    elif projection == "spherical_split_orientationwise":
        idx_map = voronoi_index_map(
            directions, width, height, split=True, positions_x=positions[:, 0]
        )
    else:
        raise ValueError(f"unknown projection {projection!r}")

    if projection.endswith("_ids"):
        return _encode_ids(idx_map)
    return make_color(omm_means[idx_map])
