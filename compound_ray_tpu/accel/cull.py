"""Per-ommatidium acceptance-cone vs cluster culling (XLA).

Each ommatidium's Gaussian splay (sigma = acceptance/FWHM_SD_RATIO,
shaders.cu:693-696) is truncated at `cull_sigmas` standard deviations to get
a hard cone half-angle.  Production runs config.py's default of 4.0 sigma
(mass outside ~6.3e-5, comfortably below the <1% fidelity budget,
BASELINE.md); CR_TPU_CULL_SIGMAS widens it.  The cone-vs-cluster test is a
conservative apex/axis/half-angle vs bounding-sphere comparison: intersect if

    angle(axis, c - apex) <= half_angle + angular_radius(sphere)

or the apex lies inside the sphere.  One cull per ommatidium per frame is
amortised over all of its samples — the structural replacement for the
reference's per-ray BVH descent.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from compound_ray_tpu.eye.sampling import FWHM_SD_RATIO


def eye_world_geometry(
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,  # (3,)
    local_space: jnp.ndarray,  # (3,3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space cone apex (retracted ray origin) and unit axis per omm."""
    rel_pos = ommatidia[:, 0:3]
    axis = ommatidia[:, 3:6]
    focal = ommatidia[:, 7]
    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    rel_origin = rel_pos - axis_n * focal[:, None]
    _hi = jax.lax.Precision.HIGHEST
    apex = position[None, :] + jnp.matmul(rel_origin, local_space, precision=_hi)
    world_axis = jnp.matmul(axis_n, local_space, precision=_hi)
    world_axis = world_axis / jnp.maximum(
        jnp.linalg.norm(world_axis, axis=-1, keepdims=True), 1e-30
    )
    return apex, world_axis


@functools.partial(jax.jit, static_argnames=("cull_sigmas",))
def cone_cull_clusters(
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    sphere_center: jnp.ndarray,  # (C,3)
    sphere_radius: jnp.ndarray,  # (C,)
    cull_sigmas: float = 4.0,  # matches RenderConfig.cull_sigmas
) -> Dict[str, jnp.ndarray]:
    """Returns {'mask': (N,C) bool, 'count': (N,) int32}.

    `count` is UNclamped: callers that shortlist into k slots must clamp
    (or size k >= count.max()) — shortlist_from_mask silently drops
    clusters past k and marks all k slots valid, so an oversized count is
    otherwise indistinguishable from an exact fit."""
    apex, axis = eye_world_geometry(ommatidia, position, local_space)
    half_angle = jnp.minimum(
        ommatidia[:, 6] / FWHM_SD_RATIO * cull_sigmas, jnp.pi
    )  # (N,)

    to_c = sphere_center[None, :, :] - apex[:, None, :]  # (N,C,3)
    dist = jnp.linalg.norm(to_c, axis=-1)  # (N,C)
    inside = dist <= sphere_radius[None, :]
    cos_a = jnp.einsum("ncd,nd->nc", to_c, axis,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-30)
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    beta = jnp.arcsin(jnp.clip(sphere_radius[None, :] / jnp.maximum(dist, 1e-30), 0.0, 1.0))
    mask = inside | (alpha <= half_angle[:, None] + beta)
    return {"mask": mask, "count": jnp.sum(mask, axis=-1).astype(jnp.int32)}


@functools.partial(jax.jit, static_argnames=("k",))
def shortlist_from_mask(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact an (N,C) hit mask to (N,k) cluster ids + validity mask.

    Stable argsort keeps surviving cluster ids in ascending order (memory-
    friendly fetch order downstream)."""
    order = jnp.argsort(~mask, axis=-1, stable=True)  # hits first
    ids = order[:, :k].astype(jnp.int32)
    counts = jnp.sum(mask, axis=-1)
    valid = jnp.arange(k)[None, :] < counts[:, None]
    return ids, valid
