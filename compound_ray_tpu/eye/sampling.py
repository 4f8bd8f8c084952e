"""Ommatidial cone sampling with a counter-based PRNG.

TPU-native replacement for the per-thread curand XORWOW state of the
reference (shaders.cu:666-736, CompoundEye.cpp:144-170): instead of

(omm x sample) mutable RNG states seeded lazily on the first frame, samples
are drawn from threefry keyed on (base_seed, frame) — stateless, no warm-up
render, statistically equivalent (verified by the variance-vs-samples tests,
tests/test_statistics.py).

Sampling semantics preserved exactly (shaders.cu:684-736):
  * splay angle   ~ Normal(0, acceptance_angle / FWHM_SD_RATIO)
  * spin angle    ~ Uniform(0, pi)  (half-turn: splay may be negative)
  * direction     = rotate(rotate(axis, splay, perp), spin, axis)
    with perp = normalize(cross(+y, axis)), or +z when that cross is the
    degenerate all-zero vector (the reference tests x+y+z == 0)
  * origin        = position - normalize(axis) * focal_point_offset
  * world         = eye position + localSpace . relative
  * tmin          = focal_point_offset  (lens surface), tmax = 1e16
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# FWHM of a Gaussian = 2*sqrt(2 ln 2) * sigma (shaders.cu:53)
FWHM_SD_RATIO = 2.35482004503094938202313865291


def rodrigues(point: jnp.ndarray, angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle rotation WITHOUT axis normalisation, matching the device
    rotatePoint (shaders.cu:650-652). Shapes broadcast; angle is (...,)."""
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    return (
        c * point
        + s * jnp.cross(axis, point)
        + (1.0 - c) * jnp.sum(axis * point, axis=-1, keepdims=True) * axis
    )


def cone_offset_directions(
    axes: jnp.ndarray,  # (..., 3) ommatidial axis (relative direction)
    splay: jnp.ndarray,  # (...,) angle away from the axis
    spin: jnp.ndarray,  # (...,) angle around the axis
) -> jnp.ndarray:
    """generateOffsetRay (shaders.cu:653-664), vectorised."""
    up = jnp.array([0.0, 1.0, 0.0])
    perp = jnp.cross(jnp.broadcast_to(up, axes.shape), axes)
    degenerate = jnp.sum(perp, axis=-1, keepdims=True) == 0.0
    norm = jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), 1e-30)
    perp = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0]), perp / norm)
    splayed = rodrigues(axes, splay, perp)
    return rodrigues(splayed, spin, axes)


def sample_angles(
    key: jax.Array,
    n_omms: int,
    samples: int,
    acceptance_angles: jnp.ndarray,  # (N,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (S, N) splay and spin angles."""
    k_splay, k_spin = jax.random.split(key)
    sd = acceptance_angles / FWHM_SD_RATIO  # (N,)
    splay = jax.random.normal(k_splay, (samples, n_omms)) * sd[None, :]
    spin = jax.random.uniform(k_spin, (samples, n_omms)) * jnp.pi
    return splay, spin


def sample_angles_ns(
    key: jax.Array,
    sd: jnp.ndarray,  # (N,) acceptance / FWHM_SD_RATIO, precomputed
    samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, S)-layout cone-jitter draw — the frame pipeline's native layout
    (drawing (S, N) and transposing cost a measurable fraction of the
    frame on three 38 MB tensors).  `sd` comes in precomputed so scan/vmap
    frame bodies don't rebuild it per frame.

    Every production draw site (single frame, shadow probe, scanned and
    stacked multi-frame) and the sharded path's global draw delegate here:
    the sharded-vs-dense and stacked-vs-sequential bit-identity tests rely
    on there being exactly ONE (N, S) draw implementation."""
    k_splay, k_spin = jax.random.split(key)
    n = sd.shape[0]
    splay = jax.random.normal(k_splay, (n, samples)) * sd[:, None]
    spin = jax.random.uniform(k_spin, (n, samples)) * jnp.pi
    return splay, spin


def rodrigues_c(px, py, pz, angle, ax, ay, az):
    """Component-planar axis-angle rotation (same math as `rodrigues`).

    TPU layout note: the AoS form keeps xyz on the minor (lane) dim, so every
    cross/dot lowers to cross-lane shuffles at 1/128 lane utilisation — the
    planar form is pure elementwise at full lanes.  All operands broadcast.
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    cx = ay * pz - az * py
    cy = az * px - ax * pz
    cz = ax * py - ay * px
    d = (1.0 - c) * (ax * px + ay * py + az * pz)
    return (c * px + s * cx + d * ax,
            c * py + s * cy + d * ay,
            c * pz + s * cz + d * az)


def cone_offset_components(ax, ay, az, splay, spin):
    """generateOffsetRay (shaders.cu:653-664) in component-planar form.

    (ax, ay, az) are the ommatidial axis components (broadcastable against
    the (N, S) splay/spin planes).  Returns unit-unnormalised direction
    components like cone_offset_directions."""
    # perp = cross(+y, axis) = (az, 0, -ax); reference degeneracy test is
    # sum(perp) == 0 (shaders.cu:657), i.e. az - ax == 0 AND ... preserved
    # exactly: perp components sum = az - ax with py ≡ 0
    px, py, pz = az, jnp.zeros_like(az), -ax
    degenerate = (px + py + pz) == 0.0
    norm = jnp.maximum(jnp.sqrt(px * px + py * py + pz * pz), 1e-30)
    px = jnp.where(degenerate, 0.0, px / norm)
    py = jnp.where(degenerate, 0.0, py / norm)
    pz = jnp.where(degenerate, 1.0, pz / norm)
    sx, sy, sz = rodrigues_c(ax, ay, az, splay, px, py, pz)
    return rodrigues_c(sx, sy, sz, spin, ax, ay, az)


def ommatidial_rays(
    ommatidia: jnp.ndarray,  # (N, 8) [pos(3), dir(3), acceptance, focal_offset]
    position: jnp.ndarray,  # (3,) eye world position
    local_space: jnp.ndarray,  # (3,3) rows = x/y/z axes
    samples: int,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate the full (S*N) world-space ray set for one frame.

    Returns (origins (S*N,3), dirs (S*N,3), tmin (S*N,)) laid out so ray
    s*N + o is sample s of ommatidium o — the reference's compound-buffer
    layout (summing_kernel.cu:92)."""
    n = ommatidia.shape[0]
    rel_pos = ommatidia[:, 0:3]
    axis = ommatidia[:, 3:6]
    acceptance = ommatidia[:, 6]
    focal = ommatidia[:, 7]

    splay, spin = sample_angles(key, n, samples, acceptance)  # (S,N)
    rel_dir = cone_offset_directions(
        jnp.broadcast_to(axis[None, :, :], (samples, n, 3)), splay, spin
    )  # (S,N,3)

    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    rel_origin = rel_pos - axis_n * focal[:, None]  # (N,3)

    # world transform: v_world = v.x * X + v.y * Y + v.z * Z = v @ local_space
    _hi = jax.lax.Precision.HIGHEST
    origins = position[None, :] + jnp.matmul(
        rel_origin, local_space, precision=_hi)  # (N,3)
    origins = jnp.broadcast_to(origins[None, :, :], (samples, n, 3)).reshape(-1, 3)
    dirs = jnp.matmul(rel_dir.reshape(-1, 3), local_space, precision=_hi)
    tmin = jnp.broadcast_to(focal[None, :], (samples, n)).reshape(-1)
    return origins, dirs, tmin
