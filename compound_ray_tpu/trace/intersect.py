"""Ray-triangle intersection over the flat triangle soup (XLA path).

The TPU-native analogue of the reference's optixTrace + GAS traversal
(libEyeRenderer3/shaders.cu:110-139): a tiled, branch-free Möller-Trumbore
sweep.  Rays are processed in static-shape chunks; triangles stream through a
`lax.scan` with a running closest-hit reduction, so peak memory is
O(ray_chunk x tri_chunk) regardless of scene size.  Both-sided intersection
(OptiX default with OPTIX_RAY_FLAG_NONE).

This module is the correctness oracle and the fallback path; the accelerated
path (cluster culling + Pallas kernel) lives in compound_ray_tpu.accel /
compound_ray_tpu.trace.pallas_tracer and must agree with it bit-for-bit on
hit ids (tests/test_accel.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# Degenerate-determinant cutoff: rays parallel to a triangle's plane miss it.
_DET_EPS = 0.0


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def moller_trumbore(
    o: jnp.ndarray,  # (R,3)
    d: jnp.ndarray,  # (R,3)
    v0: jnp.ndarray,  # (T,3)
    e1: jnp.ndarray,  # (T,3)
    e2: jnp.ndarray,  # (T,3)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-pairs Möller-Trumbore: returns (t, u, v, valid) each (R, T).

    `t` is expressed in units of |d| (directions are deliberately NOT
    normalised; the reference traces unnormalised directions and tmin/tmax
    share those units)."""
    # pvec = d x e2  -> (R,T,3)
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])
    _hi = jax.lax.Precision.HIGHEST
    det = jnp.einsum("tc,rtc->rt", e1, pvec, precision=_hi)
    inv_det = jnp.where(det == _DET_EPS, 0.0, 1.0 / det)
    tvec = o[:, None, :] - v0[None, :, :]  # (R,T,3)
    u = jnp.einsum("rtc,rtc->rt", tvec, pvec, precision=_hi) * inv_det
    qvec = jnp.cross(tvec, jnp.broadcast_to(e1[None, :, :], tvec.shape))
    v = jnp.einsum("rc,rtc->rt", d, qvec, precision=_hi) * inv_det
    t = jnp.einsum("tc,rtc->rt", e2, qvec, precision=_hi) * inv_det
    valid = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return t, u, v, valid


@functools.partial(jax.jit, static_argnames=("ray_chunk", "tri_chunk"))
def intersect_rays(
    origins: jnp.ndarray,  # (R,3) float32
    dirs: jnp.ndarray,  # (R,3) float32 (unnormalised ok)
    v0: jnp.ndarray,  # (T,3)
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    tmin,  # scalar or (R,)
    tmax,  # scalar or (R,)
    ray_chunk: int = 512,
    tri_chunk: int = 2048,
) -> Dict[str, jnp.ndarray]:
    """Closest-hit over the whole soup.

    Returns dict with (R,) arrays: t, u, v (barycentrics of the winning
    triangle), tri_id (int32, -1 on miss), hit (bool).
    """
    R = origins.shape[0]
    T = v0.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,))
    if T == 0:
        return {
            "t": jnp.full((R,), jnp.inf, jnp.float32),
            "u": jnp.zeros((R,), jnp.float32),
            "v": jnp.zeros((R,), jnp.float32),
            "tri_id": jnp.full((R,), -1, jnp.int32),
            "hit": jnp.zeros((R,), bool),
        }

    Rp = _ceil_to(R, ray_chunk)
    Tp = _ceil_to(T, tri_chunk)
    o_p = jnp.zeros((Rp, 3), jnp.float32).at[:R].set(origins)
    d_p = jnp.zeros((Rp, 3), jnp.float32).at[:R].set(dirs)
    tmin_p = jnp.zeros((Rp,), jnp.float32).at[:R].set(tmin)
    tmax_p = jnp.zeros((Rp,), jnp.float32).at[:R].set(tmax)
    # pad triangles with degenerate (zero-extent) triangles -> det==0 -> miss
    v0_p = jnp.zeros((Tp, 3), jnp.float32).at[:T].set(v0)
    e1_p = jnp.zeros((Tp, 3), jnp.float32).at[:T].set(e1)
    e2_p = jnp.zeros((Tp, 3), jnp.float32).at[:T].set(e2)

    n_tchunks = Tp // tri_chunk
    tri_stack = (
        v0_p.reshape(n_tchunks, tri_chunk, 3),
        e1_p.reshape(n_tchunks, tri_chunk, 3),
        e2_p.reshape(n_tchunks, tri_chunk, 3),
        jnp.arange(Tp, dtype=jnp.int32).reshape(n_tchunks, tri_chunk),
    )

    def process_ray_chunk(args):
        o_c, d_c, tmin_c, tmax_c = args  # (C,3) ...

        def scan_tris(carry, tris):
            best_t, best_u, best_v, best_id = carry
            cv0, ce1, ce2, cid = tris
            t, u, v, ok = moller_trumbore(o_c, d_c, cv0, ce1, ce2)
            ok &= (t >= tmin_c[:, None]) & (t <= tmax_c[:, None])
            t = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t, axis=1)
            rows = jnp.arange(t.shape[0])
            cand_t = t[rows, j]
            better = cand_t < best_t
            best_t = jnp.where(better, cand_t, best_t)
            best_u = jnp.where(better, u[rows, j], best_u)
            best_v = jnp.where(better, v[rows, j], best_v)
            best_id = jnp.where(better, cid[j], best_id)
            return (best_t, best_u, best_v, best_id), None

        C = o_c.shape[0]
        init = (
            jnp.full((C,), jnp.inf, jnp.float32),
            jnp.zeros((C,), jnp.float32),
            jnp.zeros((C,), jnp.float32),
            jnp.full((C,), -1, jnp.int32),
        )
        (bt, bu, bv, bid), _ = jax.lax.scan(scan_tris, init, tri_stack)
        return bt, bu, bv, bid

    n_rchunks = Rp // ray_chunk
    o_r = o_p.reshape(n_rchunks, ray_chunk, 3)
    d_r = d_p.reshape(n_rchunks, ray_chunk, 3)
    tmin_r = tmin_p.reshape(n_rchunks, ray_chunk)
    tmax_r = tmax_p.reshape(n_rchunks, ray_chunk)
    bt, bu, bv, bid = jax.lax.map(process_ray_chunk, (o_r, d_r, tmin_r, tmax_r))

    bt = bt.reshape(Rp)[:R]
    bu = bu.reshape(Rp)[:R]
    bv = bv.reshape(Rp)[:R]
    bid = bid.reshape(Rp)[:R]
    return {
        "t": bt,
        "u": bu,
        "v": bv,
        "tri_id": bid,
        "hit": bid >= 0,
    }


def occlusion_test(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    v0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    tmin,
    tmax,
) -> jnp.ndarray:
    """Any-hit test (shadow rays; shaders.cu traceOcclusion). Returns (R,) bool."""
    res = intersect_rays(origins, dirs, v0, e1, e2, tmin, tmax)
    return res["hit"]
