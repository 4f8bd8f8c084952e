"""MXU-formulated ray-triangle intersection (Plücker side products).

The TPU's FLOPs live in the 128x128 systolic array, not the vector unit —
so the hot intersection sweep is recast as matrix multiplies:

  * a ray is the 6-vector  [d, o x d]  (direction + Plücker moment)
  * each triangle edge a->b is the 6-vector  [a x b, b - a]
  * side(ray, edge) = d.(a x b) + (o x d).(b - a)  — a plain dot product

so the three edge tests for R rays against T triangles are ONE (R,6)@(6,3T)
contraction, and the plane term needs two more (R,3)@(3,T) products:

  t = (v0.n - o.n) / (d.n),   n = e1 x e2

A ray hits iff all three side products share a sign (both-sided, OptiX
default) and t is inside [tmin, tmax].  Barycentrics come free:
u = w1/(w0+w1+w2), v = w2/(w0+w1+w2) with wi the side product of the edge
opposite vertex i — identical to the Möller-Trumbore (u, v) of intersect.py
(verified in tests/test_plucker.py).

Numerical note: Plücker moments grow with |o|, so callers should keep the
scene near the origin (f32 is ample at reference-scene scale ~1e2 units).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def triangle_constants(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Precompute per-triangle matmul operands (host or device, once).

    Returns dict:
      edge6:  (T, 3, 6)  the three edge 6-vectors [a x b, b - a]
              (edges: p1->p2 [opposite v0], p2->p0 [opp v1 -> u],
               p0->p1 [opp v2 -> v])
      normal: (T, 3)     n = e1 x e2
      c0:     (T,)       v0 . n
    Degenerate (all-zero) padding triangles yield n = 0 -> den = 0 -> miss.
    """
    xp = jnp if isinstance(v0, jnp.ndarray) else np
    p0 = v0
    p1 = v0 + e1
    p2 = v0 + e2

    def edge(a, b):
        return xp.concatenate([xp.cross(a, b), b - a], axis=-1)  # (T,6)

    edge6 = xp.stack([edge(p1, p2), edge(p2, p0), edge(p0, p1)], axis=1)
    normal = xp.cross(e1, e2)
    c0 = xp.sum(v0 * normal, axis=-1)
    return {"edge6": edge6, "normal": normal, "c0": c0}


def ray6(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """(R,6) Plücker ray vectors [d, o x d]."""
    return jnp.concatenate([d, jnp.cross(o, d)], axis=-1)


def plucker_closest_hit(
    o: jnp.ndarray,  # (R,3)
    d: jnp.ndarray,  # (R,3)
    tri: Dict[str, jnp.ndarray],  # triangle_constants output, T triangles
    tri_id: jnp.ndarray,  # (T,) original ids, -1 padding
    tmin,  # (R,) or scalar
    tmax=1e16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit of R rays against T triangles via three matmuls.

    Returns (t, u, v, id, hit) each (R,)."""
    T = tri["normal"].shape[0]
    r6 = ray6(o, d)  # (R,6)
    w = jnp.einsum(
        "rk,tek->rte", r6, tri["edge6"], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (R,T,3)
    den = jnp.einsum(
        "rk,tk->rt", d, tri["normal"], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )
    onum = jnp.einsum(
        "rk,tk->rt", o, tri["normal"], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )
    t = (tri["c0"][None, :] - onum) / den  # inf/nan where den == 0

    all_pos = jnp.all(w >= 0.0, axis=-1)
    all_neg = jnp.all(w <= 0.0, axis=-1)
    wsum = jnp.sum(w, axis=-1)
    ok = (
        (all_pos | all_neg)
        & (den != 0.0)
        & (wsum != 0.0)
        & (tri_id[None, :] >= 0)
    )
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), t.shape[:1])
    ok &= (t >= tmin[:, None]) & (t <= tmax)

    t = jnp.where(ok, t, jnp.inf)
    j = jnp.argmin(t, axis=1)
    rows = jnp.arange(t.shape[0])
    tj = t[rows, j]
    hit = jnp.isfinite(tj)
    wj = w[rows, j]  # (R,3)
    wsum_j = wsum[rows, j]
    u = wj[:, 1] / wsum_j
    v = wj[:, 2] / wsum_j
    return (
        tj,
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
        jnp.where(hit, tri_id[j], -1),
        hit,
    )
