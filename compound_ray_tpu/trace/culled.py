"""Cone-culled dense compound render (XLA path).

Per frame: every ommatidium owns a K-entry shortlist of candidate clusters
(from accel.cull); its S samples are traced ONLY against those K x leaf_size
triangles, gathered as dense blocks.  All shapes are static — XLA sees a
regular (omm_chunk x sample_chunk x K*L) intersection sweep with a fused
shade + accumulate, so per-ommatidium work drops from num_triangles to
K*leaf_size while remaining fully vectorised.

RNG draws are the full (S, N) arrays from eye.sampling.sample_angles with the
same key as the brute-force path, so both paths produce identical samples and
differ only by cone truncation (tests/test_accel.py asserts closeness).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from compound_ray_tpu.eye.sampling import cone_offset_directions, sample_angles
from compound_ray_tpu.trace.intersect import moller_trumbore
from compound_ray_tpu.trace.shade import shade_rays


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("samples", "background", "omm_chunk", "sample_chunk"),
)
def render_means_culled(
    scene: Dict[str, Any],
    clusters: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    cluster_ids: jnp.ndarray,  # (N,K) int32
    cluster_valid: jnp.ndarray,  # (N,K) bool
    samples: int,
    background: int,
    omm_chunk: int = 64,
    sample_chunk: int = 64,
) -> jnp.ndarray:
    """Per-ommatidium mean radiance (N,3) via the culled dense sweep."""
    n = ommatidia.shape[0]
    k = cluster_ids.shape[1]
    leaf = clusters["v0"].shape[1]

    axis = ommatidia[:, 3:6]
    acceptance = ommatidia[:, 6]
    focal = ommatidia[:, 7]
    splay, spin = sample_angles(key, n, samples, acceptance)  # (S,N)

    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    rel_origin = ommatidia[:, 0:3] - axis_n * focal[:, None]
    origins = position[None, :] + rel_origin @ local_space  # (N,3)

    # pad ommatidium axis
    np_pad = _ceil_to(n, omm_chunk)
    sp_pad = _ceil_to(samples, sample_chunk)

    def pad_omm(x, fill=0.0):
        shape = (np_pad,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[:n].set(x)

    axis_p = pad_omm(axis).at[n:, 2].set(1.0)  # harmless unit-ish axis
    origins_p = pad_omm(origins)
    focal_p = pad_omm(focal)
    ids_p = pad_omm(cluster_ids)
    valid_p = pad_omm(cluster_valid, fill=False)
    splay_p = jnp.zeros((sp_pad, np_pad), splay.dtype).at[:samples, :n].set(splay)
    spin_p = jnp.zeros((sp_pad, np_pad), spin.dtype).at[:samples, :n].set(spin)
    sample_weight = (jnp.arange(sp_pad) < samples).astype(jnp.float32)  # (Sp,)

    n_ochunks = np_pad // omm_chunk
    n_schunks = sp_pad // sample_chunk

    def per_omm_chunk(args):
        (ax_c, or_c, fo_c, id_c, va_c, splay_c, spin_c) = args
        # gather this chunk's triangles: (oc, K, L, 3) -> (oc, K*L, 3)
        tv0 = clusters["v0"][id_c]  # (oc,K,L,3)
        te1 = clusters["e1"][id_c]
        te2 = clusters["e2"][id_c]
        ttid = clusters["tri_id"][id_c]  # (oc,K,L)
        vmask = va_c[:, :, None]  # (oc,K,1)
        tv0 = jnp.where(vmask[..., None], tv0, 0.0).reshape(omm_chunk, k * leaf, 3)
        te1 = jnp.where(vmask[..., None], te1, 0.0).reshape(omm_chunk, k * leaf, 3)
        te2 = jnp.where(vmask[..., None], te2, 0.0).reshape(omm_chunk, k * leaf, 3)
        ttid = jnp.where(vmask, ttid, -1).reshape(omm_chunk, k * leaf)

        def per_sample_chunk(acc, sc_args):
            splay_s, spin_s, w_s = sc_args  # (sc, oc), (sc, oc), (sc,)
            rel_dir = cone_offset_directions(
                jnp.broadcast_to(ax_c[None], (sample_chunk, omm_chunk, 3)),
                splay_s,
                spin_s,
            )  # (sc,oc,3)
            dirs = jnp.einsum("soc,cd->sod", rel_dir, local_space)  # (sc,oc,3)

            def trace_one(o_vec, d_mat, t_lo, v0s, e1s, e2s, tids):
                # o_vec (3,), d_mat (sc,3), triangles (KL,3)
                t, u, v, ok = moller_trumbore(
                    jnp.broadcast_to(o_vec, d_mat.shape), d_mat, v0s, e1s, e2s
                )
                ok &= (t >= t_lo) & (tids[None, :] >= 0)
                t = jnp.where(ok, t, jnp.inf)
                j = jnp.argmin(t, axis=1)
                rows = jnp.arange(t.shape[0])
                tj = t[rows, j]
                hit = jnp.isfinite(tj)
                return (
                    tj,
                    u[rows, j],
                    v[rows, j],
                    jnp.where(hit, tids[j], -1),
                    hit,
                )

            t, u, v, tid, hit = jax.vmap(
                trace_one, in_axes=(0, 1, 0, 0, 0, 0, 0), out_axes=1
            )(or_c, dirs, fo_c, tv0, te1, te2, ttid)
            # -> each (sc, oc)

            flat_hit = {
                "t": t.reshape(-1),
                "u": u.reshape(-1),
                "v": v.reshape(-1),
                "tri_id": tid.reshape(-1),
                "hit": hit.reshape(-1),
            }
            rgb = shade_rays(scene, dirs.reshape(-1, 3), flat_hit, background)
            rgb = rgb.reshape(sample_chunk, omm_chunk, 3) * w_s[:, None, None]
            return acc + jnp.sum(rgb, axis=0), None

        init = jnp.zeros((omm_chunk, 3), jnp.float32)
        total, _ = jax.lax.scan(
            per_sample_chunk,
            init,
            (
                splay_c.reshape(n_schunks, sample_chunk, omm_chunk),
                spin_c.reshape(n_schunks, sample_chunk, omm_chunk),
                sample_weight.reshape(n_schunks, sample_chunk),
            ),
        )
        return total

    sums = jax.lax.map(
        per_omm_chunk,
        (
            axis_p.reshape(n_ochunks, omm_chunk, 3),
            origins_p.reshape(n_ochunks, omm_chunk, 3),
            focal_p.reshape(n_ochunks, omm_chunk),
            ids_p.reshape(n_ochunks, omm_chunk, k),
            valid_p.reshape(n_ochunks, omm_chunk, k),
            jnp.moveaxis(splay_p.reshape(sp_pad, n_ochunks, omm_chunk), 1, 0),
            jnp.moveaxis(spin_p.reshape(sp_pad, n_ochunks, omm_chunk), 1, 0),
        ),
    )  # (n_ochunks, omm_chunk, 3)
    return sums.reshape(np_pad, 3)[:n] / samples
