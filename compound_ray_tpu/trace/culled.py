"""Cone-culled dense compound render (XLA path).

Per frame: every ommatidium owns a K-entry shortlist of candidate clusters
(from accel.cull); its S samples are traced ONLY against those K x leaf_size
triangles, gathered as dense blocks.  Intersection uses the Plücker
side-product formulation (trace.plucker) — three batched contractions plus a
small elementwise epilogue — because it has the smallest intermediate
footprint per (ray, triangle) pair, and the sweep is HBM-bandwidth-bound in
pure XLA.  All shapes are static; the shade + per-ommatidium mean reduction
is fused into the sample-chunk scan so no (samples x ommatidia) buffer is
ever materialised (the reference materialises one: CompoundEye.cpp:186-211).

RNG draws are the full (S, N) arrays from eye.sampling.sample_angles with the
same key as the brute-force path, so both paths produce identical samples and
differ only by cone truncation (tests/test_accel.py asserts closeness).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from compound_ray_tpu.eye.sampling import cone_offset_directions, sample_angles
from compound_ray_tpu.trace.shade import shade_rays


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


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
    """Per-ommatidium mean radiance (N,3) via the culled Plücker sweep."""
    n = ommatidia.shape[0]
    splay, spin = sample_angles(key, n, samples, ommatidia[:, 6])  # (S,N)
    return render_means_culled_angles(
        scene, clusters, ommatidia, position, local_space, splay, spin,
        cluster_ids, cluster_valid, background,
        omm_chunk=omm_chunk, sample_chunk=sample_chunk,
    )


@functools.partial(
    jax.jit,
    static_argnames=("background", "omm_chunk", "sample_chunk"),
)
def render_means_culled_angles(
    scene: Dict[str, Any],
    clusters: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    splay: jnp.ndarray,  # (S,N) pre-drawn splay angles
    spin: jnp.ndarray,  # (S,N) pre-drawn spin angles
    cluster_ids: jnp.ndarray,  # (N,K) int32
    cluster_valid: jnp.ndarray,  # (N,K) bool
    background: int,
    omm_chunk: int = 64,
    sample_chunk: int = 64,
) -> jnp.ndarray:
    """Like render_means_culled but with externally drawn angles, so callers
    can partition the ommatidium axis (K classes, shards) without changing
    the sampled noise."""
    n = ommatidia.shape[0]
    samples = splay.shape[0]
    sample_chunk = min(sample_chunk, samples)
    omm_chunk = min(omm_chunk, n)
    k = cluster_ids.shape[1]
    leaf = clusters["tri_id"].shape[1]
    kl = k * leaf

    axis = ommatidia[:, 3:6]
    focal = ommatidia[:, 7]

    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    rel_origin = ommatidia[:, 0:3] - axis_n * focal[:, None]
    origins = position[None, :] + jnp.matmul(
        rel_origin, local_space, precision=jax.lax.Precision.HIGHEST)  # (N,3)

    np_pad = _ceil_to(n, omm_chunk)
    sp_pad = _ceil_to(samples, sample_chunk)

    def pad_omm(x, fill=0.0):
        shape = (np_pad,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[:n].set(x)

    axis_p = pad_omm(axis).at[n:, 2].set(1.0)
    origins_p = pad_omm(origins)
    focal_p = pad_omm(focal)
    ids_p = pad_omm(cluster_ids)
    valid_p = pad_omm(cluster_valid, fill=False)
    splay_p = jnp.zeros((sp_pad, np_pad), splay.dtype).at[:samples, :n].set(splay)
    spin_p = jnp.zeros((sp_pad, np_pad), spin.dtype).at[:samples, :n].set(spin)
    sample_weight = (jnp.arange(sp_pad) < samples).astype(jnp.float32)

    n_ochunks = np_pad // omm_chunk
    n_schunks = sp_pad // sample_chunk

    def per_omm_chunk(args):
        (ax_c, or_c, fo_c, id_c, va_c, splay_c, spin_c) = args
        # gathered Plücker constants, invalid clusters masked to degenerate
        vm = va_c[:, :, None]  # (oc,K,1)
        w6 = clusters["edge6"][id_c]  # (oc,K,L,3,6)
        nrm = clusters["normal"][id_c]  # (oc,K,L,3)
        c0 = clusters["c0"][id_c]  # (oc,K,L)
        tid = clusters["tri_id"][id_c]  # (oc,K,L)
        w6 = jnp.where(vm[..., None, None], w6, 0.0).reshape(omm_chunk, kl * 3, 6)
        nrm = jnp.where(vm[..., None], nrm, 0.0).reshape(omm_chunk, kl, 3)
        c0 = jnp.where(vm, c0, 0.0).reshape(omm_chunk, kl)
        tid = jnp.where(vm, tid, -1).reshape(omm_chunk, kl)

        onum = jnp.einsum("ok,otk->ot", or_c, nrm,
                          precision=jax.lax.Precision.HIGHEST)  # (oc,kl)

        def per_sample_chunk(acc, sc_args):
            splay_s, spin_s, w_s = sc_args  # (sc,oc), (sc,oc), (sc,)
            rel_dir = cone_offset_directions(
                jnp.broadcast_to(ax_c[None], (sample_chunk, omm_chunk, 3)),
                splay_s, spin_s,
            )  # (sc,oc,3)
            dirs = jnp.einsum("soc,cd->osd", rel_dir, local_space,
                              precision=jax.lax.Precision.HIGHEST)  # (oc,sc,3)
            m = jnp.cross(jnp.broadcast_to(or_c[:, None, :], dirs.shape), dirs)
            r6 = jnp.concatenate([dirs, m], axis=-1)  # (oc,sc,6)

            w = jnp.einsum("osk,oTk->osT", r6, w6,
                           precision=jax.lax.Precision.HIGHEST).reshape(
                omm_chunk, sample_chunk, kl, 3
            )
            den = jnp.einsum("osk,otk->ost", dirs, nrm,
                             precision=jax.lax.Precision.HIGHEST)  # (oc,sc,kl)
            t = (c0[:, None, :] - onum[:, None, :]) / den
            wsum = jnp.sum(w, axis=-1)
            ok = (
                (jnp.all(w >= 0.0, axis=-1) | jnp.all(w <= 0.0, axis=-1))
                & (den != 0.0)
                & (wsum != 0.0)
                & (tid[:, None, :] >= 0)
                & (t >= fo_c[:, None, None])
                & (t <= 1e16)
            )
            t = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t, axis=-1)  # (oc,sc)
            oc_i = jnp.arange(omm_chunk)[:, None]
            sc_i = jnp.arange(sample_chunk)[None, :]
            tj = t[oc_i, sc_i, j]
            hit = jnp.isfinite(tj)
            wj = w[oc_i, sc_i, j]  # (oc,sc,3)
            wsj = wsum[oc_i, sc_i, j]
            wsj = jnp.where(wsj == 0.0, 1.0, wsj)
            u = jnp.where(hit, wj[..., 1] / wsj, 0.0)
            v = jnp.where(hit, wj[..., 2] / wsj, 0.0)
            tidj = jnp.where(hit, tid[oc_i, j], -1)

            flat_hit = {
                "t": tj.reshape(-1),
                "u": u.reshape(-1),
                "v": v.reshape(-1),
                "tri_id": tidj.reshape(-1),
                "hit": hit.reshape(-1),
            }
            rgb = shade_rays(scene, dirs.reshape(-1, 3), flat_hit, background)
            rgb = rgb.reshape(omm_chunk, sample_chunk, 3) * w_s[None, :, None]
            return acc + jnp.sum(rgb, axis=1), None

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
    )
    return sums.reshape(np_pad, 3)[:n] / samples
