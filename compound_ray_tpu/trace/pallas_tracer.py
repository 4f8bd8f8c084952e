"""Fused Pallas compound-ray kernel (TPU).

The hot path of the framework: per ommatidium-group, trace all cone samples
against the group's culled cluster shortlist entirely in VMEM.

Layout (chosen for the VPU's (8, 128) registers):
  * rays are rows: each (RS, 128) op tests RS rays (sublanes, component-
    broadcast from the ray block) against 128 triangles (lanes, component
    rows of the cluster payload).  One cluster = one (RS, 128) candidate
    sweep per RS rays.
  * triangle payload: (C, 16, 128) — component-major, 128 triangles per
    cluster (accel leaf size for the kernel), so "component c of every
    triangle in the cluster" is a single (1, 128) VMEM row read.
  * per-group cluster shortlists are ragged: counts come in via scalar
    prefetch, cluster ids + conservative min-distances are DMA'd to SMEM,
    payloads are DMA'd to a VMEM scratch resident across the group's ray
    blocks (re-loaded only when the grid moves to a new group); groups with
    empty shortlists skip all work (the epilogue masks them by count).
  * clusters arrive sorted front-to-back; an optional early-exit variant
    (scratch-resident winner state + while_loop) stops once every ray in a
    batch has a hit closer than the next cluster's bound — measured useful
    for wide shortlists (cache tiles, camera images), while short per-
    ommatidium shortlists run cheaper on the plain fori variant.

Intersection is the Plücker side-product form (trace.plucker) minimised for
the VPU: the identity  w0 + w1 + w2 = d·n  (the three edge products of a
triangle sum to the direction-normal determinant) removes the w0 dot product
entirely — the inside test becomes  u >= 0 & v >= 0 & u + v <= 1  with
u = w1/den, v = w2/den, and t = (v0·n − o·n)/den.  Degenerate/padding
triangles (all-zero rows) yield den = 0 → u, v, t = ±inf/NaN → every
comparison fails, so no explicit validity row is needed.

Attribute interpolation is DEFERRED: the kernel carries only the winning
(t, u, v, global cluster id) per ray and emits the winner's id + lane; the
XLA epilogue resolves colours/uvs/texture for the single winning triangle
per ray with one row gather (see eye/pipeline.resolve_kernel_hits).  This
replaces the round-1 kernel that interpolated 8 attribute channels for
every candidate cluster (measured ~56 vector ops per cluster step; this
form is ~37) and shrinks the payload DMA 44 → 16 rows per cluster.

Triangle payload rows (16 components):
   0- 5  edge Plücker 6-vector of the edge opposite v1  (w1 → u)
   6-11  edge Plücker 6-vector of the edge opposite v2  (w2 → v)
  12-14  n = e1 x e2   (den = d·n; o·n for the plane term)
  15     c0 = v0 · n   (t = (c0 − o·n)/den)

Reference semantics reproduced: closest-hit over the acceptance-cone sample
set of __raygen__ommatidium (shaders.cu:666-736) with both-sided triangle
intersection (OptiX default) and t measured in world units (tmin equals the
focal-point offset, shaders.cu:725).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_LEAF = 128  # triangles per cluster in the kernel payload
PAYLOAD_COMPS = 16  # w1 edge6, w2 edge6, normal, c0
RAY_COMPS = 16  # dx dy dz mx my mz ox oy oz tmin pad[6]
OUT_COMPS = 8  # t u v slot lane pad[3]


def build_kernel_payload(cluster_set) -> np.ndarray:
    """(C, 16, 128) float32 intersection payload from a ClusterSet with leaf
    KERNEL_LEAF.  Geometry only — attributes live in the epilogue's table
    (build_attr_table)."""
    from compound_ray_tpu.trace.plucker import triangle_constants

    c, l = cluster_set.tri_id.shape
    assert l == KERNEL_LEAF
    tri = triangle_constants(cluster_set.v0, cluster_set.e1, cluster_set.e2)
    edge6 = np.asarray(tri["edge6"], np.float32)  # (C*L, 3, 6)
    normal = np.asarray(tri["normal"], np.float32)  # (C*L, 3)
    c0 = np.asarray(tri["c0"], np.float32)[:, None]  # (C*L, 1)

    payload = np.concatenate([edge6[:, 1], edge6[:, 2], normal, c0], axis=1)
    assert payload.shape[1] == PAYLOAD_COMPS
    return np.ascontiguousarray(
        payload.reshape(c, l, PAYLOAD_COMPS).transpose(0, 2, 1)
    )  # (C, 16, 128)


ATTR_COMPS = 24  # uv0 uv1 uv2 (6), texid, lin, rgb0 rgb1 rgb2 (9), pad
ATTR_COMPS_TEX = 8  # uv0 uv1 uv2 (6), texid, pad
ATTR_COMPS_FLAT = 10  # uv0 uv1 uv2 (6), texid, rgb (3)


def build_attr_table(scene: Dict[str, Any], cluster_set,
                     tex_only: bool) -> np.ndarray:
    """(C*128, A) float32 winner-attribute rows, indexed by
    cluster_id * 128 + lane.  Three widths, chosen by scene content and
    told apart by shape in resolve_kernel_hits:
      8  (tex_only)  uv0 uv1 uv2 (6), texid, pad — every triangle textured
      10 (flat)      uv0 uv1 uv2 (6), texid, rgb (3) — no vertex colours:
                     the non-texture colour is the MATERIAL base colour, a
                     per-triangle constant (shaders.cu:813-815, used raw,
                     never linearized), so no corner interpolation exists
      24 (full)      uv0 uv1 uv2 (6), texid, lin flag, corner RGBs (9), pad
                     — vertex colours interpolate then linearize (pow 2.2)
    """
    tid = cluster_set.tri_id.reshape(-1)
    safe = np.maximum(tid, 0)
    uv0 = np.asarray(scene["uv0"])[safe]
    uv1 = np.asarray(scene["uv1"])[safe]
    uv2 = np.asarray(scene["uv2"])[safe]
    mat_id = np.maximum(np.asarray(scene["mat_id"])[safe], 0)
    texid = np.asarray(scene["mat_tex"])[mat_id].astype(np.float32)[:, None]
    if tex_only:
        pad = np.zeros((len(safe), 1), np.float32)
        out = np.concatenate([uv0, uv1, uv2, texid, pad], axis=1)
        assert out.shape[1] == ATTR_COMPS_TEX
        return np.ascontiguousarray(out.astype(np.float32))

    has_color = np.asarray(scene["has_color"])[safe]
    mat_rgb = np.asarray(scene["mat_base_color"])[mat_id][:, :3]
    if not has_color.any():
        out = np.concatenate([uv0, uv1, uv2, texid, mat_rgb], axis=1)
        assert out.shape[1] == ATTR_COMPS_FLAT
        return np.ascontiguousarray(out.astype(np.float32))

    def corner_rgb(key):
        vc = np.asarray(scene[key])[safe][:, :3]
        return np.where(has_color[:, None], vc, mat_rgb).astype(np.float32)

    lin = has_color.astype(np.float32)[:, None]
    pad = np.zeros((len(safe), ATTR_COMPS - 17), np.float32)
    out = np.concatenate(
        [uv0, uv1, uv2, texid, lin,
         corner_rgb("c0"), corner_rgb("c1"), corner_rgb("c2"), pad],
        axis=1,
    )
    assert out.shape[1] == ATTR_COMPS
    return np.ascontiguousarray(out.astype(np.float32))


def pack_rays(dirs: jnp.ndarray, origins: jnp.ndarray,
              tmin: jnp.ndarray) -> jnp.ndarray:
    """(R, 16) kernel ray rows [d, m = o x d, o, tmin, 0...] from (R,3)
    directions/origins and (R,) tmin.  The Plücker moment is precomputed
    here (ray generation is measured free; the kernel reads it as three
    more columns)."""
    m = jnp.cross(origins, dirs)
    r = dirs.shape[0]
    return jnp.concatenate(
        [dirs, m, origins, tmin.reshape(r, 1),
         jnp.zeros((r, RAY_COMPS - 10), jnp.float32)],
        axis=-1,
    )


def _make_tracer_kernel(early_exit: bool):
    """Build the kernel body; `early_exit` adds a front-to-back while_loop
    with the running winner in VMEM scratch (register-carried while state at
    RS=32 provoked a Mosaic compile hang; scratch state compiles fine)."""

    def kernel(*refs):
        if early_exit:
            (counts_ref, ids_hbm, dmin_hbm, tri_hbm, rays_ref, out_ref,
             ids_smem, dmin_smem, tri_vmem, best_vmem,
             sem_ids, sem_dmin, sem_tri) = refs
        else:
            (counts_ref, ids_hbm, dmin_hbm, tri_hbm, rays_ref, out_ref,
             ids_smem, dmin_smem, tri_vmem,
             sem_ids, sem_dmin, sem_tri) = refs
            best_vmem = None
        _tracer_kernel_body(
            counts_ref, ids_hbm, dmin_hbm, tri_hbm, rays_ref, out_ref,
            ids_smem, dmin_smem, tri_vmem, best_vmem,
            sem_ids, sem_dmin, sem_tri, early_exit,
        )

    return kernel


NB = 4  # carried winner buffers: t, u, v, slot
BATCH_RAYS = 128  # rays per in-kernel batch; rb_size must be a multiple


def _tracer_kernel_body(
    counts_ref,  # scalar prefetch (NG,) int32
    ids_hbm,  # (NG, 1, KP) int32 — KP = Kmax padded to a 128 multiple
    dmin_hbm,  # (NG, 1, KP) f32 front-to-back lower distance bounds
    tri_hbm,  # (C, 16, 128) f32
    rays_ref,  # VMEM (RB, 16)
    out_ref,  # VMEM (RB, 8)
    ids_smem,  # SMEM (1, KP) int32
    dmin_smem,  # SMEM (1, KP) f32
    tri_vmem,  # VMEM (Kmax, 16, 128)
    best_vmem,  # VMEM (4, RS, 128) running winner (early-exit variant only)
    sem_ids,
    sem_dmin,
    sem_tri,  # (Kmax,) DMA sems
    early_exit: bool,
):
    g = pl.program_id(0)
    rb = pl.program_id(1)
    cnt = counts_ref[g]
    kmax = tri_vmem.shape[0]
    rb_size = rays_ref.shape[0]

    # groups with an empty shortlist produce no hits: skip ALL work (their
    # output rows are garbage; the epilogue masks whole groups by count)
    @pl.when((rb == 0) & (cnt > 0))
    def _load_group():
        cp_ids = pltpu.make_async_copy(ids_hbm.at[g], ids_smem, sem_ids)
        cp_dmin = pltpu.make_async_copy(dmin_hbm.at[g], dmin_smem, sem_dmin)
        cp_ids.start()
        cp_dmin.start()
        cp_ids.wait()
        cp_dmin.wait()

        # clamp ONCE: tri_vmem/sem_tri are kmax-sized, so an unclamped
        # cnt would DMA out of scratch bounds (the compute loop's per-step
        # jc guard cannot protect these loops)
        cnt_c = jnp.minimum(cnt, kmax)

        def dma_start(j, _):
            pltpu.make_async_copy(
                tri_hbm.at[ids_smem[0, j]], tri_vmem.at[j], sem_tri.at[j]
            ).start()
            return 0

        jax.lax.fori_loop(0, cnt_c, dma_start, 0)

        def dma_wait(j, _):
            pltpu.make_async_copy(
                tri_hbm.at[0], tri_vmem.at[j], sem_tri.at[j]
            ).wait()
            return 0

        jax.lax.fori_loop(0, cnt_c, dma_wait, 0)

    big = jnp.float32(jnp.inf)
    RS = BATCH_RAYS  # rays per batch (loop/winner overhead amortiser)

    def ray_batch(rbi, _):
        r0 = pl.multiple_of(rbi * RS, RS)

        def rcomp(c):
            return rays_ref[pl.ds(r0, RS), c : c + 1]  # (RS,1)

        dx, dy, dz = rcomp(0), rcomp(1), rcomp(2)
        mx, my, mz = rcomp(3), rcomp(4), rcomp(5)
        ox, oy, oz = rcomp(6), rcomp(7), rcomp(8)
        tmin_r = rcomp(9)

        def cluster_step(j, state):
            (bt, bu, bv, bj) = state
            jc = jnp.minimum(j, kmax - 1)  # guard if cnt ever exceeds kmax
            # carry the GLOBAL cluster id (not the shortlist slot): a scalar
            # SMEM read here is free, while mapping slot->cluster in the XLA
            # epilogue measured ~27 ms per 3.2M rays (narrow int gathers
            # lower to per-element descriptors on TPU)
            cid = ids_smem[0, jc].astype(jnp.float32)

            def tc(c):
                return tri_vmem[jc, c, :].reshape(1, KERNEL_LEAF)

            w1 = dx * tc(0) + dy * tc(1) + dz * tc(2) \
                + mx * tc(3) + my * tc(4) + mz * tc(5)
            w2 = dx * tc(6) + dy * tc(7) + dz * tc(8) \
                + mx * tc(9) + my * tc(10) + mz * tc(11)
            nx, ny, nz = tc(12), tc(13), tc(14)
            den = dx * nx + dy * ny + dz * nz
            onum = ox * nx + oy * ny + oz * nz
            # den == 0 (parallel ray, or all-zero padding triangle) makes
            # inv = ±inf and u/v/t = ±inf or NaN: every comparison below is
            # then False, so no explicit validity mask is needed
            inv = 1.0 / den
            u = w1 * inv
            v = w2 * inv
            t = (tc(15) - onum) * inv
            ok = (
                (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t >= tmin_r) & (t < bt)
            )
            return (
                jnp.where(ok, t, bt),
                jnp.where(ok, u, bu),
                jnp.where(ok, v, bv),
                jnp.where(ok, cid, bj),
            )

        z = jnp.zeros((RS, KERNEL_LEAF), jnp.float32)
        init = (jnp.full((RS, KERNEL_LEAF), big), z, z,
                jnp.full((RS, KERNEL_LEAF), -1.0))

        if early_exit:
            # front-to-back early exit with the running winner in scratch:
            # stop once every ray's best hit is closer than the next
            # cluster's lower distance bound (t is world distance here)
            for i in range(NB):
                best_vmem[i] = init[i]

            def cluster_body(j):
                state = tuple(best_vmem[i] for i in range(NB))
                new = cluster_step(j, state)
                for i in range(NB):
                    best_vmem[i] = new[i]
                return j + 1

            kp = dmin_smem.shape[1]

            def cluster_cond(j):
                jd = jnp.minimum(j, kp - 1)
                # worst ray's CURRENT winner = max over rays of min over
                # lanes (never-hit lanes hold +inf, so a plain max over the
                # whole buffer is +inf until every lane hits — i.e. never —
                # which silently disabled the early exit entirely)
                worst = jnp.max(jnp.min(best_vmem[0], axis=1))
                return (j < cnt) & (worst > dmin_smem[0, jd])

            jax.lax.while_loop(cluster_cond, cluster_body, jnp.int32(0))
            final = tuple(best_vmem[i] for i in range(NB))
        else:
            final = jax.lax.fori_loop(0, cnt, cluster_step, init)
        (bt, bu, bv, bj) = final

        # cross-lane winner per ray (first-occurrence argmin)
        tmin_l = jnp.min(bt, axis=1, keepdims=True)  # (RS,1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RS, KERNEL_LEAF), 1)
        cand = jnp.where(bt == tmin_l, lane, KERNEL_LEAF)
        first = jnp.min(cand, axis=1, keepdims=True)
        onehot = lane == first

        def pick(buf):
            return jnp.sum(jnp.where(onehot, buf, 0.0), axis=1, keepdims=True)

        out_ref[pl.ds(r0, RS), 0:1] = jnp.where(
            jnp.isfinite(tmin_l), tmin_l, big
        )
        out_ref[pl.ds(r0, RS), 1:2] = pick(bu)
        out_ref[pl.ds(r0, RS), 2:3] = pick(bv)
        out_ref[pl.ds(r0, RS), 3:4] = pick(bj)
        out_ref[pl.ds(r0, RS), 4:5] = jnp.where(
            first < KERNEL_LEAF, first, 0
        ).astype(jnp.float32)
        return 0

    @pl.when(cnt > 0)
    def _run_batches():
        jax.lax.fori_loop(0, rb_size // RS, ray_batch, 0)


def _use_interpret() -> bool:
    """Interpret the kernel on CPU (tests / virtual meshes)."""
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("ng", "nrb", "rb_size", "kmax", "early_exit"),
)
def run_tracer_kernel(
    counts: jnp.ndarray,  # (NG,) int32
    ids: jnp.ndarray,  # (NG, KP) int32
    dmin: jnp.ndarray,  # (NG, KP) f32
    tri_payload: jnp.ndarray,  # (C, 16, 128) f32
    rays: jnp.ndarray,  # (NG*NRB*RB, 16) f32 (pack_rays layout)
    ng: int,
    nrb: int,
    rb_size: int,
    kmax: int,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Returns (R, 8) rows [t, u, v, cluster-id, lane, ?, ?, ?];
    t = +inf on miss.  Columns 5-7 are UNDEFINED (never written — the CPU
    interpreter happens to zero them, compiled TPU VMEM does not), as are
    all columns of cnt==0 groups; the epilogue masks by group count and
    reads columns 0-4 only.  Resolve attributes with eye.pipeline's
    epilogue."""
    assert rb_size % BATCH_RAYS == 0, (
        f"rb_size={rb_size} must be a multiple of BATCH_RAYS={BATCH_RAYS} "
        f"(the kernel traces rb_size // {BATCH_RAYS} batches — a remainder "
        f"would leave tail rays with uninitialised output)")
    # (NG, 1, KP): the tiled last-two dims stay whole; only the untiled
    # leading group dim is sliced by the per-group DMA
    ids = ids.reshape(ids.shape[0], 1, ids.shape[1])
    dmin = dmin.reshape(dmin.shape[0], 1, dmin.shape[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, nrb),
        in_specs=[
            # keep the ragged tables + payload in HBM: the kernel DMAs rows
            # itself, and a VMEM placement would break the row-slice tiling
            pl.BlockSpec(memory_space=pltpu.HBM),  # ids
            pl.BlockSpec(memory_space=pltpu.HBM),  # dmin
            pl.BlockSpec(memory_space=pltpu.HBM),  # tri payload
            pl.BlockSpec(
                (rb_size, RAY_COMPS),
                lambda g, rb, counts: (g * nrb + rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb_size, OUT_COMPS),
            lambda g, rb, counts: (g * nrb + rb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((1, ids.shape[2]), jnp.int32),
            pltpu.SMEM((1, ids.shape[2]), jnp.float32),
            pltpu.VMEM((kmax, PAYLOAD_COMPS, KERNEL_LEAF), jnp.float32),
        ] + (
            [pltpu.VMEM((NB, BATCH_RAYS, KERNEL_LEAF), jnp.float32)]
            if early_exit else []
        ) + [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((kmax,)),
        ],
    )
    return pl.pallas_call(
        _make_tracer_kernel(early_exit),
        out_shape=jax.ShapeDtypeStruct((rays.shape[0], OUT_COMPS), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, ids, dmin, tri_payload, rays)
