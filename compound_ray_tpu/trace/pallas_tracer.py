"""Fused Pallas compound-ray kernel (TPU).

The hot path of the framework: per ommatidium-group, trace all cone samples
against the group's culled cluster shortlist entirely in VMEM.

Layout (chosen for the VPU's (8, 128) registers):
  * rays on LANES: a ray batch is 8 rays x 128-wide ops? No — rays are rows:
    each (8, 128) op tests 8 rays (sublanes, component-broadcast from the ray
    block) against 128 triangles (lanes, component rows of the cluster
    payload).  One cluster = one (8, 128) candidate sweep per 8 rays.
  * triangle payload: (C, 40, 128) — component-major, 128 triangles per
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

Intersection is the Plücker side-product form (trace.plucker).  The kernel
carries the running winner's interpolated payload (rgb, uv, texid, lin) per
ray, so the XLA epilogue only has to: apply the vertex-colour linearisation,
sample the texture atlas for textured winners, substitute the miss shader
for t == inf, and reduce means.

Triangle payload rows (44 components):
   0-17  edge Plücker 6-vectors (e0, e1, e2), edge i opposite vertex i
  18-20  n = e1 x e2
  21     c0 = v0 . n
  22-30  corner RGBs (vertex colours, or material colour in all corners)
  31     lin flag (1.0 -> pow 2.2 after interpolation, i.e. vertex colours)
  32-37  corner UVs
  38     texture id (-1 = none)
  39     valid (0.0 = padding)
  40-43  cluster bounding sphere (cx cy cz r), replicated across the row

Fully-textured scenes use a trimmed variant carrying only (t, u, v, texid)
through the winner reduction (tex_only).
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
PAYLOAD_COMPS = 44  # 40 per-triangle rows + cluster bounding sphere (40-43)
RAY_COMPS = 8  # dx dy dz ox oy oz tmin pad


def build_kernel_payload(scene: Dict[str, Any], cluster_set) -> np.ndarray:
    """(C, 44, 128) float32 payload from a ClusterSet with leaf KERNEL_LEAF."""
    from compound_ray_tpu.trace.plucker import triangle_constants

    c, l = cluster_set.tri_id.shape
    assert l == KERNEL_LEAF
    tri = triangle_constants(cluster_set.v0, cluster_set.e1, cluster_set.e2)
    edge6 = np.asarray(tri["edge6"], np.float32).reshape(c * l, 18)
    normal = np.asarray(tri["normal"], np.float32).reshape(c * l, 3)
    c0 = np.asarray(tri["c0"], np.float32).reshape(c * l, 1)

    tid = cluster_set.tri_id.reshape(-1)
    safe = np.maximum(tid, 0)
    has_color = np.asarray(scene["has_color"])[safe]
    mat_id = np.maximum(np.asarray(scene["mat_id"])[safe], 0)
    mat_rgb = np.asarray(scene["mat_base_color"])[mat_id][:, :3]
    mat_tex = np.asarray(scene["mat_tex"])[mat_id].astype(np.float32)

    def corner_rgb(key):
        vc = np.asarray(scene[key])[safe][:, :3]
        return np.where(has_color[:, None], vc, mat_rgb).astype(np.float32)

    rgb0 = corner_rgb("c0")
    rgb1 = corner_rgb("c1")
    rgb2 = corner_rgb("c2")
    lin = has_color.astype(np.float32)[:, None]
    uv0 = np.asarray(scene["uv0"])[safe]
    uv1 = np.asarray(scene["uv1"])[safe]
    uv2 = np.asarray(scene["uv2"])[safe]
    texid = mat_tex[:, None]
    valid = (tid >= 0).astype(np.float32)[:, None]

    # cluster bounding sphere, replicated across the cluster's triangle rows
    # so the kernel's per-ray sphere pretest reads it like any other component
    sphere = np.concatenate(
        [cluster_set.sphere_center, cluster_set.sphere_radius[:, None]], axis=1
    ).astype(np.float32)  # (C, 4)
    sphere_rows = np.repeat(sphere, l, axis=0)  # (C*L, 4)

    payload = np.concatenate(
        [edge6, normal, c0, rgb0, rgb1, rgb2, lin, uv0, uv1, uv2, texid, valid,
         sphere_rows],
        axis=1,
    )  # (C*L, 44)
    assert payload.shape[1] == PAYLOAD_COMPS
    return np.ascontiguousarray(
        payload.reshape(c, l, PAYLOAD_COMPS).transpose(0, 2, 1)
    )  # (C, 44, 128)


def _make_tracer_kernel(early_exit: bool, tex_only: bool = False):
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
            sem_ids, sem_dmin, sem_tri, early_exit, tex_only,
        )

    return kernel


def _tracer_kernel_body(
    counts_ref,  # scalar prefetch (NG,) int32
    ids_hbm,  # (NG, 1, KP) int32 — KP = Kmax padded to a 128 multiple
    dmin_hbm,  # (NG, 1, KP) f32 front-to-back lower distance bounds
    tri_hbm,  # (C, 40, 128) f32
    rays_ref,  # VMEM (RB, 8)
    out_ref,  # VMEM (RB, 8)
    ids_smem,  # SMEM (1, KP) int32
    dmin_smem,  # SMEM (1, KP) f32
    tri_vmem,  # VMEM (Kmax, 44, 128)
    best_vmem,  # VMEM (8, RS, 128) running winner (early-exit variant only)
    sem_ids,
    sem_dmin,
    sem_tri,  # (Kmax,) DMA sems
    early_exit: bool,
    tex_only: bool = False,  # fully-textured scene: carry only (t,u,v,tex)
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

        def dma_start(j, _):
            pltpu.make_async_copy(
                tri_hbm.at[ids_smem[0, j]], tri_vmem.at[j], sem_tri.at[j]
            ).start()
            return 0

        jax.lax.fori_loop(0, cnt, dma_start, 0)

        def dma_wait(j, _):
            pltpu.make_async_copy(
                tri_hbm.at[0], tri_vmem.at[j], sem_tri.at[j]
            ).wait()
            return 0

        jax.lax.fori_loop(0, cnt, dma_wait, 0)

    big = jnp.float32(jnp.inf)
    RS = 32  # rays per batch: 4 vregs per op amortises loop + branch overhead

    def ray_batch(rbi, _):
        r0 = pl.multiple_of(rbi * RS, RS)

        def rcomp(c):
            return rays_ref[pl.ds(r0, RS), c : c + 1]  # (RS,1)

        # ray layout: [dx dy dz ox oy oz tmin pad]; the Plücker moment
        # m = o x d is recomputed here (6 mul/sub) because o itself is needed
        # for the plane term o.n
        dx, dy, dz = rcomp(0), rcomp(1), rcomp(2)
        ox, oy, oz = rcomp(3), rcomp(4), rcomp(5)
        tmin_r = rcomp(6)
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
        NB = 4 if tex_only else 8  # carried winner buffers

        def cluster_step(j, state):
            if tex_only:
                (bt, bu, bv, btex) = state
            else:
                (bt, br, bg_, bb, bu, bv, btex, blin) = state
            jc = jnp.minimum(j, kmax - 1)  # chunked loop may overshoot by 1

            def tc(c):
                return tri_vmem[jc, c, :].reshape(1, KERNEL_LEAF)

            # slots >= cnt hold stale payload from a previous group: mask them
            in_range = (j < cnt).astype(jnp.float32)

            w0 = dx * tc(0) + dy * tc(1) + dz * tc(2) \
                + mx * tc(3) + my * tc(4) + mz * tc(5)
            w1 = dx * tc(6) + dy * tc(7) + dz * tc(8) \
                + mx * tc(9) + my * tc(10) + mz * tc(11)
            w2 = dx * tc(12) + dy * tc(13) + dz * tc(14) \
                + mx * tc(15) + my * tc(16) + mz * tc(17)
            nx, ny, nz = tc(18), tc(19), tc(20)
            den = dx * nx + dy * ny + dz * nz
            onum = ox * nx + oy * ny + oz * nz
            t = (tc(21) - onum) / den

            ws = w0 + w1 + w2
            pos_ok = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            neg_ok = (w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
            ok = (
                (pos_ok | neg_ok)
                & (den != 0.0)
                & (ws != 0.0)
                & (tc(39) * in_range > 0.0)
                & (t >= tmin_r)
                & (t < bt)
            )
            t = jnp.where(ok, t, big)
            better = t < bt

            inv_ws = 1.0 / jnp.where(ws == 0.0, 1.0, ws)
            u = w1 * inv_ws
            v = w2 * inv_ws
            w0n = 1.0 - u - v
            cu = w0n * tc(32) + u * tc(34) + v * tc(36)
            cv = w0n * tc(33) + u * tc(35) + v * tc(37)
            if tex_only:
                return (
                    jnp.where(better, t, bt),
                    jnp.where(better, cu, bu),
                    jnp.where(better, cv, bv),
                    jnp.where(better, tc(38), btex),
                )
            cr = w0n * tc(22) + u * tc(25) + v * tc(28)
            cg = w0n * tc(23) + u * tc(26) + v * tc(29)
            cb = w0n * tc(24) + u * tc(27) + v * tc(30)

            return (
                jnp.where(better, t, bt),
                jnp.where(better, cr, br),
                jnp.where(better, cg, bg_),
                jnp.where(better, cb, bb),
                jnp.where(better, cu, bu),
                jnp.where(better, cv, bv),
                jnp.where(better, tc(38), btex),
                jnp.where(better, tc(31), blin),
            )

        z = jnp.zeros((RS, KERNEL_LEAF), jnp.float32)
        if tex_only:
            init = (
                jnp.full((RS, KERNEL_LEAF), big),
                z, z,
                jnp.full((RS, KERNEL_LEAF), -1.0),
            )
        else:
            init = (
                jnp.full((RS, KERNEL_LEAF), big),
                z, z, z, z, z,
                jnp.full((RS, KERNEL_LEAF), -1.0),
                z,
            )

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
                return (j < cnt) & (jnp.max(best_vmem[0]) > dmin_smem[0, jd])

            jax.lax.while_loop(cluster_cond, cluster_body, jnp.int32(0))
            final = tuple(best_vmem[i] for i in range(NB))
        else:
            final = jax.lax.fori_loop(0, cnt, cluster_step, init)
        if tex_only:
            (bt, bu, bv, btex) = final
            br = bg_ = bb = blin = None
        else:
            (bt, br, bg_, bb, bu, bv, btex, blin) = final

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
        out_ref[pl.ds(r0, RS), 4:5] = pick(bu)
        out_ref[pl.ds(r0, RS), 5:6] = pick(bv)
        out_ref[pl.ds(r0, RS), 6:7] = pick(btex)
        if not tex_only:
            out_ref[pl.ds(r0, RS), 1:2] = pick(br)
            out_ref[pl.ds(r0, RS), 2:3] = pick(bg_)
            out_ref[pl.ds(r0, RS), 3:4] = pick(bb)
            out_ref[pl.ds(r0, RS), 7:8] = pick(blin)
        return 0

    @pl.when(cnt > 0)
    def _run_batches():
        jax.lax.fori_loop(0, rb_size // RS, ray_batch, 0)


def _use_interpret() -> bool:
    """Interpret the kernel on CPU (tests / virtual meshes)."""
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("ng", "nrb", "rb_size", "kmax", "early_exit", "tex_only"),
)
def run_tracer_kernel(
    counts: jnp.ndarray,  # (NG,) int32
    ids: jnp.ndarray,  # (NG, KP) int32
    dmin: jnp.ndarray,  # (NG, KP) f32
    tri_payload: jnp.ndarray,  # (C, 44, 128) f32
    rays: jnp.ndarray,  # (NG*NRB*RB, 8) f32
    ng: int,
    nrb: int,
    rb_size: int,
    kmax: int,
    early_exit: bool = False,
    tex_only: bool = False,
) -> jnp.ndarray:
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
            (rb_size, RAY_COMPS),
            lambda g, rb, counts: (g * nrb + rb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((1, ids.shape[2]), jnp.int32),
            pltpu.SMEM((1, ids.shape[2]), jnp.float32),
            pltpu.VMEM((kmax, PAYLOAD_COMPS, KERNEL_LEAF), jnp.float32),
        ] + (
            [pltpu.VMEM((4 if tex_only else 8, 32, KERNEL_LEAF), jnp.float32)]
            if early_exit else []
        ) + [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((kmax,)),
        ],
    )
    return pl.pallas_call(
        _make_tracer_kernel(early_exit, tex_only),
        out_shape=jax.ShapeDtypeStruct((rays.shape[0], RAY_COMPS), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, ids, dmin, tri_payload, rays)
