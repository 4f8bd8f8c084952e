"""Dissect the packed tracer's per-step cost on hardware.

Round-4 session-20 falsified the 'latency-bound row step' theory: rowmerge
(tiny carried state) made unroll register-cheap, yet every unroll factor
REGRESSED (rm1 +5%, rm4 +21% — artifacts/tuning.json rowmerge_kernel_ms),
so independent chains do not fill the step.  This probe measures what the
~3.8 us ofstad step (49.7 ms kernel / 13.1k chain-steps) is actually made
of, with knock-out kernels sharing the production grid/BlockSpec layout:

  dma_only   grid + payload DMA + a trivial per-row touch
  dot_only   + the (RS, 16) x (16, 512) MXU dot, w1 block sunk
  dot_cand   + the full candidate math (divide, u/v/t, inside tests)
  real bary / uvs   the production kernels (run_packed_tracer)

Every variant sinks through the same per-row (min over lanes -> (1, RS)
write), so pairwise DIFFERENCES isolate: MXU+p-materialisation
(dot_only - dma_only), VPU candidate math (dot_cand - dot_only), winner
select machinery (bary - dot_cand), per-candidate cu/cv interpolation
(uvs - bary, modulo one state buffer).

Run as THE one TPU process.  Payloads are random (magnitudes matched to
the bench scenes); timings are the signal, hit semantics are junk.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compound_ray_tpu.trace.mm_tracer import (  # noqa: E402
    MM_COLS, MM_FEATS, RAY_FEATS, run_packed_tracer)
from compound_ray_tpu.trace.pallas_tracer import KERNEL_LEAF  # noqa: E402

RS = 256


def sync(x):
    return jax.device_get(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, reps=10):
    """reps back-to-back dispatches, ONE sync (frame_anatomy.timeit's
    method): a per-call sync pays the ~22 ms tunnel round trip, which
    swamped this probe's first numbers — every 'floor' measured exactly
    the RT."""
    sync(fn(*args))  # warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    sync(outs[-1])
    return (time.perf_counter() - t0) * 1e3 / reps


def _make_probe_kernel(mode: str, rs: int = RS):
    def kernel(counts_ref, tri_ref, rays_ref, out_ref):
        big = jnp.float32(jnp.inf)  # inside: a closure const can't trace
        g = pl.program_id(0)
        cnt = counts_ref[g]
        rb_size = rays_ref.shape[1]
        nb = rb_size // rs

        @pl.when(cnt > 0)
        def _run():
            def one(rbi, _):
                r0 = pl.multiple_of(rbi * rs, rs)
                ft = rays_ref[:, pl.ds(r0, rs)]
                if mode == "copy_only":
                    # no row loop, no lane reduce: grid + rays load +
                    # out write only — splits the dma_only floor into
                    # (grid/DMA/IO) vs (loop + cross-lane sink)
                    out_ref[0:1, pl.ds(r0, rs)] = ft[0:1, :]
                    return 0

                def row(j, acc):
                    mm = tri_ref[0, j]  # (16, 512)
                    if mode == "dma_only":
                        x = jnp.broadcast_to(
                            mm[0:1, 0:KERNEL_LEAF], (rs, KERNEL_LEAF))
                    else:
                        p = jax.lax.dot_general(
                            ft, mm, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )  # (rs, 512)
                        if mode == "dot_only":
                            x = p[:, 0:KERNEL_LEAF]
                        else:  # dot_cand: full candidate math, no winner
                            w1 = p[:, 0:KERNEL_LEAF]
                            w2 = p[:, KERNEL_LEAF:2 * KERNEL_LEAF]
                            den = p[:, 2 * KERNEL_LEAF:3 * KERNEL_LEAF]
                            tnum = p[:, 3 * KERNEL_LEAF:4 * KERNEL_LEAF]
                            inv = 1.0 / den
                            u = w1 * inv
                            v = w2 * inv
                            t = tnum * inv
                            ok = ((u >= 0.0) & (v >= 0.0)
                                  & (u + v <= 1.0) & (t >= 0.0))
                            x = jnp.where(ok, t, big)
                    # shared sink: per-row lane reduce + merge (same cost
                    # in every variant, so differences isolate the body)
                    return jnp.minimum(acc, jnp.min(x, axis=1))

                acc = jax.lax.fori_loop(
                    0, cnt, row, jnp.full((rs,), big))
                out_ref[0:1, pl.ds(r0, rs)] = acc.reshape(1, rs)
                return 0

            jax.lax.fori_loop(0, nb, one, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("ng", "rb_size", "rmax",
                                             "mode", "rs"))
def run_probe(rc, pmm, rays, ng, rb_size, rmax, mode, rs=RS):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, 1),
        in_specs=[
            pl.BlockSpec((1, rmax, MM_FEATS, MM_COLS),
                         lambda g, rb, counts: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_FEATS, rb_size),
                         lambda g, rb, counts: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb_size),
                               lambda g, rb, counts: (0, g),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_probe_kernel(mode, rs),
        out_shape=jax.ShapeDtypeStruct((1, rays.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(rc, pmm, rays)


@functools.partial(jax.jit, static_argnames=("ng", "rb_size", "rmax",
                                             "mode"))
def run_probe3d(rc, pmm, rays3d, ng, rb_size, rmax, mode):
    """run_probe with rays in (NG, 16, rb_size) layout: each grid step's
    ray block is ONE contiguous 196 KB region instead of 16 rows strided
    NG*rb_size*4 bytes apart — isolates DMA-descriptor stride cost."""
    def kernel(counts_ref, tri_ref, rays_ref, out_ref):
        big = jnp.float32(jnp.inf)
        g = pl.program_id(0)
        cnt = counts_ref[g]
        nb = rb_size // RS

        @pl.when(cnt > 0)
        def _run():
            def one(rbi, _):
                r0 = pl.multiple_of(rbi * RS, RS)
                ft = rays_ref[0, :, pl.ds(r0, RS)]
                if mode == "copy_only":
                    out_ref[0:1, pl.ds(r0, RS)] = ft[0:1, :]
                    return 0

                def row(j, acc):
                    mm = tri_ref[0, j]
                    if mode == "dma_only":
                        x = jnp.broadcast_to(
                            mm[0:1, 0:KERNEL_LEAF], (RS, KERNEL_LEAF))
                    else:
                        p = jax.lax.dot_general(
                            ft, mm, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        w1 = p[:, 0:KERNEL_LEAF]
                        w2 = p[:, KERNEL_LEAF:2 * KERNEL_LEAF]
                        den = p[:, 2 * KERNEL_LEAF:3 * KERNEL_LEAF]
                        tnum = p[:, 3 * KERNEL_LEAF:4 * KERNEL_LEAF]
                        inv = 1.0 / den
                        u = w1 * inv
                        v = w2 * inv
                        t = tnum * inv
                        ok = ((u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t >= 0.0))
                        x = jnp.where(ok, t, big)
                    return jnp.minimum(acc, jnp.min(x, axis=1))

                acc = jax.lax.fori_loop(
                    0, cnt, row, jnp.full((RS,), big))
                out_ref[0:1, pl.ds(r0, RS)] = acc.reshape(1, RS)
                return 0

            jax.lax.fori_loop(0, nb, one, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, 1),
        in_specs=[
            pl.BlockSpec((1, rmax, MM_FEATS, MM_COLS),
                         lambda g, rb, counts: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_FEATS, rb_size),
                         lambda g, rb, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb_size),
                               lambda g, rb, counts: (0, g),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, ng * rb_size), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(rc, pmm, rays3d)


def main():
    # ofstad-like: cnt=1 everywhere; rb_size 3072 divides by every probed
    # chain width (12 x 256 = 6 x 512 = 3 x 1024)
    ng, rb_size, rmax = 1000, 3072, 1
    rng = np.random.default_rng(0)
    pmm = np.zeros((ng, rmax, 16, 512), np.float32)
    pmm[:, :, 0:10, :] = rng.standard_normal(
        (ng, rmax, 10, 512)).astype(np.float32) * 50.0
    pmm[:, :, 10, :] = rng.integers(0, 1 << 20, (ng, rmax, 512))
    rc = np.ones((ng,), np.int32)
    rays = rng.standard_normal((16, ng * rb_size)).astype(np.float32)
    rc_j, pmm_j, rays_j = map(jnp.asarray, (rc, pmm, rays))

    times = {}
    # sum-wrap every timed call: device_get of a full output rides the
    # tunnel at ~60 MB/s and swamps the kernel (the probe_f32x1 lesson —
    # its first timings were transfer-bound too)
    for mode in ("copy_only", "dma_only", "dot_only", "dot_cand"):
        timed = jax.jit(
            lambda rc, pm, ry, m=mode: jnp.sum(
                run_probe(rc, pm, ry, ng, rb_size, rmax, m)))
        ms = bench(timed, rc_j, pmm_j, rays_j)
        times[mode] = round(ms, 3)
        print(f"probe {mode:10s}: {ms:8.2f} ms", flush=True)
    # chain-width sweep of the knock-outs: if the floor is per-chain
    # (loop + lane-reduce sink + finalize), wider chains cut it linearly
    for rs in (512, 1024):
        for mode in ("dma_only", "dot_cand"):
            timed = jax.jit(
                lambda rc, pm, ry, m=mode, r=rs: jnp.sum(
                    run_probe(rc, pm, ry, ng, rb_size, rmax, m, r)))
            ms = bench(timed, rc_j, pmm_j, rays_j)
            times[f"{mode}_rs{rs}"] = round(ms, 3)
            print(f"probe {mode}_rs{rs}: {ms:8.2f} ms", flush=True)
    # grid-size scaling at constant total rays: per-GRID-STEP floor vs
    # per-ray cost (halve/quarter the groups, double/quadruple rb_size)
    for ngx, rbx in ((500, 6144), (250, 12288)):
        rcx = jnp.asarray(np.ones((ngx,), np.int32))
        pmmx = jnp.asarray(np.asarray(pmm)[:ngx])
        timed = jax.jit(
            lambda rc, pm, ry, n=ngx, rb=rbx: jnp.sum(
                run_probe(rc, pm, ry, n, rb, rmax, "copy_only")))
        ms = bench(timed, rcx, pmmx, rays_j)
        times[f"copy_only_ng{ngx}"] = round(ms, 3)
        print(f"probe copy_only_ng{ngx}: {ms:8.2f} ms", flush=True)
    # contiguous rays layout (NG, 16, rb): one DMA descriptor per block
    # instead of 16 rows strided NG*rb*4 B apart
    rays3d = jnp.asarray(
        np.asarray(rays).reshape(16, ng, rb_size).transpose(1, 0, 2).copy())
    for mode in ("copy_only", "dot_cand"):
        timed = jax.jit(
            lambda rc, pm, ry, m=mode: jnp.sum(
                run_probe3d(rc, pm, ry, ng, rb_size, rmax, m)))
        ms = bench(timed, rc_j, pmm_j, rays3d)
        times[f"{mode}_3d"] = round(ms, 3)
        print(f"probe {mode}_3d: {ms:8.2f} ms", flush=True)
    for emit in ("bary", "uvs"):
        timed = jax.jit(
            lambda rc, pm, ry, e=emit: jnp.sum(run_packed_tracer(
                rc, pm, ry, ng=ng, nrb=1, rb_size=rb_size,
                rmax=rmax, emit=e, unroll_b=1, precision="default")[0]))
        ms = bench(timed, rc_j, pmm_j, rays_j)
        times[f"real_{emit}"] = round(ms, 3)
        print(f"probe real_{emit:5s}: {ms:8.2f} ms", flush=True)
    # REAL kernel at wider chains: the old 512-ray frame regression was
    # blamed on winner-state registers; rowmerge falsified that story,
    # so re-measure at kernel level under the production precision
    import compound_ray_tpu.trace.mm_tracer as mm
    start_rs = mm.BATCH_RAYS
    try:
        for rs in (512, 1024):
            mm.BATCH_RAYS = rs
            jax.clear_caches()
            timed = jax.jit(
                lambda rc, pm, ry: jnp.sum(run_packed_tracer(
                    rc, pm, ry, ng=ng, nrb=1, rb_size=rb_size,
                    rmax=rmax, emit="uvs", unroll_b=1,
                    precision="default")[0]))
            ms = bench(timed, rc_j, pmm_j, rays_j)
            times[f"real_uvs_rs{rs}"] = round(ms, 3)
            print(f"probe real_uvs_rs{rs}: {ms:8.2f} ms", flush=True)
    finally:
        mm.BATCH_RAYS = start_rs
        jax.clear_caches()
    steps = ng * (rb_size // RS)
    print(f"\n{steps} chain-steps at rs=256; us/step:", flush=True)
    for k, v in times.items():
        print(f"  {k:16s} {v / steps * 1000.0:6.3f}", flush=True)
    d = {
        "loop+sink (dma-copy)": times["dma_only"] - times["copy_only"],
        "mxu+p (dot-dma)": times["dot_only"] - times["dma_only"],
        "cand math (cand-dot)": times["dot_cand"] - times["dot_only"],
        "winner sel (bary-cand)": times["real_bary"] - times["dot_cand"],
        "cu/cv (uvs-bary)": times["real_uvs"] - times["real_bary"],
    }
    for k, v in d.items():
        print(f"  {k:24s} {v:8.2f} ms", flush=True)
    out = {"times_ms": times, "deltas_ms": {k: round(v, 3)
                                            for k, v in d.items()},
           "steps": steps,
           "measured": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "probe_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
