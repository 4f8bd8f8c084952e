"""Hardware probe for the "f32x1" stacked-K precision mode.

Validates, on the real chip with realistic-but-synthetic shapes, that:
  1. Mosaic compiles the stacked-K kernels (no hang / ICE on the
     in-kernel mask-split + sublane concat);
  2. the per-step cost is ~one-pass (vs HIGHEST's six) — the skinny-K
     hypothesis (contraction depth 96 <= the MXU's 256);
  3. the output agrees with HIGHEST at f32-class error on random
     payloads (the real conformance gate runs in tools/tpu_session.py —
     this is the cheap go/no-go signal before an unattended batch).

Run as THE one TPU process.  Payloads are random, so hit semantics are
junk — agreement RATES are the signal, not exact masks.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compound_ray_tpu.trace.mm_tracer import (  # noqa: E402
    run_packed_tracer, run_rows_occlusion)


def sync(x):
    return jax.device_get(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, reps=3):
    sync(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def probe_primary():
    ng, nrb, rb_size, rmax = 448, 1, 3328, 1
    rng = np.random.default_rng(0)
    pmm = np.zeros((ng, rmax, 16, 512), np.float32)
    # plausible magnitudes: unit-ish normals, scene-scale (~50) offsets
    pmm[:, :, 0:10, :] = rng.standard_normal(
        (ng, rmax, 10, 512)).astype(np.float32) * 50.0
    pmm[:, :, 10, :] = rng.integers(0, 1 << 20, (ng, rmax, 512))
    rc = np.ones((ng,), np.int32)
    rays = rng.standard_normal((16, ng * nrb * rb_size)).astype(np.float32)
    rc_j, pmm_j, rays_j = map(jnp.asarray, (rc, pmm, rays))

    outs, times = {}, {}
    for prec in ("highest", "default", "f32x1"):
        full = jax.jit(lambda rc, pmm, rays, p=prec: run_packed_tracer(
            rc, pmm, rays, ng=ng, nrb=nrb, rb_size=rb_size, rmax=rmax,
            emit="bary", precision=p))
        # sum-wrapped for timing: the raw (8, R) output is ~48 MB and the
        # tunnel transfer (~900 ms) swamped the kernel in the first probe
        fn = jax.jit(lambda rc, pmm, rays, p=prec: jnp.sum(jnp.where(
            jnp.isfinite(o := run_packed_tracer(
                rc, pmm, rays, ng=ng, nrb=nrb, rb_size=rb_size, rmax=rmax,
                emit="bary", precision=p)), o, 0.0)))
        times[prec] = bench(fn, rc_j, pmm_j, rays_j)
        outs[prec] = np.asarray(jax.device_get(full(rc_j, pmm_j, rays_j)))
        print(json.dumps({"probe": "primary", "prec": prec,
                          "ms": round(times[prec], 3)}), flush=True)
    # affine-shaped variant (ray_feats=8 -> stacked K=48): timing only
    rays8 = jnp.asarray(rays[:8])
    for prec in ("highest", "f32x1"):
        fn8 = jax.jit(lambda rc, pmm, rays, p=prec: jnp.sum(jnp.where(
            jnp.isfinite(o := run_packed_tracer(
                rc, pmm, rays, ng=ng, nrb=nrb, rb_size=rb_size, rmax=rmax,
                emit="bary", ray_feats=8, precision=p)), o, 0.0)))
        print(json.dumps({"probe": "primary-affine", "prec": prec,
                          "ms": round(bench(fn8, rc_j, pmm_j, rays8), 3)}),
              flush=True)
    for prec in ("default", "f32x1"):
        hb = np.isfinite(outs["highest"][0])
        hp = np.isfinite(outs[prec][0])
        agree = float((hb == hp).mean())
        both = hb & hp
        rel = (np.abs(outs[prec][0][both] - outs["highest"][0][both])
               / np.maximum(np.abs(outs["highest"][0][both]), 1e-9))
        print(json.dumps({
            "probe": "primary-acc", "prec": prec,
            "hit_agree": agree, "hit_rate": float(hb.mean()),
            "t_rel_p99": float(np.quantile(rel, 0.99)) if both.any() else None,
            "t_rel_max": float(rel.max()) if both.any() else None,
        }), flush=True)


def probe_occlusion():
    nvg, nrb, rb_size, rpb, feats = 475, 1, 1024, 4, 8
    bpg = 4  # blocks per virtual group
    tb = nvg * bpg
    rng = np.random.default_rng(1)
    flat = rng.standard_normal((tb, feats, rpb * 512)).astype(np.float32)
    flat[:, 0:4, :] *= 100.0  # folded light-origin-scale constants
    # zero ~99.8% of slots (all 4 column blocks of a slot consistently)
    # so the any-hit rate lands mid-range and the bit-agreement numbers
    # mean something (dense random payloads occlude EVERY ray)
    keep = (rng.uniform(size=(tb, rpb, 1, 128)) < 0.002)
    keep = np.broadcast_to(keep, (tb, rpb, 4, 128)).reshape(tb, 1, rpb * 512)
    flat *= keep.astype(np.float32)
    r2v = np.repeat(np.arange(nvg, dtype=np.int32), bpg)
    flag = np.tile(np.asarray([2] + [1] * (bpg - 1), np.int32), nvg)
    rays = rng.standard_normal(
        (feats, nvg * nrb * rb_size)).astype(np.float32)
    r2v_j, flag_j, flat_j, rays_j = map(
        jnp.asarray, (r2v, flag, flat, rays))

    outs = {}
    for prec in ("highest", "default", "bf16x3", "f32x1"):
        full = jax.jit(lambda a, b, c, d, p=prec: run_rows_occlusion(
            a, b, c, d, nrb=nrb, rb_size=rb_size, precision=p))
        fn = jax.jit(lambda a, b, c, d, p=prec: jnp.sum(run_rows_occlusion(
            a, b, c, d, nrb=nrb, rb_size=rb_size, precision=p)))
        ms = bench(fn, r2v_j, flag_j, flat_j, rays_j)
        outs[prec] = np.asarray(
            jax.device_get(full(r2v_j, flag_j, flat_j, rays_j)))[0]
        print(json.dumps({"probe": "occlusion", "prec": prec,
                          "ms": round(ms, 3)}), flush=True)
    for prec in ("default", "bf16x3", "f32x1"):
        agree = float((outs[prec] == outs["highest"]).mean())
        print(json.dumps({
            "probe": "occlusion-acc", "prec": prec, "bit_agree": agree,
            "occ_rate_highest": float(outs["highest"].mean()),
            "occ_rate_cand": float(outs[prec].mean()),
        }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    probe_primary()
    probe_occlusion()
