"""Micro-benchmark: skinny-K Pallas dot cost model + stacked-K split accuracy.

Motivation (session-16 anatomy): both tracer kernels contract K=16 (or 8)
feature rows against 512-2048 slot columns — the MXU's 256-deep systolic
array is ~6% utilised per pass, and precision=HIGHEST costs SIX such passes
serially (the occlusion kernel measured 145.7 ms at highest vs 44.2 at
default: MXU-bound).  Hypothesis: per-pass cost is ~flat in K up to 256, so
an f32-accurate product can be had at ~one-pass cost by stacking the
operands' bf16 hi/mid/lo splits on the K axis (K=16 -> 96) and running ONE
default-precision dot:

    x = x_h + x_m + x_l   (each bf16-exact, 8 mantissa bits apiece)
    A@B = [A_h A_h A_m A_h A_l A_m] @ [B_h; B_m; B_h; B_l; B_h; B_m]
          (the six >=2^-24-relative product terms HIGHEST keeps, one pass,
           f32 accumulation inside the MXU)

This script measures, on the real chip:
  1. per-step time of a Pallas fori_loop dot (256,K)x(K,N) for
     K in {16, 48, 96, 128, 256} at DEFAULT and K=16/96 at HIGHEST,
     N in {512 (primary kernel shape), 2048 (occlusion rpb=4 shape)};
  2. entrywise accuracy of the stacked-K 6-term and 3-term splits vs
     HIGHEST and vs f64, on data with a wide dynamic range.

Run as THE one TPU process (CLAUDE.md tunnel rules).  Output: one JSON
line per measurement + a summary verdict.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RS = 256
NROWS = 4  # distinct payload rows cycled in the loop (defeats LICM)


def make_bench(k: int, n: int, prec, n_steps: int):
    def kernel(ft_ref, mm_ref, out_ref):
        def step(j, acc):
            mm = mm_ref[jax.lax.rem(j, NROWS)]  # (k, n)
            p = jax.lax.dot_general(
                ft_ref[...], mm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (RS, n)
            return acc + p[:, :128]

        acc = jax.lax.fori_loop(
            0, n_steps, step, jnp.zeros((RS, 128), jnp.float32))
        out_ref[...] = acc

    @jax.jit
    def run(ft, mm):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RS, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ft, mm)

    return run


def time_variant(k: int, n: int, prec_name: str, n_steps: int = 4000,
                 reps: int = 3):
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[prec_name]
    rng = np.random.default_rng(0)
    ft = jnp.asarray(rng.standard_normal((k, RS)), jnp.float32)
    mm = jnp.asarray(rng.standard_normal((NROWS, k, n)), jnp.float32)
    run = make_bench(k, n, prec, n_steps)
    jax.device_get(run(ft, mm))  # compile + settle
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(ft, mm))
        best = min(best, time.perf_counter() - t0)
    us_per_step = best / n_steps * 1e6
    rec = {"bench": "dot_step", "K": k, "N": n, "prec": prec_name,
           "us_per_step": round(us_per_step, 4)}
    print(json.dumps(rec), flush=True)
    return us_per_step


def split3(x):
    h = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - h
    m = r.astype(jnp.bfloat16).astype(jnp.float32)
    l = (r - m).astype(jnp.bfloat16).astype(jnp.float32)
    return h, m, l


@jax.jit
def stacked6(a, b):
    ah, am, al = split3(a)
    bh, bm, bl = split3(b)
    sa = jnp.concatenate([ah, ah, am, ah, al, am], axis=1)
    sb = jnp.concatenate([bh, bm, bh, bl, bh, bm], axis=0)
    return jax.lax.dot_general(
        sa, sb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


@jax.jit
def stacked3(a, b):
    ah, am, _ = split3(a)
    bh, bm, _ = split3(b)
    sa = jnp.concatenate([ah, ah, am], axis=1)
    sb = jnp.concatenate([bh, bm, bh], axis=0)
    return jax.lax.dot_general(
        sa, sb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


@functools.partial(jax.jit, static_argnames=("prec",))
def plain(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def accuracy(k: int = 16, m: int = 512, n: int = 2048):
    rng = np.random.default_rng(1)
    # wide dynamic range + cancellation pressure (shadow payloads fold
    # light-origin constants ~1e2-1e4 against triangle-scale decisions)
    a = (rng.standard_normal((m, k))
         * 10.0 ** rng.uniform(-2, 3, (m, k))).astype(np.float32)
    b = (rng.standard_normal((k, n))
         * 10.0 ** rng.uniform(-2, 3, (k, n))).astype(np.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = (np.abs(a[:, None, :].astype(np.float64))
             * np.abs(b.T[None, :, :].astype(np.float64))).sum(-1)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    out = {}
    for name, fn in [
        ("highest", lambda: plain(aj, bj, jax.lax.Precision.HIGHEST)),
        ("default", lambda: plain(aj, bj, jax.lax.Precision.DEFAULT)),
        ("stacked3", lambda: stacked3(aj, bj)),
        ("stacked6", lambda: stacked6(aj, bj)),
    ]:
        got = np.asarray(jax.device_get(fn()), np.float64)
        # error relative to the |terms| scale (the cancellation-aware
        # measure: decision flips happen when err ~ decision margin)
        rel = np.abs(got - ref) / np.maximum(scale, 1e-30)
        out[name] = {"max_rel_vs_scale": float(rel.max()),
                     "p99": float(np.quantile(rel, 0.99))}
        print(json.dumps({"bench": "accuracy", "mode": name, **out[name]}),
              flush=True)
    return out


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    acc = accuracy()
    results = {}
    for n in (512, 2048):
        for k, prec in [(16, "highest"), (16, "default"), (48, "default"),
                        (96, "default"), (96, "highest"), (128, "default"),
                        (256, "default")]:
            results[(k, prec, n)] = time_variant(k, n, prec)
    base = results[(16, "highest", 2048)]
    one = results[(96, "default", 2048)]
    print(json.dumps({
        "verdict": "stacked-K wins" if one < 0.7 * base else "no win",
        "highestK16_us": round(base, 3), "defaultK96_us": round(one, 3),
        "stacked6_err": acc["stacked6"]["max_rel_vs_scale"],
        "highest_err": acc["highest"]["max_rel_vs_scale"],
    }), flush=True)


if __name__ == "__main__":
    main()
