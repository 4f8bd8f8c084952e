"""Packed-payload MXU tracer: per-ommatidium triangle refine + matmul test.

Round-1 evidence (docs/performance.md) showed the fused tracer kernel is
VPU-compute-bound and that cluster-sphere culling had saturated: every ray
swept ~512 (natural) to ~1937 (ofstad arena) triangle SLOTS because the
shortlist granularity was a whole 128-triangle cluster.  This module is the
round-2 hierarchy (VERDICT #1), shaped for the TPU rather than as a per-ray
BVH walk (the reference's equivalent is the GAS/IAS traversal inside
optixTrace, libEyeRenderer3/MulticamScene.cpp:1229-1596 + shaders.cu:149):

  level 1  cone-vs-cluster cull (accel/cull.py, unchanged) -> per-group
           cluster shortlists of ~4-16 clusters.
  level 2  cone-vs-TRIANGLE refine (XLA, eye/pipeline._refine_pack): every
           candidate triangle's bounding sphere is tested against the
           ommatidium acceptance cone, and the survivors are COMPACTED into
           per-group payload rows of 128 triangles.  Measured slot cut on
           the bench scenes: natural 573 -> 117 slots/ray, ofstad arena
           1937 -> 432.  The kernel then consumes a dense, group-local
           (rmax, 16, 512) block via plain BlockSpec pipelining — no manual
           DMA, no shortlist SMEM.

The intersection test itself moves to the MXU.  Each triangle contributes
four 16-feature COLUMNS (only rows 0-9 are live):

    w1   [edge1_cross(3), edge1_diff(3), 0, 0, 0, 0]   (side product -> u)
    w2   [edge2_cross(3), edge2_diff(3), 0, 0, 0, 0]   (side product -> v)
    den  [n(3),           0, 0, 0,       0, 0, 0, 0]   (d . n)
    tnum [0, 0, 0,        0, 0, 0,       n(3),  c0]    (c0 - o . n)

and a ray is the feature 16-vector  F = [d(3), m(3), -o(3), 1, 0 x 6]  with
m = o x d, so ONE  (128, 16) @ (16, 512)  f32 matmul per (ray-batch, row)
step evaluates w1, w2, den and the t numerator for 128 rays x 128 triangles
— the dot products that were ~2/3 of the round-1 kernel's VPU ops now ride
the systolic array, leaving ~18 VPU ops per slot for the divide/compare/
select epilogue (u = w1/den, v = w2/den, t = tnum/den, inside test, winner
update).  Because ray feature columns 10-15 are zero, payload rows 10-15
are free: row 10 of each w1-block lane carries the triangle's global SLOT
id (exact in f32 below 2^24), which the kernel selects into the winner
state so the XLA epilogue can resolve attributes with one row gather
(pipeline.resolve_kernel_hits).

Degenerate/padding triangles are all-zero columns: den = 0 makes u, v, t
NaN/inf and every comparison False, so compaction padding self-masks.

Reference semantics preserved: closest hit over the acceptance-cone sample
set of __raygen__ommatidium (shaders.cu:666-736), both-sided intersection,
t in world units, tmin = focal-point offset (shaders.cu:725).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compound_ray_tpu.trace.pallas_tracer import KERNEL_LEAF, OUT_COMPS

MM_FEATS = 16  # feature rows per column (0-9 live, 10 = slot id on w1)
MM_BLOCKS = 4  # w1 | w2 | den | tnum
MM_COLS = MM_BLOCKS * KERNEL_LEAF  # 512 columns per payload row
RAY_FEATS = 16  # [d, m, -o, 1, 0 x 6]
AUX_COMPS = 8  # [tmin, 0 x 7]
# independent ray-batch chains per row-loop step (see _make_packed_kernel):
# the row step is latency-bound, so independent chains overlap their
# matmul->divide->select dependency chains.  Bit-identical to 1.
from compound_ray_tpu.config import TUNING_PATH, load_tuning  # noqa: E402


def _default_batch_rays() -> int:
    """Rays per in-kernel step: env override > measured-on-TPU tuning > 256.

    The loop body is a short dependent chain (matmul -> divide/compare ->
    select), so small steps are LATENCY-bound: at 128 rays/step the natural
    scene ran ~23k steps x ~1.4 us = 32 ms for ~8 ms of VPU work; 256
    halved the step count.  512 halves it again at the cost of ~8% more
    padded rays (rb_size rounds up to BATCH_RAYS) and 2x the carried
    winner-state registers — the same budget that made unroll_b=2 regress
    2.6x — so it is adopted only by the tools/tpu_session.py batch_rays
    A/B (every value is bit-identical for real rays; speed-only).

    The kernel loops run rb_size // BATCH_RAYS, so a non-dividing value
    would silently leave ray tails untraced; non-256-multiple blocks are
    also a known Mosaic ICE risk (CLAUDE.md).  Env misuse fails loudly; a
    corrupt machine-written tuning.json warns and falls back (it must not
    brick every process at import — same contract as _default_unroll)."""
    v = os.environ.get("CR_TPU_BATCH_RAYS")
    if v is not None:
        rs = int(v)
        assert rs > 0 and rs % 128 == 0, (
            f"CR_TPU_BATCH_RAYS={rs} must be a positive multiple of 128 "
            f"(the lane tile; 256-multiples are safest for Mosaic)")
        return rs
    try:
        rs = int(load_tuning().get("batch_rays", 256))
    except (TypeError, ValueError):
        rs = 0
    if rs <= 0 or rs % 128:
        print(f"[PyEye] warning: ignoring invalid batch_rays in tuning.json "
              f"({load_tuning().get('batch_rays')!r}); using 256")
        return 256
    return rs


BATCH_RAYS = _default_batch_rays()

# max payload rows for the f32x1 stacked-split VMEM scratch (see
# run_packed_tracer): 16 rows x 196 KB = 3.1 MB, safely inside the 16 MB
# scoped-vmem budget next to the payload block and ray stack
_F32X1_SCRATCH_ROWS = 16


def _default_unroll() -> int:
    """Env override > measured-on-TPU tuning file > 1.

    tools/tpu_session.py's unroll A/B writes artifacts/tuning.json when a
    batch-unroll factor beats ub=1 on the real chip; every kernel variant is
    bit-identical across ub (tests/test_pallas_tracer.py), so adopting it
    here changes speed only."""
    v = os.environ.get("CR_TPU_UNROLL_B")
    if v is not None:
        ub = int(v)
        # ub < 1 makes both kernels trace ZERO ray batches (nb // ub and
        # the range(nb % ub) tail are empty for negatives) and emit
        # uninitialised-VMEM frames with no error — same silent-garbage
        # class the BATCH_RAYS assert above guards.  Fail loudly.
        assert ub >= 1, f"CR_TPU_UNROLL_B={ub} must be >= 1"
        return ub
    try:
        ub = int(load_tuning().get("unroll_b", 1))
    except (TypeError, ValueError):
        ub = 0
    if ub < 1:
        # tuning.json is a machine-written artifact: a corrupt value must
        # not brick every process at import — warn and run the default
        print(f"[PyEye] warning: ignoring invalid unroll_b in tuning.json "
              f"({load_tuning().get('unroll_b')!r}); using 1")
        return 1
    return ub


UNROLL_B = _default_unroll()

# intersection math precision.  "highest" is the f32 contract (six bf16
# MXU passes + exact divides — what every CPU oracle test pins);
# "default" is ONE bf16 matmul pass (~6x less MXU work — the matmul
# measured ~12.9 ms of the 34.5 ms @3200 natural kernel at HIGHEST,
# docs/performance.md) plus the VPU's approximate reciprocal on the
# u/v/t divide, at a measured median ~2e-3 relative t error and rare
# hit/miss flips on edge-grazing rays.  "mixed" takes only the matmul
# half of that bargain (one bf16 pass, EXACT divides) — built to separate
# which approximation the round-4 conformance-gate failure came from.
# The answer (session 7b, same-seed control gate on hardware): the BF16
# MATMUL — both lossy modes show an identical 0.92% vs-control MAE on
# the ofstad arena (natural only 0.17%), so neither is globally
# adoptable despite the ~9% frame win.  Both remain A/B-gated via
# tools/tpu_session.py run_precision — never adopted by hand.  (Mosaic
# lowers only DEFAULT and HIGHEST; Precision.HIGH does not lower.)
# "f32x1" is the stacked-K mode: the operands' bf16 hi/mid/lo mask-splits
# are stacked on the CONTRACTION axis (K = 16 -> 96, affine 8 -> 48) and
# ONE DEFAULT-precision dot evaluates the six >=2^-20-relative product
# terms HIGHEST spends six serial passes on — f32-class accuracy at
# ~one-pass MXU cost (see _stack6_a; the skinny-K pass is output-tile
# bound, not K-bound, below the 256-deep systolic array).
_PRECISIONS = ("highest", "mixed", "default", "f32x1")


def _default_precision() -> str:
    """Env override > measured-on-TPU tuning file > "highest"."""
    v = os.environ.get("CR_TPU_PRECISION", "").strip().lower()
    if v:
        assert v in _PRECISIONS, (
            f"CR_TPU_PRECISION={v!r} must be one of {_PRECISIONS}")
        return v
    t = str(load_tuning().get("precision", "highest")).lower()
    return t if t in _PRECISIONS else "highest"


PRECISION = _default_precision()


# Two winner-state redesigns were built against the per-step dissection's
# register-pressure diagnosis and both LOST their hardware A/Bs (round 4,
# artifacts/tuning.json rowmerge_kernel_ms / packw_frame_ms; analysis in
# docs/performance.md):
#   rowmerge (commit 441ef10) -- per-row lane reduction carrying (1, RS)
#     state: natural +11%, ofstad wash.
#   packw (commit 72c031e) -- winner state as two packed int32 buffers:
#     natural 25.2 -> 27.1 ms @3200, ofstad wash.
# Both are deleted (git history keeps them); do not rebuild without fresh
# probe evidence that the carried-buffer count is again the bottleneck.


def _default_direct1() -> bool:
    """Env override > measured-on-TPU tuning file > False.

    direct1 specialises the cnt == 1 chain (the overwhelmingly common
    case on both bench scenes: the natural scene's production plans have
    AT MOST one payload row per group after the far-field split, and the
    ofstad arena averages 1.01 — docs/performance.md "Kernel work
    accounting"): a chain is then init -> ONE row step -> finalize, so
    the winner state never needs to cross a fori_loop boundary at all.
    The row-0 candidates resolve to the output in straight SSA dataflow
    — no loop-carried (RS, 128) buffers, the register-pressure mechanism
    the per-step dissection measured at ~1.46 us/step.  Unlike rowmerge/
    packw (which restructured the carried state and lost), this removes
    the carry entirely for the dominant chain shape and leaves fat
    chains on the standard loop.  Bit-identical to the standard kernel
    (same candidate algebra and winner order), so the tools/
    tpu_session.py direct1 A/B adopts on speed alone."""
    v = os.environ.get("CR_TPU_DIRECT1", "").strip().lower()
    if v:
        return v in ("1", "true", "on", "yes")
    return bool(load_tuning().get("direct1", False))


DIRECT1 = _default_direct1()

_PREC_MAP = {
    "highest": jax.lax.Precision.HIGHEST,
    "mixed": jax.lax.Precision.DEFAULT,  # bf16 matmul, exact divides
    "default": jax.lax.Precision.DEFAULT,
    "f32x1": jax.lax.Precision.DEFAULT,  # stacked-K split operands
}


def _trunc_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """bf16-representable truncation of f32 via mantissa bitmask.

    Deliberately NOT `x.astype(bf16).astype(f32)`: XLA's
    allow-excess-precision pass (on by default) elides precision-REDUCING
    convert round-trips, which silently turns a hi/lo split into
    (x, 0, 0) — measured on hardware 2026-08-19 (tools/microbench_k.py:
    the stacked splits produced BIT-IDENTICAL output to a plain one-pass
    bf16 dot).  Masking the low 16 mantissa bits is the same truncation
    expressed as integer ops the compiler cannot legally fold away."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        xi & jnp.int32(-65536), jnp.float32)  # 0xFFFF0000


def _split3(x: jnp.ndarray):
    """x = h + m + l with h, m bf16-representable (exact under the MXU's
    DEFAULT-precision operand rounding) and l the exact f32 residual
    (rounded to bf16 only inside the dot itself).  Each level captures
    ~8 significand bits; the subtractions are exact (Sterbenz: h shares
    x's exponent and leading bits)."""
    h = _trunc_bf16(x)
    r = x - h
    m = _trunc_bf16(r)
    return h, m, r - m


def _stack6_a(x: jnp.ndarray):
    """A-side stacked-K operand [h, h, m, h, l, m] for the 6-term product
    (pairs with _stack6_b's [h, m, h, l, h, m]): one DEFAULT-precision
    dot over the stacked contraction axis evaluates
    hh + hm + mh + hl + lh + mm — every product term down to ~2^-20
    relative, i.e. f32-class — at ONE MXU pass.  The contraction depth
    grows 6x (16 -> 96, affine 8 -> 48) but stays well under the MXU's
    256-deep systolic array, where per-pass cost is dominated by the
    (rays x slots) output tile, not K — this is the whole trick: HIGHEST
    spends six passes re-streaming the same skinny-K operands."""
    h, m, l = _split3(x)
    return jnp.concatenate([h, h, m, h, l, m], axis=0)


def _stack6_b(x: jnp.ndarray):
    h, m, l = _split3(x)
    return jnp.concatenate([h, m, h, l, h, m], axis=0)


# Occlusion-kernel-only precisions: the plain tiers above plus "bf16x3" —
# a manual hi/lo split (ft = ft_h + ft_l, mm = mm_h + mm_l with the hi
# parts bf16-exact) running THREE one-pass DEFAULT dots
# (ft_h@mm_h + ft_h@mm_l + ft_l@mm_h) instead of HIGHEST's six, for a
# ~1.5e-5 relative product error (vs one-pass bf16's ~4e-3, which the
# round-4 session-15 same-seed gate measured at a disqualifying 9.34%
# lit MAE).  The PRIMARY kernel's bf16x3 was measured dead because its
# t = tnum/den divide amplifies the product error without bound at
# grazing incidence (docs/performance.md negative results); the any-hit
# kernel has NO divide — decisions are sign/interval tests on the folded
# products themselves — so that failure mechanism does not apply here.
_SHADOW_PRECISIONS = _PRECISIONS + ("bf16x3",)


def _default_shadow_precision():
    """Occlusion-kernel-only matmul precision: env > tuning > None (follow
    the global PRECISION).  Separate from PRECISION because the any-hit
    test compares sign-folded products — a one-pass bf16 matmul only
    flips slots at the u/v/t decision boundary, so the lossy mode can be
    safe for shadows on scenes where it fails the primary radiance gate
    (the ofstad 0.92% same-seed failure was t-error in the RADIANCE
    image).  Adoption is gated by tools/tpu_session.py run_shadow_prec's
    same-seed lit control — never adopted by hand."""
    v = os.environ.get("CR_TPU_SHADOW_PRECISION", "").strip().lower()
    if v:
        assert v in _SHADOW_PRECISIONS, (
            f"CR_TPU_SHADOW_PRECISION={v!r} must be one of "
            f"{_SHADOW_PRECISIONS}")
        return v
    t = str(load_tuning().get("shadow_precision", "")).lower()
    return t if t in _SHADOW_PRECISIONS else None


SHADOW_PRECISION = _default_shadow_precision()


def build_mm_features(cluster_set, uv=None, texid=None, rgb=None) -> np.ndarray:
    """(C*128 + 128, 4, 16) per-slot matmul feature columns.

    Row index = global slot id (cluster * 128 + lane); the trailing 128
    all-zero rows are the compaction PAD target (den = 0 -> never hits).
    feats[s, b] is column block b's 16-feature vector for slot s; w1's
    feature 10 carries float(s).

    Ray feature rows 10-15 are zero, so payload rows 10-15 are free of the
    matmul: besides the slot id they carry the per-slot texture-coordinate
    affine constants and texture id (when `uv` (S_valid-indexable
    (uv0, uv1, uv2) corner arrays) and `texid` are given) — the emit_uv
    kernel variant interpolates cu/cv in-register and the epilogue skips
    the winner-attribute gather entirely (each 3.3M-row gather costs a
    flat ~25 ms regardless of table size — docs/performance.md)."""
    from compound_ray_tpu.trace.plucker import triangle_constants

    c, l = cluster_set.tri_id.shape
    assert l == KERNEL_LEAF
    tri = triangle_constants(cluster_set.v0, cluster_set.e1, cluster_set.e2)
    edge6 = np.asarray(tri["edge6"], np.float32)  # (S, 3, 6)
    normal = np.asarray(tri["normal"], np.float32)  # (S, 3)
    c0 = np.asarray(tri["c0"], np.float32)  # (S,)
    s = c * l

    feats = np.zeros((s + KERNEL_LEAF, MM_BLOCKS, MM_FEATS), np.float32)
    feats[:s, 0, 0:6] = edge6[:, 1]  # w1 (edge opposite v1 -> u)
    feats[:s, 0, 10] = np.arange(s, dtype=np.float32)  # slot id
    feats[:s, 1, 0:6] = edge6[:, 2]  # w2 (edge opposite v2 -> v)
    feats[:s, 2, 0:3] = normal  # den = d . n
    feats[:s, 3, 6:9] = normal  # tnum = c0 - o . n  (ray carries -o)
    feats[:s, 3, 9] = c0
    if uv is not None:
        tid = cluster_set.tri_id.reshape(-1)
        safe = np.maximum(tid, 0)
        uv0 = np.asarray(uv[0], np.float32)[safe]
        uv1 = np.asarray(uv[1], np.float32)[safe]
        uv2 = np.asarray(uv[2], np.float32)[safe]
        feats[:s, 0, 11] = uv0[:, 0]
        feats[:s, 0, 12] = uv0[:, 1]
        feats[:s, 0, 13] = uv1[:, 0] - uv0[:, 0]
        feats[:s, 0, 14] = uv1[:, 1] - uv0[:, 1]
        feats[:s, 0, 15] = uv2[:, 0] - uv0[:, 0]
        feats[:s, 1, 10] = uv2[:, 1] - uv0[:, 1]
        feats[:s, 1, 11] = np.asarray(texid, np.float32)
    if rgb is not None:
        # flat-attr scenes (constant material colour, no vertex colours):
        # w2 rows 12-14 carry the per-slot linear base colour so the
        # emit_flat kernel variant can resolve UNtextured winners without
        # any epilogue attribute gather (shaders.cu:813-815 uses the
        # material constant raw)
        feats[:s, 1, 12] = np.asarray(rgb, np.float32)[:, 0]
        feats[:s, 1, 13] = np.asarray(rgb, np.float32)[:, 1]
        feats[:s, 1, 14] = np.asarray(rgb, np.float32)[:, 2]
    return feats


def transform_payload_affine(
    packed_mm: jnp.ndarray,  # (NG, rmax, 16, 512) build_mm_features layout
    o_g: jnp.ndarray,  # (NG, 3) per-group ray origin (g == 1: the omm)
    tmin_g: jnp.ndarray,  # (NG,) per-group tmin (focal offset, world units)
) -> jnp.ndarray:
    """Affine ray factorisation: fold the per-group origin into the payload.

    Every ray feature row is AFFINE in the unit direction d when the origin
    is constant across a group's rays (g == 1: one ommatidium per group):

        F = [d, m, -o', 1, 0 x 6] = B_g @ [d, 1]
        m  = o x d          (rows 3:6  = skew(o))
        -o' = -o - tmin d   (rows 6:9  = [-tmin I | -o])

    so F . P = [d, 1] . (B_g^T P) and the 16-feature matmul collapses to
    K = 4 once B_g^T is pre-applied to the payload — done HERE, once per
    (pose, group), in the same jit as the pack.  Per column block:

        Q_d = P[0:3] + P[3:6] x o - tmin * P[6:9]      (d coefficients)
        Q_c = P[9] - o . P[6:9]                        (constant term)

    The result keeps the (16, 512) row layout: rows 0:3 = Q_d, row 3 = Q_c,
    rows 4:8 zero (the ray vector is [d, 1, 0, 0, 0, 0] so K pads to the
    8-sublane tile and both the 0:8 matmul slice and the 8:16 metadata
    slice stay tile-aligned for Mosaic), rows 8:16 = the original metadata
    rows byte-for-byte (slot ids, texture-coordinate affine constants,
    material colours) — the emit variants read them unchanged.

    Derivation checks (per column block of build_mm_features):
      w1:  d.ec + (o x d).ed = d.(ec + ed x o)            = d . Q_d
      den: P rows 0:3 = n, rest 0                     ->  d . n (unchanged,
           bitwise: Q_d = n exactly, so padding self-masking is preserved)
      tnum: -tmin (d.n) + (c0 - o.n) = c0 - (o + tmin d).n
    """
    p_d = packed_mm[:, :, 0:3, :]  # (NG, rmax, 3, 512)
    p_m = packed_mm[:, :, 3:6, :]
    p_o = packed_mm[:, :, 6:9, :]
    p_1 = packed_mm[:, :, 9, :]  # (NG, rmax, 512)
    o = o_g[:, None, :, None]  # (NG, 1, 3, 1)
    tm = tmin_g[:, None, None, None]
    # v x o for every column vector v = p_m
    cross = jnp.concatenate(
        [
            p_m[:, :, 1:2] * o[:, :, 2:3] - p_m[:, :, 2:3] * o[:, :, 1:2],
            p_m[:, :, 2:3] * o[:, :, 0:1] - p_m[:, :, 0:1] * o[:, :, 2:3],
            p_m[:, :, 0:1] * o[:, :, 1:2] - p_m[:, :, 1:2] * o[:, :, 0:1],
        ],
        axis=2,
    )
    q_d = p_d + cross - tm * p_o
    q_c = p_1 - jnp.sum(o * p_o, axis=2)
    zeros = jnp.zeros_like(packed_mm[:, :, 0:4, :])
    return jnp.concatenate(
        [q_d, q_c[:, :, None, :], zeros, packed_mm[:, :, 8:16, :]], axis=2
    )


def pack_rays_affine(dirs: jnp.ndarray) -> jnp.ndarray:
    """(8, R) PLANAR affine ray features [d, 1, 0, 0, 0, 0] from (R, 3)
    unit dirs — the counterpart of pack_rays_mm for payloads processed by
    transform_payload_affine (origin and tmin live in the payload)."""
    r = dirs.shape[0]
    feats = jnp.concatenate(
        [dirs, jnp.ones((r, 1), jnp.float32), jnp.zeros((r, 4), jnp.float32)],
        axis=-1,
    )
    return jnp.transpose(feats, (1, 0))


def slot_spheres(cluster_set):
    """Per-slot triangle bounding spheres for the cone refine.

    Returns (center (S, 3) f32, radius (S,) f32, valid (S,) bool); padding
    slots get radius -1 so `dist <= radius` and the angular test both fail
    even before the validity mask."""
    v0 = cluster_set.v0
    p1 = v0 + cluster_set.e1
    p2 = v0 + cluster_set.e2
    c = ((v0 + p1 + p2) / 3.0).astype(np.float32)
    r = np.maximum.reduce([
        np.linalg.norm(v0 - c, axis=1),
        np.linalg.norm(p1 - c, axis=1),
        np.linalg.norm(p2 - c, axis=1),
    ]).astype(np.float32)
    valid = cluster_set.tri_id.reshape(-1) >= 0
    r = np.where(valid, r, -1.0).astype(np.float32)
    return c, r, valid


def pack_rays_mm(dirs, origins, tmin):
    """(16, R) PLANAR ray features from (R,3) dirs/origins + (R,) tmin.

    tmin is folded into the origin: o' = o + tmin * d shifts the ray start
    to the tmin sphere, so the kernel's inside test is simply t' >= 0 and
    no aux input exists.  The Plücker moment is tmin-invariant
    (o' x d = o x d + tmin * (d x d) = o x d), preserving the reference's
    focal-offset semantics (shaders.cu:705,725) exactly."""
    o2 = origins + tmin[:, None] * dirs
    m = jnp.cross(origins, dirs)
    r = dirs.shape[0]
    feats = jnp.concatenate(
        [dirs, m, -o2, jnp.ones((r, 1), jnp.float32),
         jnp.zeros((r, RAY_FEATS - 10), jnp.float32)],
        axis=-1,
    )
    return jnp.transpose(feats, (1, 0))


# winner-state layouts per kernel output mode: which state buffers init to
# -1 (id/texid lanes) instead of 0; buffer 0 is always the best-t (init inf)
_EMIT_NEG_INIT = {"bary": (3,), "uv": (3, 4), "uvs": (), "flat": (4, 5),
                  "loc": (3,)}
_EMIT_NBUFS = {"bary": 4, "uv": 5, "uvs": 3, "flat": 6, "loc": 4}


def _row_candidates(p, hi1, hi2, emit, approx_inv=False, j=None):
    """Per-row candidate quantities from the matmul product p (RS, 512) and
    the payload's high feature rows (sublane-aligned (8, 128) ref loads).
    Returns (ok, vals): vals[0] is t and the tuple matches the emit mode's
    winner-state layout (run_packed_tracer docstring).  `j` is the payload
    row index (emit "loc" encodes the winner's GROUP-LOCAL slot index
    j*128 + lane, the key into the per-group one-hot resolve tables —
    pipeline._local_resolve).

    den == 0 (parallel ray or all-zero padding column) -> inv inf -> u/v/t
    inf or NaN -> every comparison False: compaction padding self-masks.

    approx_inv uses the VPU's fast approximate reciprocal (part of the
    precision="default" mode — the divide feeds every candidate's u/v/t,
    so it sits on the latency-bound dependent chain)."""
    w1 = p[:, 0:KERNEL_LEAF]
    w2 = p[:, KERNEL_LEAF:2 * KERNEL_LEAF]
    den = p[:, 2 * KERNEL_LEAF:3 * KERNEL_LEAF]
    tnum = p[:, 3 * KERNEL_LEAF:4 * KERNEL_LEAF]
    inv = pl.reciprocal(den, approx=True) if approx_inv else 1.0 / den
    u = w1 * inv
    v = w2 * inv
    t = tnum * inv
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    if emit == "bary":
        # slot ids ride feature row 10 of the w1 block ([2] of the 8:16
        # load is a register slice)
        return ok, (t, u, v, hi1[2:3, :])
    if emit == "loc":
        # group-LOCAL winner index: payload row j, lane l -> j*128 + l
        # (exact in f32 far below 2^24).  The epilogue resolves attributes
        # against per-group tables with a one-hot MXU contraction instead
        # of a descriptor-rate-bound global row gather.
        loc = (j * KERNEL_LEAF + jax.lax.broadcasted_iota(
            jnp.int32, (1, KERNEL_LEAF), 1)).astype(jnp.float32)
        return ok, (t, u, v, loc)
    # texture-coordinate affine constants (build_mm_features rows 11-15)
    cu = hi1[3:4, :] + u * hi1[5:6, :] + v * hi1[7:8, :]
    cv = hi1[4:5, :] + u * hi1[6:7, :] + v * hi2[2:3, :]
    if emit == "uvs":
        # single-texture scenes: texid is a scene constant, slot id unused
        return ok, (t, cu, cv)
    tex = hi2[3:4, :]
    if emit == "uv":
        return ok, (t, cu, cv, tex, hi1[2:3, :])
    # "flat": polymorphic per slot — textured slots carry (cu, cv),
    # untextured the constant material colour from w2 rows 12-14
    texd = tex >= 0.0  # (1, 128) broadcasts over rays
    a0 = jnp.where(texd, cu, hi2[4:5, :])
    a1 = jnp.where(texd, cv, hi2[5:6, :])
    a2 = jnp.where(texd, 0.0, hi2[6:7, :])
    return ok, (t, a0, a1, a2, tex, hi1[2:3, :])


def _make_packed_kernel(emit: str, ub: int, ray_feats: int = RAY_FEATS,
                        precision: str = "highest",
                        direct1: bool = False):
    """Build the packed tracer kernel for an output mode and batch-unroll
    factor.

    ray_feats = 8 consumes affine-factorised payloads
    (transform_payload_affine): the matmul contracts only payload rows 0:8
    against [d, 1, 0 x 4] rays — the metadata rows 8:16 and the whole
    epilogue are shared with the 16-feature path.

    ub > 1 runs `ub` INDEPENDENT ray batches per row-loop step: the loop
    body is a short dependent chain (matmul -> divide/compare -> select)
    that measured ~1.4 us/step LATENCY-bound (module docstring), so
    independent chains fill the issue slots a single chain leaves empty.
    Different batches touch disjoint rays, so results are bit-identical to
    ub=1 for every ub.  Carried state grows ub x (nbufs x (RS, 128) f32);
    keep ub * nbufs modest — Mosaic has hung compiling loops carrying many
    wide registers (CLAUDE.md).

    precision selects the intersection matmul's MXU mode (module-level
    PRECISION notes: "highest" = exact f32 contract, "default" = one bf16
    pass, A/B-adopted only under the conformance gate).

    direct1 compiles an extra cnt == 1 branch that evaluates the chain as
    straight SSA dataflow (no fori_loop, no carried winner state) — see
    _default_direct1.  Groups with cnt != 1 take the standard loop; the
    branch is selected per grid cell from the prefetched counts.
    Bit-identical by construction (identical candidate algebra and winner
    ordering, identical miss-ray init values)."""
    neg = _EMIT_NEG_INIT[emit]
    nbufs = _EMIT_NBUFS[emit]
    prec = _PREC_MAP[precision]
    f32x1 = precision == "f32x1"

    def kernel(counts_ref, tri_ref, rays_ref, out_ref, *scratch):
        # f32x1 carries a VMEM scratch (rmax, 6*ray_feats, 512) holding the
        # stacked-K split of every live payload row, filled ONCE per grid
        # step: an in-loop split was measured at ~14 us/row-step on
        # hardware (tools/probe_f32x1.py, 2026-08-19) — the concat
        # materialisation sat on the latency-bound dependent chain; the
        # prologue amortises it over all nb ray batches.  Scenes whose
        # rmax exceeds _F32X1_SCRATCH_ROWS get NO scratch (a 76-row
        # conformance scene's 14.9 MB scratch blew the 16 MB scoped-vmem
        # limit on hardware) and split in-loop instead — slower but
        # correct, and fat-rmax scenes are off the hot path
        tri6_ref = scratch[0] if scratch else None
        g = pl.program_id(0)
        cnt = counts_ref[g]
        rb_size = rays_ref.shape[1]
        big = jnp.float32(jnp.inf)
        RS = BATCH_RAYS
        nb = rb_size // RS

        def state_init():
            z = jnp.zeros((RS, KERNEL_LEAF), jnp.float32)
            return tuple(
                jnp.full((RS, KERNEL_LEAF), big) if i == 0
                else (jnp.full((RS, KERNEL_LEAF), -1.0) if i in neg else z)
                for i in range(nbufs)
            )

        def finalize(state, r0):
            # cross-lane winner per ray (first-occurrence argmin)
            bt = state[0]
            tmin_l = jnp.min(bt, axis=1, keepdims=True)  # (RS, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (RS, KERNEL_LEAF), 1)
            cand = jnp.where(bt == tmin_l, lane, KERNEL_LEAF)
            first = jnp.min(cand, axis=1, keepdims=True)
            onehot = lane == first
            out_ref[0:1, pl.ds(r0, RS)] = jnp.where(
                jnp.isfinite(tmin_l), tmin_l, big
            ).reshape(1, RS)
            for i in range(1, nbufs):
                val = jnp.sum(jnp.where(onehot, state[i], 0.0),
                              axis=1, keepdims=True)
                out_ref[i:i + 1, pl.ds(r0, RS)] = val.reshape(1, RS)

        def run_chains(r0s):
            # f32x1: rays are row-loop-invariant, so their stacked-K
            # split is hoisted here — once per chain, not per row
            fts = [
                _stack6_a(rays_ref[:, pl.ds(r0, RS)]) if f32x1
                else rays_ref[:, pl.ds(r0, RS)]
                for r0 in r0s
            ]

            def row_step(j, states):
                # one payload load per row, shared by every chain.
                # Precision is explicit and caller-selected (module
                # PRECISION notes); register-carried winner state: a
                # VMEM-scratch variant measured +69% on the primary frame.
                mm = (tri6_ref[j] if tri6_ref is not None
                      else tri_ref[0, j] if ray_feats == RAY_FEATS
                      else tri_ref[0, j, 0:8, :])  # ((6*)ray_feats, 512)
                if f32x1 and tri6_ref is None:
                    mm = _stack6_b(mm)  # no-scratch fallback (fat rmax)
                hi1 = tri_ref[0, j, 8:16, 0:KERNEL_LEAF]
                hi2 = (tri_ref[0, j, 8:16, KERNEL_LEAF:2 * KERNEL_LEAF]
                       if emit != "bary" else None)
                new = []
                for k, ft in enumerate(fts):
                    p = jax.lax.dot_general(
                        ft, mm, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )  # (RS, 512)
                    ok, vals = _row_candidates(
                        p, hi1, hi2, emit,
                        approx_inv=(precision == "default"), j=j)
                    okk = ok & (vals[0] < states[k][0])
                    new.append(tuple(
                        jnp.where(okk, v, s)
                        for v, s in zip(vals, states[k])
                    ))
                return tuple(new)

            states = jax.lax.fori_loop(
                0, cnt, row_step, tuple(state_init() for _ in r0s)
            )
            for k, r0 in enumerate(r0s):
                finalize(states[k], r0)

        def run_chains_direct(r0s):
            # cnt == 1 specialisation: init -> ONE row step -> finalize
            # means the row-0 candidates ARE the final winner state, so
            # the whole chain is SSA dataflow with no loop-carried
            # (RS, 128) buffers (the ~1.46 us/step register-pressure cost
            # in the per-step dissection).  Algebra is the standard path
            # at cnt == 1 verbatim: okk = ok & (t < init-inf), buffers
            # select between the candidate and their init value, and the
            # finalize argmin/onehot is byte-for-byte finalize()'s —
            # bit-identical including miss rays.
            fts = [
                _stack6_a(rays_ref[:, pl.ds(r0, RS)]) if f32x1
                else rays_ref[:, pl.ds(r0, RS)]
                for r0 in r0s
            ]
            mm = (tri6_ref[0] if tri6_ref is not None
                  else tri_ref[0, 0] if ray_feats == RAY_FEATS
                  else tri_ref[0, 0, 0:8, :])
            if f32x1 and tri6_ref is None:
                mm = _stack6_b(mm)
            hi1 = tri_ref[0, 0, 8:16, 0:KERNEL_LEAF]
            hi2 = (tri_ref[0, 0, 8:16, KERNEL_LEAF:2 * KERNEL_LEAF]
                   if emit != "bary" else None)
            lane = jax.lax.broadcasted_iota(jnp.int32, (RS, KERNEL_LEAF), 1)
            for k, ft in enumerate(fts):
                p = jax.lax.dot_general(
                    ft, mm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (RS, 512)
                ok, vals = _row_candidates(
                    p, hi1, hi2, emit,
                    approx_inv=(precision == "default"), j=0)
                okk = ok & (vals[0] < big)
                bt = jnp.where(okk, vals[0], big)
                tmin_l = jnp.min(bt, axis=1, keepdims=True)  # (RS, 1)
                cand = jnp.where(bt == tmin_l, lane, KERNEL_LEAF)
                first = jnp.min(cand, axis=1, keepdims=True)
                onehot = lane == first
                r0 = r0s[k]
                out_ref[0:1, pl.ds(r0, RS)] = jnp.where(
                    jnp.isfinite(tmin_l), tmin_l, big
                ).reshape(1, RS)
                for i in range(1, nbufs):
                    init = jnp.float32(-1.0 if i in neg else 0.0)
                    sel = jnp.where(okk, vals[i], init)
                    val = jnp.sum(jnp.where(onehot, sel, 0.0),
                                  axis=1, keepdims=True)
                    out_ref[i:i + 1, pl.ds(r0, RS)] = val.reshape(1, RS)

        def batch_loop(chain_fn):
            if ub == 1:
                def one(rbi, _):
                    chain_fn([pl.multiple_of(rbi * RS, RS)])
                    return 0

                jax.lax.fori_loop(0, nb, one, 0)
            else:
                def super_step(sbi, _):
                    base = sbi * ub
                    chain_fn([
                        pl.multiple_of((base + k) * RS, RS)
                        for k in range(ub)
                    ])
                    return 0

                jax.lax.fori_loop(0, nb // ub, super_step, 0)
                # static tail: the batches ub doesn't divide run single-chain
                for k in range(nb % ub):
                    chain_fn(
                        [pl.multiple_of(((nb // ub) * ub + k) * RS, RS)]
                    )

        def fill_scratch(nrows):
            def fill(j, _):
                mm = (tri_ref[0, j] if ray_feats == RAY_FEATS
                      else tri_ref[0, j, 0:8, :])
                tri6_ref[j] = _stack6_b(mm)
                return 0

            jax.lax.fori_loop(0, nrows, fill, 0)

        if direct1:
            @pl.when(cnt == 1)
            def _run_single():
                if tri6_ref is not None:
                    fill_scratch(1)
                batch_loop(run_chains_direct)

            @pl.when(cnt > 1)
            def _run_multi():
                if tri6_ref is not None:
                    fill_scratch(cnt)
                batch_loop(run_chains)
        else:
            @pl.when(cnt > 0)
            def _run_batches():
                if tri6_ref is not None:
                    fill_scratch(cnt)
                batch_loop(run_chains)

    return kernel


def _make_rows_occlusion_kernel(ub: int, precision: str = "highest",
                                rpb: int = 1, rs: int = None):
    """Row-block shadow traversal: grid = (NRB, TB) over BLOCKS of rpb
    occluder rows packed side by side on the slot axis — step (rb, r)
    tests block r's rpb rows against its (light, group) virtual group's
    ray block with ONE (RS, 16) x (16, rpb*512) MXU dot, so the
    latency-bound grid step count shrinks rpb-fold (occlusion virtual
    groups average tens of contiguous rows, unlike the primary kernel's
    ~1/group where this would not pay).  Blocks of one virtual group are
    contiguous, so the revisited out block stays VMEM-resident; flag 2 =
    first block of its group (initialise), 1 = live block, 0 = padding
    (skip).  Virtual groups with zero rows are never visited — the caller
    masks their (uninitialised) lanes via the counts table.

    ANY-HIT semantics (traceOcclusion, shaders.cu:135-163): out is 1.0
    where some occluder lies strictly between the ray origin and t = 1
    in the ray's own parameterisation (the caller scales the shadow
    direction so t = 1 lands at the light minus its epsilon band), else
    0.0.  The u/v/t tests run on sign-folded PRODUCTS — a = w1*s,
    b = w2*s, d = den*s, tt = tnum*s with s = sign(den) — so the kernel
    does no division at all: u >= 0 iff a >= 0, u+v <= 1 iff a+b <= d,
    0 <= t <= 1 iff 0 <= tt <= d, for either sign of den.  d > 0 guards
    degenerate slots: all-zero padding rows (and rpb tail padding) yield
    den == 0 and can never report a hit.

    ub independent ray-batch chains run per loop step (same latency
    rationale and bit-identical argument as _make_packed_kernel);
    precision as in _make_packed_kernel (no reciprocal here to care
    about — only the matmul pass count).  "bf16x3" splits both operands
    hi/lo IN-KERNEL (keeps the 8-row table DMA the reverse-affine layout
    bought; the split is O(K x N) VPU work against O(RS x K x N) MXU
    work) and runs three one-pass dots — see _SHADOW_PRECISIONS."""
    bf16x3 = precision == "bf16x3"
    f32x1 = precision == "f32x1"
    prec = _PREC_MAP["default" if bf16x3 else precision]
    if rs is None:
        rs = BATCH_RAYS

    def kernel(r2v_ref, flag_ref, tri_ref, rays_ref, out_ref):
        del r2v_ref  # consumed by the BlockSpec index maps only
        r = pl.program_id(1)
        f = flag_ref[r]
        rb_size = rays_ref.shape[1]
        nb = rb_size // rs

        @pl.when(f == 2)
        def _init():
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

        @pl.when(f >= 1)
        def _test_block():
            mm = tri_ref[0]  # (16, rpb*512)
            if bf16x3:
                mm_h = mm.astype(jnp.bfloat16).astype(jnp.float32)
                mm_l = mm - mm_h
            elif f32x1:
                # stacked once per grid step, shared by every ray batch
                mm = _stack6_b(mm)  # (6*F, rpb*512)

            def _dot(a, b):
                return jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

            def one_batch(r0):
                ft = rays_ref[:, pl.ds(r0, rs)]  # (16, RS)
                if bf16x3:
                    # DEFAULT rounds operands to bf16; the hi parts are
                    # bf16-exact, so the three passes compute
                    # ft_h@mm_h + ft_h@mm_l + ft_l@mm_h in full —
                    # dropping only the ~2^-16-relative ft_l@mm_l term.
                    # (Round-4 session-16 hardware gate: 3.41% lit MAE —
                    # partly the missing term, partly that astype splits
                    # are foldable by the compiler; superseded by f32x1's
                    # mask splits + single stacked dot.)
                    ft_h = ft.astype(jnp.bfloat16).astype(jnp.float32)
                    ft_l = ft - ft_h
                    p = _dot(ft_h, mm_h) + _dot(ft_h, mm_l) \
                        + _dot(ft_l, mm_h)
                else:
                    if f32x1:
                        ft = _stack6_a(ft)  # (6*F, RS)
                    p = _dot(ft, mm)  # (RS, rpb*512)
                occ = None
                for k in range(rpb):
                    base = k * MM_COLS
                    w1 = p[:, base:base + KERNEL_LEAF]
                    w2 = p[:, base + KERNEL_LEAF:base + 2 * KERNEL_LEAF]
                    den = p[:, base + 2 * KERNEL_LEAF:
                            base + 3 * KERNEL_LEAF]
                    tnum = p[:, base + 3 * KERNEL_LEAF:
                             base + 4 * KERNEL_LEAF]
                    s = jnp.where(den >= 0.0, 1.0, -1.0)
                    a = w1 * s
                    b = w2 * s
                    d = den * s
                    tt = tnum * s
                    ok = ((a >= 0.0) & (b >= 0.0) & (a + b <= d)
                          & (tt >= 0.0) & (tt <= d) & (d > 0.0))
                    occ = ok if occ is None else (occ | ok)
                hit = jnp.max(
                    jnp.where(occ, 1.0, 0.0), axis=1)  # (RS,)
                cur = out_ref[0:1, pl.ds(r0, rs)]
                out_ref[0:1, pl.ds(r0, rs)] = jnp.maximum(
                    cur, hit.reshape(1, rs)
                )

            def ray_batch(sbi, _):
                for k in range(ub):
                    one_batch(
                        pl.multiple_of((sbi * ub + k) * rs, rs))
                return 0

            jax.lax.fori_loop(0, nb // ub, ray_batch, 0)
            for k in range(nb % ub):
                one_batch(
                    pl.multiple_of(((nb // ub) * ub + k) * rs, rs))

    return kernel


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit, static_argnames=("nrb", "rb_size", "unroll_b", "precision",
                              "batch_rays"))
def run_rows_occlusion(
    r2v: jnp.ndarray,  # (TB,) int32 block -> virtual group (light*NG + g)
    flag: jnp.ndarray,  # (TB,) int32: 2 first-of-group, 1 live, 0 padding
    flat_rows: jnp.ndarray,  # (TB, F, rpb*512) row-block payload table
    rays: jnp.ndarray,  # (F, NVG*NRB*rb_size) f32 PLANAR shadow rays
    nrb: int,
    rb_size: int,
    unroll_b: Optional[int] = None,
    precision: Optional[str] = None,
    batch_rays: Optional[int] = None,
) -> jnp.ndarray:
    """Any-hit along shadow rays, (1, R) planar; 1.0 = occluded within
    t in [0, 1] of the ray's own parameterisation, 0.0 = clear
    (traceOcclusion semantics, shaders.cu:135-163 — the caller scales the
    shadow direction so t = 1 is one segment endpoint).  The caller must
    mask ray lanes whose virtual group has zero rows (their out block is
    never initialised).  All lights trace in ONE dispatch: the ray vector
    stacks each light's group-major block, virtual group = light*NG + g,
    and the table's row BLOCKS (rpb rows side by side on the slot axis,
    rpb = flat_rows.shape[2] // 512) are sorted by virtual group (see
    _shadow_plan).

    The feature count F rides the shapes: 8 = reverse affine rays
    ([D, 1, 0 x 4] against transform_payload_affine'd rows — the
    production _shadow_plan layout, which drops the metadata rows the
    occlusion test never reads), 16 = plain pack_rays_mm features.

    batch_rays: rays per in-kernel step (None = the global BATCH_RAYS).
    Shadow-only: the any-hit kernel carries NO per-ray winner state, so
    wider batches shrink the latency-bound step count without the primary
    kernel's 512-ray register cliff.  Bit-identical across values —
    batches partition the rays (tests/test_pallas_tracer.py)."""
    rs = batch_rays if batch_rays is not None else BATCH_RAYS
    assert rs > 0 and rs % 128 == 0, (
        f"batch_rays={rs} must be a positive multiple of 128 (lane tile)")
    assert rb_size % rs == 0, (
        f"rb_size={rb_size} must be a multiple of batch_rays={rs}")
    if unroll_b is None:
        unroll_b = UNROLL_B
    assert unroll_b >= 1, (
        f"unroll_b={unroll_b} must be >= 1 (ub < 1 traces zero ray "
        f"batches and emits uninitialised frames)")
    if precision is None:
        precision = SHADOW_PRECISION or PRECISION
    assert precision in _SHADOW_PRECISIONS, precision
    assert flat_rows.shape[2] % MM_COLS == 0, flat_rows.shape
    rpb = flat_rows.shape[2] // MM_COLS
    feats = flat_rows.shape[1]
    assert rays.shape[0] == feats, (rays.shape, flat_rows.shape)
    tb_pad = flat_rows.shape[0]
    assert r2v.shape == (tb_pad,) and flag.shape == (tb_pad,), (
        r2v.shape, flag.shape, flat_rows.shape)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb, tb_pad),
        in_specs=[
            pl.BlockSpec(
                (1, feats, rpb * MM_COLS),
                lambda rb, r, r2v, flag: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (feats, rb_size),
                lambda rb, r, r2v, flag: (0, r2v[r] * nrb + rb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb_size),
            lambda rb, r, r2v, flag: (0, r2v[r] * nrb + rb),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_rows_occlusion_kernel(unroll_b, precision, rpb, rs),
        out_shape=jax.ShapeDtypeStruct((1, rays.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(r2v, flag, flat_rows, rays)


@functools.partial(
    jax.jit,
    static_argnames=("ng", "nrb", "rb_size", "rmax", "emit", "unroll_b",
                     "ray_feats", "precision", "direct1"),
)
def run_packed_tracer(
    row_counts: jnp.ndarray,  # (NG,) int32 payload rows per group
    packed_mm: jnp.ndarray,  # (NG, rmax, 16, 512) f32
    rays: jnp.ndarray,  # (ray_feats, NG*NRB*RB) f32 PLANAR
    ng: int,
    nrb: int,
    rb_size: int,
    rmax: int,
    emit: str = "bary",
    unroll_b: Optional[int] = None,
    ray_feats: int = RAY_FEATS,
    precision: Optional[str] = None,
    direct1: Optional[bool] = None,
) -> jnp.ndarray:
    """Returns PLANAR (8, R) rows; t = +inf on miss.  Row layout by emit:
    "bary": [t, u, v, slot-id, 0...] (barycentrics; the epilogue resolves
    attributes with a row gather); "uv": [t, cu, cv, texid, slot-id, 0...]
    (texture coordinates interpolated in-kernel — tex_only scenes);
    "uvs": [t, cu, cv, 0...] (single-texture tex_only scenes: texid is a
    scene constant and the slot id is unused, so the winner state drops to
    three buffers); "flat": [t, a0, a1, a2, texid, slot-id, 0, 0]
    (polymorphic: (cu, cv) for textured winners, the constant material
    (r, g, b) for untextured — flat-attr scenes need no attribute gather
    either).

    Ray features arrive and results leave feature-major: both sides of the
    kernel then connect to the pipeline's component-planar math with plain
    reshapes — no (R, 16)/(R, 8) transposes anywhere on the frame path.

    Groups with row_counts == 0 skip all work and emit garbage rows — the
    epilogue must mask whole groups by count (same contract as
    run_tracer_kernel).

    unroll_b > 1 runs that many independent ray-batch chains per row-loop
    step (bit-identical to 1 — see _make_packed_kernel); None uses the
    UNROLL_B env default.

    ray_feats = 8: `rays` is pack_rays_affine features ([d, 1, 0 x 4]) and
    `packed_mm` has been transform_payload_affine'd for this pose.

    precision: "highest" (exact f32) or "default" (one bf16 MXU pass);
    None uses the module PRECISION default (tuning-adopted — see the
    module-level notes on the accuracy contract).

    direct1: compile the cnt == 1 SSA fast path next to the standard loop
    (bit-identical — see _default_direct1; None uses the tuning-adopted
    DIRECT1 default)."""
    # the payload's affine-ness is tracked only by the flag the callers
    # thread through — catch the forgotten-flag mix-up structurally (shapes
    # are static under jit, so this is free)
    assert rays.shape[0] == ray_feats, (
        f"rays carry {rays.shape[0]} features but ray_feats={ray_feats}")
    assert rb_size % BATCH_RAYS == 0, (
        f"rb_size={rb_size} must be a multiple of BATCH_RAYS={BATCH_RAYS} "
        f"(the kernel traces rb_size // BATCH_RAYS steps — a remainder "
        f"would go untraced)")
    if unroll_b is None:
        unroll_b = UNROLL_B
    if direct1 is None:
        direct1 = DIRECT1
    assert unroll_b >= 1, (
        f"unroll_b={unroll_b} must be >= 1 (ub < 1 traces zero ray "
        f"batches and emits uninitialised frames)")
    if precision is None:
        precision = PRECISION
    # the stacked-split scratch scales with rmax: (rmax, 6*rf, 512) f32 =
    # rmax * 196 KB (rf=16).  A 76-row conformance scene measured a scoped
    # -vmem OOM at 19.07 MB (limit 16); cap the prologue path at rmax <=
    # _F32X1_SCRATCH_ROWS (bench scenes sit at <= 8) and let fatter scenes
    # take the slower in-loop split
    scratch = ([pltpu.VMEM((rmax, 6 * ray_feats, MM_COLS), jnp.float32)]
               if precision == "f32x1" and rmax <= _F32X1_SCRATCH_ROWS
               else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, nrb),
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec(
                (1, rmax, MM_FEATS, MM_COLS),
                lambda g, rb, counts: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ray_feats, rb_size),
                lambda g, rb, counts: (0, g * nrb + rb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (OUT_COMPS, rb_size),
            lambda g, rb, counts: (0, g * nrb + rb),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_packed_kernel(emit, unroll_b, ray_feats, precision,
                            direct1=direct1),
        out_shape=jax.ShapeDtypeStruct((OUT_COMPS, rays.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(row_counts, packed_mm, rays)
