"""Runtime configuration (replaces the reference's compile-time layer).

The reference's configuration is split across CMake defines, constexpr debug
flags, and BUFFER_TYPE macros (SURVEY.md §5 'Config / flag system' layers
2-3).  Here everything is a runtime dataclass, overridable from the
environment (CR_TPU_* variables) or a JSON file — no rebuilds.

The glTF 'extras' schema (layer 1) is unchanged and documented in
docs/scene-extras.md; .eye files (layer 2's data part) keep their format.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

# measured-on-TPU adoptions (tools/tpu_session.py A/B stages) — the single
# shared location; trace/mm_tracer.py imports this constant so the producer
# and both consumers can never drift apart
TUNING_PATH = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "tuning.json")


def _env_bool(s: str) -> bool:
    """Case-insensitive boolean env parsing where the EMPTY string is
    false: `CR_TPU_AFFINE_RAYS=` must disable the feature (the repo's own
    empty-means-off convention, e.g. PALLAS_AXON_POOL_IPS=), and "False"/
    "OFF" must not silently enable it."""
    return s.strip().lower() not in ("", "0", "false", "off", "no")


def load_tuning() -> dict:
    try:
        with open(TUNING_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


@dataclasses.dataclass
class RenderConfig:
    # backend: "auto" (pallas on TPU, culled XLA elsewhere), "pallas", "xla",
    # "naive"
    backend: str = "auto"
    # Gaussian truncation for cone culling, in standard deviations.
    # P(outside 4 sigma) ~ 6.3e-5 — two orders under the 1% fidelity budget.
    cull_sigmas: float = 4.0
    # triangles per cluster for the XLA culled path
    xla_leaf_size: int = 16
    # scenes below this triangle count use the dense brute-force sweep
    min_triangles_for_culling: int = 512
    # XLA culled-path chunking
    omm_chunk: int = 64
    sample_chunk: int = 64
    # base RNG seed (the reference's curand_init(42, ...), shaders.cu:689)
    base_seed: int = 42
    # far-field radiance cache: "auto" renders geometry beyond the
    # parallax-safe distance once per frame into a shared equirect cache from
    # the eye centre and lets per-sample rays trace only near clusters.
    # Angular error is bounded by eye_extent / distance < farfield_tolerance
    # * sigma (the cone jitter sd). "off" disables.
    farfield: str = "auto"
    farfield_tolerance: float = 0.25
    farfield_cache_width: int = 1024  # equirect width; height = width // 2
    # pose-keyed plan caches (ScenePlan.packed_store / shadow_store): entries
    # kept before evicting oldest.  A GA loop alternating P poses needs
    # >= P entries to avoid re-packing every frame (each re-pack is a full
    # cull+refine+gather of 100s of MB); each packed entry is
    # NG * rmax * 32 KB of HBM, so the default trades ~0.5 GB for thrash-free
    # 4-pose sweeps.
    # shadow_store matches packed_store: a lit GA sweep thrashes (probe
    # trace + per-light pack + host syncs per frame) if its poses fit the
    # packed store but not the shadow store
    packed_store_size: int = 4
    shadow_store_size: int = 4
    # level-2 refine test: "exact" = spherical-projection cone-vs-triangle
    # (tight for sliver-heavy closed arenas); "sphere" = triangle bounding
    # spheres only (round-2 behaviour).  Plan-time only — memoised per pose.
    refine_mode: str = "exact"
    # store the unified texture+cache quad table in bfloat16 when its f32
    # form exceeds the measured ~64 MB per-ray-gather cliff
    # (docs/performance.md): halves the bytes, adds <=0.4% relative texel
    # error (inside the 1% fidelity budget).  0 disables.
    big_table_bf16_bytes: int = 64_000_000
    # affine ray factorisation (trace/mm_tracer.transform_payload_affine):
    # fold the per-group origin/tmin into the pose-memoised payload so the
    # hot path traces [d, 1] rays — half the planar ray stack, no cross
    # products.  Applies to frames with one ommatidium per group (the
    # headline regime); numerically equivalent but NOT bit-identical
    # to the 16-feature path (one extra pack-time rounding), so it ships
    # default-off until the TPU A/B (tools/tpu_session.py) adopts it via
    # artifacts/tuning.json.
    affine_rays: bool = False
    # lit frames resolve winner attributes + shading basis via a one-hot
    # MXU contraction against pose-memoised PER-GROUP local tables
    # (pipeline._local_resolve) instead of two descriptor-rate-bound
    # per-ray global row gathers (~16.6 + ~16 ms per 1e6 rays).
    # Bit-identical resolve values; default on (escape hatch for A/Bs).
    lit_local_resolve: bool = True
    # corrective-shadow-audit trigger: flip leaking groups to guaranteed
    # candidate-extent bounds only when the leak FRACTION exceeds this
    # (the documented image-error bound is ~frac x local light term, so
    # 2e-3 keeps the worst bias an order below the 1% conformance band;
    # sub-threshold leaks warn with the bound stated).  0 = always flip.
    shadow_leak_tolerance: float = 2e-3
    # sky split (eye/pipeline SKY SPLIT notes): steady-state frames at a
    # MEMOISED pose compact the planned-live groups (row_counts > 0) and
    # serve every zero-row group — a shaft the conservative cull proved
    # empty of near geometry, whose samples are pure far-field cache
    # lookups — its pose-memoised acceptance-distribution EXPECTATION
    # (deterministic quadrature over the same cache).  At the natural
    # bench pose only 386/1000 groups are live, so raygen, the RNG draw,
    # and the count-bound epilogue gathers all shrink ~2.6x.  The sky
    # value is the exact mean the sample estimator converges to, but
    # frames are NOT bit-identical to the dense path (live groups draw
    # different RNG rows; sky groups lose their sampling noise), so it
    # ships default-off until the TPU A/B (tools/tpu_session.py "sky"
    # stage) adopts it under the full-conformance gate.
    sky_split: bool = False
    # sky-split quadrature nodes (splay quantiles x spin grid) for the
    # per-ommatidium cache expectation — plan-time cost only
    sky_quad_splay: int = 16
    sky_quad_spin: int = 8
    # unseen-pose planning: True packs speculatively at the eye's high-water
    # widths and validates the pack's own need counters with ONE host sync
    # (overflow re-measures exactly); False always measures widths first
    # (two planning dispatches + two syncs per unseen pose — each sync is a
    # ~26 ms transport round trip on the tunnelled TPU, the dominant cost of
    # GA-style pose sweeps)
    speculative_widths: bool = True
    # lit shadow planning: the per-light probe refine and dense pack
    # materialise ~(groups, clusters*128) temporaries; at full probe width
    # on a 256-cluster scene the unchunked forms want >15 GB of HBM (the
    # round-4 lit OOM).  Both are chunked over the group axis in blocks of
    # this many groups — peak plan-time HBM scales linearly with it.
    shadow_pack_chunk: int = 128
    # occlusion-kernel rows per grid step (trace/mm_tracer
    # run_rows_occlusion): the shadow table packs this many occluder rows
    # side by side on the slot axis, so one latency-bound grid step tests
    # rpb rows with ONE wide MXU dot.  Occlusion virtual groups average
    # tens of contiguous rows (unlike the primary kernel's ~1/group), so
    # amortising the ~µs step latency is the measured lit lever; padding
    # rows are all-zero (den == 0 can never pass the any-hit test).  Must
    # divide 64 (the shard row-padding quantum).  Adopted via tuning.json
    # after the tpu_session "shadow" A/B; 1 = per-row grid (round-3 shape).
    shadow_rpb: int = 1
    # occlusion-kernel rays per in-kernel step (trace/mm_tracer
    # run_rows_occlusion batch_rays).  Unlike the primary kernel's
    # BATCH_RAYS (whose 512 variant regressed on the carried winner-state
    # register cliff), the any-hit kernel carries NO per-ray state across
    # rows — wider batches halve the latency-bound step count with only
    # transient register growth, so the cliff mechanism does not apply.
    # Used only when it divides the frame's ray-block size (else the
    # kernel falls back to the global BATCH_RAYS).  Adopted via
    # tuning.json after the tpu_session "shadow_rs" A/B (bit-identical
    # across values — batches partition rays).
    shadow_batch_rays: int = 256
    # verbosity of the [PyEye] log lines
    verbose: bool = True

    @classmethod
    def from_env(cls, base: Optional["RenderConfig"] = None) -> "RenderConfig":
        cfg = dataclasses.replace(base) if base else cls()
        mapping = {
            "CR_TPU_BACKEND": ("backend", str),
            "CR_TPU_CULL_SIGMAS": ("cull_sigmas", float),
            "CR_TPU_LEAF_SIZE": ("xla_leaf_size", int),
            "CR_TPU_MIN_TRIS_CULL": ("min_triangles_for_culling", int),
            "CR_TPU_OMM_CHUNK": ("omm_chunk", int),
            "CR_TPU_SAMPLE_CHUNK": ("sample_chunk", int),
            "CR_TPU_SEED": ("base_seed", int),
            "CR_TPU_FARFIELD": ("farfield", str),
            "CR_TPU_FARFIELD_TOL": ("farfield_tolerance", float),
            "CR_TPU_FARFIELD_WIDTH": ("farfield_cache_width", int),
            "CR_TPU_PACKED_STORE": ("packed_store_size", int),
            "CR_TPU_SHADOW_STORE": ("shadow_store_size", int),
            "CR_TPU_REFINE": ("refine_mode", str),
            "CR_TPU_BF16_TABLE": ("big_table_bf16_bytes", int),
            "CR_TPU_SPEC_WIDTHS": ("speculative_widths", _env_bool),
            "CR_TPU_SHADOW_CHUNK": ("shadow_pack_chunk", int),
            "CR_TPU_AFFINE_RAYS": ("affine_rays", _env_bool),
            "CR_TPU_LIT_LOCAL": ("lit_local_resolve", _env_bool),
            "CR_TPU_SHADOW_LEAK_TOL": ("shadow_leak_tolerance", float),
            "CR_TPU_SKY_SPLIT": ("sky_split", _env_bool),
            "CR_TPU_SKY_QUAD_SPLAY": ("sky_quad_splay", int),
            "CR_TPU_SKY_QUAD_SPIN": ("sky_quad_spin", int),
            "CR_TPU_SHADOW_RPB": ("shadow_rpb", int),
            "CR_TPU_SHADOW_BATCH_RAYS": ("shadow_batch_rays", int),
        }
        # measured-on-TPU adoptions apply below env defaults: an explicit
        # CR_TPU_* always wins
        tuning = load_tuning()
        if "affine_rays" in tuning and "CR_TPU_AFFINE_RAYS" not in os.environ:
            cfg.affine_rays = bool(tuning["affine_rays"])
        if "sky_split" in tuning and "CR_TPU_SKY_SPLIT" not in os.environ:
            cfg.sky_split = bool(tuning["sky_split"])
        if ("lit_local_resolve" in tuning
                and "CR_TPU_LIT_LOCAL" not in os.environ):
            cfg.lit_local_resolve = bool(tuning["lit_local_resolve"])
        if "shadow_rpb" in tuning and "CR_TPU_SHADOW_RPB" not in os.environ:
            cfg.shadow_rpb = int(tuning["shadow_rpb"])
        if ("shadow_batch_rays" in tuning
                and "CR_TPU_SHADOW_BATCH_RAYS" not in os.environ):
            cfg.shadow_batch_rays = int(tuning["shadow_batch_rays"])
        for env, (field, typ) in mapping.items():
            raw = os.environ.get(env)
            if not raw:
                continue  # absent or empty (`CR_TPU_X= cmd` means "unset")
            try:
                setattr(cfg, field, typ(raw))
            except ValueError:
                raise ValueError(
                    f"{env}={raw!r} is not a valid {typ.__name__}"
                ) from None
        return cfg

    @classmethod
    def from_json(cls, path: str) -> "RenderConfig":
        with open(path) as f:
            data = json.load(f)
        return cls(**data)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=1)


_global_config: Optional[RenderConfig] = None


def get_config() -> RenderConfig:
    global _global_config
    if _global_config is None:
        _global_config = RenderConfig.from_env()
    return _global_config


def set_config(cfg: RenderConfig) -> None:
    global _global_config
    _global_config = cfg
