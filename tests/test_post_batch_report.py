"""tools/post_batch_report.py: the measured-batch -> docs renderer.

The generator is the last unattended step of the tunnel-watchdog batch
(PLAN.md round 4), so its splice/render paths must be pinned: markers are
replaced in place and idempotently, partial artifacts degrade gracefully,
and the numbers that reach the README come from bench_detail.json, not
from any stale prose.
"""

import json
import os

import pytest

from tools import post_batch_report as pbr


@pytest.fixture()
def sandbox(tmp_path, monkeypatch):
    """A fake repo root with batch artifacts + marked docs."""
    (tmp_path / "artifacts").mkdir()
    (tmp_path / "docs").mkdir()
    detail = {
        "scene": "natural-standin-sky", "ommatidia": 1000, "frames": 10,
        "sweep": {
            "1": {"pipelined_ms": 2.0, "latency_ms": 30.0,
                  "rays_per_s": 1000 / 2.0e-3},
            "3200": {"pipelined_ms": 40.0, "latency_ms": 70.0,
                     "rays_per_s": 1000 * 3200 / 40.0e-3},
        },
        "ofstad": {"3200": {"pipelined_ms": 100.0, "latency_ms": 130.0,
                            "rays_per_s": 1000 * 3200 / 0.1}},
        "burst_samples1": {"frames": 256, "ms_per_frame": 1.5,
                           "fps": 1000 / 1.5},
        "pose_sweep": {"samples": 100, "poses": 20,
                       "sequential_ms_per_pose": 60.0,
                       "batched_ms_per_pose": 8.0},
        "lit_natural": {"scene": "natural-standin-sky", "samples": 1000,
                        "frames": 6, "lights": 4,
                        "unlit_pipelined_ms": 19.0,
                        "lit_pipelined_ms": 47.5, "factor": 2.5,
                        "lit_1light_pipelined_ms": 26.5,
                        "per_light_ms": 7.0, "lit_fixed_ms": 0.5},
        "scale_10000": {"scene": "natural-standin-sky", "ommatidia": 1000,
                        "samples": 10000, "pipelined_ms": 120.0,
                        "latency_ms": 150.0, "rays_per_s": 8.3e7},
        "tuning": {"unroll_b": 2, "affine_rays": True,
                   "precision": "highest", "fast_equirect": True},
    }
    (tmp_path / "bench_detail.json").write_text(json.dumps(detail))
    tuning = {
        "unroll_b": 2,
        "unroll_kernel_ms": {"natural": {"1": 23.0, "2": 18.0, "4": 19.0}},
        "affine_rays": True,
        "affine_frame_ms": {"natural": {"off": 52.0, "on": 47.0}},
        "precision": "highest",
        "precision_frame_ms": {"natural": {"highest": 47.0, "default": 40.0}},
        "precision_gate_headline_mae_pct": 1.7,
        "fast_equirect": True,
        "equirect_frame_ms": {"natural": {"exact": 47.0, "fast": 44.0}},
        "unroll8_frame_ms": {"natural": {"4": 47.0, "8": 46.5}},
        "measured": "2026-08-18 15:00 UTC",
    }
    (tmp_path / "artifacts" / "tuning.json").write_text(json.dumps(tuning))
    anatomy = {"natural": {"samples": 3200, "platform": "tpu",
                           "measured": "2026-08-18 15:10 UTC",
                           "tuning": {"unroll_b": 2},
                           "stages_ms": {"raygen+pack": 4.1,
                                         "raygen-free kernel": 18.0,
                                         "full frame (fused)": 40.0}}}
    (tmp_path / "artifacts" / "anatomy.json").write_text(json.dumps(anatomy))
    (tmp_path / "artifacts" / "conformance.json").write_text(json.dumps(
        {"platform": "tpu", "worst_headline_mae_pct": 0.541}))
    (tmp_path / "artifacts" / "bench_lkg.json").write_text(json.dumps(
        {"value": 8.0e7, "measured": "2026-08-18 15:05 UTC",
         "tuning": detail["tuning"]}))
    (tmp_path / "README.md").write_text(
        "# x\n<!-- MEASURED-HEADLINE:BEGIN -->\nold prose\n"
        "<!-- MEASURED-HEADLINE:END -->\ntail\n")
    (tmp_path / "docs" / "performance.md").write_text(
        "# perf\n<!-- MEASURED-BATCH:BEGIN -->\npending\n"
        "<!-- MEASURED-BATCH:END -->\nhistory\n")
    monkeypatch.setattr(pbr, "ROOT", str(tmp_path))
    return tmp_path


def test_full_render_and_splice(sandbox):
    pbr.main([])
    readme = (sandbox / "README.md").read_text()
    perf = (sandbox / "docs" / "performance.md").read_text()
    # markers survive (idempotent re-runs), old prose replaced
    assert readme.count("<!-- MEASURED-HEADLINE:BEGIN -->") == 1
    assert "old prose" not in readme
    assert "tail" in readme
    # the headline derives from the LARGEST sweep entry
    assert "40.0 ms/frame pipelined" in readme
    assert "8.00e+07 ommatidial rays/s" in readme
    # ofstad + burst + measured stamp make it into the README
    assert "100.0 ms" in readme and "667 FPS" in readme
    assert "2026-08-18 15:05 UTC" in readme
    # perf section: sweep rows, lit factor, scale, adoptions, anatomy,
    # conformance
    assert "pending" not in perf and "history" in perf
    assert "| natural-standin-sky @3200 | 40.00" in perf
    assert "2.5× lighting factor" in perf
    # light-count split renders marginal + fixed from the lit entry
    assert "marginal **7.00 ms/light**" in perf
    assert "**0.50 ms fixed**" in perf
    assert "O(omms) memory" in perf
    assert "unroll_b=2" in perf
    assert "natural 23.0→18.0→19.0 (1/2/4)" in perf
    # ub=8 escalation row: measured but not adopted (unroll_b stayed 2)
    assert "| ub=8 escalation (full frame) | **off** " in perf
    assert "natural 47.0→46.5 (4/8)" in perf
    assert "natural 52.0→47.0 (off/on)" in perf
    # precision stayed at highest because the gate failed: both facts shown
    assert "**highest**" in perf and "gate worst headline MAE 1.700%" in perf
    assert "raygen-free kernel | 18.0" in perf
    assert "worst headline MAE **0.541%**" in perf


def test_rerun_is_stable(sandbox):
    pbr.main([])
    first = (sandbox / "README.md").read_text()
    pbr.main([])
    assert (sandbox / "README.md").read_text() == first


def test_missing_artifacts_degrade(sandbox):
    for p in ("bench_detail.json", "artifacts/tuning.json",
              "artifacts/anatomy.json", "artifacts/conformance.json",
              "artifacts/bench_lkg.json"):
        os.remove(sandbox / p)
    pbr.main([])  # must not raise
    readme = (sandbox / "README.md").read_text()
    perf = (sandbox / "docs" / "performance.md").read_text()
    assert "old prose" in readme  # headline left alone without a sweep
    assert "_No batch artifacts found yet._" in perf


def test_missing_markers_skip(sandbox):
    (sandbox / "README.md").write_text("no markers here\n")
    pbr.main([])  # must not raise
    assert (sandbox / "README.md").read_text() == "no markers here\n"


def test_bench_write_detail_preserves_foreign_keys(tmp_path):
    """bench.run_protocol's detail write must refresh its own keys without
    clobbering other stages' merged entries (lit/scale), and must not
    inherit stale OWNED keys a re-run did not produce."""
    import bench

    # importing bench re-points the persistent compile cache at the TPU
    # dir as an import side effect; restore the CPU-only dir conftest.py
    # set (cache-separation gotcha — mirrors test_tpu_session_toggles.py).
    # Usually a no-op (bench is already imported at collection time via
    # test_tpu_session_toggles -> tools.tpu_session), but a solo run of
    # this file would otherwise leak the TPU cache dir into later jits.
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/cr_tpu_jax_cache_cpu")

    path = str(tmp_path / "bench_detail.json")
    with open(path, "w") as f:
        json.dump({
            "sweep": {"3200": {"pipelined_ms": 50.0}},
            "ofstad": {"3200": {"pipelined_ms": 120.0}},
            "lit_natural": {"factor": 2.5, "tuning": {"unroll_b": 4}},
            "scale_10000": {"pipelined_ms": 120.0},
        }, f)
    bench.write_detail({"sweep": {"3200": {"pipelined_ms": 45.0}},
                        "tuning": {"unroll_b": 8}}, path)
    out = json.load(open(path))
    assert out["sweep"]["3200"]["pipelined_ms"] == 45.0  # refreshed
    assert out["lit_natural"]["factor"] == 2.5  # preserved
    assert out["scale_10000"]["pipelined_ms"] == 120.0  # preserved
    assert "ofstad" not in out  # stale owned key dropped, not inherited
