"""tools/tpu_session.py A/B stages: module-global toggles must never leak.

The batch runs unattended in the one tunnel window and its driver loop
catches per-stage exceptions, so a stage that dies mid-A/B with a module
global half-flipped (FAST_EQUIRECT / PRECISION) would silently poison
every LATER stage's measurement.  These tests pin the try/finally
restore-or-adopt contract with fake renderers (no real frames rendered).
"""

import json
import os

import pytest

import jax

import tools.tpu_session as ts  # noqa: E402  (imports bench -> jax config)

# importing bench re-points the persistent compile cache at the TPU dir;
# restore the CPU-only dir conftest.py set (cache separation gotcha)
jax.config.update("jax_compilation_cache_dir", "/tmp/cr_tpu_jax_cache_cpu")

import compound_ray_tpu.config as cfg  # noqa: E402
import compound_ray_tpu.eye.pipeline as pl  # noqa: E402
import compound_ray_tpu.trace.mm_tracer as mm  # noqa: E402


class _FakeRenderer:
    def set_render_size(self, w, h):
        pass

    def get_current_eye_ommatidial_count(self):
        return 8


@pytest.fixture()
def sandbox(tmp_path, monkeypatch):
    """Isolate tuning.json, pin the toggles, and stub the heavy bits."""
    p = str(tmp_path / "tuning.json")
    monkeypatch.setattr(cfg, "TUNING_PATH", p)
    monkeypatch.setattr(mm, "TUNING_PATH", p)
    monkeypatch.setattr(pl, "FAST_EQUIRECT", False)
    monkeypatch.setattr(mm, "PRECISION", "highest")
    monkeypatch.setattr(ts, "_TUNING_DIRTY", False)
    monkeypatch.setattr(ts, "_SESSION_START_FAST_EQUIRECT", False)
    monkeypatch.setattr(ts, "_SESSION_START_PRECISION", "highest")
    # clearing jit caches is pointless with fake renderers and slows the
    # suite; the stages' calls to it are not under test
    monkeypatch.setattr(ts.jax, "clear_caches", lambda: None)
    monkeypatch.setattr(ts.bench, "build_renderer",
                        lambda: (_FakeRenderer(), "natural"))
    monkeypatch.setattr(ts.bench, "build_ofstad_renderer", lambda: None)
    return p


def test_equirect_restores_on_mid_ab_failure(sandbox, monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        if pl.FAST_EQUIRECT:
            raise RuntimeError("mosaic ICE on the fast variant")
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    with pytest.raises(RuntimeError):
        ts.run_equirect()
    assert pl.FAST_EQUIRECT is False  # restored, not stuck True
    assert not os.path.exists(sandbox)  # nothing adopted
    assert ts._TUNING_DIRTY is False


def test_equirect_adopts_measured_win(sandbox, monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.5 if pl.FAST_EQUIRECT else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    ts.run_equirect()
    assert pl.FAST_EQUIRECT is True  # the finally keeps the adopted winner
    tuning = json.load(open(sandbox))
    assert tuning["fast_equirect"] is True
    assert tuning["equirect_frame_ms"]["natural"] == {"exact": 1.0,
                                                      "fast": 0.5}
    assert ts._TUNING_DIRTY is True  # run_rebench must re-measure


def test_equirect_rejects_wash(sandbox, monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.99 if pl.FAST_EQUIRECT else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    ts.run_equirect()
    assert pl.FAST_EQUIRECT is False
    assert json.load(open(sandbox))["fast_equirect"] is False
    assert ts._TUNING_DIRTY is False


def test_precision_restores_on_mid_ab_failure(sandbox, monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        if mm.PRECISION == "default":
            raise RuntimeError("wedged compile on the default variant")
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    with pytest.raises(RuntimeError):
        ts.run_precision()
    assert mm.PRECISION == "highest"  # later stages keep the exact path
    assert not os.path.exists(sandbox)


def test_precision_no_win_records_highest(sandbox, monkeypatch):
    # a wash (>0.95 ratio) must skip the conformance gate entirely and
    # still write the measurement with precision=highest
    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    ts.run_precision()
    assert mm.PRECISION == "highest"
    tuning = json.load(open(sandbox))
    assert tuning["precision"] == "highest"
    assert "precision_gate_headline_mae_pct" not in tuning


def test_unroll8_skips_without_ub4_adoption(sandbox, monkeypatch):
    monkeypatch.setattr(mm, "UNROLL_B", 1)
    called = []
    monkeypatch.setattr(ts.bench, "time_frames",
                        lambda *a, **k: called.append(1) or (1.0, 0.0, 1.0))
    ts.run_unroll8()
    assert not called  # gate: no tuning.json / unroll_b != 4 -> no measure
    assert mm.UNROLL_B == 1
    assert not os.path.exists(sandbox)


def test_unroll8_skip_drops_stale_measurement(sandbox, monkeypatch):
    # batch N measured the escalation under ub=4; batch N+1's main A/B
    # adopts ub=2, so the gate skips — the prior numbers must not linger
    # for post_batch_report to render under batch N+1's measured stamp
    with open(sandbox, "w") as f:
        json.dump({"unroll_b": 2,
                   "unroll8_frame_ms": {"natural": {"4": 47.0, "8": 45.0}}},
                  f)
    monkeypatch.setattr(mm, "UNROLL_B", 2)
    monkeypatch.setattr(ts.bench, "time_frames",
                        lambda *a, **k: pytest.fail("gate must not measure"))
    ts.run_unroll8()
    tuning = json.load(open(sandbox))
    assert "unroll8_frame_ms" not in tuning
    assert tuning["unroll_b"] == 2  # everything else untouched


def test_unroll8_adopts_and_rebenches(sandbox, monkeypatch):
    with open(sandbox, "w") as f:
        json.dump({"unroll_b": 4}, f)
    monkeypatch.setattr(mm, "UNROLL_B", 4)

    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.5 if mm.UNROLL_B == 8 else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    rebenched = []
    monkeypatch.setattr(ts.bench, "run_protocol",
                        lambda: rebenched.append(mm.UNROLL_B))
    ts.run_unroll8()
    assert mm.UNROLL_B == 8  # the finally keeps the adopted winner
    tuning = json.load(open(sandbox))
    assert tuning["unroll_b"] == 8
    assert tuning["unroll8_frame_ms"]["natural"] == {"4": 1.0, "8": 0.5}
    assert rebenched == [8]  # bench artifacts refreshed under ub=8


def test_unroll8_rejects_wash(sandbox, monkeypatch):
    with open(sandbox, "w") as f:
        json.dump({"unroll_b": 4}, f)
    monkeypatch.setattr(mm, "UNROLL_B", 4)

    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.99 if mm.UNROLL_B == 8 else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    monkeypatch.setattr(ts.bench, "run_protocol",
                        lambda: pytest.fail("wash must not rebench"))
    ts.run_unroll8()
    assert mm.UNROLL_B == 4
    tuning = json.load(open(sandbox))
    assert tuning["unroll_b"] == 4  # measurement recorded, not adopted
    assert tuning["unroll8_frame_ms"]["natural"] == {"4": 1.0, "8": 0.99}


def test_unroll8_restores_on_mid_ab_failure(sandbox, monkeypatch):
    with open(sandbox, "w") as f:
        json.dump({"unroll_b": 4}, f)
    monkeypatch.setattr(mm, "UNROLL_B", 4)

    def time_frames(r, samples, reps, warmup=3):
        if mm.UNROLL_B == 8:
            raise RuntimeError("mosaic hang on the doubled register set")
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    with pytest.raises(RuntimeError):
        ts.run_unroll8()
    assert mm.UNROLL_B == 4  # restored, not stuck at 8
    assert "unroll8_frame_ms" not in json.load(open(sandbox))


class _FakeLitRenderer:
    """Pipelined frame time depends on (lighting, light count): unlit 10,
    1 light 19, 4 lights 40 -> marginal (40-19)/3 = 7, fixed 19-7-10 = 2."""

    def __init__(self):
        import numpy as np

        self._lights = np.zeros((4, 7), "float32")
        self._lights[:, 3] = np.arange(4) + 1.0
        self.lighting = False

    def set_render_size(self, w, h):
        pass

    def get_current_eye_ommatidial_count(self):
        return 8

    def set_current_eye_samples_per_ommatidium(self, s):
        pass

    def set_lighting(self, on):
        self.lighting = on

    def set_lights(self, lights):
        self._lights = lights

    def get_lights(self):
        import numpy as np

        return np.array(self._lights)

    def _ms(self):
        if not self.lighting:
            return 10.0
        return 19.0 if self._lights.shape[0] == 1 else 40.0

    def render_frame(self):
        return self._ms()

    def render_frames_pipelined(self, n):
        return self._ms() * n


def test_lit_light_count_split(sandbox, monkeypatch):
    monkeypatch.setattr(ts.bench, "build_renderer",
                        lambda: (_FakeLitRenderer(), "natural"))
    merged = {}
    monkeypatch.setattr(ts, "_merge_bench_detail",
                        lambda key, entry: merged.update({key: entry}))
    ts.run_lit()
    e = merged["lit_natural"]
    assert e["factor"] == 4.0
    assert e["lights"] == 4
    assert e["lit_1light_pipelined_ms"] == 19.0
    assert e["per_light_ms"] == 7.0
    assert e["lit_fixed_ms"] == 2.0
