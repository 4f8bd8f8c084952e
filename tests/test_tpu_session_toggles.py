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


def _fake_conformance(monkeypatch, control_headline=1.42,
                      cand_headline=1.423, vs_control=0.004,
                      fail_control=False):
    """Stub tools.conformance_report.main for gate tests: writes the
    --out JSON a real run would, keyed off --save-frames (control pass)
    vs --ref-frames (candidate pass)."""
    import tools.conformance_report as cr

    calls = []

    def fake_main(argv):
        calls.append(list(argv))
        out = argv[argv.index("--out") + 1]
        if "--save-frames" in argv:
            if fail_control:
                raise RuntimeError("control render died")
            payload = {"worst_headline_mae_pct": control_headline}
        else:
            assert "--ref-frames" in argv  # candidates must score the diff
            payload = {"worst_headline_mae_pct": cand_headline,
                       "worst_vs_control_mae_pct": vs_control}
        with open(out, "w") as f:
            json.dump(payload, f)

    monkeypatch.setattr(cr, "main", fake_main)
    return calls


def _default_wins(monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.5 if mm.PRECISION == "default" else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)


def test_precision_gate_adopts_on_small_control_diff(sandbox, monkeypatch):
    # the quick conformance's MAE vs goldens sits ABOVE 1% (sample noise)
    # for control and candidate alike; the same-seed vs-control diff is
    # tiny -> the candidate must be adopted (the old absolute <1% bar
    # wrongly rejected exactly this case in round-4 session 6)
    _default_wins(monkeypatch)
    calls = _fake_conformance(monkeypatch, control_headline=1.42,
                              cand_headline=1.423, vs_control=0.004)
    ts.run_precision()
    assert mm.PRECISION == "default"
    tuning = json.load(open(sandbox))
    assert tuning["precision"] == "default"
    assert tuning["precision_gate_vs_control_mae_pct"] == {"default": 0.004}
    assert tuning["precision_gate_headline_mae_pct"]["highest"] == 1.42
    assert ts._TUNING_DIRTY is True
    assert len(calls) == 2  # one control render, one candidate render


def test_precision_gate_rejects_big_control_diff(sandbox, monkeypatch):
    _default_wins(monkeypatch)
    _fake_conformance(monkeypatch, vs_control=0.5)  # > 0.25% bar
    ts.run_precision()
    assert mm.PRECISION == "highest"
    assert json.load(open(sandbox))["precision"] == "highest"
    assert ts._TUNING_DIRTY is False


def test_precision_gate_rejects_headline_degradation(sandbox, monkeypatch):
    # diff small on average but the headline-vs-golden MAE grew past the
    # slack: error concentrated in the scored region -> reject
    _default_wins(monkeypatch)
    _fake_conformance(monkeypatch, control_headline=0.6,
                      cand_headline=0.75, vs_control=0.01)
    ts.run_precision()
    assert mm.PRECISION == "highest"
    assert json.load(open(sandbox))["precision"] == "highest"


def test_precision_control_failure_adopts_nothing(sandbox, monkeypatch):
    _default_wins(monkeypatch)
    _fake_conformance(monkeypatch, fail_control=True)
    ts.run_precision()
    assert mm.PRECISION == "highest"
    tuning = json.load(open(sandbox))
    assert tuning["precision"] == "highest"
    # the speed measurement is still on record
    assert tuning["precision_frame_ms"]["natural"]["default"] == 0.5


def test_precision_per_scene_salvage(sandbox, monkeypatch):
    """A candidate that fails the GLOBAL gate (ofstad error) but passes on
    every natural config is adopted PER SCENE, keyed by the natural
    scene's geometry hash — and the bench artifacts re-measure."""
    import tools.conformance_report as cr

    _default_wins(monkeypatch)

    def fake_main(argv):
        out = argv[argv.index("--out") + 1]
        if "--save-frames" in argv:
            payload = {"worst_headline_mae_pct": 0.94, "results": {
                "overview/uniform": {"headline_mae_pct": 0.04},
                "ofstad/uniform": {"headline_mae_pct": 0.94}}}
        else:
            payload = {"worst_headline_mae_pct": 1.42,
                       "worst_vs_control_mae_pct": 0.92, "results": {
                           "overview/uniform": {"headline_mae_pct": 0.04,
                                                "vs_control_mae_pct": 0.17},
                           "ofstad/uniform": {"headline_mae_pct": 1.42,
                                              "vs_control_mae_pct": 0.92}}}
        with open(out, "w") as f:
            json.dump(payload, f)

    monkeypatch.setattr(cr, "main", fake_main)
    monkeypatch.setattr(ts, "_natural_scene_sig", lambda: "cafe01")
    ts.run_precision()
    assert mm.PRECISION == "highest"  # the global adoption stays rejected
    tuning = json.load(open(sandbox))
    assert tuning["precision"] == "highest"
    assert tuning["precision_by_scene"] == {"cafe01": "default"}
    assert ts._TUNING_DIRTY is True


def test_precision_global_f32x1_plus_per_scene_default(sandbox, monkeypatch):
    """A candidate that passes the GLOBAL gate (f32x1) adopts globally,
    AND a per-scene entry still lands for a scene where a faster
    candidate (default) passes that scene's own configs — the mixed
    end-state: precision="f32x1", precision_by_scene={natural:
    "default"}.  The ofstad group must NOT get an entry (its only
    faster-than-chosen candidate fails its configs)."""
    import tools.conformance_report as cr

    class _R:
        def __init__(self, name):
            self.name = name

    monkeypatch.setattr(ts.bench, "build_renderer",
                        lambda: (_R("natural"), "natural"))
    monkeypatch.setattr(ts.bench, "build_ofstad_renderer",
                        lambda: (_R("ofstad"), "ofstad"))
    monkeypatch.setattr(_R, "set_render_size", lambda self, w, h: None,
                        raising=False)
    monkeypatch.setattr(
        _R, "get_current_eye_ommatidial_count", lambda self: 8,
        raising=False)
    times = {("natural", "highest"): 1.0, ("ofstad", "highest"): 1.0,
             ("natural", "default"): 0.5, ("ofstad", "default"): 0.52,
             ("natural", "f32x1"): 0.6, ("ofstad", "f32x1"): 0.6}

    def time_frames(r, samples, reps, warmup=3):
        t = times[(r.name, mm.PRECISION)]
        return t, 0.0, t

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)

    def fake_main(argv):
        out = argv[argv.index("--out") + 1]
        if "--save-frames" in argv:  # control
            payload = {"worst_headline_mae_pct": 0.94, "results": {
                "overview/uniform": {"headline_mae_pct": 0.04},
                "ofstad/uniform": {"headline_mae_pct": 0.94}}}
        elif mm.PRECISION == "default":
            payload = {"worst_headline_mae_pct": 1.42,
                       "worst_vs_control_mae_pct": 0.92, "results": {
                           "overview/uniform": {"headline_mae_pct": 0.04,
                                                "vs_control_mae_pct": 0.17},
                           "ofstad/uniform": {"headline_mae_pct": 1.42,
                                              "vs_control_mae_pct": 0.92}}}
        else:  # f32x1: f32-class everywhere
            payload = {"worst_headline_mae_pct": 0.94,
                       "worst_vs_control_mae_pct": 0.0001, "results": {
                           "overview/uniform": {
                               "headline_mae_pct": 0.04,
                               "vs_control_mae_pct": 0.0001},
                           "ofstad/uniform": {
                               "headline_mae_pct": 0.94,
                               "vs_control_mae_pct": 0.0001}}}
        with open(out, "w") as f:
            json.dump(payload, f)

    monkeypatch.setattr(cr, "main", fake_main)
    monkeypatch.setattr(ts, "_natural_scene_sig", lambda: "cafe01")
    monkeypatch.setattr(ts, "_ofstad_scene_sig", lambda: "0f57ad")
    ts.run_precision()
    assert mm.PRECISION == "f32x1"
    tuning = json.load(open(sandbox))
    assert tuning["precision"] == "f32x1"
    assert tuning["precision_by_scene"] == {"cafe01": "default"}
    assert ts._TUNING_DIRTY is True


def test_precision_per_scene_rejects_natural_error(sandbox, monkeypatch):
    import tools.conformance_report as cr

    _default_wins(monkeypatch)

    def fake_main(argv):
        out = argv[argv.index("--out") + 1]
        if "--save-frames" in argv:
            payload = {"worst_headline_mae_pct": 0.94, "results": {
                "overview/uniform": {"headline_mae_pct": 0.04}}}
        else:
            payload = {"worst_headline_mae_pct": 1.42,
                       "worst_vs_control_mae_pct": 0.92, "results": {
                           "overview/uniform": {"headline_mae_pct": 0.04,
                                                "vs_control_mae_pct": 0.4}}}
        with open(out, "w") as f:
            json.dump(payload, f)

    monkeypatch.setattr(cr, "main", fake_main)
    monkeypatch.setattr(ts, "_natural_scene_sig", lambda: "cafe01")
    ts.run_precision()
    tuning = json.load(open(sandbox))
    assert tuning["precision_by_scene"] == {}
    assert ts._TUNING_DIRTY is False


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


# ---- direct1 stage (cnt==1 SSA fast-path adoption) --------------------


def test_direct1_adopts_measured_win(sandbox, monkeypatch):
    monkeypatch.setattr(mm, "DIRECT1", False)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", False)
    monkeypatch.setattr(ts.bench, "time_frames",
                        lambda r, samples, reps, warmup=3: (1.0, 0.0, 0.5))
    ts._adopt_direct1({"natural": {False: 10.0, True: 8.0},
                       "ofstad": {False: 50.0, True: 35.0}})
    assert mm.DIRECT1 is True
    tuning = json.load(open(sandbox))
    assert tuning["direct1"] is True
    assert tuning["direct1_kernel_ms"]["ofstad"] == {"off": 50.0, "on": 35.0}
    assert ts._TUNING_DIRTY is True


def test_direct1_rejects_wash(sandbox, monkeypatch):
    monkeypatch.setattr(mm, "DIRECT1", False)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", False)
    ts._adopt_direct1({"natural": {False: 10.0, True: 9.9}})
    assert mm.DIRECT1 is False
    tuning = json.load(open(sandbox))
    assert tuning["direct1"] is False  # measurement recorded, not adopted
    assert ts._TUNING_DIRTY is False


def test_direct1_reverts_stale_adoption(sandbox, monkeypatch):
    """A re-measured regression must revert a previously-adopted direct1
    (the always-write contract shared with unroll/affine)."""
    with open(sandbox, "w") as f:
        json.dump({"direct1": True}, f)
    monkeypatch.setattr(mm, "DIRECT1", True)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", True)
    ts._adopt_direct1({"natural": {False: 10.0, True: 11.0}})
    assert mm.DIRECT1 is False
    assert json.load(open(sandbox))["direct1"] is False
    assert ts._TUNING_DIRTY is True  # bench artifacts used the old mode


def test_direct1_per_scene_salvage(sandbox, monkeypatch):
    """A scene that clears the bar individually is adopted per scene when
    the geomean does not (mirrors the precision salvage)."""
    monkeypatch.setattr(mm, "DIRECT1", False)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", False)
    monkeypatch.setattr(ts, "_natural_scene_sig", lambda: "sigA")
    monkeypatch.setattr(ts, "_ofstad_scene_sig", lambda: "sigB")
    ts._adopt_direct1({"natural": {False: 10.0, True: 10.0},
                       "ofstad": {False: 50.0, True: 48.0}})
    tuning = json.load(open(sandbox))
    assert tuning["direct1"] is False  # geomean 0.98 misses the bar
    assert tuning["direct1_by_scene"] == {"sigB": True}
    assert mm.DIRECT1 is False


def test_direct1_per_scene_salvage_evicted_on_wash(sandbox, monkeypatch):
    monkeypatch.setattr(mm, "DIRECT1", False)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", False)
    monkeypatch.setattr(ts, "_natural_scene_sig", lambda: "sigA")
    monkeypatch.setattr(ts, "_ofstad_scene_sig", lambda: "sigB")
    with open(sandbox, "w") as f:
        json.dump({"direct1_by_scene": {"sigB": True}}, f)
    ts._adopt_direct1({"ofstad": {False: 50.0, True: 50.0}})
    assert json.load(open(sandbox))["direct1_by_scene"] == {}


def test_direct1_bit_identity_failure_poisons_adoption(sandbox, monkeypatch):
    """run_direct1 poisons a scene's 'on' time to inf when the on-hardware
    bit-identity check fails; the adopt helper must then never adopt, no
    matter how fast the other scene measured."""
    monkeypatch.setattr(mm, "DIRECT1", False)
    monkeypatch.setattr(ts, "_SESSION_START_DIRECT1", False)
    ts._adopt_direct1({"natural": {False: 10.0, True: 1.0},
                       "ofstad": {False: 50.0, True: float("inf")}})
    assert mm.DIRECT1 is False
    assert json.load(open(sandbox))["direct1"] is False


def _fake_sky_gate(monkeypatch, worst=0.55, fail=False):
    import tools.conformance_report as cr

    def fake_main(argv):
        if fail:
            raise RuntimeError("gate render died")
        out = argv[argv.index("--out") + 1]
        with open(out, "w") as f:
            json.dump({"worst_headline_mae_pct": worst}, f)

    monkeypatch.setattr(cr, "main", fake_main)


def _sky_wins(monkeypatch):
    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.5 if cfg.get_config().sky_split else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)


def test_sky_adopts_on_gate_pass(sandbox, monkeypatch):
    cfg.set_config(cfg.RenderConfig())
    _sky_wins(monkeypatch)
    _fake_sky_gate(monkeypatch, worst=0.55)  # committed baseline is 0.541
    ts.run_sky()
    assert cfg.get_config().sky_split is True
    tuning = json.load(open(sandbox))
    assert tuning["sky_split"] is True
    assert tuning["sky_frame_ms"]["natural"] == {"off": 1.0, "on": 0.5}
    assert tuning["sky_gate"]["pass"] is True
    assert ts._TUNING_DIRTY is True
    cfg.set_config(cfg.RenderConfig())


def test_sky_rejects_on_gate_fail(sandbox, monkeypatch):
    cfg.set_config(cfg.RenderConfig())
    _sky_wins(monkeypatch)
    _fake_sky_gate(monkeypatch, worst=2.0)  # way past baseline + 0.1pp
    ts.run_sky()
    assert cfg.get_config().sky_split is False
    tuning = json.load(open(sandbox))
    assert tuning["sky_split"] is False
    assert tuning["sky_gate"]["pass"] is False
    assert ts._TUNING_DIRTY is False
    cfg.set_config(cfg.RenderConfig())


def test_sky_wash_skips_gate(sandbox, monkeypatch):
    cfg.set_config(cfg.RenderConfig())
    monkeypatch.setattr(ts.bench, "time_frames",
                        lambda *a, **k: (1.0, 0.0, 1.0))
    _fake_sky_gate(monkeypatch, fail=True)  # must never be called
    ts.run_sky()
    assert cfg.get_config().sky_split is False
    tuning = json.load(open(sandbox))
    assert tuning["sky_split"] is False
    assert "sky_gate" not in tuning
    cfg.set_config(cfg.RenderConfig())


def test_sky_restores_on_mid_ab_failure(sandbox, monkeypatch):
    cfg.set_config(cfg.RenderConfig())

    def time_frames(r, samples, reps, warmup=3):
        if cfg.get_config().sky_split:
            raise RuntimeError("wedged compile on the split variant")
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    with pytest.raises(RuntimeError):
        ts.run_sky()
    assert cfg.get_config().sky_split is False
    assert not os.path.exists(sandbox)
    cfg.set_config(cfg.RenderConfig())


def _batch_rays_sandbox(monkeypatch, start=256):
    import compound_ray_tpu.eye.pipeline as pl_mod

    monkeypatch.setattr(mm, "BATCH_RAYS", start)
    monkeypatch.setattr(pl_mod, "MM_BATCH_RAYS", start)


def test_batch_rays_adopts_and_rebenches(sandbox, monkeypatch):
    _batch_rays_sandbox(monkeypatch)

    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.5 if mm.BATCH_RAYS == 512 else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    rebenched = []
    monkeypatch.setattr(ts.bench, "run_protocol",
                        lambda: rebenched.append(mm.BATCH_RAYS))
    ts.run_batch_rays()
    assert mm.BATCH_RAYS == 512  # the finally keeps the adopted winner
    tuning = json.load(open(sandbox))
    assert tuning["batch_rays"] == 512
    assert tuning["batch_rays_frame_ms"]["natural"] == {"256": 1.0,
                                                        "512": 0.5}
    assert rebenched == [512]


def test_batch_rays_rejects_wash(sandbox, monkeypatch):
    _batch_rays_sandbox(monkeypatch)

    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 0.99 if mm.BATCH_RAYS == 512 else 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    monkeypatch.setattr(ts.bench, "run_protocol",
                        lambda: pytest.fail("wash must not rebench"))
    ts.run_batch_rays()
    assert mm.BATCH_RAYS == 256
    tuning = json.load(open(sandbox))
    assert tuning["batch_rays"] == 256  # measurement recorded, not adopted


def test_batch_rays_reverts_stale_adoption(sandbox, monkeypatch):
    # a previous batch adopted 512; this batch measures it a wash -> the
    # measurement governs (revert to 256) and the bench artifacts refresh
    _batch_rays_sandbox(monkeypatch, start=512)
    with open(sandbox, "w") as f:
        json.dump({"batch_rays": 512}, f)

    def time_frames(r, samples, reps, warmup=3):
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    rebenched = []
    monkeypatch.setattr(ts.bench, "run_protocol",
                        lambda: rebenched.append(mm.BATCH_RAYS))
    ts.run_batch_rays()
    assert mm.BATCH_RAYS == 256
    assert json.load(open(sandbox))["batch_rays"] == 256
    assert rebenched == [256]


def test_batch_rays_restores_on_mid_ab_failure(sandbox, monkeypatch):
    _batch_rays_sandbox(monkeypatch)

    def time_frames(r, samples, reps, warmup=3):
        if mm.BATCH_RAYS == 512:
            raise RuntimeError("mosaic hang on the doubled winner state")
        return 1.0, 0.0, 1.0

    monkeypatch.setattr(ts.bench, "time_frames", time_frames)
    with pytest.raises(RuntimeError):
        ts.run_batch_rays()
    assert mm.BATCH_RAYS == 256  # restored, not stuck at 512
    assert not os.path.exists(sandbox)


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


class _FakeShadowRenderer:
    """run_shadow's renderer surface; pipelined time keyed off the ACTIVE
    config's shadow_rpb so the stage's winner selection is observable."""

    def __init__(self, ms_by_rpb, explode_at=None):
        self.ms_by_rpb = ms_by_rpb
        self.explode_at = explode_at
        self.lighting = False

    def set_render_size(self, w, h):
        pass

    def get_current_eye_ommatidial_count(self):
        return 8

    def set_current_eye_samples_per_ommatidium(self, s):
        pass

    def set_lighting(self, on):
        self.lighting = on

    def render_frame(self):
        pass

    def render_frames_pipelined(self, n):
        rpb = cfg.get_config().shadow_rpb
        if rpb == self.explode_at:
            raise RuntimeError("mosaic ICE on the wide block")
        return self.ms_by_rpb[rpb] * n


@pytest.fixture()
def cfg_guard():
    base = cfg.get_config()
    yield
    cfg.set_config(base)


def test_shadow_adopts_fastest_rpb(sandbox, monkeypatch, cfg_guard):
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRenderer({1: 4.0, 2: 3.0, 4: 2.0, 8: 2.5}),
                 "natural"))
    ts.run_shadow()
    tuning = json.load(open(sandbox))
    assert tuning["shadow_rpb"] == 4
    assert tuning["shadow_rpb_lit_ms"]["natural"]["4"] == 2.0
    # the finally re-merged tuning.json: later stages run the winner
    assert cfg.get_config().shadow_rpb == 4


def test_shadow_reverts_stale_adoption(sandbox, monkeypatch, cfg_guard):
    # a previously-adopted rpb that re-measures as a regression must be
    # reverted (always-write, like run_affine/run_equirect)
    with open(sandbox, "w") as f:
        json.dump({"shadow_rpb": 8}, f)
    cfg.set_config(cfg.RenderConfig.from_env())
    assert cfg.get_config().shadow_rpb == 8
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRenderer({1: 2.0, 2: 3.0, 4: 4.0, 8: 5.0}),
                 "natural"))
    ts.run_shadow()
    assert json.load(open(sandbox))["shadow_rpb"] == 1
    assert cfg.get_config().shadow_rpb == 1


def test_shadow_restores_on_mid_ab_failure(sandbox, monkeypatch, cfg_guard):
    base_rpb = cfg.get_config().shadow_rpb
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRenderer({1: 4.0, 2: 3.0, 4: 2.0, 8: 2.5},
                                  explode_at=4),
                 "natural"))
    with pytest.raises(RuntimeError):
        ts.run_shadow()
    assert not os.path.exists(sandbox)  # nothing adopted
    assert cfg.get_config().shadow_rpb == base_rpb  # not stuck mid-flip


class _FakeShadowRsRenderer(_FakeShadowRenderer):
    """run_shadow_rs surface — same contract, keyed off shadow_batch_rays."""

    def render_frames_pipelined(self, n):
        rs = cfg.get_config().shadow_batch_rays
        if rs == self.explode_at:
            raise RuntimeError("mosaic ICE on the wide batch")
        return self.ms_by_rpb[rs] * n


def test_shadow_rs_adopts_fastest(sandbox, monkeypatch, cfg_guard):
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRsRenderer({256: 4.0, 512: 3.0, 1024: 3.5}),
                 "natural"))
    ts.run_shadow_rs()
    tuning = json.load(open(sandbox))
    assert tuning["shadow_batch_rays"] == 512
    assert tuning["shadow_batch_rays_lit_ms"]["natural"]["512"] == 3.0
    assert cfg.get_config().shadow_batch_rays == 512


def test_shadow_rs_reverts_stale_adoption(sandbox, monkeypatch, cfg_guard):
    with open(sandbox, "w") as f:
        json.dump({"shadow_batch_rays": 1024}, f)
    cfg.set_config(cfg.RenderConfig.from_env())
    assert cfg.get_config().shadow_batch_rays == 1024
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRsRenderer({256: 2.0, 512: 3.0, 1024: 4.0}),
                 "natural"))
    ts.run_shadow_rs()
    assert json.load(open(sandbox))["shadow_batch_rays"] == 256
    assert cfg.get_config().shadow_batch_rays == 256


def test_shadow_rs_restores_on_mid_ab_failure(sandbox, monkeypatch,
                                              cfg_guard):
    base_rs = cfg.get_config().shadow_batch_rays
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowRsRenderer({256: 4.0, 512: 3.0, 1024: 2.0},
                                       explode_at=1024),
                 "natural"))
    with pytest.raises(RuntimeError):
        ts.run_shadow_rs()
    assert not os.path.exists(sandbox)  # nothing adopted
    assert cfg.get_config().shadow_batch_rays == base_rs


class _FakeShadowPrecRenderer:
    """run_shadow_prec surface: frame data + timing keyed off the ACTIVE
    mm_tracer.SHADOW_PRECISION so gate and winner selection are
    observable."""

    def __init__(self, ms_by_prec, mae_pct=0.01, explode_at=None):
        import numpy as np

        self.ms_by_prec = ms_by_prec
        self.explode_at = explode_at
        # the candidate frame differs from "highest" by mae_pct (% full
        # scale)
        self.base = np.full((8, 3), 0.5, np.float32)
        self.delta = mae_pct / 100.0

    def set_render_size(self, w, h):
        pass

    def get_current_eye_ommatidial_count(self):
        return 8

    def set_current_eye_samples_per_ommatidium(self, s):
        pass

    def set_lighting(self, on):
        pass

    def render_frame(self):
        if mm.SHADOW_PRECISION == self.explode_at:
            raise RuntimeError("wedged compile on the lossy kernel")

    def get_camera_data(self):
        if mm.SHADOW_PRECISION not in (None, "highest"):
            return self.base + self.delta
        return self.base

    def render_frames_pipelined(self, n):
        return self.ms_by_prec[mm.SHADOW_PRECISION or "highest"] * n


@pytest.fixture()
def sp_guard(monkeypatch):
    monkeypatch.setattr(mm, "SHADOW_PRECISION", None)


def test_shadow_prec_adopts_gated_win(sandbox, monkeypatch, sp_guard):
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowPrecRenderer({"highest": 4.0, "f32x1": 3.0},
                                         mae_pct=0.01), "natural"))
    ts.run_shadow_prec()
    tuning = json.load(open(sandbox))
    assert tuning["shadow_precision"] == "f32x1"
    assert tuning["shadow_precision_gate_vs_control_mae_pct"] < 0.05
    assert mm.SHADOW_PRECISION == "f32x1"  # finally keeps the winner


def test_shadow_prec_gate_rejects_big_diff(sandbox, monkeypatch, sp_guard):
    # a 1% same-seed diff fails the 0.25% bar even with a 25% time win
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowPrecRenderer({"highest": 4.0, "f32x1": 3.0},
                                         mae_pct=1.0), "natural"))
    ts.run_shadow_prec()
    assert json.load(open(sandbox))["shadow_precision"] == "highest"
    assert mm.SHADOW_PRECISION == "highest"


def test_shadow_prec_rejects_wash(sandbox, monkeypatch, sp_guard):
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowPrecRenderer({"highest": 4.0, "f32x1": 3.96},
                                         mae_pct=0.01), "natural"))
    ts.run_shadow_prec()
    assert json.load(open(sandbox))["shadow_precision"] == "highest"


def test_shadow_prec_restores_on_mid_ab_failure(sandbox, monkeypatch,
                                                sp_guard):
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowPrecRenderer({"highest": 4.0, "f32x1": 3.0},
                                         explode_at="f32x1"), "natural"))
    with pytest.raises(RuntimeError):
        ts.run_shadow_prec()
    assert not os.path.exists(sandbox)  # nothing adopted
    assert mm.SHADOW_PRECISION is None  # restored to follow-global


def test_shadow_prec_merges_prior_variant_datapoints(sandbox, monkeypatch,
                                                     sp_guard):
    """A re-run must not clobber measured datapoints for variants it
    skipped — session 15/16's gate-rejected "default"/"bf16x3" stay on
    record next to the new f32x1 measurement."""
    json.dump({"shadow_precision": "highest",
               "shadow_precision_lit_ms": {"default": 106.48,
                                           "bf16x3": 136.27,
                                           "highest": 205.91}},
              open(sandbox, "w"))
    monkeypatch.setattr(
        ts.bench, "build_renderer",
        lambda: (_FakeShadowPrecRenderer({"highest": 4.0, "f32x1": 3.0},
                                         mae_pct=0.01), "natural"))
    ts.run_shadow_prec()
    ms = json.load(open(sandbox))["shadow_precision_lit_ms"]
    assert ms["default"] == 106.48 and ms["bf16x3"] == 136.27  # preserved
    assert ms["f32x1"] == 3.0 and ms["highest"] == 4.0  # re-measured
