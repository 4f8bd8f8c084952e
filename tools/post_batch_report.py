"""Render the measured-batch results into README.md and docs/performance.md.

The TPU measurement batch (tools/tpu_session.py, usually launched
unattended by the tunnel watchdog) leaves structured artifacts:

  bench_detail.json           sweep / burst / pose-sweep / ofstad / lit / scale
  artifacts/tuning.json       A/B measurements + adopted knobs
  artifacts/anatomy.json      staged frame-anatomy timings per scene
  artifacts/conformance.json  golden-image conformance
  artifacts/bench_lkg.json    headline record + timestamp

This tool turns those into the human-facing summary, splicing generated
markdown between marker comments so it is safe to re-run after every batch:

  README.md            <!-- MEASURED-HEADLINE:BEGIN/END -->
  docs/performance.md  <!-- MEASURED-BATCH:BEGIN/END -->

Pure stdlib on purpose (no jax import): it must be runnable guarded
(PALLAS_AXON_POOL_IPS= empty) next to a live tunnel session without
registering a second session, and it can never wedge anything.

Usage: python tools/post_batch_report.py [--dry-run]
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 2080 Ti rothamsted @3200: 1.748 ms -> 1.83e9 rays/s (BASELINE.md); the
# ofstad row is 1.633 ms -> 1.96e9.  Duplicated from bench.py rather than
# imported: importing bench pulls in jax (see module docstring).
BASELINE_RAYS_PER_S = 1.83e9
BASELINE_OFSTAD_MS = 1.633
BASELINE_SAMPLES1_MS = 0.185


def _load(relpath):
    try:
        with open(os.path.join(ROOT, relpath)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _fmt_ms(v):
    return f"{v:.2f}" if isinstance(v, (int, float)) else "—"


def build_perf_section():
    """The docs/performance.md measured-batch section."""
    detail = _load("bench_detail.json")
    tuning = _load("artifacts/tuning.json")
    anatomy = _load("artifacts/anatomy.json")
    conf = _load("artifacts/conformance.json")
    lkg = _load("artifacts/bench_lkg.json")

    lines = []
    when = lkg.get("measured") or tuning.get("measured")
    if when:
        lines.append(f"Measured {when} (single v5e chip via the axon "
                     f"tunnel; artifacts: `bench_detail.json`, "
                     f"`artifacts/tuning.json`, `artifacts/anatomy.json`).")
        lines.append("")

    sweep = detail.get("sweep", {})
    ofstad = detail.get("ofstad", {})
    if sweep:
        lines.append("| config | pipelined ms/frame | rays/s | vs 2080 Ti |")
        lines.append("|---|---|---|---|")
        scene = detail.get("scene", "natural")
        for s, row in sorted(sweep.items(), key=lambda kv: int(kv[0])):
            rps = row.get("rays_per_s", 0.0)
            lines.append(
                f"| {scene} @{s} | {_fmt_ms(row.get('pipelined_ms'))} "
                f"(latency {_fmt_ms(row.get('latency_ms'))}) | "
                f"{rps:.2e} | {rps / BASELINE_RAYS_PER_S:.3f}x |")
        for s, row in sorted(ofstad.items(), key=lambda kv: int(kv[0])):
            rps = row.get("rays_per_s", 0.0)
            lines.append(
                f"| ofstad @{s} | {_fmt_ms(row.get('pipelined_ms'))} "
                f"(latency {_fmt_ms(row.get('latency_ms'))}) | "
                f"{rps:.2e} | {rps / BASELINE_RAYS_PER_S:.3f}x |")
        lines.append("")

    burst = detail.get("burst_samples1")
    if burst:
        lines.append(
            f"samples=1 stacked burst ×{burst.get('frames')}: "
            f"**{burst.get('ms_per_frame', 0.0):.3f} ms/frame** "
            f"({burst.get('fps', 0.0):.0f} FPS equivalent; reference "
            f"{BASELINE_SAMPLES1_MS} ms).")
    pose = detail.get("pose_sweep")
    if pose:
        stream = pose.get("stream_ms_per_pose")
        lines.append(
            f"GA pose loop @{pose.get('samples')} samples: "
            f"{pose.get('sequential_ms_per_pose')} ms/pose sequential"
            + (f", {stream} ms/pose streamed (unsynced dispatches, one "
               f"terminal sync)" if stream is not None else "")
            + f", **{pose.get('batched_ms_per_pose')} ms/pose batched** "
            f"({pose.get('poses')} fresh poses, plan+cull+pack included).")
    lit = detail.get("lit_natural")
    if lit:
        lines.append(
            f"Lit vs unlit @{lit.get('samples')} samples (natural): "
            f"{_fmt_ms(lit.get('unlit_pipelined_ms'))} → "
            f"{_fmt_ms(lit.get('lit_pipelined_ms'))} ms pipelined = "
            f"**{lit.get('factor')}× lighting factor** "
            f"(round-2 baseline was 29×; target ≤3×).")
        if isinstance(lit.get("per_light_ms"), (int, float)):
            lines.append(
                f"  Light-count split ({lit.get('lights')} lights vs 1): "
                f"1-light frame {_fmt_ms(lit.get('lit_1light_pipelined_ms'))}"
                f" ms → marginal **{_fmt_ms(lit.get('per_light_ms'))} "
                f"ms/light** (occlusion rows + GGX) over a "
                f"**{_fmt_ms(lit.get('lit_fixed_ms'))} ms fixed** lit "
                f"overhead (shadow raygen + shading basis).")
    scale = detail.get("scale_10000")
    if scale:
        lines.append(
            f"Scale point @{scale.get('samples')} samples/omm "
            f"({scale.get('ommatidia')} omms = "
            f"{scale.get('ommatidia', 0) * scale.get('samples', 0) / 1e6:.3g}M "
            f"rays/frame): {_fmt_ms(scale.get('pipelined_ms'))} ms pipelined "
            f"({scale.get('rays_per_s', 0.0):.2e} rays/s) — the fused "
            f"pipeline is O(omms) memory, no OOM at the reference "
            f"speedTest.py maximum.")
    s10k = detail.get("scale_10k_omms")
    if s10k:
        lines.append(
            f"Scale point @{s10k.get('ommatidia')} ommatidia × "
            f"{s10k.get('samples')} samples (same rays/frame as the "
            f"headline, 10× the kernel grid): "
            f"{_fmt_ms(s10k.get('pipelined_ms'))} ms pipelined "
            f"({s10k.get('rays_per_s', 0.0):.2e} rays/s) — the "
            f"BASELINE.json 10k-ommatidia axis.")
    if burst or pose or lit or scale or s10k:
        lines.append("")

    # --- A/B adoptions
    ab = []
    ukm = tuning.get("unroll_kernel_ms")
    if "unroll_b" in tuning:
        ab.append(f"| kernel batch-unroll | **unroll_b={tuning['unroll_b']}** "
                  f"| {_ab_detail(ukm)} |")
    u8 = tuning.get("unroll8_frame_ms")
    if u8:
        ab.append(f"| ub=8 escalation (full frame) | "
                  f"**{'ON' if tuning.get('unroll_b') == 8 else 'off'}** "
                  f"| {_ab_detail(u8)} |")
    afm = tuning.get("affine_frame_ms")
    if "affine_rays" in tuning:
        ab.append(f"| affine ray factorisation | "
                  f"**{'ON' if tuning['affine_rays'] else 'off'}** "
                  f"| {_ab_detail(afm)} |")
    if "precision" in tuning:
        gate = tuning.get("precision_gate_headline_mae_pct")
        if isinstance(gate, dict):  # per-candidate gate results (round 4+)
            extra = ("; conformance gate worst headline MAE " + ", ".join(
                f"{k} {v:.3f}%" for k, v in gate.items()))
        elif isinstance(gate, (int, float)):
            extra = f"; conformance gate worst headline MAE {gate:.3f}%"
        else:
            extra = ""
        vsc = tuning.get("precision_gate_vs_control_mae_pct")
        if isinstance(vsc, dict) and vsc:
            extra += ("; same-seed diff vs highest " + ", ".join(
                f"{k} {v:.4f}%" for k, v in vsc.items()))
        pbs = tuning.get("precision_by_scene")
        if isinstance(pbs, dict) and pbs:
            extra += ("; per-scene adoption " + ", ".join(
                f"{k[:8]}…={v}" for k, v in pbs.items()))
        ab.append(f"| intersection matmul precision | "
                  f"**{tuning['precision']}** "
                  f"| {_ab_detail(tuning.get('precision_frame_ms'))}{extra} |")
    if "fast_equirect" in tuning:
        ab.append(f"| fast equirect addressing | "
                  f"**{'ON' if tuning['fast_equirect'] else 'off'}** "
                  f"| {_ab_detail(tuning.get('equirect_frame_ms'))} |")
    if "sky_split" in tuning:
        sg = tuning.get("sky_gate")
        extra = ""
        if isinstance(sg, dict) and "worst_headline_mae_pct" in sg:
            extra = (f"; full-conformance gate {sg['worst_headline_mae_pct']:.3f}%"
                     f" vs baseline {sg.get('baseline_headline_mae_pct', 0):.3f}%"
                     f" ({'PASS' if sg.get('pass') else 'FAIL'})")
        ab.append(f"| sky split (zero-row group expectation) | "
                  f"**{'ON' if tuning['sky_split'] else 'off'}** "
                  f"| {_ab_detail(tuning.get('sky_frame_ms'))}{extra} |")
    if "batch_rays" in tuning:
        ab.append(f"| kernel rays per step | "
                  f"**{tuning['batch_rays']}** "
                  f"| {_ab_detail(tuning.get('batch_rays_frame_ms'))} |")
    if ab:
        lines.append("A/B-measured tuning (adopted via `artifacts/tuning.json`"
                     " — every later process picks these up):")
        lines.append("")
        lines.append("| lever | adopted | measured (ms) |")
        lines.append("|---|---|---|")
        lines.extend(ab)
        lines.append("")

    # --- anatomy
    for scene, a in sorted(anatomy.items()):
        st = a.get("stages_ms", {})
        if not st:
            continue
        lines.append(f"Frame anatomy, {scene} @{a.get('samples')} "
                     f"(staged sub-jits, {a.get('platform')}; tuning "
                     f"{a.get('tuning')}):")
        lines.append("")
        lines.append("| stage | ms |")
        lines.append("|---|---|")
        for label, ms in st.items():
            lines.append(f"| {label} | {ms} |")
        lines.append("")

    if conf:
        worst = conf.get("worst_headline_mae_pct")
        plat = conf.get("platform", "?")
        if isinstance(worst, (int, float)):
            lines.append(f"Conformance ({plat}): worst headline MAE "
                         f"**{worst:.3f}%** across all golden configs "
                         f"(`artifacts/conformance.json`).")
            lines.append("")

    if not lines:
        lines = ["_No batch artifacts found yet._", ""]
    return "\n".join(lines).rstrip() + "\n"


def _ab_detail(per_scene):
    """'natural 52.4→48.1, ofstad 128.5→99.0' from a {scene: {variant: ms}}
    measurement dict (variant keys sorted so base comes first where the
    stage wrote base-variant-first ordering: off/exact/highest/1)."""
    if not isinstance(per_scene, dict) or not per_scene:
        return "—"
    base_first = ["off", "exact", "highest", "1", "False", "false"]

    def order(k):
        k = str(k)
        if k in base_first:
            return (base_first.index(k), 0, k)
        try:  # numeric variants (unroll factors) sort numerically
            return (99, int(k), k)
        except ValueError:
            return (99, 0, k)

    parts = []
    for scene, variants in sorted(per_scene.items()):
        if not isinstance(variants, dict):
            continue
        vs = sorted(variants.items(), key=lambda kv: order(kv[0]))
        seq = "→".join(f"{ms:.1f}" for _k, ms in vs
                       if isinstance(ms, (int, float)))
        keys = "/".join(str(k) for k, _ in vs)
        parts.append(f"{scene} {seq} ({keys})")
    return "; ".join(parts) if parts else "—"


def build_readme_headline():
    """The README 'current headline' paragraph."""
    detail = _load("bench_detail.json")
    lkg = _load("artifacts/bench_lkg.json")
    sweep = detail.get("sweep", {})
    if not sweep:
        return None
    top = str(max(int(s) for s in sweep))
    row = sweep[top]
    rps = row.get("rays_per_s", 0.0)
    scene = detail.get("scene", "natural")
    bits = [
        f"Current headline (single TPU v5e chip, reference speedTest "
        f"protocol, {scene} scene, {detail.get('ommatidia', 1000)}-"
        f"ommatidium eye @ {top} samples/omm): "
        f"**{row.get('pipelined_ms', 0.0):.1f} ms/frame pipelined = "
        f"{rps:.2e} ommatidial rays/s** "
        f"({rps / BASELINE_RAYS_PER_S:.1%} of the RTX 2080 Ti reference "
        f"per chip"]
    if rps > 0:
        # WEAK scaling: 8 chips each carrying this whole workload (the
        # measured 1/8-slice shows per-chip fixed costs do not shrink —
        # bench_detail slice_scaling; strong scaling of THIS eye is far
        # lower)
        bits.append(f"; v5e-8 weak-scaling projection (8x the ommatidia) "
                    f"{8 * rps:.1e} rays/s")
    bits.append(").")
    txt = "".join(bits)
    of = detail.get("ofstad", {})
    if top in of:
        o = of[top]
        txt += (f"  The ofstad arena renders in "
                f"**{o.get('pipelined_ms', 0.0):.1f} ms** @{top} "
                f"(reference {BASELINE_OFSTAD_MS} ms on the 2080 Ti).")
    burst = detail.get("burst_samples1")
    if burst:
        txt += (f"  Interactive regime: samples=1 stacked bursts run at "
                f"{burst.get('ms_per_frame', 0.0):.2f} ms/frame "
                f"({burst.get('fps', 0.0):.0f} FPS equivalent).")
    tun = detail.get("tuning") or lkg.get("tuning")
    if tun:
        txt += (f"  Measured-on-TPU tuning active: {tun}.")
    when = lkg.get("measured")
    if when:
        txt += f"  (Measured {when}; details in `docs/performance.md`.)"
    return txt


def splice(path, begin, end, body, dry_run=False):
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
    if not pat.search(text):
        print(f"[post_batch_report] markers missing in {path}; skipped")
        return False
    # replacement via a callable: artifact-derived text may contain
    # backslashes, which re.sub would interpret as template escapes
    new = pat.sub(lambda _m: begin + "\n" + body.rstrip() + "\n" + end,
                  text, count=1)
    if new == text:
        print(f"[post_batch_report] {path} unchanged")
        return False
    if dry_run:
        print(f"[post_batch_report] would update {path}")
        return True
    with open(path, "w") as f:
        f.write(new)
    print(f"[post_batch_report] updated {path}")
    return True


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    dry = "--dry-run" in argv
    perf = build_perf_section()
    splice(os.path.join(ROOT, "docs", "performance.md"),
           "<!-- MEASURED-BATCH:BEGIN -->", "<!-- MEASURED-BATCH:END -->",
           perf, dry_run=dry)
    headline = build_readme_headline()
    if headline is None:
        print("[post_batch_report] no sweep in bench_detail.json; "
              "README headline left as-is")
    else:
        splice(os.path.join(ROOT, "README.md"),
               "<!-- MEASURED-HEADLINE:BEGIN -->",
               "<!-- MEASURED-HEADLINE:END -->", headline, dry_run=dry)
    if dry:
        print("---- docs/performance.md section ----")
        print(perf)
        if headline:
            print("---- README headline ----")
            print(headline)


if __name__ == "__main__":
    main()
