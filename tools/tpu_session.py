"""One-session TPU measurement batch.

The axon tunnel wedges when client sessions churn or overlap (CLAUDE.md),
so every TPU measurement this round runs inside ONE process: bench sweep,
frame anatomy, lit-vs-unlit factor, and the conformance report.  Results
append to stdout as they land, so a wedge mid-run still leaves the earlier
numbers on disk.

Usage: python tools/tpu_session.py [bench] [anatomy] [lit] [conformance]
(no args = all).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/cr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def log(msg):
    print(msg, flush=True)


def run_bench():
    """The bench.py protocol inline (same process/session)."""
    os.environ.setdefault("BENCH_FRAMES", "10")
    bench.main()


def run_anatomy():
    from tools import frame_anatomy  # noqa: F401  (it self-runs via main)
    for which in ("natural", "ofstad"):
        sys.argv = ["frame_anatomy.py", which, "3200"]
        try:
            frame_anatomy.main()
        except Exception as e:
            log(f"anatomy {which} failed: {e!r}")


def run_lit():
    """Lit-vs-unlit factor at 1000 samples on the natural scene."""
    r, name = bench.build_renderer()
    r.set_render_size(r.get_current_eye_ommatidial_count(), 1)
    r.set_current_eye_samples_per_ommatidium(1000)
    for _ in range(3):
        r.render_frame()
    n = 6
    unlit = r.render_frames_pipelined(n) / n
    r.set_lighting(True)
    for _ in range(3):
        r.render_frame()
    lit = r.render_frames_pipelined(n) / n
    r.set_lighting(False)
    log(f"LIT natural @1000: unlit {unlit:.2f} ms, lit {lit:.2f} ms, "
        f"factor {lit / unlit:.2f}x")


def run_conformance():
    from tools import conformance_report
    conformance_report.main([])


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"bench", "anatomy", "lit", "conformance"}
    t0 = time.time()
    if "bench" in which:
        run_bench()
        log(f"# bench done at {time.time()-t0:.0f}s")
    if "anatomy" in which:
        run_anatomy()
        log(f"# anatomy done at {time.time()-t0:.0f}s")
    if "lit" in which:
        run_lit()
        log(f"# lit done at {time.time()-t0:.0f}s")
    if "conformance" in which:
        run_conformance()
        log(f"# conformance done at {time.time()-t0:.0f}s")
