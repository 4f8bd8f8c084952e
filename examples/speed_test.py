"""Frame-rate sweep (python-examples/speedTest.py + speed-test/speedTest.py).

Protocol (reference speed-test/speedTest.py:80-134): switch to a compound
eye, load a 1000-ommatidium equidistant eye, single_dimension_fast shader,
render size (ommatidia x 1), warm up, then average frame time over N frames
at each samples-per-ommatidium setting.  Writes the same style of result
files: `<device>-<scene>-frame-rendertime-averages-(...).txt` with one mean
frame time (ms) per line, plus an FPS variant.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.scene.eye_io import read_eye_file
from compound_ray_tpu.testing import make_sphere_eye


def run_sweep(scene_path, eye_path, samples_list, frames, warmup_s, label):
    r = EyeRenderer(verbose=False)
    r.load_gltf_scene(scene_path)

    if eye_path and os.path.isfile(eye_path):
        omms = read_eye_file(eye_path)
    else:
        omms = make_sphere_eye(1000, acceptance_deg=2.6)
    cam = CompoundEyeCamera("speed-eye", "single_dimension_fast", omms)
    r.scene.cameras.append(cam)
    r.goto_camera(len(r.scene.cameras) - 1)
    center = r.scene.aabb_center()
    cam.set_position((center[0], center[1] + 1.0, center[2]))
    n = r.get_current_eye_ommatidial_count()
    r.set_render_size(n, 1)

    # warm-up (compile + cache)
    t0 = time.time()
    while time.time() - t0 < warmup_s:
        r.render_frame()

    means, fps = [], []
    for s in samples_list:
        r.set_current_eye_samples_per_ommatidium(s)
        r.render_frame()  # shape-change warmup
        times = [r.render_frame() for _ in range(frames)]
        m = float(np.mean(times))
        means.append(m)
        fps.append(1000.0 / m)
        print(f"samples={s}: {m:.3f} ms/frame, {1000.0/m:.1f} FPS, "
              f"{n * s / (m / 1000.0):.3e} rays/s")

    lo, hi = samples_list[0], samples_list[-1]
    base = f"{label}-frame-rendertime"
    np.savetxt(f"{base}-averages-({lo}-{hi}-rays,{frames}-samples).txt",
               np.asarray(means))
    np.savetxt(f"{base}-average-FPSs-({lo}-{hi}-rays,{frames}-samples).txt",
               np.asarray(fps))
    return means


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", "--file",
                    default="/root/reference/data/natural-standin-sky.gltf")
    ap.add_argument("-e", "--eye",
                    default="/root/reference/data/eyes/1000-equidistant.eye")
    ap.add_argument("-s", "--samples", type=int, nargs="+",
                    default=[1, 10, 100, 1000, 3200])
    ap.add_argument("-n", "--frames", type=int, default=50)
    ap.add_argument("-w", "--warmup", type=float, default=10.0)
    ap.add_argument("-l", "--label", default="TPU_v5e-natural")
    args = ap.parse_args(argv)
    run_sweep(args.file, args.eye, args.samples, args.frames, args.warmup,
              args.label)


if __name__ == "__main__":
    main()
