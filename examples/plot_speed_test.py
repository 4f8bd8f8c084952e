"""Plot speed-test result files (python-examples/speed-test/plotter.py).

Reads the `*-frame-rendertime-averages-*.txt` files produced by
examples/speed_test.py (or the reference's speedTest.py — same format: one
mean frame-time in ms per line) and plots frame time + derived rays/s.
"""

import argparse
import os
import re

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="result .txt files")
    ap.add_argument("-n", "--ommatidia", type=int, default=1000)
    ap.add_argument("-s", "--samples", type=int, nargs="+", default=None,
                    help="sample counts per line (default: 1..len)")
    ap.add_argument("-o", "--output", default="speed-test-plot.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    for path in args.files:
        times = np.loadtxt(path)
        xs = np.asarray(args.samples) if args.samples else np.arange(1, len(times) + 1)
        label = os.path.basename(path).split("-frame-rendertime")[0]
        ax1.plot(xs, times, marker=".", label=label)
        rays = args.ommatidia * xs / (times / 1000.0)
        ax2.plot(xs, rays, marker=".", label=label)
    ax1.set(xlabel="samples per ommatidium", ylabel="frame time (ms)",
            title="Frame render time")
    ax2.set(xlabel="samples per ommatidium", ylabel="ommatidial rays / s",
            title="Throughput")
    ax2.set_yscale("log")
    for ax in (ax1, ax2):
        ax.grid()
        ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
