"""Equidistant eye synthesis by Riesz s-energy minimisation (eyeGenerator/).

The reference relaxes N random points on the unit sphere with a
random-move + backtrack search until the per-point energy variance falls
under a cap (EquilibriumGenerator.cpp:60-120, SphericalCoordinate.cpp:25-73).
The TPU-native version minimises the same Riesz s-energy

    E = sum_{i != j} 1 / |p_i - p_j|^s

with projected gradient descent in JAX — deterministic, vectorised, and a
few orders of magnitude faster at 1000+ points.  A `random_move` mode
reproduces the reference's stochastic search for comparison.

Output: `.eye` rows in the CURRENT 8-field format (the reference's generator
still writes the legacy 7-field format, eyeGenerator/main.cpp:78 — fixed
here per SURVEY.md §7).
"""

from __future__ import annotations

import argparse
import math
from typing import List, Optional

import numpy as np

from compound_ray_tpu.scene.eye_io import Ommatidium, write_eye_file


def _sphere_random(n: int, rng: np.random.Generator) -> np.ndarray:
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def riesz_energy(points: np.ndarray, s: float = 1.0) -> float:
    d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return float(np.sum(1.0 / d**s) / 2.0)


def relax_gradient(
    points: np.ndarray,
    s: float = 1.0,
    iterations: int = 2000,
    lr: float = 5e-4,
) -> np.ndarray:
    """Projected gradient descent on the Riesz energy (JAX)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(p, lr_):
        diff = p[:, None, :] - p[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(jnp.eye(p.shape[0], dtype=bool), jnp.inf, d2)
        # grad of 1/d^s wrt p_i: -s * diff / d^(s+2)
        w = s / jnp.power(d2, (s + 2.0) / 2.0)
        g = jnp.sum(w[:, :, None] * diff, axis=1)  # ascent dir of -E
        p = p + lr_ * g
        return p / jnp.linalg.norm(p, axis=1, keepdims=True)

    p = jnp.asarray(points)
    for i in range(iterations):
        # cosine-decay step size keeps late iterations stable
        p = step(p, lr * (0.5 + 0.5 * math.cos(math.pi * i / iterations)))
    return np.asarray(jax.device_get(p))


def relax_random_move(
    points: np.ndarray,
    s: float = 1.0,
    step_size: float = 1e-4,
    variance_cap: float = 1.10,
    proximity: int = 12,
    max_iterations: int = 200,
    seed: int = 42,
) -> np.ndarray:
    """The reference's stochastic relaxation: random move + backtrack on the
    proximity-truncated energy, until energy variance < cap."""
    rng = np.random.default_rng(seed)
    p = points.copy()
    n = len(p)

    def point_energy(i):
        d = np.linalg.norm(p - p[i], axis=1)
        d[i] = np.inf
        nearest = np.sort(d)[:proximity]
        return float(np.sum(1.0 / nearest**s))

    energy_var = 1.0
    avg_energy = 0.0
    for _ in range(max_iterations):
        order = rng.permutation(n)
        s_e = 0.0
        s_var = 0.0
        for i in order:
            e0 = point_energy(i)
            s_e += e0
            s_var += (e0 - avg_energy) ** 2
            old = p[i].copy()
            move = rng.normal(size=3) * step_size * energy_var
            p[i] = p[i] + move
            p[i] /= np.linalg.norm(p[i])
            if point_energy(i) > e0:
                p[i] = old  # backtrack
        avg_energy = s_e / n
        energy_var = s_var / n
        if energy_var <= variance_cap:
            break
    return p


def generate_equidistant_eye(
    n: int,
    acceptance_deg: float = 2.6,
    radius: float = 0.1,
    focal_offset: float = 0.0,
    method: str = "gradient",
    iterations: int = 2000,
    seed: int = 42,
    horizontally_acute: Optional[float] = None,
) -> List[Ommatidium]:
    """Relaxed equidistant eye.

    `horizontally_acute`: optional per-ommatidium acceptance-angle scaling
    toward the horizontal band (the reference's variableDegree eyes): the
    acceptance angle is multiplied by lerp(1, horizontally_acute, |dir.y|).
    """
    rng = np.random.default_rng(seed)
    pts = _sphere_random(n, rng)
    if method == "gradient":
        pts = relax_gradient(pts, iterations=iterations)
    elif method == "random_move":
        pts = relax_random_move(pts)
    else:
        raise ValueError(f"unknown method {method!r}")
    base = math.radians(acceptance_deg)
    out = []
    for d in pts:
        acc = base
        if horizontally_acute is not None:
            acc = base * (1.0 + (horizontally_acute - 1.0) * abs(float(d[1])))
        out.append(Ommatidium(d * radius, d.copy(), acc, focal_offset))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate a relaxed .eye file")
    ap.add_argument("output")
    ap.add_argument("-n", "--count", type=int, default=1000)
    ap.add_argument("-a", "--acceptance-deg", type=float, default=2.6)
    ap.add_argument("-r", "--radius", type=float, default=0.1)
    ap.add_argument("-f", "--focal-offset", type=float, default=0.0)
    ap.add_argument("-m", "--method", choices=("gradient", "random_move"),
                    default="gradient")
    ap.add_argument("-i", "--iterations", type=int, default=2000)
    ap.add_argument("--horizontally-acute", type=float, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)
    omms = generate_equidistant_eye(
        args.count, args.acceptance_deg, args.radius, args.focal_offset,
        args.method, args.iterations, args.seed, args.horizontally_acute,
    )
    write_eye_file(args.output, omms)
    print(f"Wrote {len(omms)} ommatidia to {args.output}")


if __name__ == "__main__":
    main()
