"""Compound-eye render pipeline (XLA path).

The per-frame hot path replacing the reference's compound optixLaunch +
summing kernel (libEyeRenderer.cpp:174-244, summing_kernel.cu): generate all
(sample x ommatidium) cone rays, trace, shade, and reduce to per-ommatidium
mean radiance.  Memory for the means path stays O(ommatidia) because the
sample axis is consumed by the reduction inside jit (XLA fuses the mean with
shading); the raw-samples variant materialises (S, N, 3) only when the
raw_ommatidial_samples projection or per-sample analysis requires it.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from compound_ray_tpu.eye.sampling import ommatidial_rays
from compound_ray_tpu.trace.intersect import intersect_rays
from compound_ray_tpu.trace.shade import shade_rays


@functools.partial(jax.jit, static_argnames=("samples", "background", "use_lighting"))
def render_compound_samples(
    scene: Dict[str, Any],
    ommatidia: jnp.ndarray,  # (N,8)
    position: jnp.ndarray,  # (3,)
    local_space: jnp.ndarray,  # (3,3)
    key: jax.Array,
    samples: int,
    background: int,
    use_lighting: bool = False,
    lights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full per-sample radiance, shape (samples, N, 3) float32 linear."""
    n = ommatidia.shape[0]
    origins, dirs, tmin = ommatidial_rays(
        ommatidia, position, local_space, samples, key
    )
    hit = intersect_rays(
        origins, dirs, scene["v0"], scene["e1"], scene["e2"], tmin, 1e16
    )
    lighting = {"lights": lights} if use_lighting else None
    rgb = shade_rays(scene, dirs, hit, background, lighting=lighting, origins=origins)
    return rgb.reshape(samples, n, 3)


@functools.partial(jax.jit, static_argnames=("samples", "background", "use_lighting"))
def render_compound_means(
    scene: Dict[str, Any],
    ommatidia: jnp.ndarray,
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    use_lighting: bool = False,
    lights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-ommatidium mean radiance, shape (N, 3).

    Numerically identical to the reference's write-scaled-then-sum scheme
    (shaders.cu:734 writes result/S; summing_kernel sums) up to float
    reassociation."""
    rgb = render_compound_samples(
        scene, ommatidia, position, local_space, key, samples, background,
        use_lighting, lights,
    )
    return jnp.mean(rgb, axis=0)
