"""Backend dispatch for the compound means pipeline.

Chooses between the brute-force XLA sweep (small scenes, lighting path) and
the cone-culled dense sweep (accel).  The shortlist width K is data-dependent
(max surviving clusters across ommatidia); it is pulled to the host, rounded
up, and the K-static kernel is compiled once per (K, S, N) combination —
cheap because scene + eye geometry are static across frames, the same
amortisation the reference relies on for its GAS build.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from compound_ray_tpu.accel.clusters import scene_clusters
from compound_ray_tpu.accel.cull import cone_cull_clusters, shortlist_from_mask
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.trace.culled import render_means_culled

# below this triangle count the dense brute-force sweep is cheaper than
# cull + gather (test-scene class)
MIN_TRIANGLES_FOR_CULLING = 512

DEFAULT_LEAF_SIZE = 64
CULL_SIGMAS = 5.0


def _round_k(k: int) -> int:
    """Round the shortlist width up to limit recompilation churn."""
    if k <= 4:
        return max(1, k)
    p = 4
    while p < k:
        p *= 2
    return p


def render_means_fast(
    scene_flat,
    scene_dev: Dict[str, Any],
    ommatidia: jnp.ndarray,
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    key: jax.Array,
    samples: int,
    background: int,
    use_lighting: bool = False,
    lights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if use_lighting or scene_flat.num_triangles < MIN_TRIANGLES_FOR_CULLING:
        return render_compound_means(
            scene_dev, ommatidia, position, local_space, key, samples, background,
            use_lighting, lights,
        )

    clusters = scene_clusters(scene_flat, DEFAULT_LEAF_SIZE)
    cdev = clusters.device_arrays()
    cull = cone_cull_clusters(
        ommatidia, position, local_space,
        cdev["sphere_center"], cdev["sphere_radius"], CULL_SIGMAS,
    )
    k_needed = int(jax.device_get(jnp.max(cull["count"])))  # host sync (per frame)
    k = min(clusters.num_clusters, _round_k(k_needed))
    if k == 0:
        k = 1
    ids, valid = shortlist_from_mask(cull["mask"], k)
    return render_means_culled(
        scene_dev, cdev, ommatidia, position, local_space, key,
        ids, valid, samples, background,
    )
