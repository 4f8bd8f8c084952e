"""Backend dispatch for the compound means pipeline.

Chooses between the brute-force XLA sweep (small scenes, lighting path) and
the cone-culled sweep.  The shortlist width K is highly non-uniform across
ommatidia (horizon-grazing cones intersect many clusters, sky-facing cones
almost none), so ommatidia are partitioned into power-of-two K-classes and
the kernel runs once per class — total intersection work tracks the MEAN
surviving-cluster count instead of the max.  Class sizes are padded to
limit recompilation as the camera moves.

The cone jitter angles are drawn ONCE for the whole eye (same key/layout as
the brute-force path) and sliced per class, so backend choice and class
partitioning never change the sampled noise.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.accel.clusters import scene_clusters
from compound_ray_tpu.accel.cull import cone_cull_clusters, shortlist_from_mask
from compound_ray_tpu.eye.render import render_compound_means
from compound_ray_tpu.eye.sampling import sample_angles
from compound_ray_tpu.trace.culled import render_means_culled_angles

from compound_ray_tpu.config import get_config

_K_CLASSES = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _pad_count(n: int, chunk: int = 64) -> int:
    """Pad a class population to chunk multiples with power-of-2-ish growth
    so per-pose population jitter reuses compiled kernels."""
    if n <= chunk:
        return chunk
    p = chunk
    while p < n:
        p = p * 2 if p < 1024 else p + 1024
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
    omm_chunk: Optional[int] = None,
    sample_chunk: Optional[int] = None,
) -> jnp.ndarray:
    cfg = get_config()
    # chunking defaults come from config (CR_TPU_OMM_CHUNK/CR_TPU_SAMPLE_CHUNK)
    omm_chunk = cfg.omm_chunk if omm_chunk is None else omm_chunk
    sample_chunk = cfg.sample_chunk if sample_chunk is None else sample_chunk
    if use_lighting or scene_flat.num_triangles < cfg.min_triangles_for_culling:
        return render_compound_means(
            scene_dev, ommatidia, position, local_space, key, samples, background,
            use_lighting, lights,
        )

    n = ommatidia.shape[0]
    clusters = scene_clusters(scene_flat, cfg.xla_leaf_size)
    cdev = clusters.device_arrays()
    cull = cone_cull_clusters(
        ommatidia, position, local_space,
        cdev["sphere_center"], cdev["sphere_radius"], cfg.cull_sigmas,
    )
    counts = np.asarray(jax.device_get(cull["count"]))  # host sync (per frame)
    splay, spin = sample_angles(key, n, samples, ommatidia[:, 6])

    out = jnp.zeros((n, 3), jnp.float32)
    mask = cull["mask"]
    prev_k = 0
    for k_class in _K_CLASSES:
        sel = np.flatnonzero((counts > prev_k) & (counts <= k_class))
        prev_k = k_class
        if len(sel) == 0:
            if k_class >= counts.max():
                break
            continue
        n_pad = _pad_count(len(sel))
        # pad by repeating the first selected ommatidium (results discarded)
        sel_p = np.concatenate([sel, np.full(n_pad - len(sel), sel[0])])
        sel_j = jnp.asarray(sel_p)
        k_eff = min(k_class, clusters.num_clusters)
        ids, valid = shortlist_from_mask(mask[sel_j], k_eff)
        means = render_means_culled_angles(
            scene_dev, cdev, ommatidia[sel_j], position, local_space,
            splay[:, sel_j], spin[:, sel_j], ids, valid, background,
            omm_chunk=omm_chunk, sample_chunk=sample_chunk,
        )
        out = out.at[jnp.asarray(sel)].set(means[: len(sel)])
        if k_class >= counts.max():
            break
    return out
