"""Triangle clustering: the TPU-shaped acceleration structure.

OptiX answers "which triangles might this ray hit?" with a per-ray BVH
traversal — divergent control flow and pointer chasing that a vector machine
cannot hide.  The TPU answer exploits the compound-eye workload's structure:
all samples of an ommatidium live inside a narrow acceptance cone, so culling
is done ONCE per ommatidium (amortised over every sample) against a flat list
of triangle clusters, and the surviving clusters are traced densely.

The build (host, numpy, at scene-load time — the analogue of the reference's
GAS build in MulticamScene::buildMeshAccels): recursive median split over
triangle centroids along the widest axis, producing leaves of at most
`leaf_size` triangles.  Triangles are REORDERED so each cluster is a
contiguous, padded row block — a cluster fetch is then a dynamic slice, not a
gather.  Padding uses degenerate (all-zero) triangles whose intersection
determinant is always 0.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class ClusterSet:
    """Flat cluster arrays (C clusters x L triangles)."""

    leaf_size: int
    # padded, cluster-ordered triangle data; shape (C*L, 3)
    v0: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    tri_id: np.ndarray  # (C, L) int32 original triangle index, -1 = padding
    aabb_min: np.ndarray  # (C, 3)
    aabb_max: np.ndarray  # (C, 3)
    # bounding sphere per cluster (for the angular cull test)
    sphere_center: np.ndarray  # (C, 3)
    sphere_radius: np.ndarray  # (C,)
    # sub-spheres per cluster (recursive median splits): tighter angular
    # culling for elongated/curved clusters.  H=2 for large scenes (cull cost
    # scales with C*H); H=8 for small-cluster-count scenes (closed arenas)
    # where fine granularity is what makes culling work at all.
    half_center: np.ndarray = None  # (C, H, 3)
    half_radius: np.ndarray = None  # (C, H)

    _device_cache: Optional[Dict[str, Any]] = field(default=None, repr=False)

    @property
    def num_clusters(self) -> int:
        return int(self.aabb_min.shape[0])

    def device_arrays(self) -> Dict[str, Any]:
        if self._device_cache is None:
            import jax.numpy as jnp

            from compound_ray_tpu.trace.plucker import triangle_constants

            c, l = self.tri_id.shape
            tri = triangle_constants(self.v0, self.e1, self.e2)
            self._device_cache = {
                "v0": jnp.asarray(self.v0.reshape(c, l, 3)),
                "e1": jnp.asarray(self.e1.reshape(c, l, 3)),
                "e2": jnp.asarray(self.e2.reshape(c, l, 3)),
                "edge6": jnp.asarray(
                    np.asarray(tri["edge6"], np.float32).reshape(c, l, 3, 6)
                ),
                "normal": jnp.asarray(
                    np.asarray(tri["normal"], np.float32).reshape(c, l, 3)
                ),
                "c0": jnp.asarray(np.asarray(tri["c0"], np.float32).reshape(c, l)),
                "tri_id": jnp.asarray(self.tri_id),
                "aabb_min": jnp.asarray(self.aabb_min),
                "aabb_max": jnp.asarray(self.aabb_max),
                "sphere_center": jnp.asarray(self.sphere_center),
                "sphere_radius": jnp.asarray(self.sphere_radius),
            }
        return self._device_cache


def _median_split(centroids: np.ndarray, indices: np.ndarray, leaf_size: int,
                  out: List[np.ndarray]) -> None:
    if len(indices) <= leaf_size:
        out.append(indices)
        return
    c = centroids[indices]
    axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
    order = np.argsort(c[:, axis], kind="stable")
    half = len(indices) // 2
    _median_split(centroids, indices[order[:half]], leaf_size, out)
    _median_split(centroids, indices[order[half:]], leaf_size, out)


def build_clusters(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, leaf_size: int = 64
) -> ClusterSet:
    """Build the cluster set for a triangle soup (host-side, one-time)."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n = v0.shape[0]
    if n == 0:
        z = np.zeros((leaf_size, 3), np.float32)
        return ClusterSet(
            leaf_size=leaf_size,
            v0=z, e1=z.copy(), e2=z.copy(),
            tri_id=np.full((1, leaf_size), -1, np.int32),
            aabb_min=np.zeros((1, 3), np.float32),
            aabb_max=np.zeros((1, 3), np.float32),
            sphere_center=np.zeros((1, 3), np.float32),
            sphere_radius=np.zeros(1, np.float32),
            half_center=np.zeros((1, 2, 3), np.float32),
            half_radius=np.zeros((1, 2), np.float32),  # H=2 trivial case
        )

    p1 = v0 + e1
    p2 = v0 + e2

    leaves: List[np.ndarray] = []
    try:  # native median-split (native/compoundray_native.cpp) when built
        from compound_ray_tpu import native_ext

        nat = native_ext.build_cluster_order(
            np.concatenate([v0, e1, e2], axis=1), leaf_size
        )
    except Exception:
        nat = None
    if nat is not None:
        order, sizes = nat
        off = 0
        for s in sizes:
            leaves.append(order[off:off + s].astype(np.int64))
            off += s
    else:
        centroids = (v0 + p1 + p2) / 3.0
        _median_split(centroids, np.arange(n), leaf_size, leaves)
    c = len(leaves)

    pv0 = np.zeros((c, leaf_size, 3), np.float32)
    pe1 = np.zeros((c, leaf_size, 3), np.float32)
    pe2 = np.zeros((c, leaf_size, 3), np.float32)
    tri_id = np.full((c, leaf_size), -1, np.int32)
    amin = np.zeros((c, 3), np.float32)
    amax = np.zeros((c, 3), np.float32)
    # fine sub-spheres for small scenes; coarse for big ones (cull cost ~ C*H)
    n_half = 8 if c <= 64 else 2
    half_center = np.zeros((c, n_half, 3), np.float32)
    half_radius = np.zeros((c, n_half), np.float32)

    centroids_all = (v0 + p1 + p2) / 3.0
    for i, leaf in enumerate(leaves):
        k = len(leaf)
        pv0[i, :k] = v0[leaf]
        pe1[i, :k] = e1[leaf]
        pe2[i, :k] = e2[leaf]
        tri_id[i, :k] = leaf
        pts = np.concatenate([v0[leaf], p1[leaf], p2[leaf]])
        amin[i] = pts.min(axis=0)
        amax[i] = pts.max(axis=0)
        # sub-spheres: recursive median splits along the locally widest
        # centroid axis down to n_half parts
        cen = centroids_all[leaf]

        def split2(sel_idx):
            if len(sel_idx) <= 1:
                return [sel_idx, sel_idx]
            cc = cen[sel_idx]
            ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
            order = sel_idx[np.argsort(cc[:, ax], kind="stable")]
            h = max(len(order) // 2, 1)
            return [order[:h], order[h:] if len(order) > h else order[:1]]

        parts = [np.arange(k)]
        while len(parts) < n_half:
            parts = [q for p_ in parts for q in split2(p_)]
        for hi, part in enumerate(parts):
            sel = leaf[part]
            hp = np.concatenate([v0[sel], p1[sel], p2[sel]])
            hmin, hmax = hp.min(axis=0), hp.max(axis=0)
            half_center[i, hi] = (hmin + hmax) / 2.0
            half_radius[i, hi] = np.linalg.norm(hmax - half_center[i, hi])

    center = (amin + amax) / 2.0
    radius = np.linalg.norm(amax - center, axis=1)
    return ClusterSet(
        half_center=half_center,
        half_radius=half_radius,
        leaf_size=leaf_size,
        v0=pv0.reshape(-1, 3),
        e1=pe1.reshape(-1, 3),
        e2=pe2.reshape(-1, 3),
        tri_id=tri_id,
        aabb_min=amin,
        aabb_max=amax,
        sphere_center=center,
        sphere_radius=radius.astype(np.float32),
    )


def scene_clusters(scene, leaf_size: int = 64) -> ClusterSet:
    """Cached cluster set for a FlatScene (built on first use)."""
    cache = scene._accel_cache
    if cache is None or cache.leaf_size != leaf_size:
        scene._accel_cache = build_clusters(scene.v0, scene.e1, scene.e2, leaf_size)
    return scene._accel_cache
