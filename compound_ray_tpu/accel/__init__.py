from compound_ray_tpu.accel.clusters import ClusterSet, build_clusters
from compound_ray_tpu.accel.cull import cone_cull_clusters

__all__ = ["ClusterSet", "build_clusters", "cone_cull_clusters"]
