from compound_ray_tpu.projection.project import (
    PROJECTIONS,
    project_frame,
    voronoi_index_map,
    decode_projection_map_id,
)

__all__ = [
    "PROJECTIONS",
    "project_frame",
    "voronoi_index_map",
    "decode_projection_map_id",
]
