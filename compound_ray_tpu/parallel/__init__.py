from compound_ray_tpu.parallel.sharding import (
    make_eye_mesh,
    render_means_sharded,
)

__all__ = ["make_eye_mesh", "render_means_sharded"]
