from compound_ray_tpu.trace.intersect import intersect_rays
from compound_ray_tpu.trace.shade import shade_rays, make_color

__all__ = ["intersect_rays", "shade_rays", "make_color"]
