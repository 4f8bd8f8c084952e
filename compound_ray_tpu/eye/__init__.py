from compound_ray_tpu.eye.sampling import ommatidial_rays
from compound_ray_tpu.eye.render import render_compound_means, render_compound_samples

__all__ = [
    "ommatidial_rays",
    "render_compound_means",
    "render_compound_samples",
]
