from compound_ray_tpu.api.renderer import EyeRenderer

__all__ = ["EyeRenderer"]
