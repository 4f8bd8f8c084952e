from compound_ray_tpu.cameras.types import (
    Camera,
    CompoundEyeCamera,
    OrthographicCamera,
    PanoramicCamera,
    PerspectiveCamera,
)

__all__ = [
    "Camera",
    "PerspectiveCamera",
    "PanoramicCamera",
    "OrthographicCamera",
    "CompoundEyeCamera",
]
