from compound_ray_tpu.scene.gltf import GLTFDocument, load_gltf
from compound_ray_tpu.scene.eye_io import Ommatidium, read_eye_file, write_eye_file
from compound_ray_tpu.scene.flat import FlatScene, load_scene

__all__ = [
    "GLTFDocument",
    "load_gltf",
    "Ommatidium",
    "read_eye_file",
    "write_eye_file",
    "FlatScene",
    "load_scene",
]
