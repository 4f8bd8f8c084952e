from compound_ray_tpu.gui.viewer import Viewer, FlyController

__all__ = ["Viewer", "FlyController"]
