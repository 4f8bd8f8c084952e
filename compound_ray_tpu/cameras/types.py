"""Camera types with reference-equivalent pose math.

The pose model (position + 3-axis LocalSpace) and every mutation below mirror
cameras/DataRecordCamera.h:26-101 in the reference; the per-type specialised
data mirrors cameras/{Perspective,Panoramic,Orthographic}CameraDataTypes.h and
cameras/CompoundEyeDataTypes.h.  All host state is numpy; device pytrees are
assembled per-render by the API layer.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

if False:  # typing only; deferred at runtime to avoid a scene<->cameras cycle
    from compound_ray_tpu.scene.eye_io import Ommatidium


def rotate_point(point: np.ndarray, angle: float, axis: np.ndarray) -> np.ndarray:
    """Axis-angle (Rodrigues) rotation, normalising the axis
    (DataRecordCamera.h:96-100)."""
    axis = np.asarray(axis, dtype=np.float64)
    n = np.linalg.norm(axis)
    if n == 0:
        # ill-defined input: rotating about a zero axis is identity here
        # (the reference's unconditional normalize NaNs the whole basis;
        # skipping normalisation would silently SCALE point by cos(angle))
        return np.asarray(point, dtype=np.float64)
    axis = axis / n
    c, s = math.cos(angle), math.sin(angle)
    return (
        c * point
        + s * np.cross(axis, point)
        + (1.0 - c) * np.dot(axis, point) * axis
    )


class Camera:
    """Pose = position + LocalSpace rows (xAxis, yAxis, zAxis=view dir)."""

    is_compound = False
    raygen_name = "__raygen__pinhole"

    def __init__(self, name: str):
        self.name = name
        self.position = np.zeros(3, dtype=np.float64)
        # rows: xAxis (right), yAxis (up), zAxis (forward)
        self.local_space = np.eye(3, dtype=np.float64)

    # -- pose mutations (semantics of DataRecordCamera.h) -----------------------
    def set_position(self, pos) -> None:
        self.position = np.array(pos, dtype=np.float64)

    def set_local_space(self, x_axis, y_axis, z_axis) -> None:
        self.local_space = np.stack(
            [np.asarray(x_axis, float), np.asarray(y_axis, float), np.asarray(z_axis, float)]
        )

    def set_pose_matrix(self, m: np.ndarray) -> None:
        """4x4 matrix whose columns are the local axes + translation
        (DataRecordCamera.h:41-48)."""
        m = np.asarray(m, dtype=np.float64)
        self.local_space = np.stack([m[:3, 0], m[:3, 1], m[:3, 2]])
        self.position = np.array(m[:3, 3])

    def look_at(self, target, up=(0.0, 1.0, 0.0)) -> None:
        z = np.asarray(target, float) - self.position
        z = z / np.linalg.norm(z)
        x = np.cross(z, np.asarray(up, float))
        x = x / np.linalg.norm(x)
        y = np.cross(x, z)
        y = y / np.linalg.norm(y)
        self.local_space = np.stack([x, y, z])

    def reset_pose(self) -> None:
        self.position = np.zeros(3)
        self.local_space = np.eye(3)

    def transform_to_world(self, v) -> np.ndarray:
        v = np.asarray(v, float)
        ls = self.local_space
        return v[0] * ls[0] + v[1] * ls[1] + v[2] * ls[2]

    def rotate_around(self, angle: float, axis) -> None:
        self.local_space = np.stack(
            [rotate_point(self.local_space[i], angle, axis) for i in range(3)]
        )

    def rotate_locally_around(self, angle: float, local_axis) -> None:
        self.rotate_around(angle, self.transform_to_world(local_axis))

    def move(self, step) -> None:
        self.position = self.position + np.asarray(step, float)

    def move_locally(self, local_step) -> None:
        self.move(self.transform_to_world(local_step))

    def set_pose(self, pos_x, pos_y, pos_z, rot_x, rot_y, rot_z) -> None:
        """Reset, rotate about world X/Y/Z in that order, then translate
        (libEyeRenderer.cpp:441-450)."""
        self.reset_pose()
        self.rotate_around(rot_x, (1.0, 0.0, 0.0))
        self.rotate_around(rot_y, (0.0, 1.0, 0.0))
        self.rotate_around(rot_z, (0.0, 0.0, 1.0))
        self.move((pos_x, pos_y, pos_z))


class PerspectiveCamera(Camera):
    """Scale-vector pinhole (cameras/PerspectiveCamera.cpp:13-31)."""

    raygen_name = "__raygen__pinhole"

    def __init__(self, name: str):
        super().__init__(name)
        self.scale = np.array([10.0, 10.0, 1.0], dtype=np.float64)
        self.aspect_ratio = 1.0

    def set_y_fov(self, yfov_deg: float) -> None:
        yfov = math.radians(yfov_deg)
        self.scale[1] = math.tan(yfov / 2.0) * self.scale[2]
        self.scale[0] = self.scale[1] * self.aspect_ratio

    def set_x_fov(self, xfov_deg: float) -> None:
        xfov = math.radians(xfov_deg)
        self.scale[0] = math.tan(xfov / 2.0) * self.scale[2]
        # y tracks the NEW x extent (mirror of set_y_fov); deriving it
        # from the old scale[1] shrank y on every call
        self.scale[1] = self.scale[0] / self.aspect_ratio

    def set_aspect_ratio(self, r: float) -> None:
        self.aspect_ratio = r
        prev_yfov = math.atan(self.scale[1] / self.scale[2]) * 2.0
        self.set_y_fov(math.degrees(prev_yfov))


class PanoramicCamera(Camera):
    """Equirectangular 360 camera (cameras/PanoramicCamera*)."""

    raygen_name = "__raygen__panoramic"

    def __init__(self, name: str):
        super().__init__(name)
        self.start_radius = 0.0

    def set_start_radius(self, r: float) -> None:
        self.start_radius = float(r)


class OrthographicCamera(Camera):
    """XY-scaled parallel projection (cameras/OrthographicCamera*)."""

    raygen_name = "__raygen__orthographic"

    def __init__(self, name: str):
        super().__init__(name)
        self.scale = np.array([1.0, 1.0], dtype=np.float64)

    def set_xy_scale(self, xmag: float, ymag: float) -> None:
        self.scale = np.array([xmag, ymag], dtype=np.float64)


PROJECTION_NAMES = (
    "raw_ommatidial_samples",
    "single_dimension",
    "single_dimension_fast",
    "spherical_positionwise",
    "spherical_orientationwise",
    "spherical_split_orientationwise",
    "spherical_positionwise_ids",
    "spherical_orientationwise_ids",
)


class CompoundEyeCamera(Camera):
    """Compound eye: ommatidial array + samples/ommatidium + projection name.

    Mirrors cameras/CompoundEye.{h,cpp}; the device sample/average buffers of
    the reference do not exist here — the fused TPU pipeline keeps per-sample
    data transient and materialises only the per-ommatidium mean (plus raw
    samples when the raw projection or per-sample access requires them).
    """

    is_compound = True

    def __init__(
        self,
        name: str,
        projection: str,
        ommatidia: "List[Ommatidium]",
        eye_data_path: str = "",
    ):
        from compound_ray_tpu.scene.eye_io import ommatidia_to_array

        super().__init__(name)
        self.projection = projection  # e.g. "spherical_orientationwise"
        self.eye_data_path = eye_data_path
        self.ommatidia = ommatidia_to_array(ommatidia)  # (N, 8) float32
        self.samples_per_ommatidium = 1
        # Analogue of randomsConfigured for RNG reproducibility: a per-eye
        # frame counter folded into the counter-based PRNG key by the render
        # paths.  set_samples_per_ommatidium resets it (the reference
        # re-inits curand states there: CompoundEye.cpp:271-280), as does an
        # ommatidial-count change.
        self.rng_frame = 0
        self._dev_cache = None  # (omms, positions, directions) device copies

    def device_ommatidia(self):
        """Cached device copies (omms (N,8), positions (N,3), dirs (N,3)):
        the per-frame jnp.asarray + slice of the eye arrays was measurable
        eager-dispatch overhead in the small-frame regime (VERDICT r2 #6).
        Invalidated by set_ommatidia."""
        import jax.numpy as jnp

        if self._dev_cache is None:
            omms = jnp.asarray(self.ommatidia)
            self._dev_cache = (omms, omms[:, 0:3], omms[:, 3:6])
        return self._dev_cache

    @property
    def ommatidial_count(self) -> int:
        return int(self.ommatidia.shape[0])

    def set_ommatidia(self, omms) -> None:
        from compound_ray_tpu.scene.eye_io import ommatidia_to_array

        old_count = self.ommatidia.shape[0]
        if isinstance(omms, np.ndarray):
            self.ommatidia = np.asarray(omms, dtype=np.float32).reshape(-1, 8)
        else:
            self.ommatidia = ommatidia_to_array(list(omms))
        self._dev_cache = None
        if self.ommatidia.shape[0] != old_count:
            # reference reallocates the curand states only when the count
            # changes (reconfigureOmmatidialCount, CompoundEye.cpp:35-49)
            self.rng_frame = 0

    def set_samples_per_ommatidium(self, s: int) -> None:
        # resets the random streams UNCONDITIONALLY, even at the same count —
        # the reference re-allocates its curand states on every call
        # (setSamplesPerOmmatidium, CompoundEye.cpp:271-277)
        self.samples_per_ommatidium = max(1, int(s))
        self.rng_frame = 0

    def change_samples_per_ommatidium_by(self, delta: int) -> None:
        self.set_samples_per_ommatidium(self.samples_per_ommatidium + delta)

    def set_projection(self, name: str) -> None:
        self.projection = name
