"""Non-compound camera ray generation + image rendering (XLA).

Reproduces the three real-camera raygen programs of shaders.cu:
  __raygen__pinhole       (:198-240)
  __raygen__panoramic     (:242-289)
  __raygen__orthographic  (:291-333)

Pixel convention matches the reference exactly: for pixel (x, y) in a (W, H)
launch, d = 2*(x/W, y/H) - 1 (no half-pixel offset), and the frame buffer is
row-major with index y*W + x (row 0 = d.y == -1).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from compound_ray_tpu.trace.intersect import intersect_rays
from compound_ray_tpu.trace.shade import make_color, shade_rays


def _pixel_grid(width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    dx = 2.0 * xs / width - 1.0
    dy = 2.0 * ys / height - 1.0
    gx, gy = jnp.meshgrid(dx, dy)  # (H,W)
    return gx.reshape(-1), gy.reshape(-1)


def pinhole_rays(position, local_space, scale, width: int, height: int):
    dx, dy = _pixel_grid(width, height)
    x_axis, y_axis, z_axis = local_space[0], local_space[1], local_space[2]
    dirs = (
        z_axis[None, :] * scale[2]
        + dx[:, None] * x_axis[None, :] * scale[0]
        + dy[:, None] * y_axis[None, :] * scale[1]
    )
    origins = jnp.broadcast_to(position, dirs.shape)
    return origins, dirs, 0.01


def panoramic_rays(position, local_space, start_radius, width: int, height: int):
    dx, dy = _pixel_grid(width, height)
    ax = dx * (-jnp.pi) + jnp.pi / 2.0
    ay = dy * (jnp.pi / 2.0)
    cos_y = jnp.cos(ay)
    local = jnp.stack([jnp.cos(ax) * cos_y, jnp.sin(ay), jnp.sin(ax) * cos_y], axis=-1)
    dirs = jnp.matmul(local, local_space,
                      precision=jax.lax.Precision.HIGHEST)  # rows are axes
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = position[None, :] + dirs * start_radius
    return origins, dirs, 0.01


def orthographic_rays(position, local_space, scale, width: int, height: int):
    dx, dy = _pixel_grid(width, height)
    x_axis, y_axis, z_axis = local_space[0], local_space[1], local_space[2]
    origins = (
        position[None, :]
        + dx[:, None] * x_axis[None, :] * scale[0]
        + dy[:, None] * y_axis[None, :] * scale[1]
    )
    dirs = jnp.broadcast_to(z_axis, origins.shape)
    return origins, dirs, 0.01


@functools.partial(
    jax.jit,
    static_argnames=("kind", "width", "height", "background", "use_lighting"),
)
def render_camera_image(
    scene: Dict[str, Any],
    kind: str,  # "pinhole" | "panoramic" | "orthographic"
    position: jnp.ndarray,
    local_space: jnp.ndarray,
    cam_param: jnp.ndarray,  # scale (3,) | start_radius (1,) | scale (2,)
    width: int,
    height: int,
    background: int,
    use_lighting: bool = False,
    lights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render a (H, W, 4) uint8 RGBA image for a real camera."""
    if kind == "pinhole":
        origins, dirs, tmin = pinhole_rays(position, local_space, cam_param, width, height)
    elif kind == "panoramic":
        origins, dirs, tmin = panoramic_rays(
            position, local_space, cam_param[0], width, height
        )
    elif kind == "orthographic":
        origins, dirs, tmin = orthographic_rays(
            position, local_space, cam_param, width, height
        )
    else:
        raise ValueError(f"unknown camera kind {kind!r}")
    hit = intersect_rays(
        origins, dirs, scene["v0"], scene["e1"], scene["e2"], tmin, 1e16
    )
    lighting = {"lights": lights} if use_lighting else None
    rgb = shade_rays(scene, dirs, hit, background, lighting=lighting, origins=origins)
    return make_color(rgb).reshape(height, width, 4)
