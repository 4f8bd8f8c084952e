"""Procedural scenes and eyes for tests and benchmarks (no external assets)."""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

from compound_ray_tpu.scene.eye_io import Ommatidium
from compound_ray_tpu.scene.flat import FlatScene, build_scene_from_arrays


def box_mesh(center, size) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned box: 8 vertices, 12 triangles (outward winding)."""
    c = np.asarray(center, np.float64)
    s = np.asarray(size, np.float64) / 2.0
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )
    verts = c + corners * s
    # faces as quads over corner indices (x-,x+,y-,y+,z-,z+)
    quads = [
        (0, 1, 3, 2),  # x-
        (4, 6, 7, 5),  # x+
        (0, 4, 5, 1),  # y-
        (2, 3, 7, 6),  # y+
        (0, 2, 6, 4),  # z-
        (1, 5, 7, 3),  # z+
    ]
    faces = []
    for a, b, cc, d in quads:
        faces.append((a, b, cc))
        faces.append((a, cc, d))
    return verts, np.array(faces, np.int64)


def make_box_scene(
    background: str = "simple_sky",
    colored: bool = True,
) -> FlatScene:
    """A small test scene: a coloured unit cube at the origin over a ground
    plane, plus a distant pillar — enough structure for hit/miss/projection
    coverage."""
    all_v: List[np.ndarray] = []
    all_f: List[np.ndarray] = []
    all_c: List[np.ndarray] = []
    offset = 0

    def add(verts, faces, color):
        nonlocal offset
        all_v.append(verts)
        all_f.append(faces + offset)
        all_c.append(np.tile(np.asarray(color, np.float32), (len(verts), 1)))
        offset += len(verts)

    add(*box_mesh((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)), (0.9, 0.2, 0.1, 1.0))
    add(*box_mesh((0.0, -2.0, 0.0), (20.0, 0.2, 20.0)), (0.2, 0.7, 0.2, 1.0))
    add(*box_mesh((3.0, 0.5, -2.0), (0.5, 3.0, 0.5)), (0.2, 0.2, 0.9, 1.0))
    verts = np.concatenate(all_v)
    faces = np.concatenate(all_f)
    colors = np.concatenate(all_c) if colored else None
    return build_scene_from_arrays(
        verts, faces, vertex_colors=colors, background_shader=background,
        name="box-scene",
    )


def make_sphere_eye(
    n: int,
    acceptance_deg: float = 5.0,
    radius: float = 0.1,
    focal_offset: float = 0.0,
) -> List[Ommatidium]:
    """n ommatidia on a Fibonacci sphere, outward-looking (equidistant-ish,
    like the reference's relaxed eyes but deterministic and dependency-free)."""
    golden = (1.0 + math.sqrt(5.0)) / 2.0
    out = []
    for i in range(n):
        theta = 2.0 * math.pi * i / golden
        z = 1.0 - (2.0 * i + 1.0) / n
        r = math.sqrt(max(0.0, 1.0 - z * z))
        d = np.array([r * math.cos(theta), z, r * math.sin(theta)])
        out.append(
            Ommatidium(d * radius, d, math.radians(acceptance_deg), focal_offset)
        )
    return out


def make_big_scene(n_boxes: int = 500, seed: int = 0,
                   background: str = "simple_sky") -> FlatScene:
    """A larger procedural field of boxes for accel/perf testing
    (~12*n_boxes triangles)."""
    rng = np.random.default_rng(seed)
    all_v, all_f, all_c = [], [], []
    offset = 0
    centers = rng.uniform(-50, 50, size=(n_boxes, 3))
    centers[:, 1] = rng.uniform(0.0, 5.0, size=n_boxes)
    sizes = rng.uniform(0.5, 3.0, size=(n_boxes, 3))
    colors = rng.uniform(0.1, 1.0, size=(n_boxes, 3))
    for i in range(n_boxes):
        v, f = box_mesh(centers[i], sizes[i])
        all_v.append(v)
        all_f.append(f + offset)
        all_c.append(np.tile(np.append(colors[i], 1.0).astype(np.float32), (len(v), 1)))
        offset += len(v)
    # ground plane
    v, f = box_mesh((0, -1.0, 0), (200, 0.5, 200))
    all_v.append(v)
    all_f.append(f + offset)
    all_c.append(np.tile(np.array([0.3, 0.5, 0.2, 1.0], np.float32), (len(v), 1)))
    return build_scene_from_arrays(
        np.concatenate(all_v),
        np.concatenate(all_f),
        vertex_colors=np.concatenate(all_c),
        background_shader=background,
        name=f"big-scene-{n_boxes}",
    )


def make_textured_quad_scene(tex_size: int = 8,
                             background: str = "black") -> FlatScene:
    """A textured floor quad (z-up plane at y=0, 20x20) with a checker
    texture — exercises the texture atlas + tex-only kernel paths."""
    verts = np.array(
        [[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]], np.float64
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    scene = build_scene_from_arrays(verts, faces, background_shader=background,
                                    name="textured-quad")
    # uv per corner: map the quad to the full texture
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    scene.uv0 = uvs[faces[:, 0]]
    scene.uv1 = uvs[faces[:, 1]]
    scene.uv2 = uvs[faces[:, 2]]
    scene.has_uv = np.ones(2, bool)
    # checker texture
    yy, xx = np.mgrid[0:tex_size, 0:tex_size]
    checker = ((xx + yy) % 2).astype(np.float32)
    tex = np.stack([checker, 1.0 - checker, np.full_like(checker, 0.5),
                    np.ones_like(checker)], axis=-1)
    scene.tex_data = tex.reshape(-1, 4)
    scene.tex_offset = np.array([0], np.int32)
    scene.tex_width = np.array([tex_size], np.int32)
    scene.tex_height = np.array([tex_size], np.int32)
    scene.tex_wrap_s = np.array([0], np.int32)
    scene.tex_wrap_t = np.array([0], np.int32)
    scene.tex_filter = np.array([1], np.int32)
    scene.mat_tex = np.array([0], np.int32)
    scene._device_cache = None
    return scene


def make_mr_normal_scene(background: str = "black") -> FlatScene:
    """The textured floor quad plus a metallic-roughness texture and a
    normal map on its material — exercises the lit-path modulation
    (shaders.cu:831-852, trace/lighting.py apply_material_textures).

    MR texels vary across x (left half vs right half) so sampling position
    matters; the normal map tilts normals toward +u on the left half and
    leaves them unperturbed on the right."""
    scene = make_textured_quad_scene(8, background)
    scene.mat_metallic = np.array([0.8], np.float32)
    scene.mat_roughness = np.array([0.6], np.float32)
    # upward vertex normals: the quad's winding gives a downward geometric
    # normal, which would fail the facing test for an eye above the floor
    up = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (2, 1))
    scene.n0 = up.copy()
    scene.n1 = up.copy()
    scene.n2 = up.copy()
    scene.has_normals = np.ones(2, bool)
    # texture 1: 4x4 MR map — (occlusion, roughness, metallic, 1); left
    # half halves roughness and quarters metallic, right half is identity
    mr = np.ones((4, 4, 4), np.float32)
    mr[:, :2, 1] = 0.5
    mr[:, :2, 2] = 0.25
    # texture 2: 4x4 normal map — left half tilted (+0.4 along dpdu),
    # right half flat (0.5, 0.5, 1.0) == no perturbation
    nm = np.empty((4, 4, 4), np.float32)
    nm[:, :, 0] = 0.5
    nm[:, :, 1] = 0.5
    nm[:, :, 2] = 1.0
    nm[:, :, 3] = 1.0
    nm[:, :2, 0] = 0.7
    base = scene.tex_data.shape[0]
    scene.tex_data = np.concatenate(
        [scene.tex_data, mr.reshape(-1, 4), nm.reshape(-1, 4)]
    )
    scene.tex_offset = np.concatenate(
        [scene.tex_offset, np.array([base, base + 16], np.int32)]
    )
    scene.tex_width = np.concatenate([scene.tex_width, np.array([4, 4], np.int32)])
    scene.tex_height = np.concatenate([scene.tex_height, np.array([4, 4], np.int32)])
    scene.tex_wrap_s = np.concatenate([scene.tex_wrap_s, np.zeros(2, np.int32)])
    scene.tex_wrap_t = np.concatenate([scene.tex_wrap_t, np.zeros(2, np.int32)])
    scene.tex_filter = np.concatenate([scene.tex_filter, np.ones(2, np.int32)])
    scene.mat_mr_tex = np.array([1], np.int32)
    scene.mat_normal_tex = np.array([2], np.int32)
    scene._device_cache = None
    return scene


def make_silhouette_leak_scene(with_slab: bool = True,
                               pillar_half_width: float = 0.18) -> FlatScene:
    """The shadow-plan adversarial geometry (VERDICT r3 #7): a NEAR PILLAR
    in front of a FAR WALL, with a horizontal slab that shadows the wall
    (but not the pillar) from the light.

    An eye at the origin looking -z with its acceptance cone centred on
    the pillar probes a lit frame: if every probe sample hits the pillar,
    the group's memoised shadow shaft is a small sphere at the pillar and
    its occluder payload excludes the slab (the pillar->light cone passes
    z >= -2.9; the slab spans z <= -4).  A later frame's sample that
    crosses the pillar's silhouette edge hits the wall OUT of shaft and
    its shadow ray misses the slab -> the sample leaks the wall's full
    light term.  tests/test_shadow_leak.py pins the leak against the
    1/samples bound documented at SHADOW_BOUND_INFLATE.

    Layout (light at (0, 30, -7), intensity 5):
      pillar  x in [-w, w], y in [-2, 2], z = -2   (normal +z)
      wall    x, y in [-20, 20],          z = -10  (normal +z)
      slab    x in [-12, 12], z in [-11, -4], y = 5 (occludes wall only)
    """
    w = pillar_half_width
    quads = [
        # (corner list CCW seen from +z / +y, color)
        ([[-w, -2, -2], [w, -2, -2], [w, 2, -2], [-w, 2, -2]],
         (0.9, 0.3, 0.2)),
        ([[-20, -20, -10], [20, -20, -10], [20, 20, -10], [-20, 20, -10]],
         (0.6, 0.6, 0.6)),
    ]
    if with_slab:
        quads.append(([[-12, 5, -11], [12, 5, -11], [12, 5, -4],
                       [-12, 5, -4]], (0.2, 0.2, 0.8)))
    all_v, all_f, all_c = [], [], []
    off = 0
    for corners, col in quads:
        all_v.append(np.asarray(corners, np.float64))
        all_f.append(np.array([[0, 1, 2], [0, 2, 3]], np.int64) + off)
        all_c.append(np.tile(np.asarray(col, np.float32), (4, 1)))
        off += 4
    return build_scene_from_arrays(
        np.concatenate(all_v), np.concatenate(all_f),
        vertex_colors=np.concatenate(all_c),
        background_shader="black", name="silhouette-leak",
    )


def leak_scene_light() -> np.ndarray:
    """The single point light the leak scene is designed around."""
    out = np.zeros((1, 7), np.float32)
    out[0, 0:3] = [1.0, 1.0, 0.9]
    out[0, 3] = 15.0
    out[0, 4:7] = [0.0, 30.0, -7.0]
    return out


def make_mixed_flat_scene(tex_size: int = 8,
                          background: str = "black") -> FlatScene:
    """A textured floor quad + an UNtextured coloured box (two materials,
    no vertex colours) — the ofstad-shaped 'flat attrs' case that the
    emit_flat kernel variant resolves entirely in-register."""
    scene = make_textured_quad_scene(tex_size, background)
    bv, bf = box_mesh((3.0, 1.0, 3.0), (2.0, 2.0, 2.0))
    n0 = scene.v0.shape[0]
    p0, p1, p2 = bv[bf[:, 0]], bv[bf[:, 1]], bv[bf[:, 2]]
    nb = len(bf)
    scene.v0 = np.concatenate([scene.v0, p0.astype(np.float32)])
    scene.e1 = np.concatenate([scene.e1, (p1 - p0).astype(np.float32)])
    scene.e2 = np.concatenate([scene.e2, (p2 - p0).astype(np.float32)])
    z3 = np.zeros((nb, 3), np.float32)
    z2 = np.zeros((nb, 2), np.float32)
    z4 = np.zeros((nb, 4), np.float32)
    scene.n0 = np.concatenate([scene.n0, z3])
    scene.n1 = np.concatenate([scene.n1, z3])
    scene.n2 = np.concatenate([scene.n2, z3])
    scene.has_normals = np.concatenate([scene.has_normals, np.zeros(nb, bool)])
    scene.uv0 = np.concatenate([scene.uv0, z2])
    scene.uv1 = np.concatenate([scene.uv1, z2])
    scene.uv2 = np.concatenate([scene.uv2, z2])
    scene.has_uv = np.concatenate([scene.has_uv, np.zeros(nb, bool)])
    scene.c0 = np.concatenate([scene.c0, z4])
    scene.c1 = np.concatenate([scene.c1, z4])
    scene.c2 = np.concatenate([scene.c2, z4])
    scene.has_color = np.concatenate([scene.has_color, np.zeros(nb, bool)])
    scene.mat_id = np.concatenate(
        [scene.mat_id, np.full(nb, 1, np.int32)]
    )
    scene.mat_base_color = np.concatenate(
        [scene.mat_base_color,
         np.array([[0.2, 0.5, 0.8, 1.0]], np.float32)]
    )
    scene.mat_metallic = np.concatenate(
        [scene.mat_metallic, np.array([0.0], np.float32)]
    )
    scene.mat_roughness = np.concatenate(
        [scene.mat_roughness, np.array([0.5], np.float32)]
    )
    scene.mat_tex = np.concatenate(
        [scene.mat_tex, np.array([-1], np.int32)]
    )
    scene.mat_mr_tex = np.full(2, -1, np.int32)
    scene.mat_normal_tex = np.full(2, -1, np.int32)
    scene.aabb_min = np.minimum(scene.aabb_min, bv.min(axis=0))
    scene.aabb_max = np.maximum(scene.aabb_max, bv.max(axis=0))
    scene._device_cache = None
    return scene


def make_two_texture_scene(background: str = "black") -> FlatScene:
    """Two floor quads side by side, each with its OWN texture (different
    sizes) — exercises multi-texture atlas indexing in every backend."""
    verts = np.array(
        [[-20, 0, -10], [0, 0, -10], [0, 0, 10], [-20, 0, 10],   # left quad
         [0, 0, -10], [20, 0, -10], [20, 0, 10], [0, 0, 10]],    # right quad
        np.float64,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int64)
    scene = build_scene_from_arrays(verts, faces, background_shader=background,
                                    name="two-tex")
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)
    scene.uv0 = uvs[faces[:, 0]]
    scene.uv1 = uvs[faces[:, 1]]
    scene.uv2 = uvs[faces[:, 2]]
    scene.has_uv = np.ones(4, bool)

    # texture 0: solid red 4x4; texture 1: solid blue 8x8
    t0 = np.tile(np.array([1, 0, 0, 1], np.float32), (16, 1))
    t1 = np.tile(np.array([0, 0, 1, 1], np.float32), (64, 1))
    scene.tex_data = np.concatenate([t0, t1])
    scene.tex_offset = np.array([0, 16], np.int32)
    scene.tex_width = np.array([4, 8], np.int32)
    scene.tex_height = np.array([4, 8], np.int32)
    scene.tex_wrap_s = np.zeros(2, np.int32)
    scene.tex_wrap_t = np.zeros(2, np.int32)
    scene.tex_filter = np.ones(2, np.int32)
    scene.mat_base_color = np.array([[1, 1, 1, 1], [1, 1, 1, 1]], np.float32)
    scene.mat_metallic = np.zeros(2, np.float32)
    scene.mat_roughness = np.full(2, 0.5, np.float32)
    scene.mat_tex = np.array([0, 1], np.int32)
    scene.mat_mr_tex = np.full(2, -1, np.int32)
    scene.mat_normal_tex = np.full(2, -1, np.int32)
    scene.mat_id = np.array([0, 0, 1, 1], np.int32)
    scene._device_cache = None
    return scene
