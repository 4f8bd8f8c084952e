"""GGX/Schlick direct lighting with shadow rays (shaders.cu:63-101, 826-881).

Off by default, exactly like the reference (params.lighting=false,
libEyeRenderer.cpp:127).  When enabled, the four hard-coded point lights of
initLaunchParams (libEyeRenderer.cpp:130-148) are derived from the scene AABB
by compound_ray_tpu.api.renderer.default_lights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.trace.intersect import occlusion_test
from compound_ray_tpu.trace.shade import sample_texture


def default_lights(aabb_min: np.ndarray, aabb_max: np.ndarray) -> np.ndarray:
    """The reference's 4 hard-coded point lights: (4,7) [color(3), intensity, pos(3)]."""
    center = (np.asarray(aabb_min) + np.asarray(aabb_max)) / 2.0
    loffset = float(np.max(aabb_max - aabb_min))
    rows = [
        ([1.0, 1.0, 0.8], 5.0, center + loffset),
        ([0.8, 0.8, 1.0], 3.0, center + np.array([-loffset, 0.5 * loffset, -0.5 * loffset])),
        ([1.0, 1.0, 0.8], 5.0, center + np.array([0.0, 4.0, -5.0])),
        ([1.0, 1.0, 0.8], 0.5, center + np.array([1.0, -6.0, 0.0])),
    ]
    out = np.zeros((4, 7), np.float32)
    for i, (c, inten, p) in enumerate(rows):
        out[i, 0:3] = c
        out[i, 3] = inten
        out[i, 4:7] = p
    return out


def shading_basis(scene: Dict[str, Any], tri: jnp.ndarray):
    """Per-ray shading inputs for the deferred (packed-kernel) lighting
    epilogue: gathers by triangle id and returns
    (e1, e2, n_sm0..2, has_n, metallic, roughness) with (R,3)/(R,) shapes.
    tri must already be clipped to valid range; masked rows are garbage the
    caller discards via its hit mask."""
    e1 = scene["e1"][tri]
    e2 = scene["e2"][tri]
    n0 = scene["n0"][tri]
    n1 = scene["n1"][tri]
    n2 = scene["n2"][tri]
    has_n = scene["has_normals"][tri]
    mat = jnp.maximum(scene["mat_id"][tri], 0)
    metallic = scene["mat_metallic"][mat]
    roughness = scene["mat_roughness"][mat]
    return e1, e2, n0, n1, n2, has_n, metallic, roughness


# Wide shading-row table column layout (build_shading_rows).  The per-ray
# row gather at these sizes is DESCRIPTOR-rate-bound, not byte-bound
# (docs/performance.md gather table; docs/next-levers.md "CUT GATHER
# COUNT, not bytes"), so packing every per-triangle lit attribute into one
# (T, C) table turns the lit epilogue's ~10 narrow gathers (e1, e2,
# n0..n2, has_n, mat_id -> metallic/roughness [+ uv0..uv2, mr/nm tex ids])
# into ONE (R, C) gather.  Material scalars are baked PER TRIANGLE
# (mat_metallic[mat_id[t]]), removing the two-step gather entirely; values
# are bit-identical to the narrow path.  Texture ids ride as float32
# (exact below 2^24) so the table stays one dtype.
_BC_E1 = slice(0, 3)
_BC_E2 = slice(3, 6)
_BC_N0 = slice(6, 9)
_BC_N1 = slice(9, 12)
_BC_N2 = slice(12, 15)
_BC_HAS_N = 15
_BC_METALLIC = 16
_BC_ROUGHNESS = 17
_BC_UV0 = slice(18, 20)
_BC_UV1 = slice(20, 22)
_BC_UV2 = slice(22, 24)
_BC_MR_TEX = 24
_BC_NM_TEX = 25


def build_shading_rows(scene: Dict[str, Any]) -> jnp.ndarray:
    """(T, 18|26) packed per-triangle lit-attribute table (layout above).
    The extra 8 texture columns exist only when some material references
    an MR / normal texture (the same static pytree gate the narrow path
    uses).  O(T) concat — negligible against the (R,) gathers it feeds,
    and XLA hoists it out of the per-sample work."""
    mat = jnp.maximum(scene["mat_id"], 0)
    cols = [
        scene["e1"], scene["e2"],
        scene["n0"], scene["n1"], scene["n2"],
        scene["has_normals"].astype(jnp.float32)[:, None],
        scene["mat_metallic"][mat][:, None],
        scene["mat_roughness"][mat][:, None],
    ]
    if "mat_mr_tex" in scene:
        cols += [
            scene["uv0"], scene["uv1"], scene["uv2"],
            scene["mat_mr_tex"][mat].astype(jnp.float32)[:, None],
            scene["mat_normal_tex"][mat].astype(jnp.float32)[:, None],
        ]
    return jnp.concatenate(cols, axis=1)


def shading_basis_from_rows(rows_g: jnp.ndarray):
    """Unpack one gathered (R, C) slab of build_shading_rows into the
    shading_basis tuple (e1, e2, n0, n1, n2, has_n, metallic, roughness) —
    same values, one gather descriptor instead of ~8."""
    return (
        rows_g[:, _BC_E1], rows_g[:, _BC_E2],
        rows_g[:, _BC_N0], rows_g[:, _BC_N1], rows_g[:, _BC_N2],
        rows_g[:, _BC_HAS_N] > 0.5,
        rows_g[:, _BC_METALLIC], rows_g[:, _BC_ROUGHNESS],
    )


def triangle_dpduv(scene: Dict[str, Any], tri: jnp.ndarray):
    """Per-triangle UV-parametrisation tangents dpdu/dpdv (R,3), the inputs
    to tangent-space normal mapping (cuda/LocalGeometry.h:193-205).

    The reference solves [dp1 dp2] = [du1 dv1; du2 dv2] [dpdu dpdv] with
    dp1 = P0-P2, dp2 = P1-P2; in FlatScene terms dp1 = -e2, dp2 = e1-e2.
    Our triangles are baked to world space, so the tangents come out in
    world space directly (the reference leaves them in object space and
    mixes them with a world normal — correct only for rigid transforms;
    for the identity-transformed data scenes the two agree).  A degenerate
    UV mapping (det == 0; the reference divides unguarded -> inf) returns
    zero tangents, which the caller's normalize-guard turns into a
    no-perturbation fallback."""
    return _dpduv_vals(
        scene["e1"][tri], scene["e2"][tri],
        scene["uv0"][tri], scene["uv1"][tri], scene["uv2"][tri],
    )


def _dpduv_vals(e1, e2, uv0, uv1, uv2):
    """triangle_dpduv on already-gathered per-ray values (the packed
    shading-row path feeds table columns here; no re-gather)."""
    dp1 = -e2
    dp2 = e1 - e2
    du1 = (uv0[:, 0] - uv2[:, 0])[:, None]
    du2 = (uv1[:, 0] - uv2[:, 0])[:, None]
    dv1 = (uv0[:, 1] - uv2[:, 1])[:, None]
    dv2 = (uv1[:, 1] - uv2[:, 1])[:, None]
    det = du1 * dv2 - dv1 * du2
    inv = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    dpdu = (dv2 * dp1 - dv1 * dp2) * inv
    dpdv = (-du2 * dp1 + du1 * dp2) * inv
    return dpdu, dpdv


def _unit(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-20)


def apply_material_textures(
    scene: Dict[str, Any],
    tri: jnp.ndarray,  # (R,) triangle ids (clipped to valid range)
    uv: jnp.ndarray,  # (R,2) interpolated texture coords at the hit
    n: jnp.ndarray,  # (R,3) unit shading normal
    metallic: jnp.ndarray,  # (R,)
    roughness: jnp.ndarray,  # (R,)
):
    """Metallic-roughness-texture and normal-map modulation
    (shaders.cu:838-845: roughness *= mr.g, metallic *= mr.b;
    shaders.cu:848-852: N = normalize(NN.x*normalize(dpdu) +
    NN.y*normalize(dpdv) + NN.z*N) with NN = 2*tex-1).

    Callers gate statically on `"mat_mr_tex" in scene` — the keys exist in
    the device dict only when some material references one of these
    textures (scene/flat.py device_triangles), so untextured scenes never
    trace these gathers.  Returns (n, metallic, roughness)."""
    mat = jnp.maximum(scene["mat_id"][tri], 0)
    mr_tex = scene["mat_mr_tex"][mat]
    nm_tex = scene["mat_normal_tex"][mat]
    dpdu, dpdv = triangle_dpduv(scene, tri)
    return _apply_material_textures_vals(
        scene, mr_tex, nm_tex, uv, n, metallic, roughness, dpdu, dpdv
    )


def apply_material_textures_from_rows(
    scene: Dict[str, Any],
    rows_g: jnp.ndarray,  # (R, 26) gathered build_shading_rows slab
    n: jnp.ndarray,  # (R,3) unit shading normal
    metallic: jnp.ndarray,  # (R,)
    roughness: jnp.ndarray,  # (R,)
    u: jnp.ndarray,  # (R,) barycentric u
    v: jnp.ndarray,  # (R,) barycentric v
):
    """apply_material_textures fed from the packed shading-row slab: uv
    interpolation, tex ids, and dpdu/dpdv all come from table columns the
    caller already gathered — zero additional per-triangle gathers.
    Returns (n, metallic, roughness)."""
    w = (1.0 - u - v)[:, None]
    uv0 = rows_g[:, _BC_UV0]
    uv1 = rows_g[:, _BC_UV1]
    uv2 = rows_g[:, _BC_UV2]
    uv = w * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    mr_tex = rows_g[:, _BC_MR_TEX].astype(jnp.int32)
    nm_tex = rows_g[:, _BC_NM_TEX].astype(jnp.int32)
    dpdu, dpdv = _dpduv_vals(
        rows_g[:, _BC_E1], rows_g[:, _BC_E2], uv0, uv1, uv2
    )
    return _apply_material_textures_vals(
        scene, mr_tex, nm_tex, uv, n, metallic, roughness, dpdu, dpdv
    )


def _apply_material_textures_vals(
    scene, mr_tex, nm_tex, uv, n, metallic, roughness, dpdu, dpdv
):
    mr = sample_texture(scene, mr_tex, uv)
    has_mr = mr_tex >= 0
    roughness = jnp.where(has_mr, roughness * mr[:, 1], roughness)
    metallic = jnp.where(has_mr, metallic * mr[:, 2], metallic)
    nn = sample_texture(scene, nm_tex, uv) * 2.0 - 1.0
    n_pert = (nn[:, 0:1] * _unit(dpdu) + nn[:, 1:2] * _unit(dpdv)
              + nn[:, 2:3] * n)
    n = jnp.where((nm_tex >= 0)[:, None], _unit(n_pert), n)
    return n, metallic, roughness


def unpack_shading_cols(cols: jnp.ndarray):
    """Planar unpack of a TRANSPOSED gathered shading slab (C, R) —
    shading_basis_from_rows for the component-planar lit epilogue.

    The (R, C) row gather is one descriptor (build_shading_rows); the
    (C, R) transpose costs one relayout, after which every shading
    quantity is an (R,) lane-major array and the basis/GGX math runs at
    full VPU lane occupancy instead of an (R, 3) layout's 3/128 (the
    pipeline docstring's AoS warning — measured ~70 ms/frame at 3.2M rays
    for the primary path).  Returns ((e1x..e1z), (e2x..e2z), (n0..n2 as
    3-tuples), has_n, metallic, roughness)."""
    e1 = (cols[0], cols[1], cols[2])
    e2 = (cols[3], cols[4], cols[5])
    n0 = (cols[6], cols[7], cols[8])
    n1 = (cols[9], cols[10], cols[11])
    n2 = (cols[12], cols[13], cols[14])
    return (e1, e2, n0, n1, n2, cols[_BC_HAS_N] > 0.5,
            cols[_BC_METALLIC], cols[_BC_ROUGHNESS])


def ggx_light_contrib_planar(
    n,  # 3-tuple of (R,) unit shading normal components
    view,  # 3-tuple of (R,) unit hit->camera components
    l,  # 3-tuple of (R,) unit hit->light components
    base,  # 3-tuple of (R,) linear base colour channels
    metallic: jnp.ndarray,  # (R,)
    roughness: jnp.ndarray,  # (R,)
    lcol: jnp.ndarray,  # (3,)
    lint: jnp.ndarray,  # ()
):
    """ggx_light_contrib on component-planar inputs: identical maths
    (shaders.cu:826-881) with every array (R,) lane-major, so the whole
    contraction runs at full VPU lane occupancy.  Returns
    ((cr, cg, cb), facing)."""
    nx, ny, nz = n
    vx, vy, vz = view
    lx, ly, lz = l
    f0 = 0.04
    one_m_m = 1.0 - metallic
    alpha = roughness * roughness
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    hinv = 1.0 / jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-20)
    hx, hy, hz = hx * hinv, hy * hinv, hz * hinv
    n_dot_l = nx * lx + ny * ly + nz * lz
    n_dot_v = nx * vx + ny * vy + nz * vz
    n_dot_h = nx * hx + ny * hy + nz * hz
    v_dot_h = vx * hx + vy * hy + vz * hz
    facing = (n_dot_l > 0.0) & (n_dot_v > 0.0)
    pw5 = jnp.power(1.0 - v_dot_h, 5.0)
    g_vis = _vis(n_dot_l, n_dot_v, alpha)
    d = _ggx_normal(n_dot_h, alpha)
    scale = lint * n_dot_l
    out = []
    for c, bc in enumerate(base):
        spec_c = f0 * one_m_m + bc * metallic
        diff_c = bc * (1.0 - f0) * one_m_m
        f = spec_c + (1.0 - spec_c) * pw5
        out.append(lcol[c] * scale
                   * ((1.0 - f) * diff_c / jnp.pi + f * g_vis * d))
    return tuple(out), facing


def ggx_light_contrib(
    n: jnp.ndarray,  # (R,3) unit shading normal
    view: jnp.ndarray,  # (R,3) unit direction hit->camera
    l: jnp.ndarray,  # (R,3) unit direction hit->light
    base: jnp.ndarray,  # (R,3) linear base colour
    metallic: jnp.ndarray,  # (R,)
    roughness: jnp.ndarray,  # (R,)
    lcol: jnp.ndarray,  # (3,)
    lint: jnp.ndarray,  # ()
):
    """One light's unoccluded GGX/Schlick contribution + facing mask —
    identical maths to ggx_direct (shaders.cu:826-881) but shaped for the
    deferred epilogue where occlusion comes from the packed shadow kernel.
    Returns (contrib (R,3), facing (R,))."""
    f0 = 0.04
    diff_color = base * (1.0 - f0) * (1.0 - metallic[:, None])
    spec_color = f0 * (1.0 - metallic[:, None]) + base * metallic[:, None]
    alpha = roughness * roughness
    h = l + view
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
    _hi = jax.lax.Precision.HIGHEST
    n_dot_l = jnp.einsum("rc,rc->r", n, l, precision=_hi)
    n_dot_v = jnp.einsum("rc,rc->r", n, view, precision=_hi)
    n_dot_h = jnp.einsum("rc,rc->r", n, h, precision=_hi)
    v_dot_h = jnp.einsum("rc,rc->r", view, h, precision=_hi)
    facing = (n_dot_l > 0.0) & (n_dot_v > 0.0)
    f = _schlick(spec_color, v_dot_h)
    g_vis = _vis(n_dot_l, n_dot_v, alpha)[:, None]
    d = _ggx_normal(n_dot_h, alpha)[:, None]
    diff = (1.0 - f) * diff_color / jnp.pi
    spec = f * g_vis * d
    contrib = lcol[None, :] * lint * n_dot_l[:, None] * (diff + spec)
    return contrib, facing


def _schlick(spec_color, v_dot_h):
    return spec_color + (1.0 - spec_color) * jnp.power(1.0 - v_dot_h, 5.0)[..., None]


def _vis(n_dot_l, n_dot_v, alpha):
    alpha_sq = alpha * alpha
    ggx0 = n_dot_l * jnp.sqrt(n_dot_v * n_dot_v * (1.0 - alpha_sq) + alpha_sq)
    ggx1 = n_dot_v * jnp.sqrt(n_dot_l * n_dot_l * (1.0 - alpha_sq) + alpha_sq)
    return 2.0 * n_dot_l * n_dot_v / (ggx0 + ggx1)


def _ggx_normal(n_dot_h, alpha):
    alpha_sq = alpha * alpha
    x = n_dot_h * n_dot_h * (alpha_sq - 1.0) + 1.0
    return alpha_sq / (jnp.pi * x * x)


def ggx_direct(
    scene: Dict[str, Any],
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    hit: Dict[str, jnp.ndarray],
    base_color: jnp.ndarray,
    lighting: Dict[str, Any],
) -> jnp.ndarray:
    """Direct GGX lighting over `lights` with occlusion shadow rays.

    Mirrors the loop in __closesthit__radiance (shaders.cu:826-881),
    including metallic-roughness-texture and normal-map modulation
    (apply_material_textures) when a material references those textures."""
    tri = jnp.maximum(hit["tri_id"], 0)
    u = hit["u"][:, None]
    v = hit["v"][:, None]
    w = 1.0 - u - v

    # hit position: P = v0 + u*e1 + v*e2 (world space already)
    p = scene["v0"][tri] + u * scene["e1"][tri] + v * scene["e2"][tri]

    # shading normal: interpolated vertex normals, else geometric normal
    n_sm = w * scene["n0"][tri] + u * scene["n1"][tri] + v * scene["n2"][tri]
    n_geo = jnp.cross(scene["e1"][tri], scene["e2"][tri])
    has_n = scene["has_normals"][tri][:, None]
    n = jnp.where(has_n, n_sm, n_geo)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    mat = jnp.maximum(scene["mat_id"][tri], 0)
    metallic = scene["mat_metallic"][mat]
    roughness = scene["mat_roughness"][mat]
    if "mat_mr_tex" in scene:
        uv_interp = (w * scene["uv0"][tri] + u * scene["uv1"][tri]
                     + v * scene["uv2"][tri])
        n, metallic, roughness = apply_material_textures(
            scene, tri, uv_interp, n, metallic, roughness
        )

    view = -dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-20)
    result = base_color

    lights = lighting["lights"]  # (L,7)
    for li in range(lights.shape[0]):
        lcol = lights[li, 0:3]
        lint = lights[li, 3]
        lpos = lights[li, 4:7]
        to_l = lpos[None, :] - p
        l_dist = jnp.linalg.norm(to_l, axis=-1)
        l = to_l / jnp.maximum(l_dist[:, None], 1e-20)
        occluded = occlusion_test(
            p, l, scene["v0"], scene["e1"], scene["e2"],
            jnp.float32(0.001), l_dist - 0.001,
        )
        # one BRDF implementation for both lit paths: the packed-kernel
        # epilogue calls the same function, so the cross-validation between
        # this XLA fallback and the deferred pipeline tests one maths
        contrib, facing = ggx_light_contrib(
            n, view, l, base_color, metallic, roughness, lcol, lint
        )
        result = result + jnp.where(
            (facing & ~occluded)[:, None] & hit["hit"][:, None], contrib, 0.0
        )
    return result
