"""Per-ray occlusion work limit (round-5 lit lever selector).

The lit frame's occlusion kernel tests every shadow ray of a
(light, ommatidium) virtual group against the WHOLE group shaft
(~1190 triangle slots/ray at the natural bench pose — docs/next-levers.md),
where the reference's BVH walks ~20 nodes per ray.  Round-4 CPU
measurements showed quantile sub-shafts saturate at ~0.5x work because
occluders are shared across cells — but that measurement never
established the LIMIT of subdivision: the candidate count of a single
ray's zero-width segment under the same sphere-granularity refine.

This tool measures exactly that, on the natural bench scene at the bench
pose:
  * per (light, group): the current shaft candidate count (cone refine)
  * per sampled RAY: triangles whose bounding sphere intersects the
    light->hit-point SEGMENT (the K=infinity subdivision limit at the
    refine's sphere granularity)
  * the same count with exact triangle-vs-segment(+eps) tests (the
    geometric limit, independent of the sphere refine)

Decision rule: if the sphere-granularity per-ray limit is <~100 slots,
ray-block subdivision machinery can reach reference-class occlusion cost
and is worth building; if it is still hundreds, the sphere refine itself
is the binding constraint and the lever must change representation
(tighter primitive bounds or a different visibility scheme), not
granularity.

CPU-only (JAX_PLATFORMS=cpu); run with PALLAS_AXON_POOL_IPS= so no
tunnel session opens.  Writes artifacts/shadow_limit.json.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cr_tpu_jax_cache_cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLES = int(os.environ.get("SL_SAMPLES", "200"))
RAYS_PER_GROUP = int(os.environ.get("SL_RAYS", "32"))
MAX_GROUPS = int(os.environ.get("SL_GROUPS", "64"))


def _segment_sphere_hits(light, pts, centers, radii):
    """(R, T) bool: sphere t intersects segment light->pts[r]."""
    d = pts - light[None, :]  # (R, 3)
    seg_len2 = np.sum(d * d, axis=1)  # (R,)
    co = centers[None, :, :] - light[None, None, :]  # (1, T, 3)
    # closest parameter on the segment per (ray, tri)
    t = np.einsum("rk,rtk->rt", d, np.broadcast_to(
        co, (d.shape[0],) + co.shape[1:])) / np.maximum(seg_len2, 1e-30)[:, None]
    t = np.clip(t, 0.0, 1.0)
    closest = light[None, None, :] + t[:, :, None] * d[:, None, :]
    dist2 = np.sum((closest - centers[None, :, :]) ** 2, axis=2)
    return dist2 <= (radii[None, :] ** 2)


def _segment_triangle_hits(light, pts, v0, e1, e2):
    """(R, T) bool: exact Moller-Trumbore segment intersection (both
    sided), t in (eps, 1-eps) of the light->pt parameterisation."""
    eps_t = 1e-4
    d = pts - light[None, :]  # (R, 3)
    res = np.zeros((pts.shape[0], v0.shape[0]), bool)
    # loop rays (R is small) to bound memory
    for r in range(pts.shape[0]):
        dr = d[r]
        pvec = np.cross(dr[None, :], e2)  # (T, 3)
        det = np.einsum("tk,tk->t", e1, pvec)
        inv = np.where(np.abs(det) > 1e-30, 1.0 / det, 0.0)
        tvec = light[None, :] - v0
        u = np.einsum("tk,tk->t", tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        v = np.einsum("k,tk->t", dr, qvec) * inv
        t = np.einsum("tk,tk->t", e2, qvec) * inv
        res[r] = ((np.abs(det) > 1e-30) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > eps_t) & (t < 1.0 - eps_t))
    return res


def _probe_state():
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.lighting import default_lights

    scene_path = os.environ.get(
        "SL_SCENE", "/root/reference/data/natural-standin-sky.gltf")
    r = EyeRenderer(verbose=False)
    r.load_gltf_scene(scene_path)
    while not r.is_compound_eye_active():
        r.next_camera()
    cam = r.current_camera()
    cam.set_samples_per_ommatidium(SAMPLES)
    lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)

    splan = P.scene_plan(r.scene)
    omms_np = cam.ommatidia
    eplan = P.eye_plan(omms_np, SAMPLES)
    omms_p = jnp.asarray(omms_np[eplan.perm])
    pos = jnp.asarray(np.asarray(cam.position, np.float32))
    ls = jnp.eye(3, dtype=jnp.float32)
    kcand, rmax = P._plan_widths(
        splan, eplan, omms_p, pos, ls, (eplan.sig, SAMPLES, b"shadow-limit"))
    rc, pmm, _, _ = P._pack_fused(
        splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
        splan.half_center, splan.half_radius, omms_p, pos, ls,
        g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
        tri_cl=splan.slot_tri_cl)

    # primary trace -> hit points (the _shadow_probe recipe)
    key = jax.random.PRNGKey(7)
    splay, spin = P.sample_angles_ns(
        key, omms_p[:, 6] / P.FWHM_SD_RATIO, SAMPLES)
    rays, (dx, dy, dz), neg_o = P._gen_ray_features(
        omms_p, pos, ls, splay, spin, samples=SAMPLES,
        ng=eplan.ng, g=eplan.g, nrb=eplan.nrb, rb_size=eplan.rb_size)
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    out = run_packed_tracer(
        rc, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
        rb_size=eplan.rb_size, rmax=rmax)
    t_f = np.asarray(out[0])
    ng, g = eplan.ng, eplan.g
    rg = g * SAMPLES
    rg_pad = eplan.nrb * eplan.rb_size

    def repad(x):
        x2 = np.asarray(x).reshape(ng, rg)
        if rg_pad != rg:
            x2 = np.pad(x2, ((0, 0), (0, rg_pad - rg)))
        return x2.reshape(-1)

    live_f = np.repeat(np.asarray(rc) > 0, rg_pad)
    hit_f = (t_f < 1e30) & live_f
    dxf, dyf, dzf = repad(dx), repad(dy), repad(dz)
    nox = repad(np.broadcast_to(np.asarray(neg_o[0]), (omms_p.shape[0], SAMPLES)))
    noy = repad(np.broadcast_to(np.asarray(neg_o[1]), (omms_p.shape[0], SAMPLES)))
    noz = repad(np.broadcast_to(np.asarray(neg_o[2]), (omms_p.shape[0], SAMPLES)))
    t_c = np.where(hit_f, t_f, 0.0)
    px = -nox + t_c * dxf
    py = -noy + t_c * dyf
    pz = -noz + t_c * dzf
    hits = hit_f.reshape(ng, rg_pad)
    pts_all = np.stack([px, py, pz], axis=-1).reshape(ng, rg_pad, 3)

    cg_j, rg_j = P._hit_bound_spheres(
        jnp.asarray(hit_f), jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(pz), ng, rg_pad)
    cg = np.asarray(cg_j)
    rg_sph = np.asarray(rg_j)
    rg_infl = np.where(rg_sph >= 0, rg_sph * P.SHADOW_BOUND_INFLATE + 1e-2,
                       rg_sph)

    # per-slot spheres + exact triangles (global flat arrays)
    sc = np.asarray(splan.slot_center_cl).reshape(-1, 3)
    sr = np.asarray(splan.slot_radius_cl).reshape(-1)
    tri = np.asarray(splan.slot_tri_cl).reshape(-1, 9)
    valid = sr >= 0.0
    sc_v, sr_v = sc[valid], sr[valid]
    v0_v, e1_v, e2_v = tri[valid, 0:3], tri[valid, 3:6], tri[valid, 6:9]

    return dict(P=P, lights=np.asarray(lights), splan=splan,
                eplan=eplan, omms_p=omms_p, pos=pos, ls=ls, rc=np.asarray(rc),
                hits=hits, pts_all=pts_all, cg=cg, rg_sph=rg_sph,
                rg_infl=rg_infl, sc_v=sc_v, sr_v=sr_v, v0_v=v0_v, e1_v=e1_v,
                e2_v=e2_v, splay=np.asarray(splay), spin=np.asarray(spin),
                ng=ng, rg_pad=rg_pad, scene_path=scene_path)


def main():
    st = _probe_state()
    P = st["P"]; lights = st["lights"]; rc = st["rc"]
    hits = st["hits"]; pts_all = st["pts_all"]
    cg = st["cg"]; rg_sph = st["rg_sph"]; rg_infl = st["rg_infl"]
    sc_v, sr_v = st["sc_v"], st["sr_v"]
    v0_v, e1_v, e2_v = st["v0_v"], st["e1_v"], st["e2_v"]
    ng = st["ng"]; scene_path = st["scene_path"]

    rng = np.random.default_rng(0)
    live_groups = np.where((rc > 0) & (rg_sph >= 0))[0]
    if len(live_groups) > MAX_GROUPS:
        live_groups = rng.choice(live_groups, MAX_GROUPS, replace=False)

    ratio = P.FWHM_SD_RATIO / 4.0
    shaft_counts, ray_sphere_counts, ray_exact_counts = [], [], []
    t0 = time.time()
    for li in range(lights.shape[0]):
        light = np.asarray(lights[li, 4:7], np.float32)
        for gi in live_groups:
            # current shaft: cone apex light covering the inflated sphere
            dvec = cg[gi] - light
            dist = float(np.linalg.norm(dvec))
            half = np.arcsin(min(1.0, rg_infl[gi] / max(dist, 1e-30)))
            axis = dvec / max(dist, 1e-30)
            dmax = dist + rg_infl[gi]
            # sphere-vs-cone candidate test (the refine's granularity):
            # sphere center angular distance from axis <= half + asin(r/d)
            co = sc_v - light[None, :]
            d_s = np.linalg.norm(co, axis=1)
            cosang = np.clip(co @ axis / np.maximum(d_s, 1e-30), -1, 1)
            ang = np.arccos(cosang)
            srad = np.arcsin(np.clip(sr_v / np.maximum(d_s, 1e-30), 0, 1))
            in_cone = (ang <= half + srad) & (d_s - sr_v <= dmax)
            shaft_counts.append(int(in_cone.sum()))

            # per-ray limit on a subsample of this group's hit rays
            hr = np.where(hits[gi])[0]
            if len(hr) == 0:
                continue
            sel = rng.choice(hr, min(RAYS_PER_GROUP, len(hr)), replace=False)
            pts = pts_all[gi, sel]
            cand_idx = np.where(in_cone)[0]
            sph = _segment_sphere_hits(light, pts, sc_v[cand_idx],
                                       sr_v[cand_idx])
            ray_sphere_counts.extend(sph.sum(axis=1).tolist())
            ex = _segment_triangle_hits(light, pts, v0_v[cand_idx],
                                        e1_v[cand_idx], e2_v[cand_idx])
            ray_exact_counts.extend(ex.sum(axis=1).tolist())
    el = time.time() - t0

    def stats(a):
        a = np.asarray(a, np.float64)
        if a.size == 0:
            return {}
        return {"mean": float(a.mean()), "p50": float(np.median(a)),
                "p95": float(np.percentile(a, 95)), "max": float(a.max())}

    out = {
        "scene": scene_path, "samples": SAMPLES,
        "groups_sampled": int(len(live_groups)),
        "lights": int(lights.shape[0]),
        "shaft_slots": stats(shaft_counts),
        "per_ray_sphere_slots": stats(ray_sphere_counts),
        "per_ray_exact_occluders": stats(ray_exact_counts),
        "elapsed_s": round(el, 1),
        "note": ("shaft_slots = current cone-refine candidates per "
                 "(light, group); per_ray_sphere_slots = K=inf subdivision "
                 "limit at sphere granularity; per_ray_exact_occluders = "
                 "true occluder count per ray"),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "shadow_limit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def _cone_slots(light, center, radius, sc_v, sr_v):
    """Candidate slot count for a cone apexed at `light` covering the
    sphere (center, radius) — the refine's sphere-vs-cone test."""
    dvec = center - light
    dist = float(np.linalg.norm(dvec))
    if radius < 0:
        return 0
    half = np.arcsin(min(1.0, radius / max(dist, 1e-30)))
    axis = dvec / max(dist, 1e-30)
    dmax = dist + radius
    co = sc_v - light[None, :]
    d_s = np.linalg.norm(co, axis=1)
    cosang = np.clip(co @ axis / np.maximum(d_s, 1e-30), -1, 1)
    ang = np.arccos(cosang)
    srad = np.arcsin(np.clip(sr_v / np.maximum(d_s, 1e-30), 0, 1))
    return int(((ang <= half + srad) & (d_s - sr_v <= dmax)).sum())


def cells_analysis():
    """Stratified-cell shaft sizing: re-draw the jitter stratified by
    sample index (cell = i mod C; spin strata x signed-splay normal
    quantile strata), re-trace, and size per (light, group, cell) shafts.
    Work metrics vs the whole-group shaft (both 128-slot row-quantized):
      masked_ratio = sum_c rows_c / rows_group   (all group rays dot all
                     cells' rows, per-slot cell mask — the cheap design)
      block_ratio  = masked_ratio / C            (per-cell 128-ray blocks
                     dot only their own rows — the full restructure)
    Writes artifacts/shadow_cells.json."""
    from scipy.special import ndtri

    st = _probe_state()
    P = st["P"]; lights = st["lights"]; rc = st["rc"]
    splan = st["splan"]; eplan = st["eplan"]
    omms_p = st["omms_p"]; pos = st["pos"]; ls = st["ls"]
    sc_v, sr_v = st["sc_v"], st["sr_v"]
    ng = st["ng"]; rg_pad = st["rg_pad"]
    import jax.numpy as jnp
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    rng = np.random.default_rng(0)
    live_groups = np.where((rc > 0) & (st["rg_sph"] >= 0))[0]
    if len(live_groups) > MAX_GROUPS:
        live_groups = rng.choice(live_groups, MAX_GROUPS, replace=False)

    results = {}
    for (cs_, cr_) in ((2, 4), (4, 2), (2, 8), (4, 4), (8, 4)):
        C = cs_ * cr_
        S = SAMPLES - SAMPLES % C  # analysis only: whole strata
        n = omms_p.shape[0]
        sd = np.asarray(omms_p[:, 6]) / P.FWHM_SD_RATIO
        i = np.arange(S)
        cell = i % C
        u1 = rng.random((n, S))
        u2 = rng.random((n, S))
        spin = ((cell % cs_)[None, :] + u1) / cs_ * np.pi
        q = (((cell // cs_)[None, :] + u2) / cr_)
        splay = ndtri(np.clip(q, 1e-6, 1 - 1e-6)) * sd[:, None]
        rays, _, neg_o = P._gen_ray_features(
            omms_p, pos, ls, jnp.asarray(splay, jnp.float32),
            jnp.asarray(spin, jnp.float32), samples=S,
            ng=eplan.ng, g=eplan.g, nrb=eplan.nrb,
            rb_size=eplan.rb_size)
        kcand, rmax = P._plan_widths(
            splan, eplan, omms_p, pos, ls,
            (eplan.sig, SAMPLES, b"shadow-cells"))
        rc2, pmm, _, _ = P._pack_fused(
            splan.mm_flat, splan.slot_center_cl, splan.slot_radius_cl,
            splan.half_center, splan.half_radius, omms_p, pos, ls,
            g=eplan.g, kcand=kcand, rmax=rmax, cull_sigmas=4.0,
            tri_cl=splan.slot_tri_cl)
        out = run_packed_tracer(
            rc2, pmm, rays, ng=eplan.ng, nrb=eplan.nrb,
            rb_size=eplan.rb_size, rmax=rmax)
        t_f = np.asarray(out[0])
        rg = eplan.g * S
        rg_pad2 = eplan.nrb * eplan.rb_size

        def repad(x):
            x2 = np.asarray(x).reshape(ng, rg)
            if rg_pad2 != rg:
                x2 = np.pad(x2, ((0, 0), (0, rg_pad2 - rg)))
            return x2.reshape(-1)

        live_f = np.repeat(rc > 0, rg_pad2)
        hit_f = (t_f < 1e30) & live_f
        dirs = np.asarray(rays)[0:3]  # affine off: rows 0:3 are d
        t_c = np.where(hit_f, t_f, 0.0)
        pxs = -repad(np.broadcast_to(np.asarray(neg_o[0]), (n, S))) \
            + t_c * dirs[0]
        pys = -repad(np.broadcast_to(np.asarray(neg_o[1]), (n, S))) \
            + t_c * dirs[1]
        pzs = -repad(np.broadcast_to(np.asarray(neg_o[2]), (n, S))) \
            + t_c * dirs[2]
        pts = np.stack([pxs, pys, pzs], -1).reshape(ng, rg_pad2, 3)
        hits2 = hit_f.reshape(ng, rg_pad2)
        cell_f = np.resize(np.arange(rg_pad2) % C, rg_pad2)

        tot_group_rows = 0
        tot_cell_rows = 0
        tot_group_slots = 0
        tot_cell_slots = 0
        infl = P.SHADOW_BOUND_INFLATE
        for li in range(lights.shape[0]):
            light = np.asarray(lights[li, 4:7], np.float32)
            for gi in live_groups:
                h = hits2[gi]
                p = pts[gi]
                if not h.any():
                    continue
                # whole-group shaft
                lo, hi = p[h].min(0), p[h].max(0)
                c0 = 0.5 * (lo + hi)
                r0 = 0.5 * float(np.linalg.norm(hi - lo)) * infl + 1e-2
                slots_g = _cone_slots(light, c0, r0, sc_v, sr_v)
                tot_group_rows += -(-slots_g // 128)
                tot_group_slots += slots_g
                for c in range(C):
                    m = h & (cell_f == c)
                    if not m.any():
                        continue
                    lo, hi = p[m].min(0), p[m].max(0)
                    cc = 0.5 * (lo + hi)
                    rr = 0.5 * float(np.linalg.norm(hi - lo)) * infl + 1e-2
                    slots_c = _cone_slots(light, cc, rr, sc_v, sr_v)
                    tot_cell_rows += -(-slots_c // 128)
                    tot_cell_slots += slots_c
        results[f"cs{cs_}xcr{cr_}"] = {
            "C": C,
            "group_rows": tot_group_rows,
            "cell_rows": tot_cell_rows,
            "group_slots": tot_group_slots,
            "cell_slots": tot_cell_slots,
            # slot-level packing: all cells' candidates concatenated into
            # shared rows with per-slot cell tags -> rows per (l, g) =
            # ceil(sum_c slots_c / 128); every group ray dots them all
            "packed_ratio": round(tot_cell_slots / max(tot_group_slots, 1),
                                  3),
            "masked_ratio": round(tot_cell_rows / max(tot_group_rows, 1), 3),
            "block_ratio": round(
                tot_cell_rows / max(tot_group_rows, 1) / C, 4),
        }
        print(f"cells {cs_}x{cr_}: group rows {tot_group_rows}, cell rows "
              f"{tot_cell_rows}, masked ratio "
              f"{results[f'cs{cs_}xcr{cr_}']['masked_ratio']}")
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "shadow_cells.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))



if __name__ == "__main__":
    if "--cells" in sys.argv:
        cells_analysis()
    else:
        main()
