"""Frame anatomy: time raygen / kernel / epilogue as separate sub-jits.

Differential protocol (CLAUDE.md "measure before optimising"): each stage is
its own jit, run REPS times back-to-back with ONE terminal sync, so the
~26 ms tunnel round trip amortises away.  The staged sum is slightly larger
than the fused frame (no cross-stage fusion), which is fine for ranking.

Usage:  python tools/frame_anatomy.py [natural|ofstad] [samples]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CR_SESSION_CACHE_DIR",
                                 "/tmp/cr_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "natural"
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    if which == "ofstad":
        r = bench.build_ofstad_renderer()
    else:
        r, _ = bench.build_renderer()
    r.set_render_size(r.get_current_eye_ommatidial_count(), 1)
    r.set_current_eye_samples_per_ommatidium(samples)

    import dataclasses

    from compound_ray_tpu.config import get_config, set_config

    # the dense stages dissect the DENSE plan; with an adopted sky split
    # the warmup render would compact it and evict the dense pack
    # (packed_store would be empty below).  Pin sky off here; the sky
    # stages at the end re-enable it and dissect the compacted plan.
    base_cfg = get_config()
    set_config(dataclasses.replace(base_cfg, sky_split=False))
    for _ in range(2):
        r.render_frame()

    from compound_ray_tpu.config import get_config
    from compound_ray_tpu.eye import pipeline as P
    from compound_ray_tpu.trace.mm_tracer import run_packed_tracer

    cam = r.current_camera()
    scene = r.scene
    splan = P.scene_plan(scene)
    eplan = P.eye_plan(cam.ommatidia, samples)
    omms_p = eplan.omms_p_dev
    pos = jnp.asarray(np.asarray(cam.position, np.float32))
    ls = jnp.asarray(np.asarray(cam.local_space, np.float32))
    (row_counts, packed_mm) = next(iter(splan.packed_store.values()))
    rmax = packed_mm.shape[1]
    print(f"{which}: ng={eplan.ng} g={eplan.g} rb={eplan.rb_size} rmax={rmax} "
          f"rows mean={np.asarray(jax.device_get(row_counts)).mean():.2f}")

    ng, g, nrb, rb_size = eplan.ng, eplan.g, eplan.nrb, eplan.rb_size
    key = jax.random.PRNGKey(7)

    from compound_ray_tpu.eye.sampling import FWHM_SD_RATIO, cone_offset_components

    @jax.jit
    def f_rays(omms_p, position, local_space, key):
        n_pad = omms_p.shape[0]
        k_splay, k_spin = jax.random.split(key)
        sd = omms_p[:, 6] / FWHM_SD_RATIO
        splay = jax.random.normal(k_splay, (n_pad, samples)) * sd[:, None]
        spin = jax.random.uniform(k_spin, (n_pad, samples)) * jnp.pi
        ax, ay, az = omms_p[:, 3], omms_p[:, 4], omms_p[:, 5]
        axis_len = jnp.sqrt(ax * ax + ay * ay + az * az)
        inv_al = 1.0 / jnp.maximum(axis_len, 1e-30)
        focal = omms_p[:, 7]
        rx = omms_p[:, 0] - ax * inv_al * focal
        ry = omms_p[:, 1] - ay * inv_al * focal
        rz = omms_p[:, 2] - az * inv_al * focal
        L = local_space
        ox = position[0] + rx * L[0, 0] + ry * L[1, 0] + rz * L[2, 0]
        oy = position[1] + rx * L[0, 1] + ry * L[1, 1] + rz * L[2, 1]
        oz = position[2] + rx * L[0, 2] + ry * L[1, 2] + rz * L[2, 2]
        rdx, rdy, rdz = cone_offset_components(
            ax[:, None], ay[:, None], az[:, None], splay, spin)
        wdx = rdx * L[0, 0] + rdy * L[1, 0] + rdz * L[2, 0]
        wdy = rdx * L[0, 1] + rdy * L[1, 1] + rdz * L[2, 1]
        wdz = rdx * L[0, 2] + rdy * L[1, 2] + rdz * L[2, 2]
        inv_n = jax.lax.rsqrt(jnp.maximum(wdx * wdx + wdy * wdy + wdz * wdz, 1e-60))
        dx, dy, dz = wdx * inv_n, wdy * inv_n, wdz * inv_n
        tmin = (focal * axis_len)[:, None]
        oxb, oyb, ozb = ox[:, None], oy[:, None], oz[:, None]
        mx = oyb * dz - ozb * dy
        my = ozb * dx - oxb * dz
        mz = oxb * dy - oyb * dx
        rg = g * samples
        rg_pad = nrb * rb_size
        zeros = jnp.zeros((n_pad, samples), jnp.float32)
        ones = jnp.ones((n_pad, samples), jnp.float32)
        comps = [dx, dy, dz, mx, my, mz,
                 -(oxb + tmin * dx), -(oyb + tmin * dy), -(ozb + tmin * dz),
                 ones] + [zeros] * 6
        rays_pl = jnp.stack([c.reshape(ng, rg) for c in comps])
        if rg_pad != rg:
            rays_pl = jnp.pad(rays_pl, ((0, 0), (0, 0), (0, rg_pad - rg)),
                              mode="edge")
        return rays_pl.reshape(16, ng * rg_pad)

    rays = f_rays(omms_p, pos, ls, key)
    jax.device_get(rays.ravel()[0])

    from compound_ray_tpu.trace.pallas_tracer import ATTR_COMPS_FLAT

    emit = (("uvs" if splan.tex_static is not None else "uv")
            if splan.tex_only else
            "flat" if splan.attr_table.shape[1] == ATTR_COMPS_FLAT
            else "bary")

    @jax.jit
    def f_kern(row_counts, packed_mm, rays):
        out = run_packed_tracer(row_counts, packed_mm, rays, ng=ng, nrb=nrb,
                                rb_size=rb_size, rmax=rmax, emit=emit)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    cfg = get_config()

    def f_full():
        return P._render_frame(
            packed_mm, row_counts, splan.attr_table, scene.device_triangles(),
            splan.quad_table, omms_p, pos, ls, key,
            samples=samples, background=0, ng=ng, g=g, nrb=nrb,
            rb_size=rb_size, rmax=rmax, textured=splan.textured,
            tex_only=splan.tex_only, tex_static=splan.tex_static,
            cache_shape=(cfg.farfield_cache_width // 2,
                         cfg.farfield_cache_width),
        )

    def sync1(out):
        # ONE element through the tunnel — never the whole array
        jax.device_get(out.ravel()[0] if hasattr(out, "ravel") else out)

    stage_ms = {}  # label -> ms, dumped to artifacts/anatomy.json at the end

    def timeit(label, fn, *args):
        sync1(fn(*args))  # warm
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        sync1(outs[-1])
        ms = (time.perf_counter() - t0) * 1000.0 / reps
        print(f"  {label:28s} {ms:8.2f} ms", flush=True)
        stage_ms[label.strip()] = round(ms, 3)
        return ms

    @jax.jit
    def f_rng(omms_p, key):
        n_pad = omms_p.shape[0]
        k_splay, k_spin = jax.random.split(key)
        sd = omms_p[:, 6] / FWHM_SD_RATIO
        splay = jax.random.normal(k_splay, (n_pad, samples)) * sd[:, None]
        spin = jax.random.uniform(k_spin, (n_pad, samples)) * jnp.pi
        return jnp.sum(splay) + jnp.sum(spin)

    @jax.jit
    def f_rays_nostack(omms_p, position, local_space, key):
        # identical math to f_rays but WITHOUT the 16-component stack/pad:
        # isolates the planar-layout materialisation cost
        n_pad = omms_p.shape[0]
        k_splay, k_spin = jax.random.split(key)
        sd = omms_p[:, 6] / FWHM_SD_RATIO
        splay = jax.random.normal(k_splay, (n_pad, samples)) * sd[:, None]
        spin = jax.random.uniform(k_spin, (n_pad, samples)) * jnp.pi
        ax, ay, az = omms_p[:, 3], omms_p[:, 4], omms_p[:, 5]
        axis_len = jnp.sqrt(ax * ax + ay * ay + az * az)
        inv_al = 1.0 / jnp.maximum(axis_len, 1e-30)
        focal = omms_p[:, 7]
        rx = omms_p[:, 0] - ax * inv_al * focal
        ry = omms_p[:, 1] - ay * inv_al * focal
        rz = omms_p[:, 2] - az * inv_al * focal
        L = local_space
        ox = position[0] + rx * L[0, 0] + ry * L[1, 0] + rz * L[2, 0]
        oy = position[1] + rx * L[0, 1] + ry * L[1, 1] + rz * L[2, 1]
        oz = position[2] + rx * L[0, 2] + ry * L[1, 2] + rz * L[2, 2]
        rdx, rdy, rdz = cone_offset_components(
            ax[:, None], ay[:, None], az[:, None], splay, spin)
        wdx = rdx * L[0, 0] + rdy * L[1, 0] + rdz * L[2, 0]
        wdy = rdx * L[0, 1] + rdy * L[1, 1] + rdz * L[2, 1]
        wdz = rdx * L[0, 2] + rdy * L[1, 2] + rdz * L[2, 2]
        inv_n = jax.lax.rsqrt(jnp.maximum(wdx * wdx + wdy * wdy + wdz * wdz,
                                          1e-60))
        dx, dy, dz = wdx * inv_n, wdy * inv_n, wdz * inv_n
        tmin = (focal * axis_len)[:, None]
        oxb, oyb, ozb = ox[:, None], oy[:, None], oz[:, None]
        mx = oyb * dz - ozb * dy
        my = ozb * dx - oxb * dz
        mz = oxb * dy - oyb * dx
        return (jnp.sum(dx + dy + dz) + jnp.sum(mx + my + mz)
                + jnp.sum(oxb + tmin))

    timeit("  rng draws only", f_rng, omms_p, key)
    timeit("  raygen math, no stack", f_rays_nostack, omms_p, pos, ls, key)
    t_rays = timeit("raygen+pack", f_rays, omms_p, pos, ls, key)
    t_kern = timeit("raygen-free kernel", f_kern, row_counts, packed_mm, rays)

    # kernel-variant differentials: precision isolates the matmul passes
    # (HIGHEST = 6 bf16 passes, default = 1), emit isolates the winner
    # state width + in-register cu/cv math (docs/next-levers.md reads
    # these to rank the remaining per-step cost)
    @jax.jit
    def f_kern_default(row_counts, packed_mm, rays):
        out = run_packed_tracer(row_counts, packed_mm, rays, ng=ng, nrb=nrb,
                                rb_size=rb_size, rmax=rmax, emit=emit,
                                precision="default")
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    @jax.jit
    def f_kern_f32x1(row_counts, packed_mm, rays):
        out = run_packed_tracer(row_counts, packed_mm, rays, ng=ng, nrb=nrb,
                                rb_size=rb_size, rmax=rmax, emit=emit,
                                precision="f32x1")
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    @jax.jit
    def f_kern_bary(row_counts, packed_mm, rays):
        out = run_packed_tracer(row_counts, packed_mm, rays, ng=ng, nrb=nrb,
                                rb_size=rb_size, rmax=rmax, emit="bary")
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    timeit("  kernel (precision=default)", f_kern_default,
           row_counts, packed_mm, rays)
    timeit("  kernel (precision=f32x1)", f_kern_f32x1,
           row_counts, packed_mm, rays)
    if emit != "bary":
        timeit("  kernel (emit=bary)", f_kern_bary,
               row_counts, packed_mm, rays)
    t_full = timeit("full frame (fused)", f_full)
    print(f"  {'epilogue (full-kern-rays)':28s} {t_full - t_kern - t_rays:8.2f} ms")

    # ---- epilogue sub-split (synthetic inputs, same shapes as the frame):
    # ranks addressing transcendentals vs the row gather vs bilinear+mean
    R = ng * nrb * rb_size
    kd = jax.random.split(key, 4)
    dxs = jax.random.uniform(kd[0], (R,), minval=-1.0, maxval=1.0)
    dys = jax.random.uniform(kd[1], (R,), minval=-1.0, maxval=1.0)
    dzs = jax.random.uniform(kd[2], (R,), minval=-1.0, maxval=1.0)
    table = splan.quad_gray if splan.quad_gray is not None else splan.quad_table
    if table is None or table.shape[0] < 2:
        table = jnp.zeros((1024, 16), jnp.float32)
    idx_s = jax.random.randint(kd[3], (R,), 0, table.shape[0])
    n_pad = omms_p.shape[0]

    @jax.jit
    def f_equirect(dx, dy, dz):
        ch = cfg.farfield_cache_width // 2
        i, fx, fy = P._equirect_coords_c(ch, cfg.farfield_cache_width,
                                         dx, dy, dz, fast=False)
        return jnp.sum(i) + jnp.sum(fx + fy)

    @jax.jit
    def f_equirect_fast(dx, dy, dz):
        # short-polynomial addressing (tools/tpu_session.py equirect A/B)
        ch = cfg.farfield_cache_width // 2
        i, fx, fy = P._equirect_coords_c(ch, cfg.farfield_cache_width,
                                         dx, dy, dz, fast=True)
        return jnp.sum(i) + jnp.sum(fx + fy)

    @jax.jit
    def f_texaddr(cu, cv):
        if splan.tex_static is None:
            return jnp.float32(0.0)
        from compound_ray_tpu.trace.shade import texture_quad_coords_single
        i, fx, fy = texture_quad_coords_single(cu, cv, *splan.tex_static)
        return jnp.sum(i) + jnp.sum(fx + fy)

    @jax.jit
    def f_gather_mean(table, idx, fx, fy):
        from compound_ray_tpu.trace.shade import (quad_bilinear_c,
                                                  quad_bilinear_gray_c)
        rows = table[idx]
        if rows.shape[1] == 4:
            qr = qg = qb = quad_bilinear_gray_c(rows, fx, fy)
        else:
            qr, qg, qb = quad_bilinear_c(rows, fx, fy)
        rr = qr.reshape(n_pad, -1)
        return (jnp.mean(rr, axis=1).sum()
                + jnp.sum(qg.ravel()[0] + qb.ravel()[0]))

    timeit("  equirect coords", f_equirect, dxs, dys, dzs)
    timeit("  equirect coords (fast)", f_equirect_fast, dxs, dys, dzs)
    timeit("  tex addressing", f_texaddr, dxs, dys)
    timeit("  row gather+bilinear+mean", f_gather_mean, table, idx_s,
           dxs, dys)
    # coherent variant: sorted indices approximate the real frame's
    # per-ommatidium texel locality — tells whether the gather is
    # descriptor-rate-bound (no change) or memory-bound (faster)
    timeit("  ..same, sorted indices", f_gather_mean, table,
           jnp.sort(idx_s), dxs, dys)

    stage_ms["epilogue (full-kern-rays)"] = round(t_full - t_kern - t_rays, 3)

    # ---- lit sub-split (natural only — the lit stage's target metric):
    # splits the lit premium one level deeper than tpu_session run_lit's
    # light-count differential: occlusion KERNEL vs the GGX/shading-basis
    # epilogue vs the unlit base, all at the lit stage's 1000 samples.
    # Skipped on CPU (interpret-mode occlusion is ~100x slower — the same
    # reason run_lit is not smoke-run); CR_ANATOMY_LIT=1 forces it for a
    # hand-driven check at small sizes.
    lit_on = (which == "natural"
              and (jax.devices()[0].platform != "cpu"
                   or os.environ.get("CR_ANATOMY_LIT") == "1"))
    if lit_on and getattr(r, "_lights", None) is not None:
        from compound_ray_tpu.trace.mm_tracer import run_rows_occlusion

        s_lit = min(samples,
                    int(os.environ.get("CR_ANATOMY_LIT_SAMPLES", "1000")))
        lights_np = np.asarray(r._lights, np.float32)
        pos_np = np.asarray(cam.position, np.float32)
        ls_np = np.asarray(cam.local_space, np.float32)
        kw_lit, ep_l, _ = P._plan_frame(
            scene, scene.device_triangles(), cam.ommatidia, pos_np, ls_np,
            key, s_lit, 0, lights=lights_np)
        kw_unl, _, _ = P._plan_frame(
            scene, scene.device_triangles(), cam.ommatidia, pos_np, ls_np,
            key, s_lit, 0)
        # comparable baseline: lit frames always run with the far-field
        # cache off (cached radiance is unlit), so the unlit baseline must
        # too — otherwise the derived GGX number absorbs the cache-vs-miss
        # -shader difference
        kw_unl["use_cache"] = False
        kw_unl["cache"] = None
        n_lights = int(lights_np.shape[0])
        sflat = kw_lit["shadow_flat"]  # (TB, 16, rpb*512) row blocks
        rpb_l = int(sflat.shape[2]) // 512
        t_rows = int(sflat.shape[0]) * rpb_l
        print(f"  lit split @{s_lit}: {n_lights} lights, "
              f"{t_rows} shadow table rows ({sflat.shape[0]} blocks "
              f"x rpb={rpb_l})")

        def f_lit_full():
            return P._render_frame(key=key, **kw_lit)

        def f_unlit_s():
            return P._render_frame(key=key, **kw_unl)

        # the occlusion kernel's WORK is fixed by the table's flag/row
        # layout (every live row is traversed regardless of ray values),
        # so synthetic rays time it faithfully
        rgp = ep_l.nrb * ep_l.rb_size
        rays_syn = jax.random.normal(
            jax.random.fold_in(key, 11),
            (int(sflat.shape[1]), n_lights * ep_l.ng * rgp), jnp.float32)

        @jax.jit
        def f_occ(r2v, flag, flat, rays):
            out = run_rows_occlusion(r2v, flag, flat, rays,
                                     nrb=ep_l.nrb, rb_size=ep_l.rb_size)
            return jnp.sum(out)  # any-hit 0/1, always finite

        # kernel-variant differential: the any-hit test compares
        # sign-folded PRODUCTS, so a one-pass bf16 matmul only flips
        # slots at the u/v/t decision boundary — if this row is much
        # cheaper, a gated shadow-only precision adoption is the next
        # lit lever
        @jax.jit
        def f_occ_default(r2v, flag, flat, rays):
            out = run_rows_occlusion(r2v, flag, flat, rays,
                                     nrb=ep_l.nrb, rb_size=ep_l.rb_size,
                                     precision="default")
            return jnp.sum(out)

        t_unl = timeit(f"unlit frame @{s_lit} (cache off)", f_unlit_s)
        t_lit = timeit(f"lit frame @{s_lit}", f_lit_full)
        t_occ = timeit("  occlusion kernel (all lights)", f_occ,
                       kw_lit["shadow_r2v"], kw_lit["shadow_flag"],
                       kw_lit["shadow_flat"], rays_syn)
        @jax.jit
        def f_occ_f32x1(r2v, flag, flat, rays):
            out = run_rows_occlusion(r2v, flag, flat, rays,
                                     nrb=ep_l.nrb, rb_size=ep_l.rb_size,
                                     precision="f32x1")
            return jnp.sum(out)

        t_occ_d = timeit("  occlusion kernel (precision=default)",
                         f_occ_default,
                         kw_lit["shadow_r2v"], kw_lit["shadow_flag"],
                         kw_lit["shadow_flat"], rays_syn)
        stage_ms["lit: occlusion kernel (precision=default)"] = round(
            t_occ_d, 3)
        t_occ_x = timeit("  occlusion kernel (precision=f32x1)",
                         f_occ_f32x1,
                         kw_lit["shadow_r2v"], kw_lit["shadow_flag"],
                         kw_lit["shadow_flat"], rays_syn)
        stage_ms["lit: occlusion kernel (precision=f32x1)"] = round(
            t_occ_x, 3)
        ggx = t_lit - t_unl - t_occ
        print(f"  {'ggx+basis+shadow raygen':28s} {ggx:8.2f} ms (derived)")
        stage_ms["lit: ggx+basis (derived)"] = round(ggx, 3)
        stage_ms["lit: shadow table rows"] = float(t_rows)

        # ---- finer split of the ggx+basis blob (the round-5 lit lever
        # selector): shading-basis gather+math, shadow-ray stack
        # construction, and the per-light GGX contraction, each at the
        # frame's real ray count with synthetic inputs.
        from compound_ray_tpu.trace.lighting import (
            build_shading_rows,
            ggx_light_contrib,
            shading_basis_from_rows,
        )

        sdev = scene.device_triangles()
        R_l = ep_l.ng * rgp
        n_tri = int(np.asarray(sdev["v0"]).shape[0])
        kb = jax.random.split(jax.random.fold_in(key, 13), 6)
        tid_syn = jax.random.randint(kb[0], (R_l,), 0, n_tri)
        uv_syn = jax.random.uniform(kb[1], (2, R_l), maxval=0.5)

        @jax.jit
        def f_basis(tid, uv):
            rows_g = build_shading_rows(sdev)[tid]
            e1g, e2g, n0g, n1g, n2g, has_n, metallic, roughness = (
                shading_basis_from_rows(rows_g))
            u_b, v_b = uv[0], uv[1]
            w_b = (1.0 - u_b - v_b)[:, None]
            n_sm = w_b * n0g + u_b[:, None] * n1g + v_b[:, None] * n2g
            n_vec = jnp.where(has_n[:, None], n_sm, jnp.cross(e1g, e2g))
            n_vec = n_vec / jnp.maximum(
                jnp.linalg.norm(n_vec, axis=-1, keepdims=True), 1e-20)
            return (jnp.sum(n_vec) + jnp.sum(metallic)
                    + jnp.sum(roughness))

        t_b = timeit("  lit: basis gather+math", f_basis, tid_syn, uv_syn)
        stage_ms["lit: basis gather+math"] = round(t_b, 3)

        p_syn = jax.random.normal(kb[2], (3, R_l), jnp.float32)

        @jax.jit
        def f_sraygen(p, lights):
            # mirrors the pipeline's reverse-affine shadow-ray stacks
            eps_l = jnp.float32(1e-3)
            parts = []
            for li in range(n_lights):
                lpos = lights[li, 4:7]
                tox = lpos[0] - p[0]
                toy = lpos[1] - p[1]
                toz = lpos[2] - p[2]
                ldist = jnp.sqrt(tox * tox + toy * toy + toz * toz)
                inv_ld = 1.0 / jnp.maximum(ldist, 1e-20)
                drx = eps_l * tox * inv_ld - tox
                dry = eps_l * toy * inv_ld - toy
                drz = eps_l * toz * inv_ld - toz
                one_f = jnp.ones_like(tox)
                zero_f = jnp.zeros_like(tox)
                parts.append(jnp.stack(
                    [drx, dry, drz, one_f, zero_f, zero_f, zero_f,
                     zero_f]))
            return jnp.sum(jnp.concatenate(parts, axis=1))

        t_s = timeit("  lit: shadow raygen stacks", f_sraygen, p_syn,
                     jnp.asarray(lights_np))
        stage_ms["lit: shadow raygen stacks"] = round(t_s, 3)

        def unit(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-20)

        nv_syn = unit(jax.random.normal(kb[3], (R_l, 3), jnp.float32))
        vw_syn = unit(jax.random.normal(kb[4], (R_l, 3), jnp.float32))
        base_syn = jax.random.uniform(kb[5], (R_l, 3), jnp.float32)

        @jax.jit
        def f_ggx(n_vec, view, base, mtl, rgh, lights, occ):
            result = base
            for li in range(n_lights):
                lv = unit(lights[li, 4:7][None, :] - view)  # (R,3) proxy
                contrib, facing = ggx_light_contrib(
                    n_vec, view, lv, base, mtl, rgh,
                    lights[li, 0:3], lights[li, 3])
                sel = facing & (occ[li * R_l:(li + 1) * R_l] < 0.5)
                result = result + jnp.where(sel[:, None], contrib, 0.0)
            return jnp.sum(result)

        t_g = timeit(
            "  lit: ggx contraction x lights", f_ggx, nv_syn, vw_syn,
            base_syn, base_syn[:, 0], base_syn[:, 1],
            jnp.asarray(lights_np), rays_syn[0])
        stage_ms["lit: ggx contraction"] = round(t_g, 3)

    # ---- sky-split sub-split (pipeline SKY SPLIT notes): dissect the
    # COMPACTED plan the steady state actually serves when the split is
    # adopted.  Runs when the session config adopted it (or forced via
    # CR_ANATOMY_SKY=1); the dense stages above measured the same pose
    # with the split pinned off, so the rows are directly comparable.
    if base_cfg.sky_split or os.environ.get("CR_ANATOMY_SKY") == "1":
        set_config(dataclasses.replace(base_cfg, sky_split=True))
        splan.sky_store.clear()
        for _ in range(2):
            r.render_frame()  # builds + serves the compacted plan
        entry = next((v for v in splan.sky_store.values()
                      if v is not None), None)
        if entry is None:
            print("  (sky split did not engage at this pose)")
        else:
            (pl_live, rc_live, omms_live, _scatter, _sky_means, ngl,
             _kc_s, rm_s) = entry
            live = int(np.asarray(jax.device_get(rc_live > 0)).sum())
            print(f"  sky split: ngl={ngl} (live {live} of {ng})")
            stage_ms["sky: compacted groups"] = float(ngl)
            from compound_ray_tpu.eye.sampling import sample_angles_ns

            @jax.jit
            def f_rays_sky(omms_live, position, local_space, key):
                splay, spin = sample_angles_ns(
                    key, omms_live[:, 6] / FWHM_SD_RATIO, samples)
                rays2, _, _ = P._gen_ray_features(
                    omms_live, position, local_space, splay, spin,
                    samples=samples, ng=ngl, g=g, nrb=nrb, rb_size=rb_size)
                return rays2

            @jax.jit
            def f_kern_sky(rc, pm, rays2):
                out = run_packed_tracer(rc, pm, rays2, ng=ngl, nrb=nrb,
                                        rb_size=rb_size, rmax=rm_s,
                                        emit=emit)
                return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

            rays_live = f_rays_sky(omms_live, pos, ls, key)
            jax.device_get(rays_live.ravel()[0])
            t_rays_s = timeit("  raygen+pack (sky)", f_rays_sky,
                              omms_live, pos, ls, key)
            t_kern_s = timeit("  kernel (sky)", f_kern_sky,
                              rc_live, pl_live, rays_live)
            n_burst = max(4, reps)
            r.render_frames_pipelined(n_burst)  # warm the burst shape
            ms_pipe = r.render_frames_pipelined(n_burst) / n_burst
            print(f"  {'full frame (pipelined, sky)':28s} {ms_pipe:8.2f} ms")
            stage_ms["full frame (pipelined, sky)"] = round(ms_pipe, 3)
            stage_ms["sky: epilogue (derived)"] = round(
                ms_pipe - t_kern_s - t_rays_s, 3)

    set_config(base_cfg)
    _dump_anatomy(which, samples, stage_ms)


def _dump_anatomy(which, samples, stage_ms):
    """Merge this scene's staged timings into artifacts/anatomy.json so
    tools/post_batch_report.py can render the docs table without parsing
    the session log."""
    import json

    from compound_ray_tpu.config import get_config
    from compound_ray_tpu.eye.pipeline import FAST_EQUIRECT
    from compound_ray_tpu.trace.mm_tracer import PRECISION, UNROLL_B

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "anatomy.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc[which] = {
        "samples": samples,
        "platform": jax.devices()[0].platform,
        "measured": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "tuning": {"unroll_b": UNROLL_B, "precision": PRECISION,
                   "fast_equirect": FAST_EQUIRECT,
                   "affine_rays": get_config().affine_rays,
                   "sky_split": get_config().sky_split},
        "stages_ms": stage_ms,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
