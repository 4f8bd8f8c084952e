"""EyeRenderer: the full API surface of libEyeRenderer3 on the TPU backend.

Method-for-method mirror of the reference C ABI
(libEyeRenderer3/libEyeRenderer.h:30-120 / libEyeRenderer.cpp:260-575), with
snake_case Python names; the ctypes-compatible camelCase shim lives in
compound_ray_tpu.api.shim so the reference's python-examples run unchanged.

Renderer state mirrors the reference globals (scene, params, outputBuffer,
width/height, notificationsActive at libEyeRenderer.cpp:96-106).  Per frame
(renderFrame -> launchFrame, libEyeRenderer.cpp:174-244):
  1. if a compound eye is active: run the fused sample pipeline -> per-
     ommatidium means (and raw samples when the projection requires them),
     bump the frame counter (the RNG key input).
  2. if the non-compound pipeline is required and width*height > 0: render the
     display buffer — the active camera's raygen for real cameras, or the
     active compound projection over the freshly traced ommatidial data.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from compound_ray_tpu.cameras.raygen import render_camera_image
from compound_ray_tpu.cameras.types import (
    Camera,
    CompoundEyeCamera,
    OrthographicCamera,
    PanoramicCamera,
    PerspectiveCamera,
)
from compound_ray_tpu.eye.render import render_compound_means, render_compound_samples
from compound_ray_tpu.projection.project import project_frame
from compound_ray_tpu.scene.flat import FlatScene, load_scene
from compound_ray_tpu.trace.lighting import default_lights
from compound_ray_tpu.trace.shade import miss_id

_base_key = None
_fold_jit = None
_fold_many_jit = None


def _frame_key(frame_number: int):
    """PRNG key for a frame: fold_in under jit.  The eager fold_in issued
    ~8 per-primitive dispatches per frame — the dominant host cost of the
    small-frame regime (samples=1 profile: ~105 of 113 ms on CPU).

    The base key seeds from config.base_seed (CR_TPU_SEED, default 42 —
    the reference's curand_init(42, id, 0), shaders.cu:689), read once on
    first use."""
    global _base_key, _fold_jit
    if _base_key is None:
        from compound_ray_tpu.config import get_config

        _base_key = jax.random.PRNGKey(get_config().base_seed)
        _fold_jit = jax.jit(jax.random.fold_in)
    return _fold_jit(_base_key, np.uint32(frame_number))


def _frame_keys(frame_number: int, n: int):
    """(n, ...) stacked keys for frames frame_number..frame_number+n-1 —
    the same keys n _frame_key calls would yield, in one dispatch (feeds
    the scanned multi-frame burst)."""
    global _base_key, _fold_many_jit
    if _base_key is None:
        _frame_key(0)
    if _fold_many_jit is None:
        _fold_many_jit = jax.jit(
            jax.vmap(jax.random.fold_in, in_axes=(None, 0))
        )
    return _fold_many_jit(
        _base_key, np.arange(frame_number, frame_number + n, dtype=np.uint32)
    )


class EyeRenderer:
    """TPU-backed renderer with the reference's full API surface."""

    def __init__(self, verbose: bool = True):
        self.scene: Optional[FlatScene] = None
        self.verbose = verbose
        self.width = 0
        self.height = 0
        self.require_noncompound_pipeline = True
        self.lighting = False  # params.lighting (libEyeRenderer.cpp:127)
        self._lights: Optional[np.ndarray] = None
        self._current_camera = 0
        self._frame_buffer: Optional[np.ndarray] = None  # (H,W,4) uint8
        self._device_frame = None  # device-resident frame (lazy host copy)
        self._camera_data: Optional[np.ndarray] = None  # (N,3) float32 means
        self._raw_samples: Optional[jnp.ndarray] = None
        self._device_means: Optional[jnp.ndarray] = None
        self._backend: str = "auto"  # "auto" | "xla" | "pallas"
        # observability (SURVEY.md §5): rolling per-frame timings + optional
        # jax.profiler trace capture
        self.frame_times_ms: List[float] = []
        self._profile_dir: Optional[str] = None
        # lit-frame shadow-shaft audit (see _check_shadow_audit)
        self._pending_shadow_audit = None
        self._shadow_audit_warned: set = set()
        # outstanding speculative-plan confirms (see _resolve_confirms):
        # each record is {"splan", "pending", "pose_sig", "replay"} from a
        # frame dispatched at an unseen pose with the width check deferred
        # to the next sync
        self._plan_confirms: list = []
        self._last_plan_handle = None  # set by _render_means per dispatch
        self._dispatch_count = 0  # compound dispatches (replay visibility)

    # ------------------------------------------------------------------ config
    def set_verbosity(self, v: bool) -> None:
        self.verbose = bool(v)

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(f"[PyEye] {msg}")

    def load_gltf_scene(self, filepath: str, root_transform=None) -> None:
        if filepath.endswith(".blend"):
            # direct Blender-file extraction (compound_ray_tpu.scene.blend):
            # geometry, materials, AND the cameras/compound-eye markup the
            # glTF exporter would have carried over as extras
            from compound_ray_tpu.scene.blend import load_blend_scene

            self.scene = load_blend_scene(filepath)
        else:
            self.scene = load_scene(filepath, root_transform)
        self._current_camera = 0
        self._lights = default_lights(self.scene.aabb_min, self.scene.aabb_max)
        self._log(f"Loaded scene '{filepath}' "
                  f"({self.scene.num_triangles} triangles, "
                  f"{len(self.scene.cameras)} cameras).")

    def stop(self) -> None:
        self._log("Cleaning eye renderer resources.")
        self.scene = None
        self._frame_buffer = None
        self._camera_data = None
        self._raw_samples = None
        self._device_means = None
        # device-resident state too: a stale _device_frame would keep the
        # old scene's frame alive AND be served by get_frame_pointer after
        # teardown; pending outputs/audit hold device buffers likewise
        self._device_frame = None
        self._last_outputs = None
        self._pending_shadow_audit = None

    def set_render_size(self, w: int, h: int) -> None:
        self.width = int(w)
        self.height = int(h)
        self._frame_buffer = np.zeros((self.height, self.width, 4), np.uint8)

    def set_require_noncompound_pipeline(self, require: bool) -> None:
        self.require_noncompound_pipeline = bool(require)

    def set_lighting(self, enabled: bool) -> None:
        """Extension: toggles the GGX direct-lighting path (params.lighting)."""
        self.lighting = bool(enabled)

    def set_lights(self, lights) -> None:
        """Extension: replace the reference's 4 hard-coded point lights
        (initLaunchParams, libEyeRenderer.cpp:123-160; re-created by
        trace/lighting.default_lights at scene load) with an (L, 7)
        [color rgb, intensity, position xyz] float32 array.  The lit
        frame's shadow plan is memoised per lights-content, so switching
        light sets re-probes occluders once and then renders at steady
        state."""
        arr = np.ascontiguousarray(np.asarray(lights, np.float32))
        if arr.ndim != 2 or arr.shape[1] != 7 or arr.shape[0] < 1:
            raise ValueError(
                "lights must be an (L>=1, 7) array: [r, g, b, intensity, "
                "x, y, z] per row")
        self._lights = arr

    def get_lights(self) -> np.ndarray:
        """Extension: a copy of the active point-light array (L, 7)."""
        if self._lights is None:
            raise RuntimeError("no scene loaded (lights are created at load)")
        return np.array(self._lights)

    # ------------------------------------------------------------------ render
    def _scene_dev(self):
        if self.scene is None:
            raise RuntimeError("no scene loaded (call loadGlTFscene first)")
        return self.scene.device_triangles()

    def render_frame(self, sync: bool = True) -> float:
        """Render; returns wall milliseconds (renderFrame, libEyeRenderer.cpp:279-293).

        sync=False dispatches the frame without waiting for the device — the
        building block of the pipelined (steady-state throughput) mode, where
        consecutive frames queue on the device and a single sync covers the
        batch.  The reference's per-frame cudaDeviceSynchronize costs ~0 over
        local PCIe; here a per-frame sync pays a full transport round trip,
        which is a measurement artifact rather than render cost.  Outputs
        stay device-resident either way; get_camera_data/get_frame_pointer
        block as needed."""
        if self.scene is None:
            raise RuntimeError("renderFrame: no scene loaded (call loadGlTFscene)")
        if not self.scene.cameras:
            raise RuntimeError("renderFrame: the scene has no cameras")
        t0 = time.perf_counter()
        cam = self.current_camera()
        scene_dev = self._scene_dev()
        background = miss_id(self.scene.background_shader)
        # lights stay HOST-side (numpy) through dispatch: converting the
        # device copy back with np.asarray would block ~26 ms per lit frame
        # and defeat sync=False pipelining; jit boundaries auto-convert
        lights = self._lights if self.lighting else None

        outputs = []
        if isinstance(cam, CompoundEyeCamera):
            # RNG stream is PER EYE and restarts when the sample count (or
            # ommatidial layout) changes — the reference's curand re-init
            # semantics (CompoundEye.cpp:271-280); cameras/types.py owns the
            # resets, this is the only advance site besides the burst path
            key = _frame_key(cam.rng_frame)
            omms_np = cam.ommatidia
            omms, omm_pos, omm_dir = cam.device_ommatidia()
            # pose stays host-side: the pipeline hashes it for plan caching
            # (np.asarray on a device array would block on a transfer)
            pos = np.asarray(cam.position, np.float32)
            ls = np.asarray(cam.local_space, np.float32)
            s = cam.samples_per_ommatidium
            need_raw = cam.projection == "raw_ommatidial_samples"
            # a frame dispatched at THIS pose may still have its width
            # check outstanding (a previous unsynced dispatch): resolve
            # before re-planning, so the memoised plan is committed and
            # this frame doesn't speculatively re-pack the same pose
            pose_sig = (pos.tobytes(), ls.tobytes())
            if any(rec["pose_sig"] == pose_sig for rec in self._plan_confirms):
                self._resolve_confirms()

            def dispatch(force_exact: bool = False):
                """Means (+ optional projection) for this frame's key; the
                replay path re-runs it with force_exact=True when a
                deferred width check failed (identical key => identical
                result to the exact plan)."""
                outs = []
                self._last_plan_handle = None  # only the pallas means path sets it
                if need_raw:
                    raw = self._render_raw_samples(
                        scene_dev, omms_np, omms, pos, ls, key, s,
                        background, lights
                    )
                    self._raw_samples = raw
                    self._device_means = jnp.mean(raw, axis=0)
                else:
                    self._raw_samples = None
                    self._device_means = self._render_means(
                        scene_dev, omms_np, pos, ls, key, s, background,
                        lights, force_exact=force_exact
                    )
                outs.append(self._device_means)
                self._camera_data = None  # lazily fetched in get_camera_data
                if (self.require_noncompound_pipeline
                        and self.width * self.height > 0):
                    raw_in = (
                        self._raw_samples
                        if self._raw_samples is not None
                        else jnp.zeros((1, omms.shape[0], 3), jnp.float32)
                    )
                    frame = project_frame(
                        cam.projection,
                        self._device_means,
                        raw_in,
                        omm_pos,
                        omm_dir,
                        self.width,
                        self.height,
                    )
                    outs.append(frame)
                    self._device_frame = frame
                    self._frame_buffer = None  # lazy in get_frame_pointer
                return outs

            outputs = dispatch()
            self._dispatch_count += 1
            handle = self._last_plan_handle
            self._last_plan_handle = None
            if handle is not None:
                self._plan_confirms.append(dict(
                    splan=handle[0], pending=handle[1], pose_sig=pose_sig,
                    replay=dispatch, dispatch_id=self._dispatch_count))
                # bound outstanding speculative packs (each pins its
                # payload on device until confirmed)
                if len(self._plan_confirms) >= 32:
                    self._resolve_confirms()
            cam.rng_frame += 1
        else:
            if self.require_noncompound_pipeline and self.width * self.height > 0:
                # param stays host-side: the Pallas fast path plans its
                # tiles from it on the host (np.asarray on a device array
                # is a blocking per-frame fetch); the XLA path wraps it in
                # jnp.asarray at its call below
                if isinstance(cam, PerspectiveCamera):
                    kind, param = "pinhole", np.asarray(cam.scale, np.float32)
                elif isinstance(cam, PanoramicCamera):
                    kind, param = "panoramic", np.asarray(
                        [cam.start_radius], np.float32
                    )
                elif isinstance(cam, OrthographicCamera):
                    kind, param = "orthographic", np.asarray(cam.scale, np.float32)
                else:
                    kind, param = "pinhole", np.asarray([10.0, 10.0, 1.0], np.float32)
                frame = self._render_camera_frame(
                    scene_dev, kind, cam, param, background, lights
                )
                outputs.append(frame)
                self._device_frame = frame
                self._frame_buffer = None

        if outputs and sync:
            # outputs are dependency-chained (frame consumes means), so
            # syncing on the last covers the frame.  A tiny device_get is
            # used rather than block_until_ready because the latter does not
            # reliably wait under tunneled transports — this is the analogue
            # of the reference's CUDA_SYNC_CHECK after launch
            # (libEyeRenderer.cpp:243).
            self._sync_one(outputs[-1])
        self._last_outputs = outputs
        ms = (time.perf_counter() - t0) * 1000.0
        self.frame_times_ms.append(ms)
        if len(self.frame_times_ms) > 10000:
            del self.frame_times_ms[:5000]
        self._log(f"Rendered frame in {ms}ms.")
        return ms

    def sync(self) -> None:
        """Block until every dispatched frame has completed on the device."""
        outs = getattr(self, "_last_outputs", None)
        if outs:
            self._sync_one(outs[-1])
        elif self._plan_confirms:
            self._resolve_confirms()

    def _sync_one(self, out) -> None:
        """One terminal sync: fetch a single element — and the pending
        shadow audit and every outstanding speculative-plan confirm in the
        SAME transfer, so a synced frame pays exactly one tunnel round
        trip (~26 ms each) even at a fresh pose.  A failed confirm (the
        speculative pack truncated) replays its frame with an exact plan
        and re-syncs — rare, and the high-water widths only grow, so it
        self-extinguishes over a pose sweep."""
        audit = getattr(self, "_pending_shadow_audit", None)
        self._pending_shadow_audit = None
        confirms = self._plan_confirms
        self._plan_confirms = []
        items = [out.ravel()[0]]
        if audit is not None:
            items.append(audit)
        items.extend(rec["pending"]["need"] for rec in confirms)
        host = jax.device_get(tuple(items))
        pos = 1
        if audit is not None:
            self._check_shadow_audit(host[pos])
            pos += 1
        self._finish_confirms(confirms, host[pos:], synced=True)

    def _resolve_confirms(self) -> None:
        """Resolve outstanding width checks NOW (needs-only fetch — waits
        for the packs, not the frames).  Called before re-planning a pose
        that still has its check in flight, and as the outstanding-pack
        bound in render_frame."""
        confirms = self._plan_confirms
        self._plan_confirms = []
        if not confirms:
            return
        host = jax.device_get(
            tuple(rec["pending"]["need"] for rec in confirms))
        self._finish_confirms(confirms, host, synced=False)

    def _finish_confirms(self, confirms, needs_host, synced: bool) -> None:
        """Commit validated speculative plans; replay a truncated one.

        Only a failure from the MOST RECENT dispatch is replayed: every
        earlier frame's buffers were already overwritten by later
        dispatches, so its (truncated) means are unobservable through
        this API — its plan simply stays uncommitted and the pose
        replans exactly on its next visit."""
        from compound_ray_tpu.eye.pipeline import _confirm_pending

        failed = [rec for rec, need in zip(confirms, needs_host)
                  if not _confirm_pending(rec["splan"], rec["pending"],
                                          need_host=need)]
        replay = [rec for rec in failed
                  if rec["dispatch_id"] == self._dispatch_count]
        if len(failed) > len(replay):
            self._log(f"{len(failed) - len(replay)} overwritten speculative "
                      f"frame(s) overflowed; their poses replan on revisit")
        for rec in replay:
            self._log("speculative plan overflowed; re-rendering exactly")
            outs = rec["replay"](force_exact=True)
            self._last_outputs = outs
        if replay and synced:
            jax.device_get(self._last_outputs[-1].ravel()[0])

    def _check_shadow_audit(self, audit_host) -> None:
        """Surface the lit-frame shadow-shaft audit (ADVICE r3): hits
        outside their group's memoised shaft saw only shaft-local occluders
        (the silhouette-edge approximation, pipeline.SHADOW_BOUND_INFLATE)
        — scene-dependent partial light leak that would otherwise be
        silent.  Fetched at an existing sync point, folded into the same
        transfer (_sync_one) so it costs no extra round trip; warns once
        per distinct leak fraction decade to stay quiet in steady state."""
        a = np.asarray(audit_host)
        leaked, total = int(a[0]), int(a[1])
        if leaked <= 0 or total <= 0:
            return
        frac = leaked / total
        # CORRECTIVE, not just advisory (round-4 VERDICT #7) — but
        # thresholded: each out-of-shaft sample biases its ommatidium's
        # S-sample mean by at most 1/S of the local light term, so the
        # frame's error is bounded by ~frac x light term.  Below
        # cfg.shadow_leak_tolerance (default 2e-3, an order under the 1%
        # conformance band) the leak is warn-only; above it the flagged
        # groups switch to guaranteed candidate-extent shadow bounds
        # (their shafts fatten — the natural bench pose measured the
        # whole-scene flip at ~+20% lit frame time for a 6e-5-bounded
        # leak, which is the wrong trade).  Per-group via the audit's
        # tail; a tail-less audit flips the whole scene.
        from compound_ray_tpu.config import get_config
        from compound_ray_tpu.eye.pipeline import mark_shadow_unsound

        replanned = False
        if frac >= get_config().shadow_leak_tolerance:
            groups = np.nonzero(a[2:])[0] if a.shape[0] > 2 else None
            replanned = mark_shadow_unsound(self.scene, leak_groups=groups)
        import math

        decade = int(math.floor(math.log10(max(frac, 1e-12))))
        if decade not in self._shadow_audit_warned:
            self._shadow_audit_warned.add(decade)
            print(
                f"[PyEye] warning: {leaked}/{total} lit samples "
                f"({100.0 * frac:.3g}%) hit outside their memoised shadow "
                f"shaft; their shadow rays saw only shaft-local occluders "
                f"(partial light leak — see docs/conformance.md). "
                + ("Future lit frames replan with guaranteed "
                   "candidate-extent shadow bounds."
                   if replanned else
                   (f"Bounded error ~{frac:.2g} x local light term is "
                    f"under shadow_leak_tolerance; advisory only."
                    if frac < get_config().shadow_leak_tolerance else
                    "Scene already in guaranteed-bounds mode."))
            )

    def render_frames_pipelined(self, n: int) -> float:
        """Render n consecutive frames without intermediate host syncs and
        return the TOTAL wall milliseconds (one terminal sync).

        Frames run sequentially on the device with fresh RNG streams, exactly
        as n render_frame() calls would; only the per-frame host round trip
        is removed.  This is the steady-state serving mode: a consumer reads
        get_camera_data once per pose, not once per jittered sample frame.

        On the single-chip Pallas means path the whole burst collapses into
        ONE device dispatch (a lax.scan over the per-frame keys,
        pipeline._render_frames_scanned) — per-dispatch transport latency
        (~26 ms through the axon tunnel) otherwise floors small frames at
        ~30 ms regardless of sample count.  Results are bit-identical to n
        sequential render_frame calls; only the last frame's projection is
        materialised (intermediate display buffers are unobservable inside
        the burst)."""
        t0 = time.perf_counter()
        route = self._burst_route() if n > 0 else None
        if route is not None:
            cam = self.current_camera()
            scene_dev = self._scene_dev()
            background = miss_id(self.scene.background_shader)
            lights = self._lights if self.lighting else None
            keys = _frame_keys(cam.rng_frame, n)
            pos = np.asarray(cam.position, np.float32)
            ls = np.asarray(cam.local_space, np.float32)
            if route == "sharded":
                from compound_ray_tpu.parallel.sharding import (
                    make_eye_mesh,
                    pick_sample_parallel,
                    render_means_sharded_packed_frames,
                )

                samples = cam.samples_per_ommatidium
                sp = pick_sample_parallel(samples)
                # pose stays host-side (see _render_raw_samples sharded
                # note); lights was already gated by self.lighting above
                means = render_means_sharded_packed_frames(
                    self.scene, scene_dev, cam.ommatidia,
                    pos, ls, keys, samples,
                    background, make_eye_mesh(sample_parallel=sp),
                    lights=lights,
                )
            else:
                from compound_ray_tpu.eye.pipeline import (
                    render_means_pallas_frames,
                )

                means = render_means_pallas_frames(
                    self.scene, scene_dev, cam.ommatidia, pos, ls, keys,
                    cam.samples_per_ommatidium, background,
                    lights=lights,
                )
            self._raw_samples = None
            self._device_means = means[-1]
            self._camera_data = None
            cam.rng_frame += n
            outputs = [self._device_means]
            if self.require_noncompound_pipeline and self.width * self.height > 0:
                omms, omm_pos, omm_dir = cam.device_ommatidia()
                frame = project_frame(
                    cam.projection, self._device_means,
                    jnp.zeros((1, omms.shape[0], 3), jnp.float32),
                    omm_pos, omm_dir, self.width, self.height,
                )
                outputs.append(frame)
                self._device_frame = frame
                self._frame_buffer = None
            self._last_outputs = outputs
            self.sync()
        else:
            for _ in range(n):
                self.render_frame(sync=False)
            self.sync()
        return (time.perf_counter() - t0) * 1000.0

    def _scan_frames_ok(self) -> bool:
        """True when render_frames_pipelined collapses to one dispatch."""
        return self._burst_route() is not None

    def _burst_route(self) -> Optional[str]:
        """Which one-dispatch burst backend render_frames_pipelined takes:
        "sharded" (mesh scan, multi-device), "pallas" (single-device scan /
        stacked kernel), or None (per-frame dispatch fallback — mirrors
        _render_means routing; raw-samples projections and XLA/brute
        backends render frame by frame)."""
        from compound_ray_tpu.config import get_config

        if self.scene is None or not self.scene.cameras:
            return None
        cam = self.current_camera()
        if not isinstance(cam, CompoundEyeCamera):
            return None
        if cam.projection == "raw_ommatidial_samples":
            return None
        backend = get_config().backend if self._backend == "auto" else self._backend
        if len(jax.devices()) > 1 and backend in ("auto", "sharded"):
            # pick_sample_parallel always returns an sp that divides the
            # sample count, so the mesh scan is routable unconditionally
            return "sharded"
        return "pallas" if backend in ("auto", "pallas") else None

    # ------------------------------------------------------------ observability
    def start_profile(self, log_dir: str) -> None:
        """Begin a jax.profiler trace (view with TensorBoard / xprof)."""
        import jax.profiler

        jax.profiler.start_trace(log_dir)
        self._profile_dir = log_dir

    def stop_profile(self) -> None:
        import jax.profiler

        jax.profiler.stop_trace()
        self._log(f"Profile written to {self._profile_dir}")
        self._profile_dir = None

    def frame_time_stats(self) -> dict:
        """Summary of renderFrame wall times (ms) since startup."""
        if not self.frame_times_ms:
            return {"count": 0}
        a = np.asarray(self.frame_times_ms)
        return {
            "count": int(a.size),
            "mean_ms": float(a.mean()),
            "median_ms": float(np.median(a)),
            "p95_ms": float(np.percentile(a, 95)),
            "min_ms": float(a.min()),
            "max_ms": float(a.max()),
        }

    def _render_camera_frame(self, scene_dev, kind, cam, param, background, lights):
        """Real-camera image: Pallas tile-culled path for big scenes, else XLA."""
        from compound_ray_tpu.config import get_config

        cfg = get_config()
        backend = cfg.backend if self._backend == "auto" else self._backend
        if (
            backend in ("auto", "pallas")
            and not self.lighting
            and self.scene.num_triangles >= cfg.min_triangles_for_culling
        ):
            from compound_ray_tpu.cameras.fast_image import render_camera_image_fast

            return render_camera_image_fast(
                self.scene, scene_dev, kind, cam.position, cam.local_space,
                np.asarray(param), self.width, self.height, background,
            )
        return render_camera_image(
            scene_dev, kind,
            jnp.asarray(cam.position, jnp.float32),
            jnp.asarray(cam.local_space, jnp.float32),
            jnp.asarray(param),
            self.width, self.height, background, self.lighting, lights,
        )

    def _render_raw_samples(self, scene_dev, omms_np, omms, pos, ls, key,
                            samples, background, lights):
        """Per-sample radiance (S, N, 3): Pallas pipeline when available."""
        from compound_ray_tpu.config import get_config

        backend = get_config().backend if self._backend == "auto" else self._backend
        if backend in ("auto", "pallas", "sharded") and not self.lighting:
            if len(jax.devices()) > 1 and backend in ("auto", "sharded"):
                from compound_ray_tpu.parallel.sharding import (
                    make_eye_mesh,
                    pick_sample_parallel,
                    render_samples_sharded_packed,
                )

                sp = pick_sample_parallel(samples)
                mesh = make_eye_mesh(sample_parallel=sp)
                # pose stays host-side: the sharded planner hashes it on
                # the host (sharding._plan_for_mesh device_gets its input,
                # so a jnp wrap here costs a blocking ~26 ms round trip
                # per frame)
                return render_samples_sharded_packed(
                    self.scene, scene_dev, omms_np,
                    pos, ls, key, samples,
                    background, mesh,
                )
            from compound_ray_tpu.eye.pipeline import render_samples_pallas

            return render_samples_pallas(
                self.scene, scene_dev, omms_np, pos, ls, key, samples, background,
            )
        return render_compound_samples(
            scene_dev, omms, pos, ls, key, samples, background,
            self.lighting, jnp.asarray(lights) if lights is not None else None,
        )

    def _render_means(self, scene_dev, omms_np, pos, ls, key, samples,
                      background, lights, force_exact=False):
        """Dispatch: sharded mesh > Pallas kernel > culled XLA > brute force."""
        from compound_ray_tpu.config import get_config

        backend = get_config().backend if self._backend == "auto" else self._backend
        if len(jax.devices()) > 1 and backend in ("auto", "sharded"):
            # multi-chip deployment: the packed MXU tracer pipeline sharded
            # over an (omm, sample) mesh with a psum over ICI — lit frames
            # included (the in-frame shadow pack is group-local, so every
            # shard builds its own occluder payloads)
            from compound_ray_tpu.parallel.sharding import (
                make_eye_mesh,
                pick_sample_parallel,
                render_means_sharded_packed,
            )

            sp = pick_sample_parallel(samples)
            mesh = make_eye_mesh(sample_parallel=sp)
            # pose stays host-side (see _render_raw_samples sharded note)
            return render_means_sharded_packed(
                self.scene, scene_dev, omms_np,
                pos, ls, key, samples, background,
                mesh,
                lights=(np.asarray(lights) if lights is not None else None),
            )
        if backend in ("auto", "pallas"):
            from compound_ray_tpu.eye.pipeline import render_means_pallas

            # lighting routes through the same packed pipeline: GGX direct
            # light with shadow rays traced through per-group occluder
            # payloads memoised per (pose, lights) from the probed hit
            # points (eye/pipeline._shadow_plan)
            lit = self.lighting and lights is not None
            out, handle = render_means_pallas(
                self.scene, scene_dev, omms_np, pos, ls, key, samples,
                background,
                lights=(lights if lit else None),
                shadow_audit=lit,
                force_exact=force_exact,
                # the width check rides the frame's own sync transfer
                # (render_frame collects the handle; _sync_one resolves)
                defer_confirm=True,
            )
            self._last_plan_handle = handle
            if lit:
                means, audit = out
                self._pending_shadow_audit = audit  # fetched lazily at sync
                return means
            return out
        if backend in ("auto", "xla"):
            from compound_ray_tpu.trace.dispatch import render_means_fast

            return render_means_fast(
                self.scene, scene_dev, jnp.asarray(omms_np), pos, ls, key,
                samples, background, self.lighting, lights,
            )
        return render_compound_means(
            scene_dev, jnp.asarray(omms_np), pos, ls, key, samples, background,
            self.lighting, lights,
        )

    def save_frame_as(self, path: str) -> None:
        """Write the display buffer as binary PPM; buffer row 0 is the bottom
        scanline, so rows are flipped like sutil::displayBufferFile."""
        frame = self.get_frame_pointer()
        try:
            from compound_ray_tpu import native_ext

            if native_ext.write_ppm(path, frame):
                self._log(f"Saved render as '{path}'")
                return
        except Exception:
            pass
        h, w = frame.shape[:2]
        rgb = frame[::-1, :, :3]
        with open(path, "wb") as f:
            f.write(f"P6\n{w} {h}\n255\n".encode())
            f.write(np.ascontiguousarray(rgb).tobytes())
        self._log(f"Saved render as '{path}'")

    def get_frame_pointer(self) -> np.ndarray:
        self._log("Retrieving frame pointer...")
        if self._frame_buffer is None:
            if self._device_frame is not None:
                self._frame_buffer = np.asarray(jax.device_get(self._device_frame))
            else:
                self._frame_buffer = np.zeros((self.height, self.width, 4), np.uint8)
        return self._frame_buffer

    # ------------------------------------------------------------ camera control
    def get_camera_count(self) -> int:
        return len(self.scene.cameras) if self.scene else 0

    def current_camera(self) -> Camera:
        assert self.scene is not None and self.scene.cameras, "no cameras"
        return self.scene.cameras[self._current_camera]

    def next_camera(self) -> None:
        # max(1, ...): cycling an empty scene is a no-op, not a ZeroDivision
        # (matches goto_camera's guard)
        self._current_camera = (self._current_camera + 1) % max(
            1, self.get_camera_count())

    def previous_camera(self) -> None:
        self._current_camera = (self._current_camera - 1) % max(
            1, self.get_camera_count())

    def get_current_camera_index(self) -> int:
        return self._current_camera

    def get_current_camera_name(self) -> str:
        return self.current_camera().name

    def goto_camera(self, index: int) -> None:
        self._current_camera = int(index) % max(1, self.get_camera_count())

    def goto_camera_by_name(self, name: str) -> bool:
        """Resets to camera 0 then cycles (libEyeRenderer.cpp:358-368)."""
        self.goto_camera(0)
        for _ in range(self.get_camera_count()):
            if self.get_current_camera_name() == name:
                return True
            self.next_camera()
        return False

    def set_camera_position(self, x, y, z) -> None:
        self.current_camera().set_position((x, y, z))

    def get_camera_position(self) -> Tuple[float, float, float]:
        return tuple(float(v) for v in self.current_camera().position)

    def set_camera_local_space(self, lxx, lxy, lxz, lyx, lyy, lyz, lzx, lzy, lzz):
        self.current_camera().set_local_space(
            (lxx, lxy, lxz), (lyx, lyy, lyz), (lzx, lzy, lzz)
        )

    def rotate_camera_around(self, angle, x, y, z) -> None:
        self.current_camera().rotate_around(angle, (x, y, z))

    def rotate_camera_locally_around(self, angle, x, y, z) -> None:
        self.current_camera().rotate_locally_around(angle, (x, y, z))

    def translate_camera(self, x, y, z) -> None:
        self.current_camera().move((x, y, z))

    def translate_camera_locally(self, x, y, z) -> None:
        self.current_camera().move_locally((x, y, z))

    def translate_cameras_locally(self, x, y, z) -> None:
        for _ in range(self.get_camera_count()):
            self.current_camera().move_locally((x, y, z))
            self.next_camera()

    def rotate_cameras_around(self, angle, x, y, z) -> None:
        for _ in range(self.get_camera_count()):
            self.current_camera().rotate_around(angle, (x, y, z))
            self.next_camera()

    def rotate_cameras_locally_around(self, angle, x, y, z) -> None:
        for _ in range(self.get_camera_count()):
            self.current_camera().rotate_locally_around(angle, (x, y, z))
            self.next_camera()

    def reset_camera_pose(self) -> None:
        self.current_camera().reset_pose()

    def set_camera_pose(self, px, py, pz, rx, ry, rz) -> None:
        self.current_camera().set_pose(px, py, pz, rx, ry, rz)

    def set_camera_pose_matrix(self, m) -> None:
        self.current_camera().set_pose_matrix(np.asarray(m, np.float64))

    # ------------------------------------------------------- compound controls
    def is_compound_eye_active(self) -> bool:
        return (
            self.scene is not None
            and bool(self.scene.cameras)
            and isinstance(self.current_camera(), CompoundEyeCamera)
        )

    def get_eye_data_path(self) -> str:
        if self.is_compound_eye_active():
            return self.scene.eye_data_path
        return ""

    def get_current_eye_data_path(self) -> str:
        if self.is_compound_eye_active():
            return self.current_camera().eye_data_path
        return ""

    def set_current_eye_samples_per_ommatidium(self, s: int) -> None:
        if self.is_compound_eye_active():
            self.current_camera().set_samples_per_ommatidium(s)

    def get_current_eye_samples_per_ommatidium(self) -> int:
        if self.is_compound_eye_active():
            return self.current_camera().samples_per_ommatidium
        return -1

    def change_current_eye_samples_per_ommatidium_by(self, s: int) -> None:
        if self.is_compound_eye_active():
            self.current_camera().change_samples_per_ommatidium_by(s)

    def get_current_eye_ommatidial_count(self) -> int:
        if self.is_compound_eye_active():
            return self.current_camera().ommatidial_count
        return 0

    def set_ommatidia(self, omms) -> None:
        if not self.is_compound_eye_active():
            return
        self.current_camera().set_ommatidia(omms)

    def set_current_eye_shader_name(self, name: str) -> None:
        if self.is_compound_eye_active():
            if name.startswith("__raygen__compound_projection_"):
                name = name[len("__raygen__compound_projection_"):]
            self.current_camera().set_projection(name)

    def render_batch_poses(self, poses) -> np.ndarray:
        """Batched multi-pose compound render: (B, N, 3) means in ONE pipeline
        pass (the BASELINE.json 'batched poses' config).

        `poses` is a sequence of (position(3), rotation(3)) pairs with the
        setCameraPose rotation semantics, or (position, local_space(3,3))
        pairs.  Poses fold into the ommatidium axis — each pose's ommatidia
        are pre-transformed to world space and concatenated, so culling,
        the Pallas kernel, and sharding all apply unchanged.
        """
        assert self.is_compound_eye_active(), "compound eye required"
        cam = self.current_camera()
        base = cam.ommatidia  # (N,8)
        n = base.shape[0]
        from compound_ray_tpu.cameras.types import PerspectiveCamera

        # resolve each pose's (position, local_space) — cheap 3x3 work —
        # then transform ALL poses' ommatidia in two einsums (B can be
        # hundreds in a GA sweep; per-pose (N,3)@(3,3) loops were the
        # BASELINE.json batched-poses config's host bottleneck)
        pos_all = np.empty((len(poses), 3), np.float64)
        ls_all = np.empty((len(poses), 3, 3), np.float64)
        for i, (pos, rot) in enumerate(poses):
            probe = PerspectiveCamera("pose-probe")
            if np.asarray(rot).shape == (3, 3):
                probe.set_position(pos)
                probe.local_space = np.asarray(rot, np.float64)
            else:
                probe.set_pose(*pos, *rot)
            pos_all[i] = probe.position
            ls_all[i] = probe.local_space
        b = len(poses)
        all_omms = np.broadcast_to(base[None], (b, n, base.shape[1])).copy()
        all_omms[:, :, 0:3] = (
            np.einsum("nc,bcd->bnd", base[:, 0:3], ls_all)
            + pos_all[:, None, :])
        all_omms[:, :, 3:6] = np.einsum("nc,bcd->bnd", base[:, 3:6], ls_all)
        all_omms = all_omms.reshape(b * n, base.shape[1]).astype(np.float32)

        scene_dev = self._scene_dev()
        background = miss_id(self.scene.background_shader)
        key = _frame_key(cam.rng_frame)
        cam.rng_frame += 1
        means = self._render_means(
            scene_dev, all_omms,
            np.zeros(3, np.float32), np.eye(3, dtype=np.float32),
            key, cam.samples_per_ommatidium, background,
            self._lights if self.lighting else None,
        )
        out = np.array(jax.device_get(means), np.float32)
        out[np.isnan(out[:, 0])] = 0.0
        return out.reshape(b, n, 3)

    def get_camera_data(self) -> np.ndarray:
        """Per-ommatidium mean radiance (N,3) float32, NaN-guarded
        (libEyeRenderer.cpp:457-484)."""
        if not self.is_compound_eye_active():
            raise RuntimeError(
                "Currently, getCameraData is implemented only for compound eye cameras"
            )
        if self._camera_data is None:
            assert self._device_means is not None, "render a frame first"
            data = np.array(jax.device_get(self._device_means), np.float32)
            nan_rows = np.isnan(data[:, 0])
            data[nan_rows] = 0.0
            self._camera_data = data
        return self._camera_data

    # ----------------------------------------------------------- scene queries
    def is_inside_hit_geometry(self, x, y, z, name: str) -> bool:
        assert self.scene is not None
        for hb in self.scene.hitboxes:
            if hb.name == name:
                return hb.contains((x, y, z))
        self._log(f'WARNING: No hitbox with the given name "{name}" is present.')
        return False

    def _hitbox_world_aabb(self, hb) -> Tuple[np.ndarray, np.ndarray]:
        omin, omax = hb.object_aabb_min, hb.object_aabb_max
        corners = np.array(
            [[x, y, z] for x in (omin[0], omax[0])
             for y in (omin[1], omax[1]) for z in (omin[2], omax[2])]
        )
        wc = corners @ hb.transform[:3, :3].T + hb.transform[:3, 3]
        return wc.min(axis=0), wc.max(axis=0)

    def get_geometry_max_bounds(self, name: str) -> np.ndarray:
        assert self.scene is not None
        for hb in self.scene.hitboxes:
            if hb.name == name:
                return self._hitbox_world_aabb(hb)[1]
        # a multi-primitive glTF mesh stores one record PER PRIMITIVE, all
        # sharing the mesh name — the reference reports the whole-mesh
        # world AABB (MulticamScene.cpp:449-461), so aggregate every match
        maxs = [rec.world_aabb_max for rec in self.scene.mesh_records
                if rec.name == name]
        if maxs:
            return np.max(np.asarray(maxs, np.float64), axis=0)
        return np.zeros(3)

    def get_geometry_min_bounds(self, name: str) -> np.ndarray:
        assert self.scene is not None
        for hb in self.scene.hitboxes:
            if hb.name == name:
                return self._hitbox_world_aabb(hb)[0]
        mins = [rec.world_aabb_min for rec in self.scene.mesh_records
                if rec.name == name]
        if mins:
            return np.min(np.asarray(mins, np.float64), axis=0)
        return np.zeros(3)
