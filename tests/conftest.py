"""Test harness: run everything on an 8-device virtual CPU mesh so sharding
tests reproduce the v5e-8 topology in CI (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms via config, which beats the env
# var — override back to CPU explicitly so tests run on the virtual 8-device
# host mesh
jax.config.update("jax_platforms", "cpu")
# platform-specific cache dir: sharing with TPU runs poisoned the CPU cache
# with AOT artifacts built for different machine features (SIGILL/miscompute)
jax.config.update("jax_compilation_cache_dir", "/tmp/cr_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# XLA-level AOT cache entries reload with mismatched machine-feature flags
# on CPU ("prefer-no-gather" etc.) and MISCOMPILE gather-heavy code; keep
# only the jaxpr-level cache
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_DATA, *parts)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA),
    reason="reference data mount not available",
)


@pytest.fixture(scope="session")
def test_scene_path() -> str:
    p = reference_path("test-scene", "test-scene.gltf")
    if not os.path.isfile(p):
        pytest.skip("reference test-scene.gltf not available")
    return p


@pytest.fixture(scope="session")
def natural_scene_path() -> str:
    p = reference_path("natural-standin-sky.gltf")
    if not os.path.isfile(p):
        pytest.skip("reference natural scene not available")
    return p


@pytest.fixture()
def box_scene():
    from compound_ray_tpu.testing import make_box_scene

    return make_box_scene()
