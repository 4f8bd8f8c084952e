"""bf16 big-table quantization: error bound + blend promotion semantics."""

import jax.numpy as jnp
import numpy as np

from compound_ray_tpu.trace.shade import quad_bilinear_c


def test_bf16_quad_rows_error_bound():
    rng = np.random.default_rng(0)
    rows = rng.uniform(0.0, 1.0, size=(2000, 16)).astype(np.float32)
    fx = jnp.asarray(rng.uniform(0, 1, 2000).astype(np.float32))
    fy = jnp.asarray(rng.uniform(0, 1, 2000).astype(np.float32))
    f32 = quad_bilinear_c(jnp.asarray(rows), fx, fy)
    b16 = quad_bilinear_c(jnp.asarray(rows).astype(jnp.bfloat16), fx, fy)
    for a, b in zip(f32, b16):
        a, b = np.asarray(a), np.asarray(b, np.float32)
        # bf16 storage: 8-bit mantissa => <=2^-9 relative per texel, and the
        # blend must promote to f32 (not accumulate in bf16)
        assert b.dtype == np.float32
        assert np.abs(a - b).max() < 4e-3, np.abs(a - b).max()
