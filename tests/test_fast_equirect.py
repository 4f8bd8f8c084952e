"""Fast (short-polynomial) equirect addressing vs the exact transcendental
path (eye/pipeline.py _fast_atan2/_fast_asin).

The fast path only has to be half-texel exact (2*pi/width/2 at the cache
width), with large margin; these tests pin the polynomial error bounds the
pipeline docstring claims and the end-to-end addressing/sampling agreement,
so the tools/tpu_session.py "equirect" A/B can adopt it on speed alone.
"""

import numpy as np

import jax.numpy as jnp

from compound_ray_tpu.eye import pipeline as P


def _unit_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def test_fast_atan2_error_bound():
    v = _unit_dirs(500_000)
    ref = np.arctan2(v[:, 2].astype(np.float64), v[:, 0].astype(np.float64))
    got = np.asarray(P._fast_atan2(jnp.asarray(v[:, 2]),
                                   jnp.asarray(v[:, 0])), np.float64)
    d = np.abs(got - ref)
    d = np.minimum(d, 2 * np.pi - d)  # branch-cut wrap
    assert d.max() < 1e-5, d.max()


def test_fast_atan2_axes_and_origin():
    # exact atan2 special points: +x, -x, +z, -z, and the (0,0) pole column
    z = jnp.asarray([0.0, 0.0, 1.0, -1.0, 0.0], jnp.float32)
    x = jnp.asarray([1.0, -1.0, 0.0, 0.0, 0.0], jnp.float32)
    got = np.asarray(P._fast_atan2(z, x), np.float64)
    ref = np.arctan2(np.asarray(z, np.float64), np.asarray(x, np.float64))
    assert np.allclose(got, ref, atol=1e-6), (got, ref)


def test_fast_asin_error_bound_and_poles():
    y = np.linspace(-1.0, 1.0, 400_001).astype(np.float32)
    ref = np.arcsin(y.astype(np.float64))
    got = np.asarray(P._fast_asin(jnp.asarray(y)), np.float64)
    assert np.abs(got - ref).max() < 2e-5
    # poles exact: the sqrt(1-|y|) factor vanishes there
    got_p = np.asarray(P._fast_asin(jnp.asarray([1.0, -1.0], jnp.float32)))
    np.testing.assert_allclose(got_p, [np.pi / 2, -np.pi / 2], atol=1e-6)


def test_equirect_indices_agree():
    h, w = 512, 1024
    v = _unit_dirs(1_000_000, seed=1)
    dx, dy, dz = (jnp.asarray(v[:, k]) for k in range(3))
    ie, fxe, fye = P._equirect_coords_c(h, w, dx, dy, dz, fast=False)
    i_f, fxf, fyf = P._equirect_coords_c(h, w, dx, dy, dz, fast=True)
    ie, i_f = np.asarray(ie), np.asarray(i_f)
    same = ie == i_f
    # poly error (<=1.4e-5 rad) vs texel size (6.1e-3 rad): only rays whose
    # true angle lies within poly-err of a texel boundary may flip — an
    # err/texel ~ 0.2% fraction at worst
    assert same.mean() > 0.99, same.mean()
    # any flip is to an ADJACENT texel (x wraps, y clamps)
    ye, xe = ie[~same] // w, ie[~same] % w
    yf, xf = i_f[~same] // w, i_f[~same] % w
    dx_t = np.minimum(np.abs(xe - xf), w - np.abs(xe - xf))
    assert (dx_t <= 1).all() and (np.abs(ye - yf) <= 1).all()
    # where indices agree the bilinear fractions shift by err/texel only
    fxe, fxf = np.asarray(fxe)[same], np.asarray(fxf)[same]
    fye, fyf = np.asarray(fye)[same], np.asarray(fyf)[same]
    assert np.abs(fxe - fxf).max() < 5e-3
    assert np.abs(fye - fyf).max() < 5e-3


def test_sample_equirect_end_to_end_close():
    # smooth cache: fast-vs-exact color difference is bounded by
    # (err/texel) * texel-to-texel delta, far below the 1% fidelity budget
    h, w = 64, 128
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([np.sin(2 * np.pi * xx / w),
                     np.cos(2 * np.pi * yy / h),
                     np.sin(4 * np.pi * xx / w) * np.cos(2 * np.pi * yy / h)],
                    axis=-1).astype(np.float32)
    quads = np.asarray(P.build_equirect_quads(jnp.asarray(base)))
    v = _unit_dirs(200_000, seed=2)
    old = P.FAST_EQUIRECT
    try:
        P.FAST_EQUIRECT = False
        exact = np.asarray(P.sample_equirect(jnp.asarray(quads),
                                             jnp.asarray(v)))
        P.FAST_EQUIRECT = True
        fast = np.asarray(P.sample_equirect(jnp.asarray(quads),
                                            jnp.asarray(v)))
    finally:
        P.FAST_EQUIRECT = old
    assert np.abs(exact - fast).max() < 2e-3


def test_fast_equirect_default_off(monkeypatch):
    monkeypatch.delenv("CR_TPU_FAST_EQUIRECT", raising=False)
    monkeypatch.setattr(P, "load_tuning", lambda: {})
    assert P._default_fast_equirect() is False
    monkeypatch.setattr(P, "load_tuning", lambda: {"fast_equirect": True})
    assert P._default_fast_equirect() is True
    monkeypatch.setenv("CR_TPU_FAST_EQUIRECT", "0")
    assert P._default_fast_equirect() is False
