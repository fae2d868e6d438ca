"""Per-warp pdf normalization battery: every square_to_* pdf integrates
to 1 over its domain via uniform MC (the complement of the chi^2 suite in
test_warp.py, mirroring src/libcore/tests/test_warp.py's pdf checks)."""

import numpy as np

import jax.numpy as jnp

from mitsuba2_tpu.core import warp


def _sphere_mc(pdf_fn, n=200_000, seed=0):
    """Integrate pdf over the unit sphere by uniform-direction MC."""
    rs = np.random.RandomState(seed)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    vals = np.asarray(pdf_fn(jnp.asarray(d)))
    return vals.mean() * 4.0 * np.pi


def _square_mc(fwd, pdf_fn, n=200_000, seed=0):
    """Integrate pdf over the warp's image by pushing uniform squares
    through the warp (E[pdf/pdf] trick checks self-consistency instead:
    here we check pdf at warped points is positive and finite)."""
    rs = np.random.RandomState(seed)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    x = fwd(u)
    p = np.asarray(pdf_fn(x))
    return p


def test_uniform_sphere_pdf_normalized():
    v = _sphere_mc(warp.square_to_uniform_sphere_pdf)
    assert abs(v - 1.0) < 0.01, v


def test_uniform_hemisphere_pdf_normalized():
    v = _sphere_mc(warp.square_to_uniform_hemisphere_pdf)
    assert abs(v - 1.0) < 0.02, v


def test_cosine_hemisphere_pdf_normalized():
    v = _sphere_mc(warp.square_to_cosine_hemisphere_pdf)
    assert abs(v - 1.0) < 0.02, v


def test_uniform_cone_pdf_normalized():
    cos_cut = 0.8
    v = _sphere_mc(lambda d: warp.square_to_uniform_cone_pdf(d, cos_cut))
    assert abs(v - 1.0) < 0.03, v


def test_beckmann_pdf_normalized():
    v = _sphere_mc(lambda d: warp.square_to_beckmann_pdf(d, 0.3),
                   n=400_000)
    assert abs(v - 1.0) < 0.05, v


def test_vmf_pdf_normalized():
    v = _sphere_mc(
        lambda d: warp.square_to_von_mises_fisher_pdf(d, 8.0),
        n=400_000)
    assert abs(v - 1.0) < 0.05, v


def test_uniform_disk_pdf_value():
    # constant 1/pi inside the unit disk
    rs = np.random.RandomState(2)
    u = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
    x = warp.square_to_uniform_disk_concentric(u)
    p = np.asarray(warp.square_to_uniform_disk_concentric_pdf(x))
    assert np.allclose(p, 1.0 / np.pi, atol=1e-5)


def test_uniform_triangle_pdf_value():
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
    x = warp.square_to_uniform_triangle(u)
    p = np.asarray(warp.square_to_uniform_triangle_pdf(x))
    assert np.allclose(p, 2.0, atol=1e-5)   # area 1/2 triangle


def test_std_normal_pdf_matches_gaussian():
    rs = np.random.RandomState(4)
    u = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
    x = warp.square_to_std_normal(u)
    p = np.asarray(warp.square_to_std_normal_pdf(x))
    xn = np.asarray(x)
    ref = np.exp(-0.5 * (xn ** 2).sum(-1)) / (2 * np.pi)
    assert np.allclose(p, ref, rtol=1e-4, atol=1e-6)


def test_tent_pdf_positive_in_support():
    p = _square_mc(warp.square_to_tent, warp.square_to_tent_pdf)
    assert np.isfinite(p).all() and (p >= 0).all()
    assert (p > 0).mean() > 0.99


def test_bilinear_pdf_consistency():
    rs = np.random.RandomState(5)
    u = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
    x, pdf_claimed = warp.square_to_bilinear(0.2, 0.8, 0.5, 1.5, u)
    p = np.asarray(warp.square_to_bilinear_pdf(0.2, 0.8, 0.5, 1.5, x))
    pc = np.asarray(pdf_claimed)
    ok = pc > 1e-6
    assert np.allclose(p[ok], pc[ok], rtol=1e-3)


def test_interval_to_linear_density():
    """Sampled x follows the linear density (v0 + (v1-v0)x)/integral:
    histogram slope check."""
    rs = np.random.RandomState(6)
    u = jnp.asarray(rs.rand(200_000).astype(np.float32))
    x = np.asarray(warp.interval_to_linear(0.5, 1.5, u))
    h, edges = np.histogram(x, bins=10, range=(0, 1), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    ref = (0.5 + centers) / 1.0     # integral of 0.5+x on [0,1] = 1
    assert np.abs(h - ref).max() < 0.04, (h, ref)
