"""Warp library tests: chi2 consistency of every sample/pdf pair plus analytic
spot checks (parity: reference src/libcore/tests/test_warp.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba2_tpu.core import warp, math as m
from mitsuba2_tpu.python.chi2 import (ChiSquareTest, PlanarDomain,
                                      SphericalDomain)

SAMPLES = 100000
RES = 31


def run_chi2(domain, sample_func, pdf_func, sample_dim=2, seed=0):
    test = ChiSquareTest(domain, sample_func, pdf_func,
                         sample_dim=sample_dim, sample_count=SAMPLES,
                         res=RES, ires=8, seed=seed)
    assert test.run(0.01, test_count=20), test.messages


def test_uniform_disk_chi2():
    run_chi2(PlanarDomain(), warp.square_to_uniform_disk,
             warp.square_to_uniform_disk_pdf)


def test_uniform_disk_concentric_chi2():
    run_chi2(PlanarDomain(), warp.square_to_uniform_disk_concentric,
             warp.square_to_uniform_disk_concentric_pdf)


def test_concentric_inverse_roundtrip():
    u = np.random.RandomState(0).rand(1000, 2).astype(np.float32)
    p = warp.square_to_uniform_disk_concentric(jnp.asarray(u))
    u2 = warp.uniform_disk_to_square_concentric(p)
    assert np.allclose(np.asarray(u2), u, atol=1e-4)


def test_uniform_triangle_chi2():
    run_chi2(PlanarDomain(((0.0, 1.0), (0.0, 1.0))),
             warp.square_to_uniform_triangle,
             warp.square_to_uniform_triangle_pdf)


def test_std_normal_chi2():
    run_chi2(PlanarDomain(((-4.0, 4.0), (-4.0, 4.0))),
             warp.square_to_std_normal, warp.square_to_std_normal_pdf)


def test_tent_chi2():
    run_chi2(PlanarDomain(), warp.square_to_tent, warp.square_to_tent_pdf)


def test_uniform_sphere_chi2():
    run_chi2(SphericalDomain(), warp.square_to_uniform_sphere,
             warp.square_to_uniform_sphere_pdf)


def test_uniform_hemisphere_chi2():
    run_chi2(SphericalDomain(), warp.square_to_uniform_hemisphere,
             warp.square_to_uniform_hemisphere_pdf)


def test_cosine_hemisphere_chi2():
    run_chi2(SphericalDomain(), warp.square_to_cosine_hemisphere,
             warp.square_to_cosine_hemisphere_pdf)


@pytest.mark.parametrize("cutoff", [0.95, 0.5, -0.3])
def test_uniform_cone_chi2(cutoff):
    run_chi2(SphericalDomain(),
             lambda u: warp.square_to_uniform_cone(u, cutoff),
             lambda v: warp.square_to_uniform_cone_pdf(v, cutoff))


@pytest.mark.parametrize("alpha", [0.1, 0.5, 1.0])
def test_beckmann_chi2(alpha):
    run_chi2(SphericalDomain(),
             lambda u: warp.square_to_beckmann(u, alpha),
             lambda v: warp.square_to_beckmann_pdf(v, alpha))


@pytest.mark.parametrize("kappa", [0.5, 10.0, 100.0])
def test_von_mises_fisher_chi2(kappa):
    run_chi2(SphericalDomain(),
             lambda u: warp.square_to_von_mises_fisher(u, kappa),
             lambda v: warp.square_to_von_mises_fisher_pdf(v, kappa))


def test_rough_fiber_chi2():
    wi = m.normalize(jnp.asarray([0.5, 0.0, 1.0]))
    tangent = jnp.asarray([1.0, 0.0, 0.0])
    run_chi2(SphericalDomain(),
             lambda u: warp.square_to_rough_fiber(u, wi, tangent, 30.0),
             lambda v: warp.square_to_rough_fiber_pdf(v, wi, tangent, 30.0))


def test_bilinear_chi2():
    v00, v10, v01, v11 = 0.1, 2.0, 0.5, 1.0

    def sample(u):
        p, _ = warp.square_to_bilinear(v00, v10, v01, v11, u)
        return p

    run_chi2(PlanarDomain(((0.0, 1.0), (0.0, 1.0))), sample,
             lambda p: warp.square_to_bilinear_pdf(v00, v10, v01, v11, p))


def test_interval_to_tent_analytic():
    assert np.isclose(float(warp.interval_to_tent(jnp.asarray(0.5))), 0.0)
    # CDF at 0 is 0.5; CDF(-0.5) = (0.5)^2/2 * 2 = 0.125
    assert np.isclose(float(warp.interval_to_tent(jnp.asarray(0.125))), -0.5,
                      atol=1e-6)


def test_interval_to_nonuniform_tent():
    x = warp.interval_to_nonuniform_tent(0.0, 1.0, 4.0,
                                         jnp.asarray([0.25, 1.0 - 1e-7]))
    out = np.asarray(x)
    assert np.isclose(out[0], 1.0, atol=1e-5)   # peak mass fraction = 1/4
    assert np.isclose(out[1], 4.0, atol=1e-2)


def test_uniform_square_concentric_uniform():
    u = np.random.RandomState(1).rand(200000, 2).astype(np.float32)
    p = np.asarray(warp.square_to_uniform_square_concentric(jnp.asarray(u)))
    assert p.min() >= 0 and p.max() <= 1
    h, _, _ = np.histogram2d(p[:, 0], p[:, 1], bins=8,
                             range=[[0, 1], [0, 1]])
    expect = len(u) / 64
    assert np.abs(h - expect).max() < 5 * np.sqrt(expect)
