"""Measured BSDF tests: synthesize an RGL-style tensor file from an analytic
GGX microfacet model, load it through the measured plugin, verify
sample/pdf chi2 self-consistency (parity: src/bsdfs/tests/test_measured
methodology without shipping RGL data)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def measured_file(tmp_path_factory):
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.utils.tensorfile import write_tensor_file
    alpha = 0.4
    res = 48
    n_theta = 16
    theta_i = np.linspace(0, np.pi / 2 * 0.98, n_theta).astype(np.float32)
    phi_i = np.asarray([0.0], np.float32)

    def u2theta(u):
        return (u ** 2) * (np.pi / 2)

    uu = np.linspace(0, 1, res)
    tm = u2theta(uu)                       # micro theta over rows? (x axis)
    pm = (2 * np.linspace(0, 1, res) - 1) * np.pi

    # GGX ndf over (phi_m x theta_m) grid (u coords: x=theta, y=phi)
    ct = np.cos(tm)
    a2 = alpha * alpha
    D = a2 / (np.pi * ((ct ** 2) * (a2 - 1) + 1) ** 2)
    ndf = np.tile(D[None, :], (res, 1)).astype(np.float32)   # (h=phi, w=theta)

    # sigma(theta_i): projected area = integral D(m) max(0, w.m) dm
    # for GGX equals cos-weighted smith-style; compute numerically
    tg, pg = np.meshgrid(tm, pm, indexing="ij")
    mx = np.sin(tg) * np.cos(pg)
    my = np.sin(tg) * np.sin(pg)
    mz = np.cos(tg)
    Dg = a2 / (np.pi * ((mz ** 2) * (a2 - 1) + 1) ** 2)
    dA = np.gradient(tm)[:, None] * np.gradient(pm)[None, :] * np.sin(tg)
    sigma = np.zeros((res, res), np.float32)
    for i, th in enumerate(u2theta(uu)):
        w = np.asarray([np.sin(th), 0, np.cos(th)])
        proj = np.maximum(0.0, mx * w[0] + my * w[1] + mz * w[2])
        sigma[:, i] = (Dg * proj * dA).sum()
    # vndf per theta_i slice: D(m) max(0, wi.m) (unnormalized) on the warped
    # grid INCLUDING the jacobian of (u -> m): dm = sin(theta) dtheta dphi,
    # dtheta/du = pi*u, dphi/dv = 2pi
    vndf = np.zeros((1, n_theta, res, res), np.float32)
    lum = np.zeros((1, n_theta, res, res), np.float32)
    jac_u = (np.pi * uu)[None, :] * np.sin(tg) * 2 * np.pi
    for k, th in enumerate(theta_i):
        w = np.asarray([np.sin(th), 0, np.cos(th)])
        proj = np.maximum(0.0, mx * w[0] + my * w[1] + mz * w[2])
        vndf[0, k] = (Dg * proj * jac_u).astype(np.float32)
        lum[0, k] = 1.0  # uniform second-stage warp
    L = 4
    wav = np.linspace(400, 700, L).astype(np.float32)
    spectra = np.full((1, n_theta, L, res, res), 1.0, np.float32)
    f = str(tmp_path_factory.mktemp("measured") / "ggx.bsdf")
    write_tensor_file(f, {
        "theta_i": theta_i, "phi_i": phi_i, "ndf": ndf, "sigma": sigma,
        "vndf": vndf, "luminance": lum, "spectra": spectra,
        "wavelengths": wav,
        "description": np.frombuffer(b"synthetic ggx", np.uint8),
        "jacobian": np.asarray([1], np.uint8),
    })
    return f


def test_tensorfile_roundtrip(tmp_path, variant_scalar_rgb):
    from mitsuba2_tpu.utils.tensorfile import TensorFile, write_tensor_file
    rs = np.random.RandomState(0)
    fields = {
        "a": rs.rand(3, 4).astype(np.float32),
        "b": np.arange(7, dtype=np.uint8),
        "c": rs.rand(2, 2, 2).astype(np.float64),
    }
    f = str(tmp_path / "t.tensor")
    write_tensor_file(f, fields)
    tf = TensorFile(f)
    for k, v in fields.items():
        assert tf.has_field(k)
        assert np.allclose(tf.field(k), v)


def test_measured_loads(measured_file, variant_scalar_rgb):
    import mitsuba2_tpu as mi
    b = mi.load_dict({"type": "measured", "filename": measured_file})
    assert b.n_theta == 16


def test_measured_chi2(measured_file, variant_scalar_rgb):
    from mitsuba2_tpu.python.chi2 import (ChiSquareTest, SphericalDomain,
                                          BSDFAdapter)
    sample_func, pdf_func = BSDFAdapter(
        "measured", {"filename": measured_file}, wi=(0.3, 0.1, 0.95))
    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_dim=3, sample_count=80000, res=21, ires=16,
                         seed=0)
    assert test.run(0.01, test_count=10), test.messages


@pytest.mark.parametrize("theta_deg", [12.0, 41.0, 43.0, 68.0])
def test_measured_chi2_theta_sweep(measured_file, variant_scalar_rgb,
                                   theta_deg):
    """(VERDICT r1 #8) chi^2 across incident angles INCLUDING directions
    that fall between theta_i slices — the interpolated inversion must
    keep sample()/pdf() consistent there (nearest-slice sampling fails
    this near slice boundaries)."""
    from mitsuba2_tpu.python.chi2 import (ChiSquareTest, SphericalDomain,
                                          BSDFAdapter)
    t = np.deg2rad(theta_deg)
    wi = (np.sin(t), 0.0, np.cos(t))
    sample_func, pdf_func = BSDFAdapter(
        "measured", {"filename": measured_file}, wi=wi)
    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_dim=3, sample_count=80000, res=21, ires=16,
                         seed=0)
    assert test.run(0.01, test_count=10), test.messages


def test_measured_interpolation_continuity(measured_file,
                                           variant_scalar_rgb):
    """pdf() is continuous across a theta_i slice boundary (the old
    nearest-slice scheme jumped there)."""
    import mitsuba2_tpu as mi
    import jax.numpy as jnp
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu.render.testutil import dummy_si

    b = mi.load_dict({"type": "measured", "filename": measured_file})
    th = np.asarray(b.theta_i)
    # straddle the boundary between slices 7 and 8
    tb = 0.5 * (th[7] + th[8])
    eps = 1e-3
    thetas = jnp.asarray([tb - eps, tb + eps], jnp.float32)
    wi = jnp.stack([jnp.sin(thetas), jnp.zeros(2), jnp.cos(thetas)], -1)
    wo = jnp.broadcast_to(
        jnp.asarray([0.1, 0.05, float(np.sqrt(1 - 0.1**2 - 0.05**2))]),
        (2, 3))
    si = dummy_si(2)._replace(wi=wi)
    pdf = np.asarray(b.pdf(BSDFContext(), si, wo, True))
    assert pdf[0] > 0 and pdf[1] > 0
    assert abs(pdf[0] - pdf[1]) < 5e-3 * max(pdf.mean(), 1e-6)
