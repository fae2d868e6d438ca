"""BSDF tests: chi2 sample/pdf consistency + analytic spot checks
(parity: src/bsdfs/tests/test_*.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba2_tpu.python.chi2 import (ChiSquareTest, SphericalDomain,
                                      BSDFAdapter)

SAMPLES = 80000
RES = 21


def run_chi2(bsdf_type, extra=None, wi=(0.3, 0.3, 0.9), sample_dim=3,
             seed=0):
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    sample_func, pdf_func = BSDFAdapter(bsdf_type, extra or {}, wi=wi)
    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_dim=sample_dim, sample_count=SAMPLES,
                         res=RES, ires=16, seed=seed)
    assert test.run(0.01, test_count=30), test.messages


def test_diffuse_chi2():
    run_chi2("diffuse", {"reflectance": 0.7})


def test_diffuse_analytic(variant_scalar_rgb):
    """pdf == cos(theta)/pi, eval == albedo*cos/pi
    (test_diffuse.py:16-38)."""
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu import load_dict
    b = load_dict({"type": "diffuse", "reflectance": 0.6})
    si = dummy_si(3)
    wo = jnp.asarray([[0, 0, 1.0], [0.7, 0.0, 0.714142], [0, 0, -1.0]])
    ctx = BSDFContext()
    pdf = np.asarray(b.pdf(ctx, si, wo, jnp.ones(3, bool)))
    assert np.allclose(pdf, [1 / np.pi, 0.714142 / np.pi, 0], atol=1e-5)
    val = np.asarray(b.eval(ctx, si, wo, jnp.ones(3, bool)))
    assert np.allclose(val[0], 0.6 / np.pi, atol=1e-5)
    assert np.allclose(val[2], 0.0)


@pytest.mark.parametrize("dist", ["ggx", "beckmann"])
@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_roughconductor_chi2(dist, alpha):
    run_chi2("roughconductor",
             {"material": "Au", "alpha": alpha, "distribution": dist},
             wi=(0.5, 0.0, 0.866))


def test_roughconductor_anisotropic_chi2():
    run_chi2("roughconductor",
             {"material": "Cu", "alpha_u": 0.1, "alpha_v": 0.4,
              "distribution": "ggx"},
             wi=(0.4, -0.3, 0.86))


@pytest.mark.parametrize("dist", ["ggx", "beckmann"])
def test_roughdielectric_chi2(dist):
    run_chi2("roughdielectric", {"alpha": 0.3, "distribution": dist},
             wi=(0.3, 0.0, 0.954))


def test_roughdielectric_from_inside_chi2():
    run_chi2("roughdielectric", {"alpha": 0.35, "distribution": "ggx"},
             wi=(0.3, 0.1, -0.95))


def test_plastic_chi2():
    run_chi2("plastic", {"diffuse_reflectance": 0.5}, wi=(0.4, 0.0, 0.917))


def test_roughplastic_chi2():
    run_chi2("roughplastic",
             {"diffuse_reflectance": 0.5, "alpha": 0.3,
              "distribution": "ggx"},
             wi=(0.4, 0.0, 0.917))


def test_blend_chi2():
    run_chi2("blendbsdf",
             {"weight": 0.4,
              "a": {"type": "diffuse", "reflectance": 0.9},
              "b": {"type": "roughconductor", "alpha": 0.3,
                    "material": "Au", "distribution": "ggx"}},
             wi=(0.2, 0.1, 0.97))


def test_twosided_chi2_backside():
    run_chi2("twosided", {"a": {"type": "diffuse", "reflectance": 0.8}},
             wi=(0.3, 0.3, -0.9))


def test_normalmap_chi2():
    run_chi2("normalmap",
             {"a": {"type": "diffuse", "reflectance": 0.8},
              "normal": {"type": "srgb",
                         "color": [0.55, 0.5, 0.85]}},
             wi=(0.1, 0.2, 0.97))


def test_dielectric_energy(variant_scalar_rgb):
    """Delta dielectric: weights sum to 1 (F + (1-F)), eta bookkeeping."""
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core import rng
    b = load_dict({"type": "dielectric", "int_ior": 1.5, "ext_ior": 1.0})
    n = 4096
    si = dummy_si(n, wi=(0.4, 0.0, 0.9165))
    key = rng.lane_key(0, jnp.arange(n, dtype=jnp.uint32))
    u1 = rng.uniform_float(key, 0)
    u2 = jnp.stack([rng.uniform_float(key, 1), rng.uniform_float(key, 2)], -1)
    ctx = BSDFContext()
    bs, val = b.sample(ctx, si, u1, u2, jnp.ones(n, bool))
    val = np.asarray(val)
    pdf = np.asarray(bs.pdf)
    eta = np.asarray(bs.eta)
    assert (pdf > 0).all()
    # reflection lanes keep eta=1; transmission lanes eta=1.5
    refl = np.asarray(bs.wo)[:, 2] > 0
    assert np.allclose(eta[refl], 1.0)
    assert np.allclose(eta[~refl], 1.5, atol=1e-5)
    # energy: importance-transport weight should be 1 for both lobes
    # radiance transport carries the eta^-2 compression for transmission
    assert np.allclose(val[refl], 1.0, atol=1e-5)
    assert np.allclose(val[~refl], (1 / 1.5) ** 2, atol=1e-4)


def test_dielectric_tir(variant_scalar_rgb):
    """Total internal reflection from inside beyond the critical angle."""
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu import load_dict
    b = load_dict({"type": "dielectric", "int_ior": 1.5, "ext_ior": 1.0})
    # from inside (wi.z < 0), grazing: critical angle ~41.8 deg
    si = dummy_si(2, wi=(0.9, 0.0, -0.43589))
    ctx = BSDFContext()
    bs, val = b.sample(ctx, si, jnp.asarray([0.1, 0.9]),
                       jnp.full((2, 2), 0.5), jnp.ones(2, bool))
    # all samples must reflect (TIR): wo = (-wi.x, -wi.y, wi.z)
    assert np.allclose(np.asarray(bs.wo)[:, 2], np.asarray(si.wi)[:, 2])
    assert np.allclose(np.asarray(bs.wo)[:, 0], -np.asarray(si.wi)[:, 0])
    assert np.allclose(np.asarray(val), 1.0, atol=1e-5)


def test_conductor_fresnel(variant_scalar_rgb):
    """Normal-incidence conductor reflectance matches the analytic value."""
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu import load_dict
    b = load_dict({"type": "conductor", "material": "Au"})
    si = dummy_si(1, wi=(0, 0, 1))
    bs, val = b.sample(BSDFContext(), si, jnp.asarray([0.5]),
                       jnp.full((1, 2), 0.5), jnp.ones(1, bool))
    from mitsuba2_tpu.render.fresnel import lookup_conductor_ior
    eta, k = lookup_conductor_ior("Au")
    expect = [((e - 1) ** 2 + kk ** 2) / ((e + 1) ** 2 + kk ** 2)
              for e, kk in zip(eta, k)]
    assert np.allclose(np.asarray(val)[0], expect, rtol=1e-4)


def test_mask_null_transmission(variant_scalar_rgb):
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu import load_dict
    b = load_dict({"type": "mask", "opacity": 0.3,
                   "a": {"type": "diffuse"}})
    si = dummy_si(4)
    out = np.asarray(b.eval_null_transmission(si, jnp.ones(4, bool)))
    assert np.allclose(out, 0.7, atol=1e-5)


def test_white_furnace_roughconductor(variant_scalar_rgb):
    """Energy conservation: a perfectly reflecting rough conductor under
    uniform illumination must not gain energy (weak white furnace)."""
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.render.bsdf import BSDFContext
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core import rng
    b = load_dict({"type": "roughconductor", "material": "none",
                   "alpha": 0.4, "distribution": "ggx"})
    n = 200000
    si = dummy_si(n, wi=(0.4, 0.0, 0.9165))
    key = rng.lane_key(3, jnp.arange(n, dtype=jnp.uint32))
    u1 = rng.uniform_float(key, 0)
    u2 = jnp.stack([rng.uniform_float(key, 1), rng.uniform_float(key, 2)], -1)
    bs, val = b.sample(BSDFContext(), si, u1, u2, jnp.ones(n, bool))
    # albedo estimate = E[value] (value = f*cos/pdf) must be <= 1
    albedo = float(np.asarray(val)[:, 0].mean())
    assert albedo <= 1.001, albedo
    # single-scattering GGX at alpha=0.4 legitimately loses ~20-25% energy
    assert albedo > 0.70, albedo


def test_phase_hg_chi2():
    from mitsuba2_tpu.python.chi2 import PhaseFunctionAdapter
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    sample_func, pdf_func = PhaseFunctionAdapter("hg", {"g": 0.6},
                                                 wi=(0, 0, 1))
    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_dim=2, sample_count=SAMPLES, res=RES,
                         ires=8, seed=1)
    assert test.run(0.01, test_count=30), test.messages
