"""measured_polarized pBRDF (models/measured.py MeasuredPolarizedBSDF,
parity: src/bsdfs/measured_polarized.cpp) driven by synthesized KAIST-layout
tensor files."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.utils.tensorfile import write_tensor_file


def _write_pbrdf(path, mueller_fn, nan_region=False):
    """KAIST file layout: M (P, D, H, W, 4, 4) over grids phi_d, theta_d,
    theta_h, wvls."""
    P, D, H, W = 9, 8, 8, 5
    phi_d = np.linspace(0, 2 * np.pi, P, dtype=np.float32)
    theta_d = np.linspace(0, np.pi / 2, D, dtype=np.float32)
    theta_h = np.linspace(0, np.pi / 2, H, dtype=np.float32)
    wvls = np.array([450, 500, 550, 600, 650], np.uint16)
    M = np.zeros((P, D, H, W, 4, 4), np.float32)
    for iw, w in enumerate(wvls):
        M[:, :, :, iw] = mueller_fn(float(w))
    if nan_region:
        M[:, :, H // 2:] = np.nan
    write_tensor_file(path, {
        "phi_d": phi_d.reshape(1, -1), "theta_d": theta_d.reshape(1, -1),
        "theta_h": theta_h.reshape(1, -1), "wvls": wvls, "M": M})
    return path


def _si(wi, wavelengths):
    from mitsuba2_tpu.render.interaction import SurfaceInteraction
    from mitsuba2_tpu.core.frame import Frame
    n = len(wi)
    wi = jnp.asarray(wi, jnp.float32)
    z = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    x = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (n, 1))
    y = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    return SurfaceInteraction(
        t=jnp.ones(n), p=jnp.zeros((n, 3)), n=z, sh_frame=Frame(x, y, z),
        uv=jnp.zeros((n, 2)), wi=wi, dp_du=x, dp_dv=y,
        shape_idx=jnp.zeros(n, jnp.int32), prim_idx=jnp.zeros(n, jnp.int32),
        wavelengths=jnp.asarray(wavelengths, jnp.float32),
        time=jnp.zeros(n))


def _lambertian_mueller(rho=0.5):
    def fn(w):
        m = np.zeros((4, 4), np.float32)
        m[0, 0] = rho / np.pi
        return m
    return fn


def test_constant_table_matches_analytic(tmp_path, variant_scalar_spectral):
    from mitsuba2_tpu.render.bsdf import BSDFContext
    f = _write_pbrdf(str(tmp_path / "flat.bsdf"), _lambertian_mueller(0.5))
    b = mi.load_dict({"type": "measured_polarized", "filename": f})
    wi = [[0, 0, 1], [np.sin(0.5), 0, np.cos(0.5)]]
    wav = np.tile([460.0, 520.0, 580.0, 640.0], (2, 1))
    si = _si(wi, wav)
    wo = jnp.asarray([[np.sin(0.3), 0, np.cos(0.3)],
                      [0, np.sin(0.7), np.cos(0.7)]], jnp.float32)
    val = np.asarray(b.eval(BSDFContext(), si, wo))
    expect = 0.5 / np.pi * np.cos([0.3, 0.7])
    np.testing.assert_allclose(val, expect[:, None] * np.ones((1, 4)),
                               rtol=1e-3)


def test_backfacing_is_zero(tmp_path, variant_scalar_spectral):
    from mitsuba2_tpu.render.bsdf import BSDFContext
    f = _write_pbrdf(str(tmp_path / "flat2.bsdf"), _lambertian_mueller())
    b = mi.load_dict({"type": "measured_polarized", "filename": f})
    si = _si([[0, 0, 1]], np.tile([500.0] * 4, (1, 1)))
    wo = jnp.asarray([[0.0, 0.0, -1.0]])
    assert np.all(np.asarray(b.eval(BSDFContext(), si, wo)) == 0)


def test_nan_region_zeroed(tmp_path, variant_scalar_spectral):
    from mitsuba2_tpu.render.bsdf import BSDFContext
    f = _write_pbrdf(str(tmp_path / "nan.bsdf"), _lambertian_mueller(),
                     nan_region=True)
    b = mi.load_dict({"type": "measured_polarized", "filename": f})
    # grazing-ish configuration: theta_h large -> lands in the NaN half
    a = 1.2
    si = _si([[np.sin(a), 0, np.cos(a)]], np.tile([550.0] * 4, (1, 1)))
    wo = jnp.asarray([[np.sin(a), 0, np.cos(a)]], jnp.float32)
    val = np.asarray(b.eval(BSDFContext(), si, wo))
    assert np.all(val == 0)
    # near-normal stays finite and positive
    si2 = _si([[0.05, 0, np.sqrt(1 - 0.05 ** 2)]],
              np.tile([550.0] * 4, (1, 1)))
    wo2 = jnp.asarray([[-0.05, 0, np.sqrt(1 - 0.05 ** 2)]], jnp.float32)
    assert np.asarray(b.eval(BSDFContext(), si2, wo2)).min() > 0


def test_sample_pdf_consistency(tmp_path, variant_scalar_spectral):
    """MC integral of pdf over sampled directions ~ 1 (mixture density is
    normalized), and sample() weights equal eval/pdf."""
    from mitsuba2_tpu.render.bsdf import BSDFContext
    f = _write_pbrdf(str(tmp_path / "flat3.bsdf"), _lambertian_mueller())
    b = mi.load_dict({"type": "measured_polarized", "filename": f})
    n = 4096
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    a = 0.4
    si = _si([[np.sin(a), 0, np.cos(a)]] * n,
             np.tile([460, 520, 580, 640], (n, 1)).astype(np.float32))
    ctx = BSDFContext()
    bs, w = b.sample(ctx, si, u1, u2, True)
    val = np.asarray(b.eval(ctx, si, bs.wo))
    pdf = np.asarray(b.pdf(ctx, si, bs.wo))
    ok = pdf > 1e-6
    np.testing.assert_allclose(np.asarray(w)[ok],
                               (val / np.maximum(pdf, 1e-12)[:, None])[ok],
                               rtol=1e-4, atol=1e-6)
    # E[f/p] over the sampled lobe with f = pdf -> 1
    est = np.where(ok, 1.0, 0.0).mean()
    assert est > 0.97  # nearly all samples land in the upper hemisphere


def test_polarized_render_stokes(tmp_path, variant_scalar_spectral):
    """End-to-end: a polarizing pBRDF rendered through the stokes
    integrator yields a physical Stokes vector (dop <= 1, s0 > 0)."""
    mi.set_variant("scalar_spectral_polarized")
    try:
        def polarizer(w):
            m = np.zeros((4, 4), np.float32)
            # horizontal-polarizer-flavored reflection, scaled down
            m[0, 0] = 0.3
            m[0, 1] = m[1, 0] = 0.15
            m[1, 1] = 0.3
            return m
        from mitsuba2_tpu.core.transform import Transform as T
        f = _write_pbrdf(str(tmp_path / "pol.bsdf"), polarizer)
        scene = mi.load_dict({
            "type": "scene",
            "integrator": {"type": "stokes",
                           "integrator": {"type": "path", "max_depth": 3}},
            "plate": {"type": "rectangle",
                      "bsdf": {"type": "measured_polarized",
                               "filename": f}},
            "light": {"type": "constant"},
            "sensor": {"type": "perspective",
                       "to_world": T.look_at([1.2, 0, 2.2], [0, 0, 0],
                                             [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 8, "height": 8,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}}})
        img = np.asarray(scene.integrator.render(scene, seed=0))
        # stokes integrator output: rgb + 12 aovs (s1..s3 per channel)
        assert np.isfinite(img).all()
        s0 = img[..., :3]
        assert s0.max() > 0
        s1 = img[..., 3:6]
        dop = np.abs(s1) / np.maximum(s0, 1e-6)
        assert dop.max() <= 1.0 + 1e-3
        assert np.abs(s1).max() > 1e-4  # the material does polarize
    finally:
        mi.set_variant("scalar_spectral")


def test_requires_spectral_or_wavelength(tmp_path):
    mi.set_variant("scalar_rgb")
    f = _write_pbrdf(str(tmp_path / "flat4.bsdf"), _lambertian_mueller())
    with pytest.raises(Exception, match="wavelength"):
        mi.load_dict({"type": "measured_polarized", "filename": f})
    # with an explicit wavelength, rgb mode works
    b = mi.load_dict({"type": "measured_polarized", "filename": f,
                      "wavelength": 550.0})
    from mitsuba2_tpu.render.bsdf import BSDFContext
    si = _si([[0, 0, 1]], np.zeros((1, 0), np.float32))
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    v = np.asarray(b.eval(BSDFContext(), si, wo))
    assert v.shape == (1, 3) and np.allclose(v, 0.5 / np.pi, rtol=1e-3)
