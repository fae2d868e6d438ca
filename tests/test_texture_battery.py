"""Per-texture/spectrum plugin battery (reference src/textures +
src/spectra tests role): evaluation conventions, wrap modes, spectral
plugin normalization."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T
from mitsuba2_tpu.render.testutil import dummy_si


def _si_at_uv(uv):
    uv = np.asarray(uv, np.float32).reshape(-1, 2)
    si = dummy_si(len(uv))
    return si._replace(uv=jnp.asarray(uv))


def test_constant_eval(variant_scalar_rgb):
    from mitsuba2_tpu.models.textures import ConstantTexture
    t = ConstantTexture(color=[0.2, 0.4, 0.8])
    out = np.asarray(t.eval_3(_si_at_uv([[0.5, 0.5]])))
    assert np.allclose(out, [[0.2, 0.4, 0.8]], atol=1e-6)


def test_checkerboard_parity(variant_scalar_rgb):
    t = mi.load_dict({"type": "checkerboard",
                      "color0": {"type": "rgb", "value": 1.0},
                      "color1": {"type": "rgb", "value": 0.0},
                      "to_uv": T.scale([4, 4, 1])})
    # cell (0,0) -> color0; adjacent cell -> color1
    a = np.asarray(t.eval_3(_si_at_uv([[0.1, 0.1]])))
    b = np.asarray(t.eval_3(_si_at_uv([[0.35, 0.1]])))
    assert a.mean() != b.mean()
    assert {round(float(a.mean()), 3), round(float(b.mean()), 3)} \
        == {0.0, 1.0}


def test_bitmap_matches_numpy_bilinear(variant_scalar_rgb):
    from mitsuba2_tpu.utils.io_exr import write_exr
    rs = np.random.RandomState(0)
    img = rs.rand(8, 8, 3).astype(np.float32)
    path = os.path.join(tempfile.gettempdir(), "tb_bilin.exr")
    write_exr(path, img)
    t = mi.load_dict({"type": "bitmap", "filename": path})
    # texel centers: (i+0.5)/8 in uv -> exact texel values (half-float
    # EXR storage: ~1e-3 quantization)
    uvs = [[(i + 0.5) / 8, (j + 0.5) / 8] for j in range(8)
           for i in range(8)]
    out = np.asarray(t.eval_3(_si_at_uv(uvs))).reshape(8, 8, 3)
    assert np.allclose(out, img, atol=2e-3)


def test_bitmap_wraps(variant_scalar_rgb):
    from mitsuba2_tpu.utils.io_exr import write_exr
    rs = np.random.RandomState(1)
    img = rs.rand(4, 4, 3).astype(np.float32)
    path = os.path.join(tempfile.gettempdir(), "tb_wrap.exr")
    write_exr(path, img)
    t = mi.load_dict({"type": "bitmap", "filename": path})
    a = np.asarray(t.eval_3(_si_at_uv([[0.125, 0.375]])))
    b = np.asarray(t.eval_3(_si_at_uv([[1.125, 0.375]])))
    c = np.asarray(t.eval_3(_si_at_uv([[-0.875, 0.375]])))
    assert np.allclose(a, b, atol=1e-4)
    assert np.allclose(a, c, atol=1e-4)


def test_uniform_spectrum(variant_scalar_spectral):
    t = mi.load_dict({"type": "uniform", "value": 0.6})
    si = dummy_si(4, n_wav=4)
    out = np.asarray(t.eval(si))
    assert np.allclose(out, 0.6, atol=1e-6)


def test_regular_spectrum_interpolates(variant_scalar_spectral):
    t = mi.load_dict({"type": "regular", "lambda_min": 400.0,
                      "lambda_max": 700.0, "values": "0.0, 1.0"})
    si = dummy_si(1, n_wav=4)
    si = si._replace(wavelengths=jnp.asarray([[400.0, 550.0, 700.0,
                                               475.0]]))
    out = np.asarray(t.eval(si))[0]
    assert abs(out[0] - 0.0) < 1e-5
    assert abs(out[1] - 0.5) < 1e-5
    assert abs(out[2] - 1.0) < 1e-5
    assert abs(out[3] - 0.25) < 1e-5


def test_irregular_spectrum_interpolates(variant_scalar_spectral):
    t = mi.load_dict({"type": "irregular",
                      "wavelengths": "400, 500, 700",
                      "values": "0.2, 1.0, 0.4"})
    si = dummy_si(1, n_wav=4)
    si = si._replace(wavelengths=jnp.asarray([[400.0, 450.0, 600.0,
                                               700.0]]))
    out = np.asarray(t.eval(si))[0]
    assert abs(out[0] - 0.2) < 1e-5
    assert abs(out[1] - 0.6) < 1e-5
    assert abs(out[3] - 0.4) < 1e-5


def test_d65_has_daylight_shape(variant_scalar_spectral):
    """The d65 curve follows the CIE daylight shape: stronger at 460nm
    than 700nm, smooth and positive over the visible range."""
    t = mi.load_dict({"type": "d65"})
    si = dummy_si(3, n_wav=1)
    wl = jnp.asarray([[460.0], [560.0], [700.0]])
    v = np.asarray(t.eval(si._replace(wavelengths=wl)))[:, 0]
    assert (v > 0).all()
    assert v[0] > v[2]                    # blue-ish daylight
    assert v[0] / v[1] < 1.5              # not wildly unnormalized


def test_blackbody_peak_shifts_with_temperature(variant_scalar_spectral):
    hot = mi.load_dict({"type": "blackbody", "temperature": 8000.0})
    cold = mi.load_dict({"type": "blackbody", "temperature": 3000.0})
    si = dummy_si(2, n_wav=1)
    blue = si._replace(wavelengths=jnp.full((2, 1), 420.0))
    red = si._replace(wavelengths=jnp.full((2, 1), 700.0))
    hr = float(np.asarray(hot.eval(blue)).mean() /
               np.asarray(hot.eval(red)).mean())
    cr = float(np.asarray(cold.eval(blue)).mean() /
               np.asarray(cold.eval(red)).mean())
    assert hr > cr    # hotter -> relatively bluer


def test_srgb_spectrum_roundtrip(variant_scalar_spectral):
    """rgb->spectrum upsampling integrates back to ~the input color
    (rgb2spec round trip, srgb.cpp)."""
    from mitsuba2_tpu.core import spectrum as sp
    t = mi.load_dict({"type": "srgb", "color": [0.7, 0.3, 0.2]})
    wav = jnp.linspace(380.0, 780.0, 280)
    si = dummy_si(280, n_wav=1)._replace(wavelengths=wav[:, None])
    vals = np.asarray(t.eval(si))[:, 0]
    xyz_cmf = np.asarray(sp.cie1931_xyz(wav))
    d65 = np.asarray(sp.cie_d65(wav))
    w = xyz_cmf * d65[:, None]
    w = w / w[:, 1].sum()
    xyz = (vals[:, None] * w).sum(0)
    rgb = np.asarray(sp.xyz_to_srgb(jnp.asarray(xyz[None])))[0]
    assert np.allclose(rgb, [0.7, 0.3, 0.2], atol=0.03), rgb


def test_grid3d_trilinear(variant_scalar_rgb):
    data = np.zeros((2, 2, 2), np.float32)
    data[1, 1, 1] = 1.0
    v = mi.load_dict({"type": "grid3d", "data": data})
    # volumes take raw world points ([0,1]^3 local cube)
    hi = float(np.asarray(v.eval_1(jnp.asarray([[0.999, 0.999,
                                                 0.999]]))).mean())
    lo = float(np.asarray(v.eval_1(jnp.asarray([[0.001, 0.001,
                                                 0.001]]))).mean())
    assert hi > 0.9 and lo < 0.1


def test_grid3d_max_bounds_field(variant_scalar_rgb):
    rs = np.random.RandomState(0)
    data = rs.rand(4, 4, 4).astype(np.float32)
    v = mi.load_dict({"type": "grid3d", "data": data})
    assert abs(v.max() - data.max()) < 1e-6
    pts = jnp.asarray(rs.rand(512, 3).astype(np.float32))
    vals = np.asarray(v.eval_1(pts))
    assert (vals <= v.max() + 1e-6).all() and (vals >= 0).all()


def test_constant3d(variant_scalar_rgb):
    v = mi.load_dict({"type": "constant3d", "value": 0.4})
    out = np.asarray(v.eval(jnp.zeros((3, 3))))
    assert np.allclose(out, 0.4, atol=1e-5)
