"""Spectrum plugins (reference: src/spectra/{uniform,regular,irregular,srgb,
srgb_d65,d65,blackbody}.cpp). Like the reference these are Texture subclasses;
in RGB/mono variants they pre-integrate against the CIE CMFs at load time
(spectrum_to_rgb), in spectral variants they evaluate the curve at the hero
wavelengths.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import spectrum as spec
from ..core.distr_1d import (ContinuousDistribution,
                             IrregularContinuousDistribution)
from ..render.texture import Texture
from ..variants import current as current_variant


class _CurveSpectrum(Texture):
    """Shared logic: a spectral curve evaluated at hero wavelengths, or its
    CIE-integrated RGB in trichromatic modes."""

    def _setup(self, wavelengths_np, values_np, bounded=False):
        self._wl = np.asarray(wavelengths_np, np.float32)
        self._vals = np.asarray(values_np, np.float32)
        self._rgb = spec.spectrum_to_rgb(self._wl, self._vals, bounded=bounded)
        self._distr = IrregularContinuousDistribution.create(
            jnp.asarray(self._wl), jnp.asarray(self._vals))
        var = current_variant()
        if var.is_monochromatic:
            self._mono = float(spec.luminance(jnp.asarray(self._rgb)))

    def _eval_curve(self, wavelengths):
        wl = jnp.asarray(self._wl)
        vals = jnp.asarray(self._vals)
        idx = jnp.clip(jnp.searchsorted(wl, wavelengths, side="right") - 1,
                       0, len(self._wl) - 2)
        x0 = wl[idx]
        x1 = wl[idx + 1]
        w = (wavelengths - x0) / jnp.maximum(x1 - x0, 1e-8)
        v = vals[idx] * (1 - w) + vals[idx + 1] * w
        ok = (wavelengths >= wl[0]) & (wavelengths <= wl[-1])
        return jnp.where(ok, v, 0.0)

    def eval(self, si, active=True):
        var = current_variant()
        if var.is_spectral:
            return self._eval_curve(si.wavelengths)
        if var.is_monochromatic:
            return jnp.full(si.t.shape + (1,), self._mono, si.t.dtype)
        return jnp.broadcast_to(jnp.asarray(self._rgb, si.t.dtype),
                                si.t.shape + (3,))

    def eval_1(self, si, active=True):
        return jnp.full(si.t.shape,
                        float(spec.luminance(jnp.asarray(self._rgb))),
                        si.t.dtype)

    def eval_3(self, si, active=True):
        return jnp.broadcast_to(jnp.asarray(self._rgb, si.t.dtype),
                                si.t.shape + (3,))

    def sample_spectrum(self, si, sample, active=True):
        var = current_variant()
        if not var.is_spectral:
            return si.wavelengths, self.eval(si, active)
        wl = self._distr.sample(sample)
        pdf = self._distr.eval_pdf_normalized(wl)
        si2 = si._replace(wavelengths=wl)
        from ..core.math import safe_div
        return wl, safe_div(self._eval_curve(wl), pdf, 0.0)

    def pdf_spectrum(self, si, active=True):
        var = current_variant()
        if not var.is_spectral:
            return jnp.zeros_like(si.wavelengths)
        return self._distr.eval_pdf_normalized(si.wavelengths)

    def mean(self):
        return float(spec.luminance(jnp.asarray(self._rgb)))


@register_plugin("spectrum", "uniform")
class UniformSpectrum(Texture):
    """(uniform.cpp) constant value at every wavelength. NOTE: in RGB mode a
    uniform spectrum is NOT white rgb (it integrates to the E-illuminant
    color); the reference treats it as the given value in all channels —
    mirrored here."""

    def __init__(self, props=None, value=None):
        super().__init__(props)
        self.value = float(props.float_("value", 1.0)) if props else \
            float(value if value is not None else 1.0)

    def eval(self, si, active=True):
        var = current_variant()
        return jnp.full(si.t.shape + (var.n_channels,), self.value, si.t.dtype)

    def eval_1(self, si, active=True):
        return jnp.full(si.t.shape, self.value, si.t.dtype)

    def eval_3(self, si, active=True):
        return jnp.full(si.t.shape + (3,), self.value, si.t.dtype)

    def mean(self):
        return self.value

    def traverse(self, cb):
        cb.put_parameter("value", self.value)


@register_plugin("spectrum", "regular")
class RegularSpectrum(_CurveSpectrum):
    """(regular.cpp) uniform wavelength grid over [lambda_min, lambda_max]."""

    def __init__(self, props=None, lambda_min=None, lambda_max=None,
                 values=None):
        super().__init__(props)
        if props is not None:
            lambda_min = props.float_("lambda_min", spec.MTS_WAVELENGTH_MIN)
            lambda_max = props.float_("lambda_max", spec.MTS_WAVELENGTH_MAX)
            values = props.get("values")
            if isinstance(values, str):
                values = [float(x) for x in values.replace(",", " ").split()]
        values = np.asarray(values, np.float32)
        wl = np.linspace(lambda_min, lambda_max, len(values))
        self._setup(wl, values)


@register_plugin("spectrum", "irregular")
class IrregularSpectrum(_CurveSpectrum):
    """(irregular.cpp) explicit (wavelength, value) pairs."""

    def __init__(self, props=None, wavelengths=None, values=None):
        super().__init__(props)
        if props is not None:
            wavelengths = props.get("wavelengths")
            values = props.get("values")
            if isinstance(wavelengths, str):
                wavelengths = [float(x) for x in
                               wavelengths.replace(",", " ").split()]
            if isinstance(values, str):
                values = [float(x) for x in values.replace(",", " ").split()]
        self._setup(np.asarray(wavelengths, np.float32),
                    np.asarray(values, np.float32))


@register_plugin("spectrum", "d65")
class D65Spectrum(_CurveSpectrum):
    """(d65.cpp) CIE D65 illuminant normalized to luminance `scale`."""

    def __init__(self, props=None, scale=None):
        super().__init__(props)
        if props is not None:
            scale = props.float_("scale", 1.0)
        scale = 1.0 if scale is None else float(scale)
        wl = np.linspace(spec.MTS_CIE_MIN, spec.MTS_CIE_MAX,
                         spec.MTS_CIE_SAMPLES)
        d65 = np.asarray(spec.CIE_D65_TABLE)
        ybar = np.asarray(spec.CIE_XYZ_TABLE)[:, 1]
        norm = np.trapezoid(d65 * ybar, wl)
        # in-kernel payload: unit reflectance (sigmoid -> 1) times d65
        self._coeff = np.asarray([0.0, 0.0, 1.0e5], np.float32)
        self._d65_scale = float(scale / norm)
        self._setup(wl, d65 * (scale / norm))


@register_plugin("spectrum", "srgb_d65")
class SRGBD65Spectrum(_CurveSpectrum):
    """(srgb_d65.cpp) an sRGB color times the D65 illuminant — the standard
    emitter spectrum for RGB-specified lights."""

    def __init__(self, props=None, color=None):
        super().__init__(props)
        if props is not None:
            color = props.get("color", props.get("value", 1.0))
        color = np.asarray(color, np.float32)
        if color.ndim == 0:
            color = np.broadcast_to(color, (3,)).copy()
        from ..render.srgb import srgb_model_fetch, srgb_model_eval
        wl = np.linspace(spec.MTS_CIE_MIN, spec.MTS_CIE_MAX, 256)
        coeff = srgb_model_fetch(np.clip(color / max(color.max(), 1.0), 0, 1))
        refl = np.asarray(srgb_model_eval(coeff, jnp.asarray(wl,
                                                             jnp.float32)))
        d65 = np.asarray(spec.cie_d65(jnp.asarray(wl, jnp.float32)))
        ybar = np.asarray(spec.cie1931_y(jnp.asarray(wl, jnp.float32)))
        norm = np.trapezoid(d65 * ybar, wl)
        vals = refl * d65 / norm * max(float(color.max()), 1.0)
        # factored payload for in-kernel evaluation (ops/megakernel.py):
        # value(wl) = sigmoid(_coeff, wl) * cie_d65(wl) * _d65_scale
        self._coeff = np.asarray(coeff, np.float32).reshape(3)
        self._d65_scale = float(max(float(color.max()), 1.0) / norm)
        self._setup(wl, vals)


@register_plugin("spectrum", "blackbody")
class BlackbodySpectrum(_CurveSpectrum):
    """(blackbody.cpp:1-220) Planck blackbody radiance at temperature T in
    W / (m^2 sr nm)."""

    def __init__(self, props=None, temperature=None):
        super().__init__(props)
        if props is not None:
            temperature = props.float_("temperature", 2856.0)
        T = float(temperature)
        wl = np.linspace(spec.MTS_CIE_MIN, spec.MTS_CIE_MAX, 256)
        lam = wl * 1e-9
        h = 6.62607015e-34
        c = 2.99792458e8
        kb = 1.380649e-23
        # spectral radiance per nm
        L = (2 * h * c * c) / (lam ** 5) \
            / (np.exp(h * c / (lam * kb * T)) - 1.0) * 1e-9
        self._setup(wl, L.astype(np.float32))


# anchor wavelengths for rgb-anchored conductor IOR curves (approximate
# centroids of the CIE-weighted sRGB primaries)
IOR_ANCHORS_NM = (600.0, 550.0, 450.0)     # (r, g, b)


def _anchored_quad_coeffs(rgb):
    """Quadratic (in the sigmoid-normalized wavelength x) through the
    three (anchor, value) points — exact interpolation, UNBOUNDED (eta/k
    exceed 1; the sigmoid reflectance model must not clip them)."""
    xs = np.asarray([(w - spec.MTS_CIE_MIN)
                     / (spec.MTS_CIE_MAX - spec.MTS_CIE_MIN) * 2.0 - 1.0
                     for w in IOR_ANCHORS_NM])
    return np.polyfit(xs, np.asarray(rgb, np.float64), 2)  # (a, b, c)


class ConductorIORSpectrum(Texture):
    """Complex-IOR channel curve for conductors in spectral variants.

    The reference evaluates eta/k from tabulated .spd curves at the hero
    wavelengths (roughconductor.cpp:306-430, fresnel.h, ior.h). This
    repo's IOR database carries rgb triples, so the curve is modeled as
    the quadratic through the three anchor values, clamped to the anchor
    span (flat extension) — unbounded, unlike the sigmoid reflectance
    upsampling which clips to [0, 1] and silently destroyed k > 1
    (e.g. Au's k = 3.98 at 600 nm)."""

    def __init__(self, rgb, curve=None):
        """rgb: the CIE-weighted triple (kept for rgb/mono fallbacks and
        metameric checks). curve: optional (wavelengths_nm, values) full
        tabulated curve (fresnel.CONDUCTOR_IOR_CURVES) — when given, the
        quadratic is least-squares fit over the WHOLE hero range and the
        clamp span widens to the table's span (ADVICE r4: the 3-anchor
        fit flat-clamped outside 450-600 nm while hero sampling covers
        360-830 nm)."""
        rgb = np.asarray(rgb, np.float32).reshape(3)
        self._rgb_np = rgb
        if curve is not None:
            wl_t = np.asarray(curve[0], np.float64)
            v_t = np.asarray(curve[1], np.float64)
            wl_d = np.linspace(wl_t[0], wl_t[-1], 128)
            v_d = np.interp(wl_d, wl_t, v_t)
            x_d = ((wl_d - spec.MTS_CIE_MIN)
                   / (spec.MTS_CIE_MAX - spec.MTS_CIE_MIN) * 2.0 - 1.0)
            self._coeff = np.asarray(np.polyfit(x_d, v_d, 2), np.float32)
            lo, hi = float(wl_t[0]), float(wl_t[-1])
        else:
            self._coeff = np.asarray(_anchored_quad_coeffs(rgb),
                                     np.float32)
            lo = min(IOR_ANCHORS_NM)
            hi = max(IOR_ANCHORS_NM)
        self._x_lo = float((lo - spec.MTS_CIE_MIN)
                           / (spec.MTS_CIE_MAX - spec.MTS_CIE_MIN) * 2 - 1)
        self._x_hi = float((hi - spec.MTS_CIE_MIN)
                           / (spec.MTS_CIE_MAX - spec.MTS_CIE_MIN) * 2 - 1)

    def eval(self, si, active=True):
        wl = si.wavelengths
        x = (wl - spec.MTS_CIE_MIN) \
            / (spec.MTS_CIE_MAX - spec.MTS_CIE_MIN) * 2.0 - 1.0
        x = jnp.clip(x, self._x_lo, self._x_hi)
        a, b, c = [float(v) for v in self._coeff]
        return (a * x + b) * x + c

    def eval_3(self, si, active=True):
        return jnp.broadcast_to(jnp.asarray(self._rgb_np),
                                si.t.shape + (3,))

    def eval_1(self, si, active=True):
        v = float(self._rgb_np @ np.asarray([0.212671, 0.715160,
                                             0.072169]))
        return jnp.full(si.t.shape, v, si.t.dtype)

    def mean(self):
        return float(self._rgb_np.mean())

    def is_spatially_varying(self):
        return False
