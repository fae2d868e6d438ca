"""Microfacet distributions: Beckmann + GGX with Smith shadowing and
visible-normal sampling (reference: include/mitsuba/render/microfacet.h:18-61,
553 LoC).

Anisotropic roughness (alpha_u, alpha_v) supported throughout. Visible-normal
sampling follows Heitz's slope-space construction for both distributions (the
same algorithm family the reference uses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr


GGX = "ggx"
BECKMANN = "beckmann"


class MicrofacetDistribution(NamedTuple):
    type: str               # static: 'ggx' | 'beckmann'
    alpha_u: jnp.ndarray
    alpha_v: jnp.ndarray
    sample_visible: bool = True

    @property
    def is_isotropic(self):
        return self.alpha_u is self.alpha_v

    def scale_alpha(self, s):
        return self._replace(alpha_u=self.alpha_u * s,
                             alpha_v=self.alpha_v * s)

    # -- density ---------------------------------------------------------------
    def eval(self, mh):
        """NDF D(m) (microfacet.h eval)."""
        au, av = self.alpha_u, self.alpha_v
        ct = fr.cos_theta(mh)
        ct2 = ct * ct
        x2 = m.sqr(mh[..., 0] / au)
        y2 = m.sqr(mh[..., 1] / av)
        if self.type == BECKMANN:
            val = m.safe_div(jnp.exp(-m.safe_div(x2 + y2, ct2, 0.0)),
                             m.Pi * au * av * ct2 * ct2, 0.0)
        else:
            t = x2 + y2 + ct2
            val = m.safe_div(1.0, m.Pi * au * av * t * t, 0.0)
        return jnp.where(ct > 0, val, 0.0)

    def smith_g1(self, v, mh):
        """Smith monodirectional shadowing (microfacet.h smith_g1)."""
        ct = fr.cos_theta(v)
        xy_alpha_2 = (m.sqr(self.alpha_u * v[..., 0])
                      + m.sqr(self.alpha_v * v[..., 1]))
        tan_theta_alpha_2 = m.safe_div(xy_alpha_2, m.sqr(ct), 0.0)
        if self.type == BECKMANN:
            # exact Smith G1 (not the rational fit): matches the exact VNDF
            # slope sampling so pdf() is the true sampling density
            a = m.safe_rsqrt(tan_theta_alpha_2)
            lam = 0.5 * (_erf(a) - 1.0) \
                + m.safe_div(jnp.exp(-a * a), 2.0 * a * m.SqrtPi, 0.0)
            result = 1.0 / (1.0 + lam)
        else:
            result = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
        # perpendicular incidence / sidedness checks (microfacet.h)
        result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
        result = jnp.where(m.dot(v, mh) * ct <= 0.0, 0.0, result)
        return result

    def G(self, wi, wo, mh):
        return self.smith_g1(wi, mh) * self.smith_g1(wo, mh)

    def pdf(self, wi, mh):
        """Density of :func:`sample` (microfacet.h pdf)."""
        d = self.eval(mh)
        if self.sample_visible:
            return (self.smith_g1(wi, mh) * jnp.abs(m.dot(wi, mh)) * d
                    / jnp.maximum(jnp.abs(fr.cos_theta(wi)), 1e-8))
        return d * fr.cos_theta(mh)

    # -- sampling ----------------------------------------------------------------
    def sample(self, wi, sample2):
        """-> (micro-normal m, pdf) (microfacet.h sample)."""
        if self.sample_visible:
            mh = self._sample_visible(wi, sample2)
            return mh, self.pdf(wi, mh)
        # full-distribution sampling
        u1 = sample2[..., 0]
        u2 = sample2[..., 1]
        if self.type == BECKMANN:
            # anisotropic beckmann (microfacet.h sample, non-visible branch)
            phi = jnp.arctan2(self.alpha_v * jnp.sin(2 * m.Pi * u2),
                              self.alpha_u * jnp.cos(2 * m.Pi * u2))
            cp, sp = jnp.cos(phi), jnp.sin(phi)
            alpha2 = 1.0 / (m.sqr(cp / self.alpha_u) + m.sqr(sp / self.alpha_v))
            tan_theta2 = -alpha2 * jnp.log(jnp.maximum(1.0 - u1, 1e-38))
            ct = m.safe_rsqrt(1.0 + tan_theta2)
        else:
            phi = jnp.arctan2(self.alpha_v * jnp.sin(2 * m.Pi * u2),
                              self.alpha_u * jnp.cos(2 * m.Pi * u2))
            cp, sp = jnp.cos(phi), jnp.sin(phi)
            alpha2 = 1.0 / (m.sqr(cp / self.alpha_u) + m.sqr(sp / self.alpha_v))
            tan_theta2 = alpha2 * u1 / jnp.maximum(1.0 - u1, 1e-8)
            ct = m.safe_rsqrt(1.0 + tan_theta2)
        st = m.safe_sqrt(1.0 - ct * ct)
        mh = m.vec3(st * cp, st * sp, ct)
        return mh, self.pdf(wi, mh)

    def _sample_visible(self, wi, sample2):
        """Visible-normal sampling. GGX uses Heitz 2018's exact hemisphere
        projection; Beckmann uses exact slope-space CDF inversion."""
        au, av = self.alpha_u, self.alpha_v
        if self.type == GGX:
            u1 = sample2[..., 0]
            u2 = sample2[..., 1]
            wi_s = m.normalize(m.vec3(au * wi[..., 0], av * wi[..., 1],
                                      wi[..., 2]))
            lensq = wi_s[..., 0] ** 2 + wi_s[..., 1] ** 2
            inv_len = m.safe_rsqrt(jnp.maximum(lensq, 1e-20))
            t1 = jnp.where(lensq[..., None] > 1e-14,
                           m.vec3(-wi_s[..., 1] * inv_len,
                                  wi_s[..., 0] * inv_len,
                                  jnp.zeros_like(inv_len)),
                           jnp.broadcast_to(
                               jnp.asarray([1.0, 0.0, 0.0], wi.dtype),
                               wi.shape))
            t2 = m.cross(wi_s, t1)
            r = m.safe_sqrt(u1)
            phi = 2.0 * m.Pi * u2
            p1 = r * jnp.cos(phi)
            p2 = r * jnp.sin(phi)
            s = 0.5 * (1.0 + wi_s[..., 2])
            p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
            nh = (t1 * p1[..., None] + t2 * p2[..., None]
                  + wi_s * m.safe_sqrt(1.0 - p1 * p1 - p2 * p2)[..., None])
            return m.normalize(m.vec3(au * nh[..., 0], av * nh[..., 1],
                                      jnp.maximum(nh[..., 2], 1e-6)))
        # stretch wi
        wi_s = m.normalize(m.vec3(au * wi[..., 0], av * wi[..., 1],
                                  wi[..., 2]))
        # sample P22 slopes conditioned on wi (in the stretched configuration)
        sx, sy = self._sample_slopes(jnp.clip(fr.cos_theta(wi_s), -1, 1),
                                     sample2)
        # rotate by phi(wi_s)
        cp = fr.cos_phi(wi_s)
        sp = fr.sin_phi(wi_s)
        sx_r = cp * sx - sp * sy
        sy_r = sp * sx + cp * sy
        # unstretch
        sx_f = au * sx_r
        sy_f = av * sy_r
        return m.normalize(m.vec3(-sx_f, -sy_f, jnp.ones_like(sx_f)))

    def _sample_slopes(self, cos_theta_i, sample2):
        u1 = jnp.clip(sample2[..., 0], 1e-6, 1 - 1e-6)
        u2 = jnp.clip(sample2[..., 1], 1e-6, 1 - 1e-6)
        if self.type == GGX:
            # Heitz 2014 analytic GGX slope sampling
            ct = jnp.maximum(cos_theta_i, -0.9999)
            st = m.safe_sqrt(1.0 - ct * ct)
            tan_theta = m.safe_div(st, ct, 0.0)
            # normal incidence special case
            a = 1.0 / jnp.maximum(tan_theta, 1e-12)
            g1 = 2.0 / (1.0 + m.safe_sqrt(1.0 + 1.0 / (a * a)))
            A = 2.0 * u1 / g1 - 1.0
            A = jnp.clip(A, -1 + 1e-6, 1 - 1e-6)
            tmp = jnp.minimum(1.0 / (A * A - 1.0), 1e10)
            B = tan_theta
            D = m.safe_sqrt(jnp.maximum(B * B * tmp * tmp
                                        - (A * A - B * B) * tmp, 0.0))
            sx_1 = B * tmp - D
            sx_2 = B * tmp + D
            slope_x = jnp.where((A < 0.0) | (sx_2 > 1.0 / jnp.maximum(
                tan_theta, 1e-12)), sx_1, sx_2)
            # normal incidence: uniform disk mapping
            ni = ct > 0.9999
            r = m.safe_sqrt(u1 / jnp.maximum(1.0 - u1, 1e-12))
            phi_ni = 2 * m.Pi * u2
            slope_x = jnp.where(ni, r * jnp.cos(phi_ni), slope_x)
            # slope_y
            s = jnp.where(u2 > 0.5, 1.0, -1.0)
            u2b = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
            z = ((u2b * (u2b * (u2b * 0.27385 - 0.73369) + 0.46341))
                 / (u2b * (u2b * (u2b * 0.093073 + 0.309420) - 1.0)
                    + 0.597999))
            slope_y = s * z * m.safe_sqrt(1.0 + slope_x * slope_x)
            slope_y = jnp.where(ni, r * jnp.sin(phi_ni), slope_y)
            return slope_x, slope_y
        # Beckmann: invert the conditional CDF with Newton iterations
        # (pbrt-v3 / reference microfacet.h approach)
        ct = jnp.maximum(cos_theta_i, 1e-6)
        st = m.safe_sqrt(1.0 - ct * ct)
        tan_theta = st / ct
        cot_theta = 1.0 / jnp.maximum(tan_theta, 1e-12)
        # bracketed Newton solve of the conditional slope CDF in erf space
        c = _erf(cot_theta)
        sample_x = jnp.maximum(u1, 1e-6)
        theta_big = tan_theta > 1e-4
        fit = 1.0 + cos_theta_i * (-0.876 + cos_theta_i
                                   * (0.4265 - 0.0594 * cos_theta_i))
        b = c - (1.0 + c) * jnp.power(1.0 - sample_x, fit)
        norm = m.safe_div(1.0, 1.0 + c + m.InvSqrtPi * tan_theta
                          * jnp.exp(-cot_theta * cot_theta), 0.0)
        lo = jnp.full_like(b, -1.0 + 1e-6)
        hi = c - 1e-6
        for _ in range(12):
            b = jnp.clip(b, lo, hi)
            inv_erf = _erfinv(b)
            val = norm * (1.0 + b + m.InvSqrtPi * tan_theta
                          * jnp.exp(-inv_erf * inv_erf)) - sample_x
            derivative = norm * (1.0 - inv_erf * tan_theta)
            go_lo = val > 0
            hi = jnp.where(go_lo, b, hi)
            lo = jnp.where(go_lo, lo, b)
            b_newton = b - m.safe_div(val, derivative, 0.0)
            inside = (b_newton > lo) & (b_newton < hi)
            b = jnp.where(inside, b_newton, 0.5 * (lo + hi))
        slope_x = _erfinv(jnp.clip(b, -1 + 1e-6, 1 - 1e-6))
        slope_y = _erfinv(jnp.clip(2.0 * jnp.maximum(u2, 1e-6) - 1.0,
                                   -1 + 1e-6, 1 - 1e-6))
        # near-normal incidence: sample isotropic gaussian slopes
        ni = cos_theta_i > 0.9999
        r = m.safe_sqrt(-jnp.log(jnp.maximum(1.0 - u1, 1e-38)))
        phi_ni = 2 * m.Pi * u2
        slope_x = jnp.where(ni | ~theta_big, r * jnp.cos(phi_ni), slope_x)
        slope_y = jnp.where(ni | ~theta_big, r * jnp.sin(phi_ni), slope_y)
        return slope_x, slope_y


def _erf(x):
    return _erf_approx(x)


def _erf_approx(x):
    # Abramowitz-Stegun 7.1.26, |err| < 1.5e-7 — adequate for sampling
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                * t - 0.284496736) * t + 0.254829592) * t * jnp.exp(-x * x)
    return sign * y


def _erfinv(x):
    # Giles 2010 single-precision rational approximation
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-38))
    w_small = w < 5.0
    ws = w - 2.5
    wb = jnp.sqrt(jnp.maximum(w, 5.0)) - 3.0
    p_s = 2.81022636e-08
    p_s = 3.43273939e-07 + p_s * ws
    p_s = -3.5233877e-06 + p_s * ws
    p_s = -4.39150654e-06 + p_s * ws
    p_s = 0.00021858087 + p_s * ws
    p_s = -0.00125372503 + p_s * ws
    p_s = -0.00417768164 + p_s * ws
    p_s = 0.246640727 + p_s * ws
    p_s = 1.50140941 + p_s * ws
    p_b = -0.000200214257
    p_b = 0.000100950558 + p_b * wb
    p_b = 0.00134934322 + p_b * wb
    p_b = -0.00367342844 + p_b * wb
    p_b = 0.00573950773 + p_b * wb
    p_b = -0.0076224613 + p_b * wb
    p_b = 0.00943887047 + p_b * wb
    p_b = 1.00167406 + p_b * wb
    p_b = 2.83297682 + p_b * wb
    return jnp.where(w_small, p_s, p_b) * x
