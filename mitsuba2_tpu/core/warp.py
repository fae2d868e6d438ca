"""Square <-> distribution warps with matching PDFs.

Full parity surface with reference include/mitsuba/core/warp.h (see SURVEY.md
appendix): interval_to_{linear,tent,nonuniform_tent}, square_to_{uniform_disk,
uniform_disk_concentric, uniform_square_concentric, uniform_triangle,
std_normal, tent, bilinear, uniform_sphere, uniform_hemisphere,
cosine_hemisphere, uniform_cone, beckmann, von_mises_fisher, rough_fiber} plus
``*_pdf``. All functions take (..., 2) samples in [0,1)^2 and are fully
vectorized / AD-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m
from .math import (Pi, TwoPi, InvPi, InvTwoPi, InvFourPi, sqr, safe_sqrt,
                   vec2, vec3)

# ----------------------------------------------------------------------------
# 1D interval warps
# ----------------------------------------------------------------------------

def interval_to_linear(v0, v1, sample):
    """Importance sample a linear interpolant on [0,1] with endpoints v0,v1."""
    num = v0 - safe_sqrt(m.lerp(sqr(v0), sqr(v1), sample))
    den = v0 - v1
    return jnp.where(jnp.abs(den) > 1e-9, m.safe_div(num, den, sample), sample)


def interval_to_tent(sample):
    """[0,1] -> [-1,1] with density (1-|x|)."""
    neg = sample < 0.5
    return jnp.where(neg, safe_sqrt(2.0 * sample) - 1.0,
                     1.0 - safe_sqrt(jnp.maximum(2.0 - 2.0 * sample, 0.0)))


def interval_to_nonuniform_tent(a, b, c, sample):
    """[0,1] -> [a,c] tent with peak at b (warp.h interval_to_nonuniform_tent)."""
    left_mass = m.safe_div(b - a, c - a, 0.0)
    left = sample < left_mass
    x_l = a + safe_sqrt(sample * (b - a) * (c - a))
    x_r = c - safe_sqrt((1.0 - sample) * (c - b) * (c - a))
    return jnp.where(left, x_l, x_r)


# ----------------------------------------------------------------------------
# 2D planar warps
# ----------------------------------------------------------------------------

def square_to_uniform_disk(sample):
    r = safe_sqrt(sample[..., 1])
    phi = TwoPi * sample[..., 0]
    return vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def square_to_uniform_disk_pdf(p):
    inside = m.squared_norm(p) <= 1.0
    return jnp.where(inside, InvPi, 0.0)


def square_to_uniform_disk_concentric(sample):
    """Shirley-Chiu low-distortion concentric disk mapping (warp.h:54)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * Pi * m.safe_div(rp, r, 0.0)
    phi = jnp.where(quadrant_1_or_3, 0.5 * Pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def square_to_uniform_disk_concentric_pdf(p):
    return square_to_uniform_disk_pdf(p)


def uniform_disk_to_square_concentric(p):
    """Inverse of the concentric mapping (warp.h:96)."""
    quadrant_0_or_2 = jnp.abs(p[..., 0]) > jnp.abs(p[..., 1])
    r_sign = jnp.where(quadrant_0_or_2, p[..., 0], p[..., 1])
    r = jnp.copysign(m.norm(p), r_sign)
    phi = jnp.arctan2(m.mulsign(p[..., 1], r_sign), m.mulsign(p[..., 0], r_sign))
    t = 4.0 / Pi * phi
    t = jnp.where(quadrant_0_or_2, t, 2.0 - t) * r
    a = jnp.where(quadrant_0_or_2, r, t)
    b = jnp.where(quadrant_0_or_2, t, r)
    return vec2((a + 1.0) * 0.5, (b + 1.0) * 0.5)


def square_to_uniform_square_concentric(sample):
    """Square -> square through the concentric disk (warp.h ~146)."""
    return uniform_disk_to_square_concentric(
        square_to_uniform_disk_concentric(sample))


def square_to_uniform_triangle(sample):
    """Uniform barycentrics on the triangle (0,0),(1,0),(0,1)."""
    t = safe_sqrt(1.0 - sample[..., 0])
    return vec2(1.0 - t, t * sample[..., 1])


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1)
    return jnp.where(inside, 2.0, 0.0)


def square_to_std_normal(sample):
    """Box-Muller transform to a 2D standard normal."""
    r = safe_sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - sample[..., 0], 1e-38)))
    phi = TwoPi * sample[..., 1]
    return vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def square_to_std_normal_pdf(p):
    return InvTwoPi * jnp.exp(-0.5 * m.squared_norm(p))


def square_to_tent(sample):
    return vec2(interval_to_tent(sample[..., 0]),
                interval_to_tent(sample[..., 1]))


def square_to_tent_pdf(p):
    ax, ay = jnp.abs(p[..., 0]), jnp.abs(p[..., 1])
    inside = (ax <= 1.0) & (ay <= 1.0)
    return jnp.where(inside, (1.0 - ax) * (1.0 - ay), 0.0)


def square_to_bilinear(v00, v10, v01, v11, sample):
    """Sample a bilinear interpolant on [0,1]^2; returns (point, pdf).

    Corner convention: v<ix><iy>. (warp.h square_to_bilinear)
    """
    # marginal in x
    r0 = v00 + v01  # x = 0
    r1 = v10 + v11  # x = 1
    x = interval_to_linear(r0, r1, sample[..., 0])
    # conditional in y given x
    c0 = m.lerp(v00, v10, x)
    c1 = m.lerp(v01, v11, x)
    y = interval_to_linear(c0, c1, sample[..., 1])
    p = vec2(x, y)
    return p, square_to_bilinear_pdf(v00, v10, v01, v11, p)


def square_to_bilinear_pdf(v00, v10, v01, v11, p):
    x, y = p[..., 0], p[..., 1]
    f = (v00 * (1 - x) * (1 - y) + v10 * x * (1 - y)
         + v01 * (1 - x) * y + v11 * x * y)
    integral = 0.25 * (v00 + v10 + v01 + v11)
    inside = (x >= 0) & (x <= 1) & (y >= 0) & (y <= 1)
    return jnp.where(inside, m.safe_div(f, integral, 0.0), 0.0)


# ----------------------------------------------------------------------------
# Sphere / hemisphere warps
# ----------------------------------------------------------------------------

def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 1]
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * sample[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], InvFourPi, v.dtype)


def square_to_uniform_hemisphere(sample):
    z = sample[..., 1]
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * sample[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0, InvTwoPi, 0.0)


def square_to_cosine_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - m.squared_norm(p))
    return vec3(p[..., 0], p[..., 1], z)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * InvPi


def square_to_uniform_cone(sample, cos_cutoff):
    """Uniform direction in a cone around +z (warp.h:446)."""
    z = m.lerp(1.0, cos_cutoff, sample[..., 1])
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * sample[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    return jnp.where(v[..., 2] >= cos_cutoff,
                     InvTwoPi / (1.0 - cos_cutoff), 0.0)


def square_to_beckmann(sample, alpha):
    """Sample the Beckmann NDF * cos (warp.h:496)."""
    phi = TwoPi * sample[..., 0]
    tan_theta_2 = -sqr(alpha) * jnp.log(jnp.maximum(1.0 - sample[..., 1], 1e-38))
    cos_theta = m.safe_rsqrt(1.0 + tan_theta_2)
    r = safe_sqrt(jnp.maximum(1.0 - sqr(cos_theta), 0.0))
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), cos_theta)


def square_to_beckmann_pdf(v, alpha):
    ct = v[..., 2]
    ok = ct > 1e-9
    ct_safe = jnp.where(ok, ct, 1.0)
    tan_theta_2 = (1.0 - sqr(ct_safe)) / sqr(ct_safe)
    pdf = jnp.exp(-tan_theta_2 / sqr(alpha)) / (Pi * sqr(alpha) * ct_safe ** 3)
    return jnp.where(ok, pdf, 0.0)


def square_to_von_mises_fisher(sample, kappa):
    """vMF distribution around +z (warp.h:551)."""
    kappa = jnp.asarray(kappa, jnp.result_type(sample, 1.0))
    sy = jnp.maximum(1.0 - sample[..., 1], 1e-38)
    z = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / jnp.maximum(kappa, 1e-38)
    z_unif = 1.0 - 2.0 * sample[..., 1]
    z = jnp.where(kappa <= 0, z_unif, z)
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * sample[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_von_mises_fisher_pdf(v, kappa):
    kappa = jnp.asarray(kappa, jnp.result_type(v, 1.0))
    pdf = jnp.exp(kappa * (v[..., 2] - 1.0)) * kappa * InvTwoPi \
        / (1.0 - jnp.exp(-2.0 * kappa))
    return jnp.where(kappa <= 0, jnp.full_like(pdf, InvFourPi), pdf)


def square_to_rough_fiber(sample, wi, tangent, kappa):
    """Rough fiber scattering lobe (role of warp.h:610).

    TPU-friendly construction (not a transcription of the reference's
    quadrature tables): sample a micro-normal n from a vMF lobe of
    concentration ``kappa`` expressed in a frame around ``tangent``, then
    specularly reflect ``wi`` about n. The matching PDF below makes the pair
    self-consistent (validated by the chi2 harness).
    """
    t = m.normalize(tangent)
    s, b = m.coordinate_system(t)
    wi_l = vec3(m.dot(wi, s), m.dot(wi, b), m.dot(wi, t))
    n = square_to_von_mises_fisher(sample, kappa)
    wo_l = m.normalize(-wi_l + 2.0 * m.dot(wi_l, n)[..., None] * n)
    return s * wo_l[..., 0:1] + b * wo_l[..., 1:2] + t * wo_l[..., 2:3]


def square_to_rough_fiber_pdf(v, wi, tangent, kappa):
    """PDF of :func:`square_to_rough_fiber` via the half-vector jacobian:
    p(wo) = p_n(h) / (4 |wo . h|) with h = normalize(wo + wi)."""
    t = m.normalize(tangent)
    s, b = m.coordinate_system(t)

    def local(x):
        return vec3(m.dot(x, s), m.dot(x, b), m.dot(x, t))

    wi_l, v_l = local(wi), local(v)
    h = m.normalize(v_l + wi_l)
    # both n = +h and n = -h reflect wi onto wo
    pn = (square_to_von_mises_fisher_pdf(h, kappa)
          + square_to_von_mises_fisher_pdf(-h, kappa))
    denom = 4.0 * jnp.abs(m.dot(v_l, h))
    return m.safe_div(pn, denom, 0.0)
