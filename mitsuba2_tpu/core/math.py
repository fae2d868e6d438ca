"""Math constants and helpers (reference: include/mitsuba/core/math.h).

Everything here is shape-polymorphic over leading lane axes and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Pi = 3.141592653589793
TwoPi = 2.0 * Pi
FourPi = 4.0 * Pi
InvPi = 1.0 / Pi
InvTwoPi = 1.0 / TwoPi
InvFourPi = 1.0 / FourPi
SqrtPi = 1.7724538509055160
SqrtTwo = 1.4142135623730951
InvSqrtPi = 1.0 / SqrtPi
InvSqrtTwo = 1.0 / SqrtTwo

# Ray-offset epsilons (reference: include/mitsuba/render/fwd.h — RayEpsilon =
# eps*1500, ShadowEpsilon = RayEpsilon*10; used by Scene shadow rays,
# scene.cpp:204-206).
RayEpsilon = 1.1920929e-07 * 1500.0
ShadowEpsilon = RayEpsilon * 10.0
Infinity = jnp.inf
Epsilon = 1.1920929e-07 / 2


def sqr(x):
    return x * x


def rcp(x):
    return 1.0 / x


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.result_type(x, 1.0)).tiny))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, fallback=0.0):
    """a/b with a well-defined value where b == 0 (keeps AD NaN-free)."""
    b_ok = b != 0
    bsafe = jnp.where(b_ok, b, 1.0)
    return jnp.where(b_ok, a / bsafe, fallback)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def lerp(a, b, t):
    return a + (b - a) * t


def mulsign(x, s):
    """x with the sign of s applied (Enoki ``mulsign``)."""
    return jnp.where(s >= 0, x, -x)


def sign(x):
    return jnp.where(x >= 0, 1.0, -1.0)


def fmadd(a, b, c):
    return a * b + c


# ----------------------------------------------------------------------------
# Vector helpers over the trailing axis (public (..., 3) convention)
# ----------------------------------------------------------------------------

def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def abs_dot(a, b, keepdims: bool = False):
    return jnp.abs(dot(a, b, keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, keepdims: bool = False):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def squared_norm(v, keepdims: bool = False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def normalize(v):
    return v * safe_rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def vec3(x, y, z):
    """Stack components into a (..., 3) vector, broadcasting."""
    x, y, z = jnp.broadcast_arrays(
        jnp.asarray(x, dtype=jnp.result_type(x, y, z, 1.0)),
        jnp.asarray(y, dtype=jnp.result_type(x, y, z, 1.0)),
        jnp.asarray(z, dtype=jnp.result_type(x, y, z, 1.0)))
    return jnp.stack([x, y, z], axis=-1)


def vec2(x, y):
    x, y = jnp.broadcast_arrays(
        jnp.asarray(x, dtype=jnp.result_type(x, y, 1.0)),
        jnp.asarray(y, dtype=jnp.result_type(x, y, 1.0)))
    return jnp.stack([x, y], axis=-1)


def unstack(v):
    """Split the trailing axis into component arrays."""
    return tuple(v[..., i] for i in range(v.shape[-1]))


def coordinate_system(n):
    """Build an orthonormal basis around unit normal n.

    Duff et al. 2017 branchless construction (reference:
    include/mitsuba/core/vector.h coordinate_system).
    """
    nx, ny, nz = unstack(n)
    s = sign(nz)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    s_x = vec3(mulsign(sqr(nx) * a, nz) + 1.0, mulsign(b, nz), mulsign(-nx, nz))
    s_y = vec3(b, s + sqr(ny) * a, -ny)
    return s_x, s_y


def spherical_direction(theta, phi):
    """Unit direction from spherical angles (z-up)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return vec3(st * cp, st * sp, ct)


def spherical_coordinates(d):
    """(theta, phi) from a unit direction."""
    theta = safe_acos(d[..., 2])
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    return theta, phi


def linear_to_srgb(x):
    """Linear RGB -> sRGB transfer (reference: core/math.h linear_to_srgb)."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((x + 0.055) / 1.055, 2.4))


def find_interval(size, pred):
    """Mitsuba's math::find_interval — here specialized as a helper for sorted
    array lookup: callers should use ``jnp.searchsorted`` directly instead."""
    raise NotImplementedError("use jnp.searchsorted")


def legendre_p(order: int, x):
    """Legendre polynomial P_n(x) by recurrence (core/math.h legendre_p)."""
    if order == 0:
        return jnp.ones_like(x)
    p_prev, p = jnp.ones_like(x), x
    for n in range(1, order):
        p_prev, p = p, ((2 * n + 1) * x * p - n * p_prev) / (n + 1)
    return p


def legendre_pd(order: int, x):
    """(P_n(x), P_n'(x)) — used by Gauss-Legendre node finding."""
    if order == 0:
        return jnp.ones_like(x), jnp.zeros_like(x)
    p_prev, p = jnp.ones_like(x), x
    d_prev, d = jnp.zeros_like(x), jnp.ones_like(x)
    for n in range(1, order):
        p_next = ((2 * n + 1) * x * p - n * p_prev) / (n + 1)
        d_next = d_prev + (2 * n + 1) * p
        p_prev, p, d_prev, d = p, p_next, d, d_next
    return p, d
