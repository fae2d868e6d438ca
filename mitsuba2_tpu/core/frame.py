"""Shading frame (reference: include/mitsuba/core/frame.h Frame3f).

A Frame is a pytree of three (..., 3) arrays forming an orthonormal basis with
``n`` the shading normal. All trig helpers assume directions are expressed in
local frame coordinates (z = n).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as m


class Frame(NamedTuple):
    s: jnp.ndarray  # tangent
    t: jnp.ndarray  # bitangent
    n: jnp.ndarray  # normal

    @staticmethod
    def from_normal(n) -> "Frame":
        s, t = m.coordinate_system(n)
        return Frame(s, t, n)

    def to_local(self, v):
        return m.vec3(m.dot(v, self.s), m.dot(v, self.t), m.dot(v, self.n))

    def to_world(self, v):
        return (self.s * v[..., 0:1] + self.t * v[..., 1:2]
                + self.n * v[..., 2:3])


# Local-frame trigonometry (frame.h:62-140)
def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return m.sqr(v[..., 2])


def sin_theta_2(v):
    return jnp.maximum(0.0, 1.0 - cos_theta_2(v))


def sin_theta(v):
    return m.safe_sqrt(sin_theta_2(v))


def tan_theta(v):
    return m.safe_div(sin_theta(v), cos_theta(v), 0.0)


def tan_theta_2(v):
    return m.safe_div(sin_theta_2(v), cos_theta_2(v), 0.0)


def sin_phi(v):
    s = sin_theta(v)
    return jnp.where(s == 0, 0.0, jnp.clip(m.safe_div(v[..., 1], s), -1.0, 1.0))


def cos_phi(v):
    s = sin_theta(v)
    return jnp.where(s == 0, 1.0, jnp.clip(m.safe_div(v[..., 0], s), -1.0, 1.0))


def sincos_phi_2(v):
    s2 = sin_theta_2(v)
    inv = m.safe_div(1.0, s2, 0.0)
    sin_phi2 = jnp.where(s2 <= 0, 0.0, jnp.clip(m.sqr(v[..., 1]) * inv, 0.0, 1.0))
    cos_phi2 = jnp.where(s2 <= 0, 1.0, jnp.clip(m.sqr(v[..., 0]) * inv, 0.0, 1.0))
    return sin_phi2, cos_phi2
