"""Phase functions (reference: src/phase/{isotropic,hg}.cpp,
include/mitsuba/render/phase.h:85)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.object import Object, register_plugin
from ..core import math as m
from ..core import warp


class PhaseFunction(Object):
    """Base (phase.h:85): sample(ctx, mi, sample2) -> (wo, pdf); eval."""

    def sample(self, mi, sample2, active=True):
        raise NotImplementedError

    def eval(self, mi, wo, active=True):
        raise NotImplementedError


@register_plugin("phase", "isotropic")
class IsotropicPhase(PhaseFunction):
    """(isotropic.cpp) uniform sphere."""

    def sample(self, mi, sample2, active=True):
        wo = warp.square_to_uniform_sphere(sample2)
        pdf = jnp.full(wo.shape[:-1], m.InvFourPi, wo.dtype)
        return wo, pdf

    def eval(self, mi, wo, active=True):
        return jnp.full(wo.shape[:-1], m.InvFourPi, wo.dtype)


@register_plugin("phase", "hg")
class HGPhase(PhaseFunction):
    """(hg.cpp) Henyey-Greenstein, anisotropy g in (-1, 1).

    Directions follow the reference convention: wo measured such that the
    density around the *forward* continuation of the incident ray grows with
    g > 0; mi.wi = -ray.d in WORLD coordinates (medium.cpp:46) and wo is a
    world direction — eval dots the two directly (hg.cpp:71)."""

    def __init__(self, props=None):
        super().__init__(props)
        self.g = float(props.float_("g", 0.8)) if props else 0.8

    def sample(self, mi, sample2, active=True):
        g = self.g
        if abs(g) < 1e-3:
            wo = warp.square_to_uniform_sphere(sample2)
            return wo, self.eval(mi, wo, active)
        sqr_term = (1 - g * g) / (1 - g + 2 * g * sample2[..., 0])
        cos_theta = (1 + g * g - sqr_term * sqr_term) / (2 * g)
        sin_theta = m.safe_sqrt(1.0 - cos_theta ** 2)
        phi = 2 * m.Pi * sample2[..., 1]
        wo_local = m.vec3(sin_theta * jnp.cos(phi),
                          sin_theta * jnp.sin(phi), cos_theta)
        # rotate around -wi (forward scattering axis)
        from ..core.frame import Frame
        frame = Frame.from_normal(-mi.wi)
        wo = frame.to_world(wo_local)
        return wo, self.eval(mi, wo, active)

    def eval(self, mi, wo, active=True):
        g = self.g
        temp = 1.0 + g * g + 2.0 * g * m.dot(mi.wi, wo)
        return m.InvFourPi * (1 - g * g) \
            / jnp.maximum(temp * m.safe_sqrt(temp), 1e-8)
