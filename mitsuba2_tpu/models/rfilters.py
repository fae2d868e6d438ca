"""Reconstruction filters (reference: src/rfilters/{box,tent,gaussian,
mitchell,catmullrom,lanczos}.cpp + core/rfilter.h).

The reference discretizes filters into a lookup table (rfilter.h); here eval
is computed directly on the VPU (cheaper than a gather)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.object import Object, register_plugin
from ..core import math as m


class ReconstructionFilter(Object):
    radius: float = 1.0

    def __init__(self, props=None):
        super().__init__(props)

    def eval(self, x):
        raise NotImplementedError


@register_plugin("rfilter", "box")
class BoxFilter(ReconstructionFilter):
    """(box.cpp) radius 0.5."""

    def __init__(self, props=None):
        super().__init__(props)
        self.radius = 0.5

    def eval(self, x):
        return jnp.where(jnp.abs(x) <= 0.5, 1.0, 0.0)


@register_plugin("rfilter", "tent")
class TentFilter(ReconstructionFilter):
    def __init__(self, props=None):
        super().__init__(props)
        self.radius = float(props.float_("radius", 1.0)) if props else 1.0

    def eval(self, x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(x / self.radius))


@register_plugin("rfilter", "gaussian")
class GaussianFilter(ReconstructionFilter):
    """(gaussian.cpp) truncated gaussian, stddev 0.5, radius 2."""

    def __init__(self, props=None):
        super().__init__(props)
        self.stddev = float(props.float_("stddev", 0.5)) if props else 0.5
        self.radius = 4.0 * self.stddev
        alpha = -1.0 / (2.0 * self.stddev ** 2)
        self.alpha = alpha
        self.bias = float(jnp.exp(alpha * self.radius ** 2))

    def eval(self, x):
        v = jnp.exp(self.alpha * x * x) - self.bias
        return jnp.maximum(0.0, v)


class _Mitchell(ReconstructionFilter):
    B: float = 1.0 / 3.0
    C: float = 1.0 / 3.0

    def __init__(self, props=None):
        super().__init__(props)
        if props is not None:
            self.B = float(props.float_("B", type(self).B))
            self.C = float(props.float_("C", type(self).C))
        self.radius = 2.0

    def eval(self, x):
        x = jnp.abs(x)
        x2 = x * x
        x3 = x2 * x
        B, C = self.B, self.C
        inner = ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2
                 + (6 - 2 * B)) * (1.0 / 6.0)
        outer = ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2
                 + (-12 * B - 48 * C) * x + (8 * B + 24 * C)) * (1.0 / 6.0)
        return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))


@register_plugin("rfilter", "mitchell")
class MitchellFilter(_Mitchell):
    """(mitchell.cpp) B = C = 1/3."""


@register_plugin("rfilter", "catmullrom")
class CatmullRomFilter(_Mitchell):
    """(catmullrom.cpp) Mitchell with B=0, C=0.5."""
    B = 0.0
    C = 0.5


@register_plugin("rfilter", "lanczos")
class LanczosFilter(ReconstructionFilter):
    """(lanczos.cpp) windowed sinc, default 3 lobes."""

    def __init__(self, props=None):
        super().__init__(props)
        self.lobes = int(props.int_("lobes", 3)) if props else 3
        self.radius = float(self.lobes)

    def eval(self, x):
        def sinc(v):
            v = jnp.abs(v) * m.Pi
            return jnp.where(v < 1e-5, 1.0, jnp.sin(v) / jnp.where(v == 0, 1.0, v))
        ax = jnp.abs(x)
        return jnp.where(ax < self.radius,
                         sinc(x) * sinc(x / self.lobes), 0.0)
