"""Participating media + volume data sources (reference: src/media/
{homogeneous,heterogeneous}.cpp, include/mitsuba/render/medium.h:11,
texture.h:210 Volume, src/textures/{constant3d,grid3d}.cpp).

Round-1 tier: base classes + constant3d volume; the medium transport
(delta/ratio tracking) lands with the volumetric milestone (SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import Object, register_plugin
from ..variants import current as current_variant


class Volume(Object):
    """3D texture base (texture.h:210-225)."""

    def __init__(self, props=None):
        super().__init__(props)
        from ..core.transform import Transform
        self.to_local = (props.transform("to_world", Transform.identity())
                         .inverse()) if props else Transform.identity()

    def eval(self, it, active=True):
        raise NotImplementedError

    def eval_1(self, it, active=True):
        raise NotImplementedError

    def max(self) -> float:
        raise NotImplementedError


@register_plugin("volume", "constant3d")
class ConstantVolume(Volume):
    """(constant3d.cpp) constant value everywhere."""

    def __init__(self, props=None, value=None):
        super().__init__(props)
        if props is not None:
            value = props.get("value", 1.0)
        v = np.asarray(value, np.float32)
        if v.ndim == 0:
            v = np.broadcast_to(v, (3,)).copy()
        self._rgb = v
        from .textures import ConstantTexture
        self._tex = ConstantTexture(color=v)

    def eval(self, it, active=True):
        return self._tex.eval(it, active)

    def eval_1(self, it, active=True):
        return self._tex.eval_1(it, active)

    def max(self):
        return float(self._rgb.max())


class Medium(Object):
    """Medium base (medium.h:11). Interface: intersect_aabb,
    get_combined_extinction (majorant), get_scattering_coefficients,
    sample_interaction, eval_tr_and_pdf — implemented with the volumetric
    transport milestone."""

    def __init__(self, props=None):
        super().__init__(props)
        self.phase_function = None
        if props is not None:
            for _, obj in props.objects():
                if getattr(obj, "plugin_category", "") == "phase":
                    self.phase_function = obj


def as_volume(v) -> Volume:
    if isinstance(v, Volume):
        return v
    if isinstance(v, (int, float, list, tuple, np.ndarray)):
        return ConstantVolume(value=v)
    raise TypeError(f"cannot interpret {type(v)} as a volume")
