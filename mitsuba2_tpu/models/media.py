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
        has_tw = props is not None and props.has_property("to_world")
        self.to_local = (props.transform("to_world").inverse() if has_tw
                         else Transform.identity())
        self.identity_transform = not has_tw

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
        from .textures import _SpectrumData
        self._data = _SpectrumData(v)

    def eval(self, p, active=True, wavelengths=None):
        """p: world positions (..., 3) — volumes take raw points."""
        from ..variants import current
        var = current()
        if var.is_spectral and (wavelengths is None
                                or wavelengths.shape[-1] == 0):
            wavelengths = jnp.full(p.shape[:-1] + (var.n_channels,), 550.0,
                                   p.dtype)
        out = self._data.eval(None, wavelengths if var.is_spectral else None)
        return jnp.broadcast_to(out, p.shape[:-1] + out.shape[-1:])

    def eval_1(self, p, active=True):
        from ..core import spectrum as spec
        v = float(spec.luminance(jnp.asarray(self._rgb)))
        return jnp.full(p.shape[:-1], v, p.dtype)

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
    from ..core.dictio import ColorValue
    if isinstance(v, ColorValue) and v.kind == "rgb":
        return ConstantVolume(value=v.payload)
    if isinstance(v, ColorValue) and v.kind == "spectrum-uniform":
        return ConstantVolume(value=v.payload)
    if isinstance(v, (int, float, list, tuple, np.ndarray)):
        return ConstantVolume(value=v)
    if isinstance(v, dict):
        from ..core.dictio import load_dict
        return as_volume(load_dict(v))
    raise TypeError(f"cannot interpret {type(v)} as a volume")
