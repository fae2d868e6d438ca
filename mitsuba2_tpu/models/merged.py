"""Trace-time BSDF merging — the TPU replacement for Enoki's vectorized
vcall lane partitioning (reference include/mitsuba/render/bsdf.h:522-532,
SURVEY.md §2.4 "material-sorted queues").

A wavefront dispatch over K same-type BSDF instances costs K masked
sweeps; merging collapses them into ONE sweep whose parameters are
gathered per lane from a packed per-shape table (one one-hot matmul,
ops/gather.py). Sorting lanes by material would pay a ~4M-lane gather per
bounce for the same effect; parameter gathering moves that indirection
into the (already-required) shading math instead.

The merged instances read the ORIGINAL plugin objects' parameters at
trace time, so `traverse()`/autodiff keep addressing the per-shape
plugins, exactly like round 1's diffuse-only merge did.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bsdfs import (SmoothDiffuse, RoughConductor, SmoothDielectric,
                    SmoothPlastic, RoughPlastic)
from .textures import ConstantTexture
from ..render.bsdf import BSDF
from ..render.microfacet import MicrofacetDistribution


def _slot_at(shape_slot, si):
    from ..ops.gather import gather_rows
    slot_f = jnp.asarray(shape_slot, jnp.float32)[:, None]
    return gather_rows(slot_f, jnp.maximum(si.shape_idx, 0))[:, 0] \
        .astype(jnp.int32)


def _gather_scalars(values, shape_slot, si, dtype):
    """Per-lane scalar from a per-instance list (traced — values may be
    live autodiff parameters)."""
    from ..ops.gather import gather_rows
    tab = jnp.stack([jnp.reshape(jnp.asarray(v, dtype), ())
                     for v in values])[:, None]
    return gather_rows(tab, _slot_at(shape_slot, si))[:, 0]


def _const(*texs):
    return all(type(t) is ConstantTexture for t in texs)


def merge_signature(b):
    """Hashable group key for instances that can share one sweep, or
    None when the instance must keep its own masked evaluation."""
    if type(b) is SmoothDiffuse and type(b.reflectance) is ConstantTexture:
        return ("diffuse",)
    if type(b) is RoughConductor and _const(b.eta_tex, b.k_tex,
                                            b.specular_reflectance):
        return ("roughconductor", b.dist_type, b.sample_visible,
                bool(np.isclose(float(b.alpha_u), float(b.alpha_v))))
    if type(b) is SmoothDielectric and _const(b.specular_reflectance,
                                              b.specular_transmittance):
        return ("dielectric",)
    if type(b) is SmoothPlastic and _const(b.diffuse_reflectance,
                                           b.specular_reflectance):
        return ("plastic", b.nonlinear)
    if type(b) is RoughPlastic and _const(b.diffuse_reflectance,
                                          b.specular_reflectance):
        return ("roughplastic", b.dist_type, b.sample_visible, b.nonlinear)
    return None


class MergedRoughConductor(RoughConductor):
    """K rough conductors -> one sweep; alpha/eta/k/scale per lane."""

    def __init__(self, instances, shape_slot):
        from ..render.scene import _PerShapeTexture
        BSDF.__init__(self, None)
        b0 = instances[0]
        self.merged_instances = list(instances)
        self._shape_slot = np.asarray(shape_slot)
        self.dist_type = b0.dist_type
        self.sample_visible = b0.sample_visible
        self.alpha_u = b0.alpha_u            # representative (flags only)
        self.alpha_v = b0.alpha_v
        self.eta_tex = _PerShapeTexture(
            [b.eta_tex for b in instances], shape_slot)
        self.k_tex = _PerShapeTexture(
            [b.k_tex for b in instances], shape_slot)
        self.specular_reflectance = _PerShapeTexture(
            [b.specular_reflectance for b in instances], shape_slot)
        self.m_components = list(b0.m_components)
        self.m_flags = b0.m_flags

    def _distr(self, si):
        dtype = si.t.dtype
        au = _gather_scalars([b.alpha_u for b in self.merged_instances],
                             self._shape_slot, si, dtype)
        av = _gather_scalars([b.alpha_v for b in self.merged_instances],
                             self._shape_slot, si, dtype)
        return MicrofacetDistribution(self.dist_type, au, av,
                                      self.sample_visible)


class MergedSmoothDielectric(SmoothDielectric):
    """K smooth dielectrics -> one sweep; eta per lane."""

    def __init__(self, instances, shape_slot):
        from ..render.scene import _PerShapeTexture
        BSDF.__init__(self, None)
        b0 = instances[0]
        self.merged_instances = list(instances)
        self._shape_slot = np.asarray(shape_slot)
        self.eta = b0.eta                    # representative scalar
        self.specular_reflectance = _PerShapeTexture(
            [b.specular_reflectance for b in instances], shape_slot)
        self.specular_transmittance = _PerShapeTexture(
            [b.specular_transmittance for b in instances], shape_slot)
        self.m_components = list(b0.m_components)
        self.m_flags = b0.m_flags

    def _eta_at(self, si):
        return _gather_scalars([b.eta for b in self.merged_instances],
                               self._shape_slot, si, si.t.dtype)


def build_merged(sig, instances, shape_slot):
    kind = sig[0]
    if kind == "diffuse":
        from ..render.scene import _PerShapeTexture
        merged = SmoothDiffuse()
        merged.reflectance = _PerShapeTexture(
            [b.reflectance for b in instances], shape_slot)
        merged.merged_instances = list(instances)
        return merged
    if kind == "roughconductor":
        return MergedRoughConductor(instances, shape_slot)
    if kind == "dielectric":
        return MergedSmoothDielectric(instances, shape_slot)
    if kind == "plastic":
        return MergedSmoothPlastic(instances, shape_slot)
    if kind == "roughplastic":
        return MergedRoughPlastic(instances, shape_slot)
    raise ValueError(f"unknown merge signature {sig!r}")


class MergedSmoothPlastic(SmoothPlastic):
    """K smooth plastics -> one sweep; eta / sampling weight / fdr /
    inv_eta^2 per lane (nonlinear is part of the group key)."""

    def __init__(self, instances, shape_slot):
        from ..render.scene import _PerShapeTexture
        BSDF.__init__(self, None)
        b0 = instances[0]
        self.merged_instances = list(instances)
        self._shape_slot = np.asarray(shape_slot)
        self.nonlinear = b0.nonlinear
        self.eta = b0.eta
        self.fdr_int = b0.fdr_int
        self.inv_eta_2 = b0.inv_eta_2
        self.specular_sampling_weight = b0.specular_sampling_weight
        self.diffuse_reflectance = _PerShapeTexture(
            [b.diffuse_reflectance for b in instances], shape_slot)
        self.specular_reflectance = _PerShapeTexture(
            [b.specular_reflectance for b in instances], shape_slot)
        self.m_components = list(b0.m_components)
        self.m_flags = b0.m_flags

    def _params_at(self, si):
        g = lambda vals: _gather_scalars(vals, self._shape_slot, si,
                                         si.t.dtype)
        insts = self.merged_instances
        return (g([b.eta for b in insts]),
                g([b.specular_sampling_weight for b in insts]),
                g([b.fdr_int for b in insts]),
                g([b.inv_eta_2 for b in insts]))


class MergedRoughPlastic(RoughPlastic):
    def __init__(self, instances, shape_slot):
        from ..render.scene import _PerShapeTexture
        BSDF.__init__(self, None)
        b0 = instances[0]
        self.merged_instances = list(instances)
        self._shape_slot = np.asarray(shape_slot)
        self.nonlinear = b0.nonlinear
        self.eta = b0.eta
        self.fdr_int = b0.fdr_int
        self.inv_eta_2 = b0.inv_eta_2
        self.specular_sampling_weight = b0.specular_sampling_weight
        self.dist_type = b0.dist_type
        self.sample_visible = b0.sample_visible
        self.alpha_u = b0.alpha_u
        self.alpha_v = b0.alpha_v
        self.diffuse_reflectance = _PerShapeTexture(
            [b.diffuse_reflectance for b in instances], shape_slot)
        self.specular_reflectance = _PerShapeTexture(
            [b.specular_reflectance for b in instances], shape_slot)
        self.m_components = list(b0.m_components)
        self.m_flags = b0.m_flags

    def _distr(self, si):
        dtype = si.t.dtype
        au = _gather_scalars([b.alpha_u for b in self.merged_instances],
                             self._shape_slot, si, dtype)
        av = _gather_scalars([b.alpha_v for b in self.merged_instances],
                             self._shape_slot, si, dtype)
        return MicrofacetDistribution(self.dist_type, au, av,
                                      self.sample_visible)

    def _params_at(self, si):
        g = lambda vals: _gather_scalars(vals, self._shape_slot, si,
                                         si.t.dtype)
        insts = self.merged_instances
        return (g([b.eta for b in insts]),
                g([b.specular_sampling_weight for b in insts]),
                g([b.fdr_int for b in insts]),
                g([b.inv_eta_2 for b in insts]))
