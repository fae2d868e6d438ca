"""BSDF plugins (reference: src/bsdfs/ — SURVEY.md §2.3).

This module grows toward the full reference surface; the diffuse/null/
twosided tier lands with the end-to-end slice, the microfacet families in the
breadth milestone.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core import warp
from ..core.frame import cos_theta
from ..render.bsdf import BSDF, BSDFFlags, BSDFContext, zero_bsdf_sample
from ..render.records import BSDFSample


@register_plugin("bsdf", "diffuse")
class SmoothDiffuse(BSDF):
    """Lambertian reflection (diffuse.cpp:1-156): cosine-hemisphere sampling,
    eval = albedo * cos(theta_o) / pi."""

    def __init__(self, props=None):
        super().__init__(props)
        self.reflectance = props.texture("reflectance", 0.5) if props \
            else None
        if self.reflectance is None:
            from .textures import ConstantTexture
            self.reflectance = ConstantTexture(color=0.5)
        self.m_components = [BSDFFlags.DiffuseReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0]

    def sample(self, ctx, si, sample1, sample2, active):
        cos_i = cos_theta(si.wi)
        active = active & (cos_i > 0)
        wo = warp.square_to_cosine_hemisphere(sample2)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        bs = BSDFSample(
            wo=wo, pdf=pdf,
            eta=jnp.ones_like(pdf),
            sampled_type=jnp.full(pdf.shape,
                                  int(BSDFFlags.DiffuseReflection), jnp.uint32),
            sampled_component=jnp.zeros(pdf.shape, jnp.int32))
        # value/pdf * cos = albedo (perfect importance sampling)
        value = self.reflectance.eval(si, active)
        ok = active & (pdf > 0) & ctx.is_enabled(BSDFFlags.DiffuseReflection)
        value = jnp.where(ok[..., None], value, 0.0)
        bs = bs._replace(pdf=jnp.where(ok, bs.pdf, 0.0))
        return bs, value

    def eval(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = active & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.DiffuseReflection)
        value = self.reflectance.eval(si, active) * (m.InvPi * cos_o)[..., None]
        return jnp.where(ok[..., None], value, 0.0)

    def pdf(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = active & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.DiffuseReflection)
        return jnp.where(ok, cos_o * m.InvPi, 0.0)

    def traverse(self, cb):
        cb.put_object("reflectance", self.reflectance)


@register_plugin("bsdf", "null")
class NullBSDF(BSDF):
    """Pass-through material for medium boundaries (null.cpp)."""

    def __init__(self, props=None):
        super().__init__(props)
        self.m_components = [BSDFFlags.Null | BSDFFlags.FrontSide
                             | BSDFFlags.BackSide]
        self.m_flags = self.m_components[0]

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        bs = zero_bsdf_sample(n, si.t.dtype)
        ok = active & ctx.is_enabled(BSDFFlags.Null)
        bs = bs._replace(
            wo=-si.wi,
            pdf=jnp.where(ok, 1.0, 0.0),
            sampled_type=jnp.full((n,), int(BSDFFlags.Null), jnp.uint32))
        from ..variants import current
        value = jnp.where(ok[..., None],
                          jnp.ones((n, current().n_channels), si.t.dtype), 0.0)
        return bs, value

    def eval(self, ctx, si, wo, active):
        from ..variants import current
        n = si.t.shape[0]
        return jnp.zeros((n, current().n_channels), si.t.dtype)

    def pdf(self, ctx, si, wo, active):
        return jnp.zeros(si.t.shape, si.t.dtype)

    def eval_null_transmission(self, si, active):
        from ..variants import current
        n = si.t.shape[0]
        return jnp.where(jnp.asarray(active)[..., None],
                         jnp.ones((n, current().n_channels), si.t.dtype), 0.0)
