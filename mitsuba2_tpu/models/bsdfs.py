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
        ok = jnp.broadcast_to(jnp.asarray(active), (n,)) \
            & ctx.is_enabled(BSDFFlags.Null)
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


# =============================================================================
# Smooth dielectrics (dielectric.cpp:1-351, thindielectric.cpp:1-207)
# =============================================================================

from ..render import fresnel as fr_mod
from ..render.fresnel import (fresnel, fresnel_conductor, reflect, refract,
                              lookup_ior, lookup_conductor_ior,
                              fresnel_diffuse_reflectance)
from ..render.microfacet import MicrofacetDistribution, GGX, BECKMANN
from ..core.frame import Frame


def _nch():
    from ..variants import current
    return current().n_channels


def _spectral_ior(tex, curve=None):
    """In spectral variants, rgb-valued conductor eta/k constants become
    anchored-quadratic IOR curves (ConductorIORSpectrum): the sigmoid
    reflectance upsampling is bounded to [0, 1] and silently clipped
    k > 1, breaking every metal (roughconductor.cpp:306-430 evaluates
    unbounded complex IOR spectra). Named materials with full tabulated
    curves (fresnel.CONDUCTOR_IOR_CURVES) fit over the whole hero range
    instead of flat-clamping outside the sRGB anchors. Spectra the user
    supplied directly (regular/irregular curves) pass through."""
    from ..variants import current
    if not current().is_spectral:
        return tex
    rgb = getattr(tex, "_rgb_np", None)
    if rgb is None:
        return tex
    from .spectra import ConductorIORSpectrum
    return ConductorIORSpectrum(rgb, curve=curve)


def _spec(value, n, dtype=jnp.float32):
    return jnp.broadcast_to(jnp.asarray(value, dtype), (n, _nch()))


class SmoothDielectric(BSDF):
    """(dielectric.cpp) perfectly smooth dielectric interface; two delta
    lobes selected by the Fresnel term."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        int_ior = lookup_ior(p.get("int_ior", "bk7")) if p else 1.5046
        ext_ior = lookup_ior(p.get("ext_ior", "air")) if p else 1.000277
        self.eta = int_ior / ext_ior
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else None
        self.specular_transmittance = p.texture("specular_transmittance",
                                                1.0) if p else None
        if self.specular_reflectance is None:
            from .textures import ConstantTexture
            self.specular_reflectance = ConstantTexture(color=1.0)
            self.specular_transmittance = ConstantTexture(color=1.0)
        self.m_components = [
            BSDFFlags.DeltaReflection | BSDFFlags.FrontSide
            | BSDFFlags.BackSide,
            BSDFFlags.DeltaTransmission | BSDFFlags.FrontSide
            | BSDFFlags.BackSide | BSDFFlags.NonSymmetric]
        self.m_flags = self.m_components[0] | self.m_components[1]

    def _eta_at(self, si):
        """Relative IOR per lane (overridden by the merged variant)."""
        return self.eta

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        F, cos_t, eta_it, eta_ti = fresnel(cos_i, self._eta_at(si))
        has_r = ctx.is_enabled(BSDFFlags.DeltaReflection, 0)
        has_t = ctx.is_enabled(BSDFFlags.DeltaTransmission, 1)
        # lobe selection
        if has_r and has_t:
            select_r = sample1 <= F
            pdf = jnp.where(select_r, F, 1.0 - F)
            weight = jnp.ones((n,), si.t.dtype)
        elif has_r:
            select_r = jnp.ones((n,), bool)
            pdf = jnp.ones((n,), si.t.dtype)
            weight = F
        elif has_t:
            select_r = jnp.zeros((n,), bool)
            pdf = jnp.ones((n,), si.t.dtype)
            weight = 1.0 - F
        else:
            return zero_bsdf_sample(n, si.t.dtype), \
                jnp.zeros((n, _nch()), si.t.dtype)
        wo = jnp.where(select_r[..., None], reflect(si.wi),
                       refract(si.wi, cos_t, eta_ti))
        # radiance-transport solid angle compression (dielectric.cpp)
        if ctx.mode == 0:  # Radiance
            factor = jnp.where(select_r, 1.0, eta_ti)
        else:
            factor = jnp.ones_like(F)
        refl = self.specular_reflectance.eval(si, active)
        trans = self.specular_transmittance.eval(si, active)
        value = jnp.where(select_r[..., None], refl, trans) \
            * (weight * factor * factor)[..., None]
        ok = jnp.asarray(active) & (pdf > 0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.where(select_r, 1.0, eta_it),
            sampled_type=jnp.where(
                select_r, jnp.uint32(int(BSDFFlags.DeltaReflection)),
                jnp.uint32(int(BSDFFlags.DeltaTransmission))),
            sampled_component=jnp.where(select_r, 0, 1).astype(jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        return jnp.zeros((si.t.shape[0], _nch()), si.t.dtype)

    def pdf(self, ctx, si, wo, active):
        return jnp.zeros(si.t.shape, si.t.dtype)

    def traverse(self, cb):
        cb.put_parameter("eta", self.eta)
        cb.put_object("specular_reflectance", self.specular_reflectance)
        cb.put_object("specular_transmittance", self.specular_transmittance)


register_plugin("bsdf", "dielectric")(SmoothDielectric)


class ThinDielectric(BSDF):
    """(thindielectric.cpp) thin dielectric slab: transmission leaves the
    direction unchanged; reflectance accounts for internal bounces
    R' = 2F/(1+F)."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        int_ior = lookup_ior(p.get("int_ior", "bk7")) if p else 1.5046
        ext_ior = lookup_ior(p.get("ext_ior", "air")) if p else 1.000277
        self.eta = int_ior / ext_ior
        from .textures import ConstantTexture
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.specular_transmittance = p.texture(
            "specular_transmittance", 1.0) if p else ConstantTexture(color=1.0)
        self.m_components = [
            BSDFFlags.DeltaReflection | BSDFFlags.FrontSide
            | BSDFFlags.BackSide,
            BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide]
        self.m_flags = self.m_components[0] | self.m_components[1]

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        F, _, _, _ = fresnel(jnp.abs(cos_theta(si.wi)), self.eta)
        # account for internal reflections: R' = 2F/(1+F) (thindielectric.cpp)
        F = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
        has_r = ctx.is_enabled(BSDFFlags.DeltaReflection, 0)
        has_t = ctx.is_enabled(BSDFFlags.Null, 1)
        if has_r and has_t:
            select_r = sample1 <= F
            pdf = jnp.where(select_r, F, 1.0 - F)
            weight = jnp.ones((n,), si.t.dtype)
        elif has_r:
            select_r = jnp.ones((n,), bool)
            pdf = jnp.ones((n,), si.t.dtype)
            weight = F
        elif has_t:
            select_r = jnp.zeros((n,), bool)
            pdf = jnp.ones((n,), si.t.dtype)
            weight = 1.0 - F
        else:
            return zero_bsdf_sample(n, si.t.dtype), \
                jnp.zeros((n, _nch()), si.t.dtype)
        wo = jnp.where(select_r[..., None], reflect(si.wi), -si.wi)
        refl = self.specular_reflectance.eval(si, active)
        trans = self.specular_transmittance.eval(si, active)
        value = jnp.where(select_r[..., None], refl, trans) \
            * weight[..., None]
        ok = jnp.asarray(active) & (pdf > 0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.where(
                select_r, jnp.uint32(int(BSDFFlags.DeltaReflection)),
                jnp.uint32(int(BSDFFlags.Null))),
            sampled_component=jnp.where(select_r, 0, 1).astype(jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        return jnp.zeros((si.t.shape[0], _nch()), si.t.dtype)

    def pdf(self, ctx, si, wo, active):
        return jnp.zeros(si.t.shape, si.t.dtype)

    def eval_null_transmission(self, si, active):
        F, _, _, _ = fresnel(jnp.abs(cos_theta(si.wi)), self.eta)
        F = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
        trans = self.specular_transmittance.eval(si, active)
        return trans * (1.0 - F)[..., None]


register_plugin("bsdf", "thindielectric")(ThinDielectric)


# =============================================================================
# Conductors (conductor.cpp:1-306, roughconductor.cpp:1-430)
# =============================================================================

class SmoothConductor(BSDF):
    """(conductor.cpp) delta reflection with complex-IOR Fresnel."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        material = p.string("material", "none") if p else "none"
        from .textures import ConstantTexture, as_texture
        if p is not None and (p.has_property("eta") or p.has_property("k")):
            self.eta_tex = p.texture("eta", 0.0)
            self.k_tex = p.texture("k", 1.0)
            self.eta_tex = _spectral_ior(self.eta_tex)
            self.k_tex = _spectral_ior(self.k_tex)
        else:
            eta_rgb, k_rgb = lookup_conductor_ior(material)
            self.eta_tex = as_texture(list(eta_rgb))
            self.k_tex = as_texture(list(k_rgb))
            from ..render.fresnel import lookup_conductor_curves
            curves = lookup_conductor_curves(material)
            e_cv = (curves[0], curves[1]) if curves else None
            k_cv = (curves[0], curves[2]) if curves else None
            self.eta_tex = _spectral_ior(self.eta_tex, curve=e_cv)
            self.k_tex = _spectral_ior(self.k_tex, curve=k_cv)
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.m_components = [BSDFFlags.DeltaReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0]

    def _fresnel_spec(self, si, cos_i, active):
        eta = self.eta_tex.eval(si, active)
        k = self.k_tex.eval(si, active)
        return fresnel_conductor(cos_i[..., None], eta, k)

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        ok = jnp.asarray(active) & (cos_i > 0) \
            & ctx.is_enabled(BSDFFlags.DeltaReflection)
        wo = reflect(si.wi)
        F = self._fresnel_spec(si, cos_i, active)
        value = self.specular_reflectance.eval(si, active) * F
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, 1.0, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.full((n,), int(BSDFFlags.DeltaReflection),
                                  jnp.uint32),
            sampled_component=jnp.zeros((n,), jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        return jnp.zeros((si.t.shape[0], _nch()), si.t.dtype)

    def pdf(self, ctx, si, wo, active):
        return jnp.zeros(si.t.shape, si.t.dtype)

    def traverse(self, cb):
        cb.put_object("eta", self.eta_tex)
        cb.put_object("k", self.k_tex)
        cb.put_object("specular_reflectance", self.specular_reflectance)


register_plugin("bsdf", "conductor")(SmoothConductor)


def _microfacet_from_props(p):
    dist = (p.string("distribution", "beckmann") if p else "beckmann")
    if dist not in (GGX, BECKMANN):
        raise ValueError(f"unknown microfacet distribution {dist!r}")
    if p is not None and (p.has_property("alpha_u")
                          or p.has_property("alpha_v")):
        au = p.float_("alpha_u")
        av = p.float_("alpha_v")
    else:
        au = av = p.float_("alpha", 0.1) if p else 0.1
    sv = p.bool_("sample_visible", True) if p else True
    return dist, float(au), float(av), sv


class RoughConductor(BSDF):
    """(roughconductor.cpp) microfacet conductor with visible-normal
    sampling."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        material = p.string("material", "none") if p else "none"
        from .textures import ConstantTexture, as_texture
        if p is not None and (p.has_property("eta") or p.has_property("k")):
            self.eta_tex = p.texture("eta", 0.0)
            self.k_tex = p.texture("k", 1.0)
            self.eta_tex = _spectral_ior(self.eta_tex)
            self.k_tex = _spectral_ior(self.k_tex)
        else:
            eta_rgb, k_rgb = lookup_conductor_ior(material)
            self.eta_tex = as_texture(list(eta_rgb))
            self.k_tex = as_texture(list(k_rgb))
            from ..render.fresnel import lookup_conductor_curves
            curves = lookup_conductor_curves(material)
            e_cv = (curves[0], curves[1]) if curves else None
            k_cv = (curves[0], curves[2]) if curves else None
            self.eta_tex = _spectral_ior(self.eta_tex, curve=e_cv)
            self.k_tex = _spectral_ior(self.k_tex, curve=k_cv)
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.dist_type, self.alpha_u, self.alpha_v, self.sample_visible = \
            _microfacet_from_props(p)
        flags = BSDFFlags.GlossyReflection | BSDFFlags.FrontSide
        if self.alpha_u != self.alpha_v:
            flags |= BSDFFlags.Anisotropic
        self.m_components = [flags]
        self.m_flags = flags

    def _distr(self, si):
        dtype = si.t.dtype
        return MicrofacetDistribution(
            self.dist_type, jnp.asarray(self.alpha_u, dtype),
            jnp.asarray(self.alpha_v, dtype), self.sample_visible)

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        ok = jnp.asarray(active) & (cos_i > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        d = self._distr(si)
        mh, pdf_m = d.sample(si.wi, sample2)
        wo = reflect(si.wi, mh)
        pdf = m.safe_div(pdf_m, 4.0 * m.dot(wo, mh), 0.0)
        ok = ok & (cos_theta(wo) > 0) & (pdf > 0)
        # weight = value/pdf
        if self.sample_visible:
            weight = d.smith_g1(wo, mh)
        else:
            weight = m.safe_div(d.eval(mh) * d.G(si.wi, wo, mh),
                                4.0 * pdf * cos_i, 0.0)
        eta = self.eta_tex.eval(si, active)
        k = self.k_tex.eval(si, active)
        F = fresnel_conductor(m.dot(si.wi, mh)[..., None], eta, k)
        value = self.specular_reflectance.eval(si, active) * F \
            * weight[..., None]
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.full((n,), int(BSDFFlags.GlossyReflection),
                                  jnp.uint32),
            sampled_component=jnp.zeros((n,), jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        d = self._distr(si)
        mh = m.normalize(si.wi + wo)
        D = d.eval(mh)
        G = d.G(si.wi, wo, mh)
        eta = self.eta_tex.eval(si, active)
        k = self.k_tex.eval(si, active)
        F = fresnel_conductor(m.dot(si.wi, mh)[..., None], eta, k)
        value = self.specular_reflectance.eval(si, active) * F \
            * m.safe_div(D * G, 4.0 * cos_i, 0.0)[..., None]
        return jnp.where(ok[..., None], value, 0.0)

    def pdf(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        d = self._distr(si)
        mh = m.normalize(si.wi + wo)
        pdf = m.safe_div(d.pdf(si.wi, mh), 4.0 * m.dot(wo, mh), 0.0)
        return jnp.where(ok, pdf, 0.0)

    def traverse(self, cb):
        cb.put_parameter("alpha_u", self.alpha_u)
        cb.put_parameter("alpha_v", self.alpha_v)
        cb.put_object("eta", self.eta_tex)
        cb.put_object("k", self.k_tex)


register_plugin("bsdf", "roughconductor")(RoughConductor)


# =============================================================================
# Rough dielectric (roughdielectric.cpp:1-503, Walter et al. 2007)
# =============================================================================

class RoughDielectric(BSDF):
    """(roughdielectric.cpp) microfacet dielectric: glossy reflection +
    refraction with visible-normal sampling."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        int_ior = lookup_ior(p.get("int_ior", "bk7")) if p else 1.5046
        ext_ior = lookup_ior(p.get("ext_ior", "air")) if p else 1.000277
        self.eta = int_ior / ext_ior
        self.inv_eta = 1.0 / self.eta
        from .textures import ConstantTexture
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.specular_transmittance = p.texture(
            "specular_transmittance", 1.0) if p else ConstantTexture(color=1.0)
        self.dist_type, self.alpha_u, self.alpha_v, self.sample_visible = \
            _microfacet_from_props(p)
        f = (BSDFFlags.GlossyReflection | BSDFFlags.FrontSide
             | BSDFFlags.BackSide)
        ft = (BSDFFlags.GlossyTransmission | BSDFFlags.FrontSide
              | BSDFFlags.BackSide | BSDFFlags.NonSymmetric)
        if self.alpha_u != self.alpha_v:
            f |= BSDFFlags.Anisotropic
            ft |= BSDFFlags.Anisotropic
        self.m_components = [f, ft]
        self.m_flags = f | ft

    def _distr(self, si):
        dtype = si.t.dtype
        return MicrofacetDistribution(
            self.dist_type, jnp.asarray(self.alpha_u, dtype),
            jnp.asarray(self.alpha_v, dtype), self.sample_visible)

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        d = self._distr(si)
        # flip wi to the +z hemisphere for sampling (roughdielectric.cpp)
        wi_p = m.mulsign(si.wi, cos_i[..., None])
        mh, pdf_m = d.sample(wi_p, sample2)
        F, cos_t, eta_it, eta_ti = fresnel(m.dot(si.wi, mh), self.eta)
        has_r = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_t = ctx.is_enabled(BSDFFlags.GlossyTransmission, 1)
        if has_r and has_t:
            select_r = sample1 <= F
            lobe_pdf = jnp.where(select_r, F, 1.0 - F)
            weight = jnp.ones((n,), si.t.dtype)
        elif has_r:
            select_r = jnp.ones((n,), bool)
            lobe_pdf = jnp.ones((n,), si.t.dtype)
            weight = F
        elif has_t:
            select_r = jnp.zeros((n,), bool)
            lobe_pdf = jnp.ones((n,), si.t.dtype)
            weight = 1.0 - F
        else:
            return zero_bsdf_sample(n, si.t.dtype), \
                jnp.zeros((n, _nch()), si.t.dtype)
        wo_r = reflect(si.wi, mh)
        wo_t = refract(si.wi, cos_t, eta_ti, mh)
        wo = jnp.where(select_r[..., None], wo_r, wo_t)
        cos_o = cos_theta(wo)
        # sidedness: reflection stays, transmission crosses
        side_ok = jnp.where(select_r, cos_i * cos_o > 0, cos_i * cos_o < 0)
        # jacobians dm/dwo
        dwh_dwo_r = m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo, mh)), 0.0)
        sqrt_denom = m.dot(si.wi, mh) + eta_it * m.dot(wo, mh)
        dwh_dwo_t = m.safe_div(m.sqr(eta_it) * jnp.abs(m.dot(wo, mh)),
                               m.sqr(sqrt_denom), 0.0)
        pdf = pdf_m * lobe_pdf * jnp.where(select_r, dwh_dwo_r, dwh_dwo_t)
        ok = jnp.asarray(active) & side_ok & (pdf > 0) & (pdf_m > 0)
        if self.sample_visible:
            wo_p = m.mulsign(wo, cos_o[..., None])
            weight = weight * d.smith_g1(wo_p, mh)
        else:
            wi_pp = wi_p
            wo_p = m.mulsign(wo, cos_o[..., None])
            weight = weight * m.safe_div(
                d.eval(mh) * d.G(wi_pp, wo_p, mh) * jnp.abs(m.dot(si.wi, mh)),
                pdf_m * jnp.abs(cos_i), 0.0)
        # radiance transport compression for refraction
        if ctx.mode == 0:
            factor = jnp.where(select_r, 1.0, eta_ti)
        else:
            factor = jnp.ones_like(F)
        refl = self.specular_reflectance.eval(si, active)
        trans = self.specular_transmittance.eval(si, active)
        value = jnp.where(select_r[..., None], refl, trans) \
            * (weight * factor * factor)[..., None]
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.where(select_r, 1.0, eta_it),
            sampled_type=jnp.where(
                select_r, jnp.uint32(int(BSDFFlags.GlossyReflection)),
                jnp.uint32(int(BSDFFlags.GlossyTransmission))),
            sampled_component=jnp.where(select_r, 0, 1).astype(jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        reflecting = cos_i * cos_o > 0
        eta_l = jnp.where(cos_i > 0, self.eta, self.inv_eta)
        m_r = m.normalize(si.wi + wo)
        m_t = m.normalize(si.wi + wo * eta_l[..., None])
        mh = jnp.where(reflecting[..., None], m_r, m_t)
        # canonical orientation: micro-normal on the +z side
        mh = m.mulsign(mh, cos_theta(mh)[..., None])
        d = self._distr(si)
        wi_p = m.mulsign(si.wi, cos_i[..., None])
        wo_p = m.mulsign(wo, cos_o[..., None])
        D = d.eval(mh)
        G = d.smith_g1(wi_p, mh) * d.smith_g1(wo_p, mh)
        F, _, eta_it, eta_ti = fresnel(m.dot(si.wi, mh), self.eta)
        # reflection
        val_r = m.safe_div(F * D * G, 4.0 * jnp.abs(cos_i), 0.0)
        # transmission (Walter 2007 eq. 21 + radiance compression)
        sqrt_denom = m.dot(si.wi, mh) + eta_it * m.dot(wo, mh)
        scale = m.sqr(eta_ti) if ctx.mode == 0 else 1.0
        val_t = jnp.abs(m.safe_div(
            scale * (1.0 - F) * D * G * m.sqr(eta_it)
            * m.dot(si.wi, mh) * m.dot(wo, mh),
            cos_i * m.sqr(sqrt_denom), 0.0))
        has_r = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_t = ctx.is_enabled(BSDFFlags.GlossyTransmission, 1)
        val = jnp.where(reflecting, val_r if has_r else 0.0,
                        val_t if has_t else 0.0)
        refl = self.specular_reflectance.eval(si, active)
        trans = self.specular_transmittance.eval(si, active)
        spec = jnp.where(reflecting[..., None], refl, trans)
        ok = jnp.asarray(active) & (jnp.abs(cos_i) > 1e-6) \
            & (jnp.abs(cos_o) > 1e-6)
        return jnp.where(ok[..., None], spec * val[..., None], 0.0)

    def pdf(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        reflecting = cos_i * cos_o > 0
        eta_l = jnp.where(cos_i > 0, self.eta, self.inv_eta)
        m_r = m.normalize(si.wi + wo)
        m_t = m.normalize(si.wi + wo * eta_l[..., None])
        mh = jnp.where(reflecting[..., None], m_r, m_t)
        mh = m.mulsign(mh, cos_theta(mh)[..., None])
        d = self._distr(si)
        wi_p = m.mulsign(si.wi, cos_i[..., None])
        F, _, eta_it, _ = fresnel(m.dot(si.wi, mh), self.eta)
        dwh_dwo_r = m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo, mh)), 0.0)
        sqrt_denom = m.dot(si.wi, mh) + eta_it * m.dot(wo, mh)
        dwh_dwo_t = m.safe_div(m.sqr(eta_it) * jnp.abs(m.dot(wo, mh)),
                               m.sqr(sqrt_denom), 0.0)
        has_r = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_t = ctx.is_enabled(BSDFFlags.GlossyTransmission, 1)
        if has_r and has_t:
            lobe = jnp.where(reflecting, F, 1.0 - F)
        else:
            lobe = jnp.ones_like(F)
        pdf = d.pdf(wi_p, mh) * lobe \
            * jnp.where(reflecting, dwh_dwo_r, dwh_dwo_t)
        # micro/macro side agreement for BOTH directions — replicates the
        # smith_g1 masking baked into eval/sample (roughdielectric.cpp pdf)
        ok = jnp.asarray(active) \
            & jnp.where(reflecting,
                        jnp.asarray(has_r), jnp.asarray(has_t)) \
            & (m.dot(si.wi, mh) * cos_i > 0) \
            & (m.dot(wo, mh) * cos_o > 0)
        return jnp.where(ok, pdf, 0.0)


register_plugin("bsdf", "roughdielectric")(RoughDielectric)


# =============================================================================
# Plastic (plastic.cpp:1-335, roughplastic.cpp:1-433)
# =============================================================================

class SmoothPlastic(BSDF):
    """(plastic.cpp) smooth dielectric coating over a diffuse base with
    internal-scattering compensation."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        int_ior = lookup_ior(p.get("int_ior", "polypropylene")) if p else 1.49
        ext_ior = lookup_ior(p.get("ext_ior", "air")) if p else 1.000277
        self.eta = int_ior / ext_ior
        from .textures import ConstantTexture
        self.diffuse_reflectance = p.texture("diffuse_reflectance", 0.5) \
            if p else ConstantTexture(color=0.5)
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.nonlinear = p.bool_("nonlinear", False) if p else False
        d_mean = self.diffuse_reflectance.mean()
        s_mean = self.specular_reflectance.mean()
        self.specular_sampling_weight = s_mean / (d_mean + s_mean)
        self.fdr_int = float(fresnel_diffuse_reflectance(
            jnp.asarray(1.0 / self.eta)))
        self.fdr_ext = float(fresnel_diffuse_reflectance(
            jnp.asarray(self.eta)))
        self.inv_eta_2 = 1.0 / (self.eta * self.eta)
        self.m_components = [
            BSDFFlags.DeltaReflection | BSDFFlags.FrontSide,
            BSDFFlags.DiffuseReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0] | self.m_components[1]

    def _params_at(self, si):
        """(eta, specular_sampling_weight, fdr_int, inv_eta_2) per lane
        — scalars here; the merged variant gathers per-shape rows."""
        return (self.eta, self.specular_sampling_weight, self.fdr_int,
                self.inv_eta_2)

    def _probs(self, F_i, has_spec, has_diff, w=None):
        if w is None:
            w = self.specular_sampling_weight
        prob_spec = F_i * w
        prob_diff = (1.0 - F_i) * (1.0 - w)
        total = prob_spec + prob_diff
        prob_spec = jnp.where(has_spec & has_diff,
                              m.safe_div(prob_spec, total, 1.0),
                              jnp.where(has_spec, 1.0, 0.0))
        return prob_spec

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        ok = jnp.asarray(active) & (cos_i > 0)
        eta, ssw, fdr_int, inv_eta_2 = self._params_at(si)
        F_i, _, _, _ = fresnel(cos_i, eta)
        has_spec = ctx.is_enabled(BSDFFlags.DeltaReflection, 0)
        has_diff = ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        prob_spec = self._probs(F_i, jnp.asarray(has_spec),
                                jnp.asarray(has_diff), w=ssw)
        sel_spec = (sample1 < prob_spec) & has_spec
        wo = jnp.where(sel_spec[..., None], reflect(si.wi),
                       warp.square_to_cosine_hemisphere(sample2))
        cos_o = cos_theta(wo)
        F_o, _, _, _ = fresnel(cos_o, eta)
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo) \
            * (1.0 - prob_spec)
        pdf = jnp.where(sel_spec, prob_spec, pdf_diff)
        # weights
        spec_w = self.specular_reflectance.eval(si, active) \
            * m.safe_div(F_i, prob_spec, 0.0)[..., None]
        diff = self.diffuse_reflectance.eval(si, active)
        if self.nonlinear:
            denom = 1.0 - diff * jnp.reshape(
                jnp.asarray(fdr_int, si.t.dtype), (-1, 1))
        else:
            denom = 1.0 - jnp.reshape(
                jnp.asarray(fdr_int, si.t.dtype), (-1, 1))
        diff_w = m.safe_div(diff, denom, 0.0) \
            * (inv_eta_2 * (1.0 - F_i) * (1.0 - F_o)
               / jnp.maximum(1.0 - prob_spec, 1e-8))[..., None]
        value = jnp.where(sel_spec[..., None], spec_w, diff_w)
        ok = ok & (pdf > 0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.where(
                sel_spec, jnp.uint32(int(BSDFFlags.DeltaReflection)),
                jnp.uint32(int(BSDFFlags.DiffuseReflection))),
            sampled_component=jnp.where(sel_spec, 0, 1).astype(jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        eta, _, fdr_int, inv_eta_2 = self._params_at(si)
        F_i, _, _, _ = fresnel(cos_i, eta)
        F_o, _, _, _ = fresnel(cos_o, eta)
        diff = self.diffuse_reflectance.eval(si, active)
        fdr_c = jnp.reshape(jnp.asarray(fdr_int, si.t.dtype), (-1, 1))
        denom = 1.0 - diff * fdr_c if self.nonlinear else 1.0 - fdr_c
        value = m.safe_div(diff, denom, 0.0) * (
            m.InvPi * inv_eta_2 * cos_o
            * (1.0 - F_i) * (1.0 - F_o))[..., None]
        return jnp.where(ok[..., None], value, 0.0)

    def pdf(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0) \
            & ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        eta, ssw, _, _ = self._params_at(si)
        F_i, _, _, _ = fresnel(cos_i, eta)
        has_spec = ctx.is_enabled(BSDFFlags.DeltaReflection, 0)
        prob_spec = self._probs(F_i, jnp.asarray(has_spec),
                                jnp.asarray(True), w=ssw)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
        return jnp.where(ok, pdf, 0.0)

    def traverse(self, cb):
        cb.put_object("diffuse_reflectance", self.diffuse_reflectance)
        cb.put_object("specular_reflectance", self.specular_reflectance)


register_plugin("bsdf", "plastic")(SmoothPlastic)


class RoughPlastic(BSDF):
    """(roughplastic.cpp) microfacet dielectric coating over a diffuse
    base."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        int_ior = lookup_ior(p.get("int_ior", "polypropylene")) if p else 1.49
        ext_ior = lookup_ior(p.get("ext_ior", "air")) if p else 1.000277
        self.eta = int_ior / ext_ior
        from .textures import ConstantTexture
        self.diffuse_reflectance = p.texture("diffuse_reflectance", 0.5) \
            if p else ConstantTexture(color=0.5)
        self.specular_reflectance = p.texture("specular_reflectance", 1.0) \
            if p else ConstantTexture(color=1.0)
        self.nonlinear = p.bool_("nonlinear", False) if p else False
        self.dist_type, self.alpha_u, self.alpha_v, self.sample_visible = \
            _microfacet_from_props(p)
        d_mean = self.diffuse_reflectance.mean()
        s_mean = self.specular_reflectance.mean()
        self.specular_sampling_weight = s_mean / (d_mean + s_mean)
        self.fdr_int = float(fresnel_diffuse_reflectance(
            jnp.asarray(1.0 / self.eta)))
        self.inv_eta_2 = 1.0 / (self.eta * self.eta)
        self.m_components = [
            BSDFFlags.GlossyReflection | BSDFFlags.FrontSide,
            BSDFFlags.DiffuseReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0] | self.m_components[1]

    def _distr(self, si):
        dtype = si.t.dtype
        return MicrofacetDistribution(
            self.dist_type, jnp.asarray(self.alpha_u, dtype),
            jnp.asarray(self.alpha_v, dtype), self.sample_visible)

    def _params_at(self, si):
        return (self.eta, self.specular_sampling_weight, self.fdr_int,
                self.inv_eta_2)

    def _probs(self, F_i, has_spec, has_diff, w=None):
        if w is None:
            w = self.specular_sampling_weight
        prob_spec = F_i * w
        prob_diff = (1.0 - F_i) * (1.0 - w)
        total = prob_spec + prob_diff
        return jnp.where(has_spec & has_diff,
                         m.safe_div(prob_spec, total, 1.0),
                         jnp.where(has_spec, 1.0, 0.0))

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        cos_i = cos_theta(si.wi)
        ok = jnp.asarray(active) & (cos_i > 0)
        eta, ssw, _, _ = self._params_at(si)
        F_i, _, _, _ = fresnel(cos_i, eta)
        has_spec = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_diff = ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        prob_spec = self._probs(F_i, jnp.asarray(has_spec),
                                jnp.asarray(has_diff), w=ssw)
        sel_spec = (sample1 < prob_spec) & has_spec
        d = self._distr(si)
        mh, _ = d.sample(si.wi, sample2)
        wo_spec = reflect(si.wi, mh)
        wo_diff = warp.square_to_cosine_hemisphere(sample2)
        wo = jnp.where(sel_spec[..., None], wo_spec, wo_diff)
        cos_o = cos_theta(wo)
        ok = ok & (cos_o > 0)
        pdf = self.pdf(ctx, si, wo, ok)
        value = self.eval(ctx, si, wo, ok)
        value = jnp.where((ok & (pdf > 0))[..., None],
                          value * m.safe_div(1.0, pdf, 0.0)[..., None], 0.0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.where(
                sel_spec, jnp.uint32(int(BSDFFlags.GlossyReflection)),
                jnp.uint32(int(BSDFFlags.DiffuseReflection))),
            sampled_component=jnp.where(sel_spec, 0, 1).astype(jnp.int32))
        return bs, value

    def eval(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0)
        has_spec = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_diff = ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        value = jnp.zeros((si.t.shape[0], _nch()), si.t.dtype)
        eta, _, fdr_int, inv_eta_2 = self._params_at(si)
        if has_spec:
            d = self._distr(si)
            mh = m.normalize(si.wi + wo)
            D = d.eval(mh)
            F, _, _, _ = fresnel(m.dot(si.wi, mh), eta)
            G = d.G(si.wi, wo, mh)
            spec = m.safe_div(F * D * G, 4.0 * cos_i, 0.0)
            value = value + self.specular_reflectance.eval(si, active) \
                * spec[..., None]
        if has_diff:
            F_i, _, _, _ = fresnel(cos_i, eta)
            F_o, _, _, _ = fresnel(cos_o, eta)
            diff = self.diffuse_reflectance.eval(si, active)
            fdr_c = jnp.reshape(jnp.asarray(fdr_int, si.t.dtype), (-1, 1))
            denom = 1.0 - diff * fdr_c if self.nonlinear else 1.0 - fdr_c
            value = value + m.safe_div(diff, denom, 0.0) * (
                m.InvPi * inv_eta_2 * cos_o
                * (1.0 - F_i) * (1.0 - F_o))[..., None]
        return jnp.where(ok[..., None], value, 0.0)

    def pdf(self, ctx, si, wo, active):
        cos_i = cos_theta(si.wi)
        cos_o = cos_theta(wo)
        ok = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0)
        eta, ssw, _, _ = self._params_at(si)
        F_i, _, _, _ = fresnel(cos_i, eta)
        has_spec = ctx.is_enabled(BSDFFlags.GlossyReflection, 0)
        has_diff = ctx.is_enabled(BSDFFlags.DiffuseReflection, 1)
        prob_spec = self._probs(F_i, jnp.asarray(has_spec),
                                jnp.asarray(has_diff), w=ssw)
        d = self._distr(si)
        mh = m.normalize(si.wi + wo)
        pdf_spec = m.safe_div(d.pdf(si.wi, mh), 4.0 * m.dot(wo, mh), 0.0) \
            * prob_spec
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo) \
            * (1.0 - prob_spec)
        return jnp.where(ok, pdf_spec + pdf_diff, 0.0)

    def traverse(self, cb):
        cb.put_object("diffuse_reflectance", self.diffuse_reflectance)
        cb.put_object("specular_reflectance", self.specular_reflectance)
        cb.put_parameter("alpha", self.alpha_u)


register_plugin("bsdf", "roughplastic")(RoughPlastic)


# =============================================================================
# Wrapper BSDFs (twosided.cpp, mask.cpp, blendbsdf.cpp, normalmap.cpp,
# bumpmap.cpp)
# =============================================================================

def _nested_bsdfs(props, max_count=2):
    out = []
    if props is not None:
        for _, obj in props.objects():
            if getattr(obj, "plugin_category", "") == "bsdf":
                out.append(obj)
    return out[:max_count]


def _flip_si(si):
    flip = jnp.asarray([1.0, 1.0, -1.0], si.wi.dtype)
    return si._replace(wi=si.wi * flip)


class TwoSided(BSDF):
    """(twosided.cpp:1-204) makes nested one-sided BRDF(s) visible from both
    sides by flipping the frame for back-facing lanes."""

    def __init__(self, props=None, nested=None):
        super().__init__(props)
        bsdfs = _nested_bsdfs(props) if props is not None else \
            ([nested] if nested is not None else [])
        if not bsdfs:
            raise RuntimeError("twosided requires a nested BSDF")
        self.brdf_front = bsdfs[0]
        self.brdf_back = bsdfs[1] if len(bsdfs) > 1 else bsdfs[0]
        f = (self.brdf_front.flags() | self.brdf_back.flags()) \
            | BSDFFlags.FrontSide | BSDFFlags.BackSide
        self.m_components = [f]
        self.m_flags = BSDFFlags(int(f) & ~int(BSDFFlags.BackSide)
                                 | int(BSDFFlags.BackSide))
        self.m_flags = f

    def sample(self, ctx, si, sample1, sample2, active):
        front = cos_theta(si.wi) > 0
        si_f = si
        si_b = _flip_si(si)
        bs_f, val_f = self.brdf_front.sample(ctx, si_f, sample1, sample2,
                                             active & front)
        bs_b, val_b = self.brdf_back.sample(ctx, si_b, sample1, sample2,
                                            active & ~front)
        flip = jnp.asarray([1.0, 1.0, -1.0], si.wi.dtype)
        bs_b = bs_b._replace(wo=bs_b.wo * flip)
        import jax as _jax
        bs = _jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                front.reshape(front.shape + (1,) * (a.ndim - 1)), a, b),
            bs_f, bs_b)
        value = jnp.where(front[..., None], val_f, val_b)
        return bs, value

    def eval(self, ctx, si, wo, active):
        front = cos_theta(si.wi) > 0
        flip = jnp.asarray([1.0, 1.0, -1.0], si.wi.dtype)
        val_f = self.brdf_front.eval(ctx, si, wo, active & front)
        val_b = self.brdf_back.eval(ctx, _flip_si(si), wo * flip,
                                    active & ~front)
        return jnp.where(front[..., None], val_f, val_b)

    def pdf(self, ctx, si, wo, active):
        front = cos_theta(si.wi) > 0
        flip = jnp.asarray([1.0, 1.0, -1.0], si.wi.dtype)
        p_f = self.brdf_front.pdf(ctx, si, wo, active & front)
        p_b = self.brdf_back.pdf(ctx, _flip_si(si), wo * flip,
                                 active & ~front)
        return jnp.where(front, p_f, p_b)

    def traverse(self, cb):
        cb.put_object("brdf_front", self.brdf_front)
        if self.brdf_back is not self.brdf_front:
            cb.put_object("brdf_back", self.brdf_back)


register_plugin("bsdf", "twosided")(TwoSided)


class MaskBSDF(BSDF):
    """(mask.cpp:1-190) opacity mask: passes straight through with
    probability 1 - opacity (a Null lobe), otherwise the nested BSDF."""

    def __init__(self, props=None, nested=None, opacity=0.5):
        super().__init__(props)
        bsdfs = _nested_bsdfs(props) if props is not None else \
            ([nested] if nested is not None else [])
        if not bsdfs:
            raise RuntimeError("mask requires a nested BSDF")
        self.nested = bsdfs[0]
        self.opacity = props.texture("opacity", 0.5) if props else None
        if self.opacity is None:
            from .textures import ConstantTexture
            self.opacity = ConstantTexture(color=opacity)
        f = self.nested.flags() | BSDFFlags.Null | BSDFFlags.FrontSide \
            | BSDFFlags.BackSide
        self.m_components = list(self.nested.m_components) + [
            BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide]
        self.m_flags = f

    def _opacity(self, si, active):
        return jnp.clip(self.opacity.eval_1(si, active), 0.0, 1.0)

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        op = self._opacity(si, active)
        sel_nested = sample1 < op
        # re-normalize sample1 for the nested lobe (sample reuse)
        s1 = m.safe_div(sample1, op, 0.0)
        bs_n, val_n = self.nested.sample(ctx, si, s1, sample2,
                                         active & sel_nested)
        pass_pdf = 1.0 - op
        bs_null = zero_bsdf_sample(n, si.t.dtype)._replace(
            wo=-si.wi, pdf=pass_pdf,
            sampled_type=jnp.full((n,), int(BSDFFlags.Null), jnp.uint32),
            sampled_component=jnp.full((n,), len(self.m_components) - 1,
                                       jnp.int32))
        import jax as _jax
        bs = _jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                sel_nested.reshape(sel_nested.shape + (1,) * (a.ndim - 1)),
                a, b),
            bs_n, bs_null)
        bs = bs._replace(pdf=jnp.where(sel_nested, bs_n.pdf * op, pass_pdf))
        value = jnp.where(sel_nested[..., None], val_n,
                          jnp.ones((n, _nch()), si.t.dtype))
        value = jnp.where(jnp.asarray(active)[..., None], value, 0.0)
        return bs, value

    def eval(self, ctx, si, wo, active):
        op = self._opacity(si, active)
        return self.nested.eval(ctx, si, wo, active) * op[..., None]

    def pdf(self, ctx, si, wo, active):
        op = self._opacity(si, active)
        return self.nested.pdf(ctx, si, wo, active) * op

    def eval_null_transmission(self, si, active):
        op = self._opacity(si, active)
        return jnp.where(jnp.asarray(active)[..., None],
                         (1.0 - op)[..., None]
                         * jnp.ones((si.t.shape[0], _nch()), si.t.dtype), 0.0)

    def traverse(self, cb):
        cb.put_object("opacity", self.opacity)
        cb.put_object("nested", self.nested)


register_plugin("bsdf", "mask")(MaskBSDF)


class BlendBSDF(BSDF):
    """(blendbsdf.cpp:1-190) convex combination of two BSDFs by a weight
    texture."""

    def __init__(self, props=None, bsdf0=None, bsdf1=None, weight=0.5):
        super().__init__(props)
        bsdfs = _nested_bsdfs(props) if props is not None else \
            [b for b in (bsdf0, bsdf1) if b is not None]
        if len(bsdfs) != 2:
            raise RuntimeError("blendbsdf requires exactly two nested BSDFs")
        self.bsdf0, self.bsdf1 = bsdfs
        self.weight = props.texture("weight", 0.5) if props else None
        if self.weight is None:
            from .textures import ConstantTexture
            self.weight = ConstantTexture(color=weight)
        self.m_components = (list(self.bsdf0.m_components)
                             + list(self.bsdf1.m_components))
        self.m_flags = self.bsdf0.flags() | self.bsdf1.flags()

    def sample(self, ctx, si, sample1, sample2, active):
        w = jnp.clip(self.weight.eval_1(si, active), 0.0, 1.0)
        sel1 = sample1 < w
        s1 = jnp.where(sel1, m.safe_div(sample1, w, 0.0),
                       m.safe_div(sample1 - w, 1.0 - w, 0.0))
        bs0, v0 = self.bsdf0.sample(ctx, si, s1, sample2, active & ~sel1)
        bs1, v1 = self.bsdf1.sample(ctx, si, s1, sample2, active & sel1)
        import jax as _jax
        bs = _jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                sel1.reshape(sel1.shape + (1,) * (a.ndim - 1)), a, b),
            bs1, bs0)
        value = jnp.where(sel1[..., None], v1, v0)
        return bs, value

    def eval(self, ctx, si, wo, active):
        w = jnp.clip(self.weight.eval_1(si, active), 0.0, 1.0)
        return (self.bsdf0.eval(ctx, si, wo, active) * (1 - w)[..., None]
                + self.bsdf1.eval(ctx, si, wo, active) * w[..., None])

    def pdf(self, ctx, si, wo, active):
        w = jnp.clip(self.weight.eval_1(si, active), 0.0, 1.0)
        return (self.bsdf0.pdf(ctx, si, wo, active) * (1 - w)
                + self.bsdf1.pdf(ctx, si, wo, active) * w)

    def traverse(self, cb):
        cb.put_object("weight", self.weight)
        cb.put_object("bsdf_0", self.bsdf0)
        cb.put_object("bsdf_1", self.bsdf1)


register_plugin("bsdf", "blendbsdf")(BlendBSDF)


class _FrameMapBSDF(BSDF):
    """Shared machinery for normalmap/bumpmap: evaluate the nested BSDF in a
    perturbed shading frame."""

    def __init__(self, props=None, nested=None):
        super().__init__(props)
        bsdfs = _nested_bsdfs(props) if props is not None else \
            ([nested] if nested is not None else [])
        if not bsdfs:
            raise RuntimeError(f"{type(self).__name__} requires a nested BSDF")
        self.nested = bsdfs[0]
        self.m_components = list(self.nested.m_components)
        self.m_flags = self.nested.flags() | BSDFFlags.SpatiallyVarying

    def _perturbed_frame(self, si, active):
        raise NotImplementedError

    def _to_perturbed(self, si, active):
        frame = self._perturbed_frame(si, active)
        wi_world = si.to_world(si.wi)
        si_p = si._replace(wi=frame.to_local(wi_world))
        return si_p, frame

    def sample(self, ctx, si, sample1, sample2, active):
        si_p, frame = self._to_perturbed(si, active)
        bs, value = self.nested.sample(ctx, si_p, sample1, sample2, active)
        wo_world = frame.to_world(bs.wo)
        wo = si.to_local(wo_world)
        # reject samples pushed below the geometric surface
        ok = jnp.asarray(active) & (cos_theta(wo) * cos_theta(bs.wo) > 0)
        bs = bs._replace(wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        si_p, frame = self._to_perturbed(si, active)
        wo_p = frame.to_local(si.to_world(wo))
        ok = jnp.asarray(active) & (cos_theta(wo) * cos_theta(wo_p) > 0)
        return jnp.where(ok[..., None],
                         self.nested.eval(ctx, si_p, wo_p, ok), 0.0)

    def pdf(self, ctx, si, wo, active):
        si_p, frame = self._to_perturbed(si, active)
        wo_p = frame.to_local(si.to_world(wo))
        ok = jnp.asarray(active) & (cos_theta(wo) * cos_theta(wo_p) > 0)
        return jnp.where(ok, self.nested.pdf(ctx, si_p, wo_p, ok), 0.0)

    def traverse(self, cb):
        cb.put_object("nested", self.nested)


class NormalMap(_FrameMapBSDF):
    """(normalmap.cpp:1-183) tangent-space normal map."""

    def __init__(self, props=None, nested=None):
        self.normalmap = None
        if props is not None:
            for k, obj in props.objects():
                from ..render.texture import Texture
                if isinstance(obj, Texture):
                    self.normalmap = obj
            if self.normalmap is None and props.has_property("normalmap"):
                self.normalmap = props.texture("normalmap")
        super().__init__(props, nested)
        if self.normalmap is None:
            raise RuntimeError("normalmap requires a normal texture")

    def _perturbed_frame(self, si, active):
        rgb = self.normalmap.eval_3(si, active)
        n_local = m.normalize(2.0 * rgb - 1.0)
        # build the perturbed world normal from the shading frame
        n_world = (si.sh_frame.s * n_local[..., 0:1]
                   + si.sh_frame.t * n_local[..., 1:2]
                   + si.sh_frame.n * n_local[..., 2:3])
        n_world = m.normalize(n_world)
        s = m.normalize(si.dp_du - n_world
                        * m.dot(n_world, si.dp_du, keepdims=True))
        deg = m.squared_norm(s) < 0.5
        fs, ft = m.coordinate_system(n_world)
        s = jnp.where(deg[..., None], fs, s)
        t = m.normalize(m.cross(n_world, s))
        return Frame(s, t, n_world)


register_plugin("bsdf", "normalmap")(NormalMap)


class BumpMap(_FrameMapBSDF):
    """(bumpmap.cpp:1-205) height-field bump mapping via uv-space texture
    gradients."""

    def __init__(self, props=None, nested=None):
        self.bumpmap = None
        self.scale = 1.0
        if props is not None:
            self.scale = props.float_("scale", 1.0)
            for k, obj in props.objects():
                from ..render.texture import Texture
                if isinstance(obj, Texture):
                    self.bumpmap = obj
        super().__init__(props, nested)
        if self.bumpmap is None:
            raise RuntimeError("bumpmap requires a height texture")

    def _perturbed_frame(self, si, active):
        eps = 1e-3
        h = self.bumpmap.eval_1(si, active)
        si_u = si._replace(uv=si.uv + jnp.asarray([eps, 0.0], si.uv.dtype))
        si_v = si._replace(uv=si.uv + jnp.asarray([0.0, eps], si.uv.dtype))
        dh_du = (self.bumpmap.eval_1(si_u, active) - h) / eps * self.scale
        dh_dv = (self.bumpmap.eval_1(si_v, active) - h) / eps * self.scale
        # displaced surface tangents: dp'_du = dp_du + n * dh_du etc.
        tu = si.dp_du + si.sh_frame.n * dh_du[..., None]
        tv = si.dp_dv + si.sh_frame.n * dh_dv[..., None]
        n_world = m.normalize(m.cross(tu, tv))
        # keep orientation consistent with the original shading normal
        n_world = m.mulsign(n_world, m.dot(n_world, si.sh_frame.n)[..., None])
        s = m.normalize(si.dp_du - n_world
                        * m.dot(n_world, si.dp_du, keepdims=True))
        deg = m.squared_norm(s) < 0.5
        fs, ft = m.coordinate_system(n_world)
        s = jnp.where(deg[..., None], fs, s)
        t = m.normalize(m.cross(n_world, s))
        return Frame(s, t, n_world)


register_plugin("bsdf", "bumpmap")(BumpMap)


# =============================================================================
# Polarized optical elements (polarizer.cpp:1-212, retarder.cpp:1-195,
# circular.cpp:1-184) and polarized plastic (pplastic.cpp:1-433)
# =============================================================================

from ..render import mueller as mu
from ..render.bsdf import _depolarize_value


class _PolarizedElement(BSDF):
    """Shared machinery: a Null-direction filter with a Mueller matrix.

    In unpolarized variants these return the (0,0) matrix component like
    the reference."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.theta_tex = p.texture("theta", 0.0) if p else None
        if self.theta_tex is None:
            from .textures import ConstantTexture
            self.theta_tex = ConstantTexture(color=0.0)
        self.m_components = [BSDFFlags.Null | BSDFFlags.FrontSide
                             | BSDFFlags.BackSide]
        self.m_flags = self.m_components[0]

    def _mueller(self, si, active, forward):
        """(N, 4, 4) element matrix; forward: local propagation direction."""
        raise NotImplementedError

    def _scalar(self, si, active, forward):
        Mm = self._mueller(si, active, forward)
        return Mm[..., 0, 0]

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        wo = -si.wi
        value = self._scalar(si, active, wo)[..., None] \
            * jnp.ones((n, _nch()), si.t.dtype)
        ok = jnp.asarray(active) & ctx.is_enabled(BSDFFlags.Null)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, 1.0, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.full((n,), int(BSDFFlags.Null), jnp.uint32),
            sampled_component=jnp.zeros((n,), jnp.int32))
        return bs, jnp.where(ok[..., None], value, 0.0)

    def sample_pol(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        wo = -si.wi
        Mm = self._mueller(si, active, wo)            # (N, 4, 4)
        Mm = mu.to_world_mueller(si, Mm, -wo, si.wi)
        ok = jnp.asarray(active) & ctx.is_enabled(BSDFFlags.Null)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, 1.0, 0.0),
            eta=jnp.ones((n,), si.t.dtype),
            sampled_type=jnp.full((n,), int(BSDFFlags.Null), jnp.uint32),
            sampled_component=jnp.zeros((n,), jnp.int32))
        value = jnp.broadcast_to(Mm[:, None], (n, _nch(), 4, 4))
        return bs, jnp.where(ok[..., None, None, None], value, 0.0)

    def eval(self, ctx, si, wo, active):
        return jnp.zeros((si.t.shape[0], _nch()), si.t.dtype)

    def pdf(self, ctx, si, wo, active):
        return jnp.zeros(si.t.shape, si.t.dtype)

    def eval_null_transmission(self, si, active):
        n = si.t.shape[0]
        v = self._scalar(si, active, -si.wi)
        return jnp.where(jnp.asarray(active)[..., None],
                         v[..., None] * jnp.ones((n, _nch()), si.t.dtype),
                         0.0)

    def traverse(self, cb):
        cb.put_object("theta", self.theta_tex)


class PolarizerBSDF(_PolarizedElement):
    """(polarizer.cpp) ideal linear polarizer, axis rotated by `theta`
    degrees."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.transmittance = p.texture("transmittance", 1.0) if p else None
        if self.transmittance is None:
            from .textures import ConstantTexture
            self.transmittance = ConstantTexture(color=1.0)

    def _mueller(self, si, active, forward):
        theta = jnp.deg2rad(self.theta_tex.eval_1(si, active))
        t = self.transmittance.eval_1(si, active)
        return mu.rotated_element(theta, mu.linear_polarizer(t))


class RetarderBSDF(_PolarizedElement):
    """(retarder.cpp) linear retarder; `delta` = phase in degrees (180 =
    half-wave plate), fast axis rotated by `theta`."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.delta_tex = p.texture("delta", 90.0) if p else None
        if self.delta_tex is None:
            from .textures import ConstantTexture
            self.delta_tex = ConstantTexture(color=90.0)

    def _mueller(self, si, active, forward):
        theta = jnp.deg2rad(self.theta_tex.eval_1(si, active))
        delta = jnp.deg2rad(self.delta_tex.eval_1(si, active))
        return mu.rotated_element(theta, mu.linear_retarder(delta))


class CircularPolarizerBSDF(_PolarizedElement):
    """(circular.cpp) circular polarizer (left/right)."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.left_handed = p.bool_("left_handed", False) if p else False

    def _mueller(self, si, active, forward):
        n = si.t.shape[0]
        M = mu.left_circular_polarizer() if self.left_handed \
            else mu.right_circular_polarizer()
        return jnp.broadcast_to(M, (n, 4, 4))


register_plugin("bsdf", "polarizer")(PolarizerBSDF)
register_plugin("bsdf", "retarder")(RetarderBSDF)
register_plugin("bsdf", "circular")(CircularPolarizerBSDF)


class PolarizedPlastic(SmoothPlastic):
    """(pplastic.cpp) plastic whose specular lobe carries the polarized
    Fresnel Mueller matrix; the diffuse base depolarizes."""

    def sample_pol(self, ctx, si, sample1, sample2, active):
        bs, value = self.sample(ctx, si, sample1, sample2, active)
        sel_spec = (bs.sampled_type
                    & jnp.uint32(int(BSDFFlags.DeltaReflection))) != 0
        # polarized Fresnel for the specular lobe, expressed in the s/p
        # frame of the reflection and rotated to the canonical bases
        cos_i = cos_theta(si.wi)
        Msp = mu.specular_reflection(jnp.maximum(cos_i, 1e-6), self.eta)
        F_i, _, _, _ = fresnel(cos_i, self.eta)
        # sample() already divided by lobe prob; rescale so the (0,0)
        # component matches the scalar value
        scale = m.safe_div(value[..., 0], jnp.maximum(Msp[..., 0, 0], 1e-12),
                           0.0)
        Mspec = Msp[:, None] * scale[..., None, None, None]
        Mspec = mu.to_world_mueller(si, Mspec, -bs.wo, si.wi)
        Mdiff = _depolarize_value(value)
        Mm = jnp.where(sel_spec[..., None, None, None], Mspec, Mdiff)
        return bs, Mm

    def eval_pol(self, ctx, si, wo, active):
        return _depolarize_value(self.eval(ctx, si, wo, active))


register_plugin("bsdf", "pplastic")(PolarizedPlastic)
