"""Emitter plugins (reference: src/emitters/ — area, point, constant,
envmap, directional, spot, projector; SURVEY.md §2.3).

Area emitters pre-pack their shape's triangles + area CDF into device arrays
at scene-compile time so sample_direction is pure traced gather+warp math.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core import warp
from ..core.frame import Frame, cos_theta
from ..render.emitter import Emitter, EmitterFlags
from ..render.records import DirectionSample
from ..variants import current as current_variant


def _zero_ds(n, dtype=jnp.float32):
    z3 = jnp.zeros((n, 3), dtype)
    z = jnp.zeros((n,), dtype)
    return DirectionSample(p=z3, n=z3, uv=jnp.zeros((n, 2), dtype),
                           time=z, pdf=z, delta=jnp.zeros((n,), bool),
                           d=z3, dist=z, emitter_idx=jnp.full((n,), -1,
                                                              jnp.int32))


@register_plugin("emitter", "area")
class AreaEmitter(Emitter):
    """(area.cpp) one-sided surface emitter; uniform-texture path samples the
    shape area-uniformly and converts to solid angle."""

    def __init__(self, props=None):
        super().__init__(props)
        self.radiance = props.texture_d65("radiance", 1.0) if props else None
        if self.radiance is None:
            from .textures import ConstantTexture
            self.radiance = ConstantTexture(color=1.0)
        self.m_flags = EmitterFlags.Surface
        if self.radiance.is_spatially_varying():
            self.m_flags |= EmitterFlags.SpatiallyVarying
        self._packed = False

    # -- scene compile ---------------------------------------------------------
    def prepare(self, scene):
        mesh = self.shape
        if mesh is None or not mesh.is_mesh():
            raise RuntimeError("area emitter requires a mesh shape")
        p = mesh.vertices[mesh.faces]
        v0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        fn = np.cross(e1, e2)
        areas = 0.5 * np.linalg.norm(fn, axis=-1)
        self.total_area = float(areas.sum())
        from ..core.distr_1d import DiscreteDistribution
        self.face_distr = DiscreteDistribution.create(
            jnp.asarray(areas.astype(np.float32)))
        self.tv0 = jnp.asarray(v0)
        self.te1 = jnp.asarray(e1)
        self.te2 = jnp.asarray(e2)
        self.tn = jnp.asarray(
            fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20))
        if mesh.uvs is not None:
            uv = mesh.uvs[mesh.faces]
            self.tuv0 = jnp.asarray(uv[:, 0])
            self.tuv1 = jnp.asarray(uv[:, 1])
            self.tuv2 = jnp.asarray(uv[:, 2])
        else:
            self.tuv0 = self.tuv1 = self.tuv2 = None
        self._packed = True

    # -- queries ----------------------------------------------------------------
    def eval(self, si, active):
        ok = jnp.asarray(active) & (cos_theta(si.wi) > 0)
        val = self.radiance.eval(si, active)
        return jnp.where(ok[..., None], val, 0.0)

    def sample_direction(self, it, sample, active):
        assert self._packed, "Scene.prepare() must run before sampling"
        n = it.p.shape[0]
        dt = it.p.dtype
        # pick face ~ area, then uniform barycentrics (mesh.cpp:300-307 +
        # sample_position semantics)
        face, u_re = self.face_distr.sample_reuse(sample[..., 0])
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u_re, sample[..., 1]], -1))
        bu, bv = bary[..., 0], bary[..., 1]
        v0 = self.tv0[face]
        p = v0 + self.te1[face] * bu[..., None] + self.te2[face] * bv[..., None]
        nrm = self.tn[face]
        if self.tuv0 is not None:
            uv = (self.tuv0[face] * (1 - bu - bv)[..., None]
                  + self.tuv1[face] * bu[..., None]
                  + self.tuv2[face] * bv[..., None])
        else:
            uv = bary
        d = p - it.p
        dist2 = m.squared_norm(d)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        d = d / dist[..., None]
        # area pdf -> solid angle (shape.cpp sample_direction)
        cos_em = m.dot(-d, nrm)
        pdf = m.safe_div(dist2, cos_em * self.total_area, 0.0)
        front = cos_em > 0
        active = jnp.asarray(active) & front & (pdf > 0)
        pdf = jnp.where(active, pdf, 0.0)
        ds = DirectionSample(
            p=p, n=nrm, uv=uv, time=it.time, pdf=pdf,
            delta=jnp.zeros((n,), bool), d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        si_em = _si_on_emitter(p, nrm, uv, -d, it)
        spec = self.radiance.eval(si_em, active)
        spec = jnp.where(active[..., None],
                         spec * m.safe_div(1.0, pdf, 0.0)[..., None], 0.0)
        return ds, spec

    def pdf_direction(self, it, ds, active):
        cos_em = m.dot(-ds.d, ds.n)
        pdf = m.safe_div(ds.dist * ds.dist, cos_em * self.total_area, 0.0)
        return jnp.where(jnp.asarray(active) & (cos_em > 0), pdf, 0.0)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        """Emitted ray: area-uniform position x cosine direction
        (area.cpp:75-120)."""
        from ..core.ray import Ray
        face, u_re = self.face_distr.sample_reuse(sample2[..., 0])
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u_re, sample2[..., 1]], -1))
        bu, bv = bary[..., 0], bary[..., 1]
        p = (self.tv0[face] + self.te1[face] * bu[..., None]
             + self.te2[face] * bv[..., None])
        nrm = self.tn[face]
        frame = Frame.from_normal(nrm)
        local = warp.square_to_cosine_hemisphere(sample3)
        d = frame.to_world(local)
        var = current_variant()
        nlanes = p.shape[0]
        if var.is_spectral:
            from ..core import spectrum as spec_mod
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), p.dtype)
            wav_weight = 1.0
        si_em = _si_on_emitter(p, nrm, bary, d, None, time=time,
                               wavelengths=wav)
        spec = self.radiance.eval(si_em, active) * wav_weight
        weight = spec * (m.Pi * self.total_area)
        return Ray.make(p, d, time=time, wavelengths=wav), weight

    def traverse(self, cb):
        cb.put_object("radiance", self.radiance)


def _si_on_emitter(p, n, uv, wi_world, it, time=None, wavelengths=None):
    """Minimal SurfaceInteraction on the emitter surface for texture eval."""
    from ..render.interaction import SurfaceInteraction
    frame = Frame.from_normal(n)
    nlanes = p.shape[0]
    if wavelengths is None:
        wavelengths = it.wavelengths if it is not None else \
            jnp.zeros((nlanes, 0), p.dtype)
    if time is None:
        time = it.time if it is not None else jnp.zeros((nlanes,), p.dtype)
    return SurfaceInteraction(
        t=jnp.zeros((nlanes,), p.dtype), p=p, n=n, sh_frame=frame, uv=uv,
        wi=frame.to_local(wi_world), dp_du=frame.s, dp_dv=frame.t,
        shape_idx=jnp.full((nlanes,), -1, jnp.int32),
        prim_idx=jnp.zeros((nlanes,), jnp.int32),
        wavelengths=wavelengths, time=time)


@register_plugin("emitter", "point")
class PointEmitter(Emitter):
    """(point.cpp) delta position emitter with uniform intensity."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.intensity = p.texture_d65("intensity", 1.0) if p else None
        if self.intensity is None:
            from .textures import ConstantTexture
            self.intensity = ConstantTexture(color=1.0)
        pos = p.vector3("position", [0, 0, 0]) if p else np.zeros(3)
        if p is not None and p.has_property("to_world"):
            tw = p.transform("to_world")
            pos = np.asarray(tw.matrix)[:3, 3]
        self.position = jnp.asarray(pos, jnp.float32)
        self.m_flags = EmitterFlags.DeltaPosition

    def sample_direction(self, it, sample, active):
        n = it.p.shape[0]
        d = self.position - it.p
        dist2 = m.squared_norm(d)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        d = d / dist[..., None]
        ds = DirectionSample(
            p=jnp.broadcast_to(self.position, it.p.shape),
            n=jnp.zeros_like(it.p), uv=jnp.zeros((n, 2), it.p.dtype),
            time=it.time, pdf=jnp.ones((n,), it.p.dtype),
            delta=jnp.ones((n,), bool), d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        si = _si_on_emitter(ds.p, -d, ds.uv, -d, it)
        spec = self.intensity.eval(si, active) / dist2[..., None]
        spec = jnp.where(jnp.asarray(active)[..., None], spec, 0.0)
        return ds, spec

    def pdf_direction(self, it, ds, active):
        return jnp.zeros(ds.pdf.shape, ds.pdf.dtype)

    def eval(self, si, active):
        nch = current_variant().n_channels
        return jnp.zeros(si.t.shape + (nch,), si.t.dtype)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        from ..core.ray import Ray
        d = warp.square_to_uniform_sphere(sample2)
        nlanes = d.shape[0]
        var = current_variant()
        if var.is_spectral:
            from ..core import spectrum as spec_mod
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), d.dtype)
            wav_weight = 1.0
        si = _si_on_emitter(jnp.broadcast_to(self.position, d.shape), d,
                            jnp.zeros((nlanes, 2), d.dtype), d, None,
                            time=time, wavelengths=wav)
        spec = self.intensity.eval(si, active) * wav_weight * (4.0 * m.Pi)
        return Ray.make(jnp.broadcast_to(self.position, d.shape), d,
                        time=time, wavelengths=wav), spec

    def traverse(self, cb):
        cb.put_object("intensity", self.intensity)


@register_plugin("emitter", "constant")
class ConstantEmitter(Emitter):
    """(constant.cpp) uniform environment radiance over the scene's bounding
    sphere."""

    def __init__(self, props=None):
        super().__init__(props)
        self.radiance = props.texture_d65("radiance", 1.0) if props else None
        if self.radiance is None:
            from .textures import ConstantTexture
            self.radiance = ConstantTexture(color=1.0)
        self.m_flags = EmitterFlags.Infinite

    def eval(self, si, active):
        return jnp.where(jnp.asarray(active)[..., None],
                         self.radiance.eval(si, active), 0.0)

    def sample_direction(self, it, sample, active):
        n = it.p.shape[0]
        d = warp.square_to_uniform_sphere(sample)
        pdf = jnp.full((n,), m.InvFourPi, it.p.dtype)
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        dist = 2.0 * radius + m.norm(it.p - center)
        ds = DirectionSample(
            p=it.p + d * dist[..., None], n=-d,
            uv=jnp.zeros((n, 2), it.p.dtype), time=it.time, pdf=pdf,
            delta=jnp.zeros((n,), bool), d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        si = _si_on_emitter(ds.p, -d, ds.uv, -d, it)
        spec = self.radiance.eval(si, active) * (4.0 * m.Pi)
        spec = jnp.where(jnp.asarray(active)[..., None], spec, 0.0)
        return ds, spec

    def pdf_direction(self, it, ds, active):
        return jnp.full(ds.pdf.shape, m.InvFourPi, ds.pdf.dtype)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        raise NotImplementedError("constant emitter sample_ray: "
                                  "needed only by bidirectional methods")

    def traverse(self, cb):
        cb.put_object("radiance", self.radiance)
