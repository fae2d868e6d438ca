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
        # packed per-face table for one-hot gather (ops/gather.py)
        cols = [v0, e1, e2, np.asarray(self.tn)]
        if self.tuv0 is not None:
            cols += [uv[:, 0], uv[:, 1], uv[:, 2]]
        self._face_table = jnp.asarray(
            np.concatenate(cols, axis=1).astype(np.float32))
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
        from ..ops.gather import gather_rows
        face, u_re = self.face_distr.sample_reuse(sample[..., 0])
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u_re, sample[..., 1]], -1))
        bu, bv = bary[..., 0], bary[..., 1]
        A = gather_rows(self._face_table, face)
        v0, te1, te2, nrm = A[:, 0:3], A[:, 3:6], A[:, 6:9], A[:, 9:12]
        p = v0 + te1 * bu[..., None] + te2 * bv[..., None]
        if self.tuv0 is not None:
            uv = (A[:, 12:14] * (1 - bu - bv)[..., None]
                  + A[:, 14:16] * bu[..., None]
                  + A[:, 16:18] * bv[..., None])
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
        wavelengths=wavelengths, time=time,
        bsdf_idx=jnp.full((nlanes,), -1, jnp.int32),
        emitter_idx=jnp.full((nlanes,), -1, jnp.int32))


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
        """Emitted ray: uniform point on the scene's bounding sphere +
        inward cosine direction (constant.cpp:59-78)."""
        from ..core.ray import Ray
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        v0 = warp.square_to_uniform_sphere(sample2)
        v1 = warp.square_to_cosine_hemisphere(sample3)
        d = Frame.from_normal(-v0).to_world(v1)
        p = center + v0 * radius
        nlanes = p.shape[0]
        var = current_variant()
        if var.is_spectral:
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), p.dtype)
            wav_weight = 1.0
        si = _si_on_emitter(p, -v0, jnp.zeros((nlanes, 2), p.dtype), d,
                            None, time=time, wavelengths=wav)
        weight = self.radiance.eval(si, active) * wav_weight \
            * (4.0 * (m.Pi * radius) ** 2)
        return Ray.make(p, d, time=time, wavelengths=wav), weight

    def traverse(self, cb):
        cb.put_object("radiance", self.radiance)


# =============================================================================
# envmap (envmap.cpp:1-334), directional, spot, projector
# =============================================================================

from ..core.transform import Transform
from ..core import spectrum as spec_mod


@register_plugin("emitter", "envmap")
class EnvironmentMap(Emitter):
    """(envmap.cpp) lat-long environment map with Hierarchical2D importance
    sampling over sin-theta-weighted luminance (envmap.cpp:67)."""

    def __init__(self, props=None, data=None, scale=1.0):
        super().__init__(props)
        if props is not None:
            from ..utils import io_image
            filename = props.string("filename")
            data = io_image.read_image(filename)
            scale = props.float_("scale", 1.0)
            self.to_world = props.transform("to_world", Transform.identity())
        else:
            self.to_world = Transform.identity()
        data = np.asarray(data, np.float32)
        if data.ndim == 2:
            data = data[..., None]
        if data.shape[-1] == 1:
            data = np.repeat(data, 3, -1)
        data = data[..., :3] * scale
        self.scale = scale
        from .textures import BitmapTexture
        self.bitmap = BitmapTexture(data=data)
        h, w = data.shape[0], data.shape[1]
        self.res = (w, h)
        if current_variant().is_spectral:
            # per-texel HDR decomposition (envmap.cpp:95-115): scale =
            # 2*max(rgb), srgb sigmoid coefficients of rgb/scale; eval
            # = sigmoid(λ) · scale · d65(λ)/∫d65·ȳ  (whitepoint folded
            # into the stored scale, like the megakernel's env table)
            from ..render.srgb import srgb_model_fetch
            from ..core.spectrum import d65_y_normalization
            sc = 2.0 * data.max(axis=-1)
            unit = data / np.maximum(sc, 1e-8)[..., None]
            self._spec_coeff = jnp.asarray(
                np.asarray(srgb_model_fetch(unit), np.float32)
                .reshape(h * w, 3))
            self._spec_scale = jnp.asarray(
                (sc / d65_y_normalization()).reshape(h * w)
                .astype(np.float32))
        # importance table: luminance * sin(theta) at texel vertices
        lum = (0.212671 * data[..., 0] + 0.715160 * data[..., 1]
               + 0.072169 * data[..., 2])
        theta = (np.arange(h) + 0.5) / h * np.pi
        weight = lum * np.sin(theta)[:, None]
        from ..core.distr_2d import Hierarchical2D
        self.warp = Hierarchical2D.create(jnp.asarray(weight))
        self.m_flags = EmitterFlags.Infinite | EmitterFlags.SpatiallyVarying
        self.to_local_t = self.to_world.inverse()

    def _dir_to_uv(self, d_world):
        d = self.to_local_t.transform_vector(d_world)
        d = m.normalize(d)
        u = jnp.arctan2(d[..., 0], -d[..., 2]) * m.InvTwoPi + 0.5
        v = m.safe_acos(jnp.clip(d[..., 1], -1.0, 1.0)) * m.InvPi
        return jnp.stack([u, v], axis=-1)

    def _uv_to_dir(self, uv):
        phi = (uv[..., 0] - 0.5) * m.TwoPi
        theta = uv[..., 1] * m.Pi
        st = jnp.sin(theta)
        d = m.vec3(st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi))
        return m.normalize(self.to_world.transform_vector(d)), st

    def _radiance_at_uv(self, uv, it_or_si, active):
        if current_variant().is_spectral:
            return self._radiance_spectral(uv, it_or_si.wavelengths)
        si = _si_on_emitter(
            jnp.zeros(uv.shape[:-1] + (3,), uv.dtype),
            jnp.zeros(uv.shape[:-1] + (3,), uv.dtype).at[..., 2].set(1.0),
            uv, jnp.zeros(uv.shape[:-1] + (3,), uv.dtype).at[..., 2].set(1.0),
            it_or_si)
        return self.bitmap.eval(si, active)

    def _radiance_spectral(self, uv, wavelengths):
        """Hero-wavelength radiance at (u, v): per-corner sigmoid evals
        bilinearly blended, scale blended linearly, times the D65
        whitepoint (envmap.cpp:269-307 eval_spectrum)."""
        from ..render.srgb import srgb_model_eval
        from ..core import spectrum as spec_mod
        w, h = self.res
        fu = uv[..., 0] * w - 0.5
        fv = uv[..., 1] * h - 0.5
        u0 = jnp.floor(fu)
        v0 = jnp.floor(fv)
        wu = fu - u0
        wv = fv - v0
        iu0 = jnp.mod(u0.astype(jnp.int32), w)
        iv0 = jnp.mod(v0.astype(jnp.int32), h)
        iu1 = jnp.mod(iu0 + 1, w)
        iv1 = jnp.mod(iv0 + 1, h)
        out = 0.0
        scl = 0.0
        for iv, wy in ((iv0, 1.0 - wv), (iv1, wv)):
            for iu, wx in ((iu0, 1.0 - wu), (iu1, wu)):
                idx = iv * w + iu
                wgt = wy * wx
                out = out + wgt[..., None] * srgb_model_eval(
                    self._spec_coeff[idx], wavelengths)
                scl = scl + wgt * self._spec_scale[idx]
        d65 = spec_mod.cie_d65(wavelengths)
        return out * scl[..., None] * d65

    def eval(self, si, active):
        uv = self._dir_to_uv(-si.to_world(si.wi))
        val = self._radiance_at_uv(uv, si, active)
        return jnp.where(jnp.asarray(active)[..., None], val, 0.0)

    def sample_direction(self, it, sample, active):
        n = it.p.shape[0]
        uv, pdf_uv = self.warp.sample(sample)
        d, st = self._uv_to_dir(uv)
        # uv-area to solid-angle: dA_uv/dOmega = 1/(2 pi^2 sin(theta))
        pdf = m.safe_div(pdf_uv, 2.0 * m.Pi * m.Pi * st, 0.0)
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        dist = 2.0 * radius + m.norm(it.p - center)
        ds = DirectionSample(
            p=it.p + d * dist[..., None], n=-d, uv=uv, time=it.time,
            pdf=pdf, delta=jnp.zeros((n,), bool), d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        val = self._radiance_at_uv(uv, it, active)
        spec = val * m.safe_div(1.0, pdf, 0.0)[..., None]
        ok = jnp.asarray(active) & (pdf > 0)
        return ds, jnp.where(ok[..., None], spec, 0.0)

    def pdf_direction(self, it, ds, active):
        uv = self._dir_to_uv(ds.d)
        pdf_uv = self.warp.eval(uv)
        st = jnp.sin(uv[..., 1] * m.Pi)
        return m.safe_div(pdf_uv, 2.0 * m.Pi * m.Pi * st, 0.0)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        """Emitted ray: importance-sampled direction (Hierarchical2D over
        sin-theta-weighted luminance) + uniform disk origin on the
        bounding-sphere cross-section. The reference leaves this
        NotImplemented (envmap.cpp:149-154); semantics follow
        directional.cpp:80-105's spatial construction with the warp's
        directional density."""
        from ..core.ray import Ray
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        uv, pdf_uv = self.warp.sample(sample2)
        d_to_env, st = self._uv_to_dir(uv)
        d = -d_to_env                       # ray travels into the scene
        pdf_dir = m.safe_div(pdf_uv, 2.0 * m.Pi * m.Pi * st, 0.0)
        offset = warp.square_to_uniform_disk_concentric(sample3)
        frame = Frame.from_normal(d)
        perp = (frame.s * offset[..., 0:1] + frame.t * offset[..., 1:2])
        p = center + (perp - d) * radius
        nlanes = p.shape[0]
        var = current_variant()
        if var.is_spectral:
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), uv.dtype)
            wav_weight = 1.0
        si = _si_on_emitter(p, d, uv, d, None, time=time, wavelengths=wav)
        val = self.bitmap.eval(si, active)
        weight = val * wav_weight \
            * m.safe_div(m.Pi * radius * radius, pdf_dir, 0.0)[..., None]
        ok = jnp.asarray(active) & (pdf_dir > 0)
        return Ray.make(p, d, time=time, wavelengths=wav), \
            jnp.where(ok[..., None], weight, 0.0)

    def traverse(self, cb):
        cb.put_object("data", self.bitmap)


@register_plugin("emitter", "directional")
class DirectionalEmitter(Emitter):
    """(directional.cpp:1-172) delta-direction distant emitter."""

    def __init__(self, props=None, direction=None, irradiance=1.0):
        super().__init__(props)
        if props is not None:
            d = props.vector3("direction", [0, 0, 1])
            if props.has_property("to_world"):
                tw = props.transform("to_world")
                d = np.asarray(tw.matrix)[:3, 2]
            self.irradiance = props.texture_d65("irradiance", 1.0)
        else:
            d = np.asarray(direction if direction is not None else [0, 0, 1],
                           np.float32)
            from .textures import ConstantTexture
            self.irradiance = ConstantTexture(color=irradiance)
        self.direction = jnp.asarray(d / np.linalg.norm(d), jnp.float32)
        self.m_flags = EmitterFlags.Infinite | EmitterFlags.DeltaDirection

    def eval(self, si, active):
        nch = current_variant().n_channels
        return jnp.zeros(si.t.shape + (nch,), si.t.dtype)

    def sample_direction(self, it, sample, active):
        n = it.p.shape[0]
        d = jnp.broadcast_to(-self.direction, it.p.shape)
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        dist = 2.0 * radius + m.norm(it.p - center)
        ds = DirectionSample(
            p=it.p + d * dist[..., None], n=jnp.broadcast_to(self.direction,
                                                             it.p.shape),
            uv=jnp.zeros((n, 2), it.p.dtype), time=it.time,
            pdf=jnp.ones((n,), it.p.dtype), delta=jnp.ones((n,), bool),
            d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        si = _si_on_emitter(ds.p, self.direction + jnp.zeros_like(d),
                            ds.uv, d, it)
        spec = self.irradiance.eval(si, active)
        return ds, jnp.where(jnp.asarray(active)[..., None], spec, 0.0)

    def pdf_direction(self, it, ds, active):
        return jnp.zeros(ds.pdf.shape, ds.pdf.dtype)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        """Emitted ray: uniform disk on the bounding-sphere cross-section
        perpendicular to the (delta) direction (directional.cpp:80-105)."""
        from ..core.ray import Ray
        center, radius = self._scene_bsphere or (jnp.zeros(3), 1.0)
        d = jnp.broadcast_to(self.direction, sample2.shape[:-1] + (3,))
        offset = warp.square_to_uniform_disk_concentric(sample2)
        frame = Frame.from_normal(d)
        perp = frame.s * offset[..., 0:1] + frame.t * offset[..., 1:2]
        p = center + (perp - d) * radius
        nlanes = p.shape[0]
        var = current_variant()
        if var.is_spectral:
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), p.dtype)
            wav_weight = 1.0
        si = _si_on_emitter(p, d, jnp.zeros((nlanes, 2), p.dtype), d,
                            None, time=time, wavelengths=wav)
        weight = self.irradiance.eval(si, active) * wav_weight \
            * (m.Pi * radius * radius)
        return Ray.make(p, d, time=time, wavelengths=wav), weight

    def traverse(self, cb):
        cb.put_object("irradiance", self.irradiance)


@register_plugin("emitter", "spot")
class SpotEmitter(Emitter):
    """(spot.cpp:1-203) point light with linear-falloff cone."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.intensity = p.texture_d65("intensity", 1.0) if p else None
        if self.intensity is None:
            from .textures import ConstantTexture
            self.intensity = ConstantTexture(color=1.0)
        cutoff = p.float_("cutoff_angle", 20.0) if p else 20.0
        beam = p.float_("beam_width", cutoff * 0.75) if p else cutoff * 0.75
        self.cutoff_angle = np.deg2rad(cutoff)
        self.beam_width = np.deg2rad(beam)
        self.cos_cutoff = float(np.cos(self.cutoff_angle))
        self.cos_beam = float(np.cos(self.beam_width))
        self.inv_transition_width = 1.0 / max(
            self.cutoff_angle - self.beam_width, 1e-6)
        self.texture = p.texture("texture", 1.0) if (
            p is not None and p.has_property("texture")) else None
        tw = p.transform("to_world", Transform.identity()) if p else \
            Transform.identity()
        self.to_world = tw
        self.to_local = tw.inverse()
        self.position = jnp.asarray(np.asarray(tw.matrix)[:3, 3], jnp.float32)
        self.m_flags = EmitterFlags.DeltaPosition

    def _falloff(self, d_world, active):
        """Angular falloff (spot.cpp falloff_curve)."""
        local = self.to_local.transform_vector(d_world)
        local = m.normalize(local)
        ct = local[..., 2]
        angle = m.safe_acos(ct)
        falloff = jnp.clip((self.cutoff_angle - angle)
                           * self.inv_transition_width, 0.0, 1.0)
        falloff = jnp.where(ct >= self.cos_beam, 1.0, falloff)
        falloff = jnp.where(ct <= self.cos_cutoff, 0.0, falloff)
        if self.texture is not None:
            uv = jnp.stack([
                0.5 + 0.5 * m.safe_div(local[..., 0], local[..., 2], 0.0),
                0.5 + 0.5 * m.safe_div(local[..., 1], local[..., 2], 0.0)],
                axis=-1)
            si = _si_on_emitter(jnp.zeros_like(d_world),
                                jnp.zeros_like(d_world).at[..., 2].set(1.0),
                                uv,
                                jnp.zeros_like(d_world).at[..., 2].set(1.0),
                                None,
                                time=jnp.zeros(d_world.shape[:-1],
                                               d_world.dtype),
                                wavelengths=jnp.zeros(
                                    d_world.shape[:-1] + (0,), d_world.dtype))
            return falloff[..., None] * self.texture.eval(si, active)
        return falloff[..., None]

    def eval(self, si, active):
        nch = current_variant().n_channels
        return jnp.zeros(si.t.shape + (nch,), si.t.dtype)

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
        falloff = self._falloff(-d, active)
        spec = self.intensity.eval(si, active) * falloff / dist2[..., None]
        return ds, jnp.where(jnp.asarray(active)[..., None], spec, 0.0)

    def pdf_direction(self, it, ds, active):
        return jnp.zeros(ds.pdf.shape, ds.pdf.dtype)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        from ..core.ray import Ray
        local = warp.square_to_uniform_cone(
            sample2, self.cos_cutoff)
        d = self.to_world.transform_vector(local)
        nlanes = d.shape[0]
        pdf_dir = warp.square_to_uniform_cone_pdf(local, self.cos_cutoff)
        var = current_variant()
        if var.is_spectral:
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), d.dtype)
            wav_weight = 1.0
        si = _si_on_emitter(jnp.broadcast_to(self.position, d.shape), d,
                            jnp.zeros((nlanes, 2), d.dtype), d, None,
                            time=time, wavelengths=wav)
        falloff = self._falloff(d, active)
        spec = self.intensity.eval(si, active) * falloff * wav_weight \
            * m.safe_div(1.0, pdf_dir, 0.0)[..., None]
        return Ray.make(jnp.broadcast_to(self.position, d.shape), d,
                        time=time, wavelengths=wav), spec

    def traverse(self, cb):
        cb.put_object("intensity", self.intensity)


@register_plugin("emitter", "projector")
class ProjectorEmitter(Emitter):
    """(projector.cpp:1-227) textured perspective projector (delta
    position)."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.irradiance = p.texture("irradiance", 1.0) if p else None
        if self.irradiance is None:
            from .textures import ConstantTexture
            self.irradiance = ConstantTexture(color=1.0)
        self.scale = p.float_("scale", 1.0) if p else 1.0
        fov = p.float_("fov", 45.0) if p else 45.0
        tw = p.transform("to_world", Transform.identity()) if p else \
            Transform.identity()
        self.to_world = tw
        self.to_local = tw.inverse()
        self.position = jnp.asarray(np.asarray(tw.matrix)[:3, 3], jnp.float32)
        # camera-style sample mapping (projector.cpp uses a perspective
        # transform like the camera)
        pcam = Transform.perspective(fov, 1e-4, 1e4)
        scale_t = Transform.scale([-0.5, -0.5, 1.0])
        trans_t = Transform.translate([-1.0, -1.0, 0.0])
        self.camera_to_sample = scale_t @ trans_t @ pcam
        self.m_flags = EmitterFlags.DeltaPosition | EmitterFlags.SpatiallyVarying

    def eval(self, si, active):
        nch = current_variant().n_channels
        return jnp.zeros(si.t.shape + (nch,), si.t.dtype)

    def sample_direction(self, it, sample, active):
        n = it.p.shape[0]
        d = self.position - it.p
        dist2 = m.squared_norm(d)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        d = d / dist[..., None]
        # project the shading point into the projector's image plane
        local = self.to_local.transform_vector(-d)
        uvw = self.camera_to_sample.transform_point(local)
        uv = uvw[..., :2]
        in_frustum = ((uv[..., 0] >= 0) & (uv[..., 0] <= 1)
                      & (uv[..., 1] >= 0) & (uv[..., 1] <= 1)
                      & (local[..., 2] > 0))
        ds = DirectionSample(
            p=jnp.broadcast_to(self.position, it.p.shape),
            n=jnp.zeros_like(it.p), uv=uv, time=it.time,
            pdf=jnp.ones((n,), it.p.dtype), delta=jnp.ones((n,), bool),
            d=d, dist=dist,
            emitter_idx=jnp.full((n,), getattr(self, "_emitter_index", 0),
                                 jnp.int32))
        si = _si_on_emitter(ds.p, -d, uv, -d, it)
        spec = self.irradiance.eval(si, active) * self.scale \
            / dist2[..., None]
        ok = jnp.asarray(active) & in_frustum
        return ds, jnp.where(ok[..., None], spec, 0.0)

    def pdf_direction(self, it, ds, active):
        return jnp.zeros(ds.pdf.shape, ds.pdf.dtype)

    def sample_ray(self, time, sample1, sample2, sample3, active):
        """Emitted ray from the projector position through a film sample
        (projector.cpp:118-152; uniform uv = the reference's default
        Texture::sample_position for untextured irradiance)."""
        from ..core.ray import Ray
        uv = sample3
        nlanes = uv.shape[0]
        var = current_variant()
        if var.is_spectral:
            wav, wav_weight = spec_mod.sample_wavelength(sample1)
        else:
            wav = jnp.zeros((nlanes, 0), uv.dtype)
            wav_weight = 1.0
        near = self.camera_to_sample.inverse().transform_point(
            jnp.concatenate([uv, jnp.zeros((nlanes, 1), uv.dtype)], -1))
        d_local = m.normalize(near)
        d = self.to_world.transform_vector(d_local)
        p = jnp.broadcast_to(self.position, (nlanes, 3))
        si = _si_on_emitter(p, d, uv, d, None, time=time, wavelengths=wav)
        weight = self.irradiance.eval(si, active) * self.scale * wav_weight
        return Ray.make(p, d, time=time, wavelengths=wav), weight
