"""Sensor plugins (reference: src/sensors/{perspective,thinlens,
radiancemeter,irradiancemeter}.cpp)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core import warp
from ..core.ray import Ray
from ..core.transform import Transform
from ..render.sensor import Sensor, ProjectiveCamera
from ..variants import current as current_variant


def _sample_wavelengths(wavelength_sample, nlanes, dtype):
    var = current_variant()
    if var.is_spectral:
        from ..core import spectrum as spec_mod
        wav, weight = spec_mod.sample_wavelength(wavelength_sample)
        return wav, weight
    return jnp.zeros((nlanes, 0), dtype), jnp.ones((nlanes, var.n_channels),
                                                   dtype)


def _parse_fov(props, aspect: float) -> float:
    """fov + fov_axis handling (perspective.cpp parse_fov semantics)."""
    if props is None:
        return 34.0
    if props.has_property("focal_length") and props.has_property("fov"):
        raise RuntimeError("specify either focal_length or fov, not both")
    axis = props.string("fov_axis", "x")
    if props.has_property("fov"):
        fov = props.float_("fov")
    else:
        # 35mm-equivalent focal length (36x24mm frame, diagonal 43.27mm)
        focal = props.get("focal_length", "50mm")
        if isinstance(focal, str):
            focal = float(focal.replace("mm", ""))
        fov = float(np.rad2deg(2.0 * np.arctan(43.266615300557 / 2.0 / focal)))
        axis = "diagonal"

    def conv(v, factor):
        return float(np.rad2deg(
            2.0 * np.arctan(np.tan(np.deg2rad(v) * 0.5) * factor)))

    if axis == "x":
        return fov
    if axis == "y":
        return conv(fov, aspect)
    if axis == "diagonal":
        diag = np.hypot(1.0, 1.0 / aspect)
        return conv(fov, 1.0 / diag)
    if axis == "smaller":
        return fov if aspect < 1 else conv(fov, aspect)
    if axis == "larger":
        return conv(fov, aspect) if aspect < 1 else fov
    raise RuntimeError(f"bad fov_axis {axis!r}")


@register_plugin("sensor", "perspective")
class PerspectiveCamera(ProjectiveCamera):
    """(perspective.cpp:1-325) pinhole camera with ray differentials."""

    def __init__(self, props=None):
        super().__init__(props)
        w, h = self.film.crop_size
        aspect = w / h
        self.x_fov = _parse_fov(props, aspect)
        self._update_camera_transforms(aspect)

    def _update_camera_transforms(self, aspect):
        film = self.film
        w, h = film.size
        cw, chh = film.crop_size
        cx, cy = film.crop_offset
        pcam = Transform.perspective(self.x_fov, self.near_clip, self.far_clip)
        # image-plane rect at z=1 spans x in [-1,1], y in [-1/a, 1/a];
        # map to [0,1]^2: y scale is -0.5*aspect (perspective.cpp
        # update_camera_transforms)
        scale = Transform.scale([-0.5, -0.5 * aspect, 1.0])
        trans = Transform.translate([-1.0, -1.0 / aspect, 0.0])
        camera_to_sample = scale @ trans @ pcam
        # account for crop window (maps full film [0,1] to crop [0,1])
        crop_scale = Transform.scale([w / cw, h / chh, 1.0])
        crop_trans = Transform.translate([-cx / w, -cy / h, 0.0])
        self.camera_to_sample = crop_scale @ crop_trans @ camera_to_sample
        self.sample_to_camera = self.camera_to_sample.inverse()
        if self.world_transform is None:
            self.world_transform = Transform.identity()

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample, active=True):
        n = position_sample.shape[0]
        dt = position_sample.dtype
        wav, wav_weight = _sample_wavelengths(wavelength_sample, n, dt)
        p3 = jnp.concatenate([position_sample,
                              jnp.zeros((n, 1), dt)], axis=-1)
        near_p = self.sample_to_camera.transform_point(p3)
        d = m.normalize(near_p)
        inv_z = 1.0 / d[..., 2]
        o = self.world_transform.transform_point(jnp.zeros((n, 3), dt))
        d_world = self.world_transform.transform_vector(d)
        ray = Ray.make(o + d_world * (self.near_clip * inv_z)[..., None],
                       d_world,
                       mint=jnp.zeros((n,), dt),
                       maxt=jnp.full((n,), (self.far_clip - self.near_clip),
                                     dt) * inv_z,
                       time=jnp.broadcast_to(jnp.asarray(time, dt), (n,)),
                       wavelengths=wav)
        return ray, wav_weight

    def traverse(self, cb):
        super().traverse(cb)
        cb.put_parameter("x_fov", self.x_fov)


@register_plugin("sensor", "thinlens")
class ThinLensCamera(PerspectiveCamera):
    """(thinlens.cpp:1-285) perspective camera with a finite aperture."""

    def __init__(self, props=None):
        self.aperture_radius = props.float_("aperture_radius", 0.1) \
            if props else 0.1
        super().__init__(props)

    def needs_aperture_sample(self):
        return True

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample, active=True):
        n = position_sample.shape[0]
        dt = position_sample.dtype
        wav, wav_weight = _sample_wavelengths(wavelength_sample, n, dt)
        p3 = jnp.concatenate([position_sample,
                              jnp.zeros((n, 1), dt)], axis=-1)
        near_p = self.sample_to_camera.transform_point(p3)
        # aperture point
        ap = warp.square_to_uniform_disk_concentric(aperture_sample) \
            * self.aperture_radius
        ap3 = jnp.concatenate([ap, jnp.zeros((n, 1), dt)], axis=-1)
        # focus plane intersection
        d = m.normalize(near_p)
        focus_t = self.focus_distance / jnp.maximum(d[..., 2], 1e-8)
        focus_p = d * focus_t[..., None]
        d_new = m.normalize(focus_p - ap3)
        o = self.world_transform.transform_point(ap3)
        d_world = self.world_transform.transform_vector(d_new)
        inv_z = 1.0 / jnp.maximum(d_new[..., 2], 1e-8)
        ray = Ray.make(o + d_world * (self.near_clip * inv_z)[..., None],
                       d_world,
                       mint=jnp.zeros((n,), dt),
                       maxt=jnp.full((n,), self.far_clip - self.near_clip,
                                     dt) * inv_z,
                       time=jnp.broadcast_to(jnp.asarray(time, dt), (n,)),
                       wavelengths=wav)
        return ray, wav_weight


@register_plugin("sensor", "radiancemeter")
class RadianceMeter(Sensor):
    """(radiancemeter.cpp) measures radiance along a single ray."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        origin = p.vector3("origin", [0, 0, 0]) if p else np.zeros(3)
        direction = p.vector3("direction", [0, 0, 1]) if p else \
            np.array([0, 0, 1.0])
        if p is not None and p.has_property("to_world"):
            tw = p.transform("to_world")
            mtx = np.asarray(tw.matrix)
            origin = mtx[:3, 3]
            direction = mtx[:3, 2]
        self.origin = jnp.asarray(origin, jnp.float32)
        self.direction = jnp.asarray(
            direction / np.linalg.norm(direction), jnp.float32)

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample, active=True):
        n = position_sample.shape[0]
        dt = position_sample.dtype
        wav, wav_weight = _sample_wavelengths(wavelength_sample, n, dt)
        ray = Ray.make(jnp.broadcast_to(self.origin, (n, 3)),
                       jnp.broadcast_to(self.direction, (n, 3)),
                       time=jnp.broadcast_to(jnp.asarray(time, dt), (n,)),
                       wavelengths=wav)
        return ray, wav_weight


@register_plugin("sensor", "irradiancemeter")
class IrradianceMeter(Sensor):
    """(irradiancemeter.cpp) measures irradiance over an attached shape:
    cosine-weighted rays from its surface. Shape attachment is wired by the
    scene loader."""

    def __init__(self, props=None):
        super().__init__(props)
        self.shape = None

    def set_shape(self, shape):
        self.shape = shape
        # build the area-sampling pack EAGERLY: constructing it inside a
        # jitted sample_ray would fold traced values into host tables.
        # Analytic prims call set_shape before tessellating — wait for
        # the mesh re-point from expand()/_tessellate.
        if not shape.is_mesh():
            return
        from .emitters import AreaEmitter  # reuse packing
        helper = AreaEmitter()
        helper.shape = shape
        helper.prepare(None)
        self._pack = helper

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample, active=True):
        if self.shape is None or not hasattr(self, "_pack"):
            raise RuntimeError("irradiancemeter requires a shape")
        hp = self._pack
        n = position_sample.shape[0]
        dt = position_sample.dtype
        wav, wav_weight = _sample_wavelengths(wavelength_sample, n, dt)
        face, u_re = hp.face_distr.sample_reuse(position_sample[..., 0])
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u_re, position_sample[..., 1]], -1))
        p = (hp.tv0[face] + hp.te1[face] * bary[..., 0:1]
             + hp.te2[face] * bary[..., 1:2])
        nrm = hp.tn[face]
        from ..core.frame import Frame
        frame = Frame.from_normal(nrm)
        local = warp.square_to_cosine_hemisphere(aperture_sample)
        d = frame.to_world(local)
        ray = Ray.make(p + nrm * 1e-4, d,
                       time=jnp.broadcast_to(jnp.asarray(time, dt), (n,)),
                       wavelengths=wav)
        return ray, wav_weight * m.Pi
