"""Sensors (reference: include/mitsuba/render/sensor.h:16 Sensor,
sensor.h:155 ProjectiveCamera; sample_ray_differential sensor.h:61)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.object import Object
from ..core.ray import Ray, RayDifferential


class Sensor(Object):
    def __init__(self, props=None):
        super().__init__(props)
        film = None
        sampler = None
        if props is not None:
            for _, obj in props.objects():
                kind = getattr(obj, "plugin_category", "")
                if kind == "film":
                    film = obj
                elif kind == "sampler":
                    sampler = obj
        if film is None:
            from ..models.films import HDRFilm
            from ..core.properties import Properties
            film = HDRFilm(Properties("hdrfilm"))
        if sampler is None:
            from ..render.sampler import Sampler
            sampler = Sampler()
        self.film = film
        self.sampler = sampler
        self.shutter_open = props.float_("shutter_open", 0.0) if props else 0.0
        self.shutter_close = props.float_("shutter_close", 0.0) if props else 0.0

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample, active=True):
        """-> (Ray, spectral weight). position_sample in [0,1]^2 over the
        crop window; wavelength_sample drives hero-wavelength sampling in
        spectral variants (sensor.h sample_ray)."""
        raise NotImplementedError

    def sample_ray_differential(self, time, wavelength_sample,
                                position_sample, aperture_sample, active=True):
        """Default implementation: finite-difference offset rays one pixel
        apart (sensor.cpp sample_ray_differential)."""
        ray, weight = self.sample_ray(time, wavelength_sample,
                                      position_sample, aperture_sample, active)
        size = self.film.crop_size
        dx = jnp.asarray([1.0 / size[0], 0.0])
        dy = jnp.asarray([0.0, 1.0 / size[1]])
        ray_x, _ = self.sample_ray(time, wavelength_sample,
                                   position_sample + dx, aperture_sample, active)
        ray_y, _ = self.sample_ray(time, wavelength_sample,
                                   position_sample + dy, aperture_sample, active)
        rd = RayDifferential(ray, ray_x.o, ray_y.o, ray_x.d, ray_y.d, True)
        return rd, weight

    def needs_aperture_sample(self) -> bool:
        return False

    def traverse(self, cb):
        cb.put_object("film", self.film)


class ProjectiveCamera(Sensor):
    """(sensor.h:155) adds near/far clip and focus distance."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.near_clip = p.float_("near_clip", 1e-2) if p else 1e-2
        self.far_clip = p.float_("far_clip", 1e4) if p else 1e4
        self.focus_distance = p.float_("focus_distance", self.far_clip) \
            if p else 1e4
        from ..core.transform import Transform
        self.world_transform = p.transform("to_world", Transform.identity()) \
            if p else None
