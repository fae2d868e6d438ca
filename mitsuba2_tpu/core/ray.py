"""Rays as SoA pytrees (reference: include/mitsuba/core/ray.h).

A Ray carries origin/direction plus [mint, maxt], time and — in spectral
variants — the hero wavelengths. RayDifferential adds offset rays used for
texture filtering (sensor ray differentials)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import math as m


class Ray(NamedTuple):
    o: jnp.ndarray          # (..., 3)
    d: jnp.ndarray          # (..., 3)
    mint: jnp.ndarray       # (...,)
    maxt: jnp.ndarray       # (...,)
    time: jnp.ndarray       # (...,)
    wavelengths: jnp.ndarray  # (..., C) — zeros-width placeholder when not spectral

    @staticmethod
    def make(o, d, mint=None, maxt=None, time=None, wavelengths=None) -> "Ray":
        o = jnp.asarray(o); d = jnp.asarray(d)
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        dt = o.dtype
        if mint is None: mint = jnp.full(batch, m.RayEpsilon, dt)
        else: mint = jnp.broadcast_to(jnp.asarray(mint, dt), batch)
        if maxt is None: maxt = jnp.full(batch, jnp.inf, dt)
        else: maxt = jnp.broadcast_to(jnp.asarray(maxt, dt), batch)
        if time is None: time = jnp.zeros(batch, dt)
        else: time = jnp.broadcast_to(jnp.asarray(time, dt), batch)
        if wavelengths is None: wavelengths = jnp.zeros(batch + (0,), dt)
        return Ray(jnp.broadcast_to(o, batch + (3,)),
                   jnp.broadcast_to(d, batch + (3,)),
                   mint, maxt, time, wavelengths)

    def __call__(self, t):
        """Point along the ray: o + t*d (ray.h operator())."""
        return self.o + self.d * t[..., None]

    def replace(self, **kw) -> "Ray":
        return self._replace(**kw)


class RayDifferential(NamedTuple):
    ray: Ray
    o_x: jnp.ndarray
    o_y: jnp.ndarray
    d_x: jnp.ndarray
    d_y: jnp.ndarray
    has_differentials: bool  # static flag

    @staticmethod
    def from_ray(ray: Ray) -> "RayDifferential":
        z = jnp.zeros_like(ray.o)
        return RayDifferential(ray, z, z, z, z, False)

    def scale_differential(self, amount) -> "RayDifferential":
        """Adjust differentials for spp != 1 (ray.h scale_differential)."""
        r = self.ray
        return RayDifferential(
            r,
            (self.o_x - r.o) * amount + r.o,
            (self.o_y - r.o) * amount + r.o,
            (self.d_x - r.d) * amount + r.d,
            (self.d_y - r.d) * amount + r.d,
            self.has_differentials)
