"""Axis-aligned bounding boxes (reference: include/mitsuba/core/bbox.h)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as m


class BoundingBox(NamedTuple):
    min: jnp.ndarray  # (..., 3)
    max: jnp.ndarray  # (..., 3)

    @staticmethod
    def invalid(batch=(), dtype=jnp.float32) -> "BoundingBox":
        return BoundingBox(jnp.full(batch + (3,), jnp.inf, dtype),
                           jnp.full(batch + (3,), -jnp.inf, dtype))

    @staticmethod
    def from_points(p) -> "BoundingBox":
        return BoundingBox(jnp.min(p, axis=-2), jnp.max(p, axis=-2))

    def expand(self, other: "BoundingBox") -> "BoundingBox":
        return BoundingBox(jnp.minimum(self.min, other.min),
                           jnp.maximum(self.max, other.max))

    def valid(self):
        return jnp.all(self.max >= self.min, axis=-1)

    @property
    def center(self):
        return 0.5 * (self.min + self.max)

    @property
    def extents(self):
        return self.max - self.min

    def surface_area(self):
        e = self.extents
        return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2]
                      + e[..., 0] * e[..., 2])

    def contains(self, p, strict: bool = False):
        if strict:
            return jnp.all((p > self.min) & (p < self.max), axis=-1)
        return jnp.all((p >= self.min) & (p <= self.max), axis=-1)

    def distance_squared(self, p):
        d = jnp.maximum(jnp.maximum(self.min - p, p - self.max), 0.0)
        return jnp.sum(d * d, axis=-1)

    def bounding_sphere(self):
        c = self.center
        return c, m.norm(self.max - c)

    def ray_intersect(self, o, d, mint=0.0, maxt=jnp.inf):
        """Slab test; returns (hit_mask, t_near, t_far) (bbox.h ray_intersect)."""
        inv_d = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d),
                          jnp.where(d >= 0, jnp.inf, -jnp.inf))
        t1 = (self.min - o) * inv_d
        t2 = (self.max - o) * inv_d
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (t_near <= t_far) & (t_far >= mint) & (t_near <= maxt)
        return hit, t_near, t_far
