"""Interaction records as SoA pytrees.

Parity: include/mitsuba/render/interaction.h — ``SurfaceInteraction``
(fields at interaction.h:83-131), ``MediumInteraction`` (interaction.h:368),
``PreliminaryIntersection`` with lazy ``compute_surface_interaction``
(interaction.h:511-569). Object pointers become integer ids into the scene's
static tables (shape_idx/prim_idx); "invalid" is encoded as t == inf like the
reference's ``is_valid``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.ray import Ray


class SurfaceInteraction(NamedTuple):
    t: jnp.ndarray            # (N,) hit distance, inf if miss
    p: jnp.ndarray            # (N,3) position
    n: jnp.ndarray            # (N,3) geometric normal
    sh_frame: Frame           # shading frame (n = shading normal)
    uv: jnp.ndarray           # (N,2)
    wi: jnp.ndarray           # (N,3) incident dir, LOCAL shading frame
    dp_du: jnp.ndarray        # (N,3)
    dp_dv: jnp.ndarray        # (N,3)
    shape_idx: jnp.ndarray    # (N,) int32 index into scene shape table (-1 miss)
    prim_idx: jnp.ndarray     # (N,) int32 primitive (face) index
    wavelengths: jnp.ndarray  # (N,C) hero wavelengths (0-width if not spectral)
    time: jnp.ndarray         # (N,)
    # resolved plugin indices (filled by compute_surface_interaction so the
    # hot loop never re-gathers them; -1 where absent)
    bsdf_idx: jnp.ndarray = None
    emitter_idx: jnp.ndarray = None
    prim_uv: jnp.ndarray = None  # (N,2) barycentrics (mesh_attribute interp)
    duv_dx: jnp.ndarray = None   # (N,2) uv footprint (compute_uv_partials)
    duv_dy: jnp.ndarray = None

    def compute_uv_partials(self, rd) -> "SurfaceInteraction":
        """Screen-space uv footprint from a RayDifferential
        (interaction.h:217-249): intersect the offset rays with the
        tangent plane, least-squares-project onto (dp_du, dp_dv)."""
        if not rd.has_differentials:
            return self
        dist = m.dot(self.n, self.p)
        t_x = (dist - m.dot(self.n, rd.o_x)) / m.dot(self.n, rd.d_x)
        t_y = (dist - m.dot(self.n, rd.o_y)) / m.dot(self.n, rd.d_y)
        dp_dx = rd.o_x + rd.d_x * t_x[..., None] - self.p
        dp_dy = rd.o_y + rd.d_y * t_y[..., None] - self.p
        a00 = m.dot(self.dp_du, self.dp_du)
        a01 = m.dot(self.dp_du, self.dp_dv)
        a11 = m.dot(self.dp_dv, self.dp_dv)
        det = a00 * a11 - a01 * a01
        inv_det = jnp.where(jnp.abs(det) > 1e-20,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        inv_det = jnp.where(jnp.isfinite(inv_det), inv_det, 0.0)
        b0x = m.dot(self.dp_du, dp_dx)
        b1x = m.dot(self.dp_dv, dp_dx)
        b0y = m.dot(self.dp_du, dp_dy)
        b1y = m.dot(self.dp_dv, dp_dy)
        duv_dx = jnp.stack([(a11 * b0x - a01 * b1x) * inv_det,
                            (a00 * b1x - a01 * b0x) * inv_det], -1)
        duv_dy = jnp.stack([(a11 * b0y - a01 * b1y) * inv_det,
                            (a00 * b1y - a01 * b0y) * inv_det], -1)
        # offset rays parallel to the tangent plane / missed lanes: zero
        # footprint instead of NaN
        duv_dx = jnp.where(jnp.isfinite(duv_dx), duv_dx, 0.0)
        duv_dy = jnp.where(jnp.isfinite(duv_dy), duv_dy, 0.0)
        return self._replace(duv_dx=duv_dx, duv_dy=duv_dy)

    def has_uv_partials(self):
        return self.duv_dx is not None

    def is_valid(self):
        return jnp.isfinite(self.t)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    def to_world(self, v):
        return self.sh_frame.to_world(v)

    def spawn_ray(self, d) -> Ray:
        """Offset ray origin to avoid self-intersection (interaction.h
        spawn_ray — offsets along the geometric normal scaled by position
        magnitude, mirrored here with the same RayEpsilon semantics)."""
        o = self.offset_p(d)
        return Ray.make(o, d, mint=jnp.zeros(self.t.shape, self.t.dtype),
                        maxt=jnp.full(self.t.shape, jnp.inf, self.t.dtype),
                        time=self.time, wavelengths=self.wavelengths)

    def spawn_ray_to(self, p) -> tuple[Ray, jnp.ndarray]:
        """Shadow ray toward a target point; returns (ray, distance)."""
        d = p - self.offset_p(p - self.p)
        dist = m.norm(d)
        d = d / jnp.maximum(dist, 1e-20)[..., None]
        ray = Ray.make(self.offset_p(p - self.p), d,
                       mint=jnp.zeros_like(dist),
                       maxt=dist * (1.0 - m.ShadowEpsilon),
                       time=self.time, wavelengths=self.wavelengths)
        return ray, dist

    def offset_p(self, d):
        """Ray-epsilon offset along the geometric normal, sign chosen to face
        the outgoing direction d."""
        mag = (1.0 + jnp.max(jnp.abs(self.p), axis=-1)) * m.RayEpsilon
        sgn = m.sign(m.dot(self.n, d))
        return self.p + (mag * sgn)[..., None] * self.n

    @staticmethod
    def invalid(n_lanes: int, n_channels: int = 0, dtype=jnp.float32):
        z3 = jnp.zeros((n_lanes, 3), dtype)
        zn = z3.at[..., 2].set(1.0)
        return SurfaceInteraction(
            t=jnp.full((n_lanes,), jnp.inf, dtype),
            p=z3, n=zn, sh_frame=Frame(
                jnp.zeros((n_lanes, 3), dtype).at[..., 0].set(1.0),
                jnp.zeros((n_lanes, 3), dtype).at[..., 1].set(1.0),
                zn),
            uv=jnp.zeros((n_lanes, 2), dtype),
            wi=zn, dp_du=z3, dp_dv=z3,
            shape_idx=jnp.full((n_lanes,), -1, jnp.int32),
            prim_idx=jnp.zeros((n_lanes,), jnp.int32),
            wavelengths=jnp.zeros((n_lanes, n_channels), dtype),
            time=jnp.zeros((n_lanes,), dtype),
            bsdf_idx=jnp.full((n_lanes,), -1, jnp.int32),
            emitter_idx=jnp.full((n_lanes,), -1, jnp.int32))


class MediumInteraction(NamedTuple):
    """Scattering event inside a medium (interaction.h:368)."""
    t: jnp.ndarray
    p: jnp.ndarray
    sh_frame: Frame
    wi: jnp.ndarray             # local frame
    medium_idx: jnp.ndarray
    sigma_s: jnp.ndarray
    sigma_n: jnp.ndarray
    sigma_t: jnp.ndarray
    combined_extinction: jnp.ndarray
    mint: jnp.ndarray
    wavelengths: jnp.ndarray
    time: jnp.ndarray

    def is_valid(self):
        return jnp.isfinite(self.t)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    def to_world(self, v):
        return self.sh_frame.to_world(v)


class PreliminaryIntersection(NamedTuple):
    """Cheap hit record; full SurfaceInteraction computed lazily
    (interaction.h:511 — mirrors the ray_intersect_preliminary /
    compute_surface_interaction split)."""
    t: jnp.ndarray
    prim_uv: jnp.ndarray      # barycentric (N,2)
    shape_idx: jnp.ndarray
    prim_idx: jnp.ndarray

    def is_valid(self):
        return jnp.isfinite(self.t)
