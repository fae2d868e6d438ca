"""Participating media implementation (reference: src/media/{homogeneous,
heterogeneous}.cpp, src/librender/medium.cpp:36-90, src/textures/grid3d.cpp).

Free-flight sampling is single-step delta tracking against a per-channel
majorant (medium.cpp:36-75); the volpath integrator chains null collisions
through its wavefront loop. All functions are vectorized and masked.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core.frame import Frame
from ..core.transform import Transform
from ..render.interaction import MediumInteraction
from ..variants import current as current_variant
from .media import Medium, Volume, ConstantVolume, as_volume


@register_plugin("volume", "grid3d")
class Grid3DVolume(Volume):
    """(grid3d.cpp:1-447) trilinearly interpolated 3D grid in [0,1]^3 local
    coordinates; binary .vol files load via utils.vol."""

    def __init__(self, props=None, data=None, to_world=None):
        super().__init__(props)
        if props is not None:
            if props.has_property("filename"):
                from ..utils.vol import read_vol
                data, _bbox = read_vol(props.string("filename"))
            else:
                data = props.get("data")
        data = np.asarray(data, np.float32)
        if data.ndim == 3:
            data = data[..., None]
        self.data = jnp.asarray(data)        # (D, H, W, C)
        self._max = float(data.max())
        self._mean = float(data.mean())
        if to_world is not None:
            self.to_local = to_world.inverse()
            self.identity_transform = False

    def eval_1(self, p_world, active=True):
        """Trilinear lookup of channel 0 at world positions (..., 3)."""
        return self._interp(p_world)[..., 0]

    def eval(self, p_world, active=True):
        v = self._interp(p_world)
        nch = current_variant().n_channels
        if v.shape[-1] == 1:
            return jnp.repeat(v, nch, axis=-1)
        if v.shape[-1] >= nch:
            return v[..., :nch]
        return jnp.repeat(v[..., :1], nch, axis=-1)

    # above this many (depth x height) rows the one-hot matmul outgrows
    # the native-gather cost (ops/gather.py rationale)
    _FACTORIZED_MAX_ROWS = 1024

    def _interp(self, p_world):
        p = self.to_local.transform_point(p_world)
        d, h, w, c = self.data.shape
        fx = p[..., 0] * w - 0.5
        fy = p[..., 1] * h - 0.5
        fz = p[..., 2] * d - 0.5
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
        iz = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, d - 1)
        ix1 = jnp.minimum(ix + 1, w - 1)
        iy1 = jnp.minimum(iy + 1, h - 1)
        iz1 = jnp.minimum(iz + 1, d - 1)
        tx = jnp.clip(fx - ix, 0.0, 1.0)
        ty = jnp.clip(fy - iy, 0.0, 1.0)
        tz = jnp.clip(fz - iz, 0.0, 1.0)
        if d * h <= self._FACTORIZED_MAX_ROWS and p.ndim == 2:
            # TPU-friendly trilinear: dynamic gathers are ~100x slower
            # than arithmetic for wavefront index vectors (ops/gather.py)
            # — fold the z/y lerps into ONE weighted one-hot matmul over
            # (d*h) rows and the x lerp into a weighted column reduce.
            n = p.shape[0]
            g2 = self.data.reshape(d * h, w * c)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, d * h), 1)
            r00 = (iz * h + iy)[:, None]
            r01 = (iz * h + iy1)[:, None]
            r10 = (iz1 * h + iy)[:, None]
            r11 = (iz1 * h + iy1)[:, None]
            w00 = ((1 - tz) * (1 - ty))[:, None]
            w01 = ((1 - tz) * ty)[:, None]
            w10 = (tz * (1 - ty))[:, None]
            w11 = (tz * ty)[:, None]
            W = (jnp.where(rows == r00, w00, 0.0)
                 + jnp.where(rows == r01, w01, 0.0)
                 + jnp.where(rows == r10, w10, 0.0)
                 + jnp.where(rows == r11, w11, 0.0))
            M = jax.lax.dot_general(
                W, g2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (n, w*c)
            M = M.reshape(n, w, c)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
            wc = (jnp.where(cols == ix[:, None], (1 - tx)[:, None], 0.0)
                  + jnp.where(cols == ix1[:, None], tx[:, None], 0.0))
            out = (M * wc[..., None]).sum(axis=1)
        else:
            txc = tx[..., None]
            tyc = ty[..., None]
            tzc = tz[..., None]
            g = self.data
            c00 = g[iz, iy, ix] * (1 - txc) + g[iz, iy, ix1] * txc
            c10 = g[iz, iy1, ix] * (1 - txc) + g[iz, iy1, ix1] * txc
            c01 = g[iz1, iy, ix] * (1 - txc) + g[iz1, iy, ix1] * txc
            c11 = g[iz1, iy1, ix] * (1 - txc) + g[iz1, iy1, ix1] * txc
            c0 = c00 * (1 - tyc) + c10 * tyc
            c1 = c01 * (1 - tyc) + c11 * tyc
            out = c0 * (1 - tzc) + c1 * tzc
        inside = jnp.all((p >= 0.0) & (p <= 1.0), axis=-1)
        return jnp.where(inside[..., None], out, 0.0)

    def max(self):
        return self._max

    def traverse(self, cb):
        cb.put_parameter("data", self.data)


def _zero_mi(n, nch, dtype=jnp.float32):
    z3 = jnp.zeros((n, 3), dtype)
    zn = z3.at[..., 2].set(1.0)
    zc = jnp.zeros((n, nch), dtype)
    return MediumInteraction(
        t=jnp.full((n,), jnp.inf, dtype), p=z3,
        sh_frame=Frame(z3.at[..., 0].set(1.0), z3.at[..., 1].set(1.0), zn),
        wi=zn, medium_idx=jnp.full((n,), -1, jnp.int32),
        sigma_s=zc, sigma_n=zc, sigma_t=zc,
        combined_extinction=jnp.ones((n, nch), dtype),
        mint=jnp.zeros((n,), dtype),
        wavelengths=jnp.zeros((n, 0), dtype), time=jnp.zeros((n,), dtype))


class _MediumImpl(Medium):
    """Shared sample_interaction / eval_tr_and_pdf (medium.cpp:36-90)."""

    is_homogeneous = False

    def __init__(self, props=None):
        super().__init__(props)
        if self.phase_function is None:
            from .phase import IsotropicPhase
            self.phase_function = IsotropicPhase()
        p = props
        self.use_emitter_sampling = p.bool_("sample_emitters", True) \
            if p else True

    # subclass hooks -----------------------------------------------------------
    def intersect_aabb(self, ray):
        """(valid, mint, maxt)"""
        raise NotImplementedError

    def get_combined_extinction(self, mi, active=True):
        raise NotImplementedError

    def get_scattering_coefficients(self, mi, active=True):
        raise NotImplementedError

    def has_spectral_extinction(self) -> bool:
        return True

    # shared --------------------------------------------------------------------
    def sample_interaction(self, ray, sample, channel, active):
        n = ray.o.shape[0]
        nch = current_variant().n_channels
        mi = _zero_mi(n, nch, ray.o.dtype)
        frame = Frame.from_normal(ray.d)
        # medium.cpp:46 keeps mi.wi in WORLD coordinates (-ray.d), unlike
        # SurfaceInteraction's local wi: phase functions dot it against
        # world directions. The old frame.to_local(-ray.d) collapsed wi
        # to a constant local (0,0,-1), so the HG NEE eval mixed frames
        # — measured ~10% darkening of forward-scattered single scatter
        # on the volpath slab (the fused kernel, whose world-frame HG
        # disagreed by exactly that margin, was the correct one).
        mi = mi._replace(sh_frame=frame, wi=-ray.d,
                         time=ray.time, wavelengths=ray.wavelengths)
        aabb_its, mint, maxt = self.intersect_aabb(ray)
        active = jnp.asarray(active) & aabb_its
        mint = jnp.where(active, jnp.maximum(ray.mint, mint), 0.0)
        maxt = jnp.where(active, jnp.minimum(ray.maxt, maxt), jnp.inf)
        combined = self.get_combined_extinction(mi, active)
        maj_c = jnp.take_along_axis(
            combined, channel[..., None].astype(jnp.int32), axis=-1)[..., 0]
        sampled_t = mint - jnp.log(jnp.maximum(1.0 - sample, 1e-38)) \
            / jnp.maximum(maj_c, 1e-20)
        valid_mi = active & (sampled_t <= maxt)
        p = ray(sampled_t)
        mi = mi._replace(
            t=jnp.where(valid_mi, sampled_t, jnp.inf), p=p,
            medium_idx=jnp.full((n,), getattr(self, "_medium_index", 0),
                                jnp.int32),
            mint=mint, combined_extinction=combined)
        sigma_s, sigma_n, sigma_t = self.get_scattering_coefficients(
            mi, valid_mi)
        return mi._replace(sigma_s=sigma_s, sigma_n=sigma_n, sigma_t=sigma_t)

    def eval_tr_and_pdf(self, mi, si_t, active):
        """(tr, pdf) per channel (medium.cpp:80-90); si_t = surface distance."""
        t = jnp.minimum(mi.t, si_t) - mi.mint
        t = jnp.maximum(t, 0.0)
        tr = jnp.exp(-t[..., None] * mi.combined_extinction)
        pdf = jnp.where((si_t < mi.t)[..., None], tr,
                        tr * mi.combined_extinction)
        return tr, pdf


@register_plugin("medium", "homogeneous")
class HomogeneousMedium(_MediumImpl):
    """(homogeneous.cpp) unbounded uniform medium."""

    is_homogeneous = True

    def __init__(self, props=None, sigma_t=1.0, albedo=0.75, scale=1.0):
        super().__init__(props)
        p = props
        if p is not None:
            sigma_t = p.get("sigma_t", 1.0)
            albedo = p.get("albedo", 0.75)
            scale = p.float_("scale", 1.0)
        from .textures import as_texture
        self.sigma_t_tex = as_texture(
            sigma_t if not hasattr(sigma_t, "kind") else sigma_t)
        self.albedo_tex = as_texture(
            albedo if not hasattr(albedo, "kind") else albedo)
        self.scale = float(scale)

    def has_spectral_extinction(self):
        return True

    def intersect_aabb(self, ray):
        n = ray.o.shape[0]
        return (jnp.ones((n,), bool),
                jnp.zeros((n,), ray.o.dtype),
                jnp.full((n,), jnp.inf, ray.o.dtype))

    def _sigma_t(self, mi, active):
        from ..render.testutil import dummy_si
        si = dummy_si(mi.t.shape[0], n_wav=mi.wavelengths.shape[-1])
        si = si._replace(p=mi.p, wavelengths=mi.wavelengths)
        return self.sigma_t_tex.eval(si, active) * self.scale

    def get_combined_extinction(self, mi, active=True):
        return self._sigma_t(mi, active)

    def get_scattering_coefficients(self, mi, active=True):
        from ..render.testutil import dummy_si
        si = dummy_si(mi.t.shape[0], n_wav=mi.wavelengths.shape[-1])
        si = si._replace(p=mi.p, wavelengths=mi.wavelengths)
        sigma_t = self._sigma_t(mi, active)
        albedo = self.albedo_tex.eval(si, active)
        sigma_s = sigma_t * albedo
        sigma_n = jnp.zeros_like(sigma_t)
        return sigma_s, sigma_n, sigma_t

    def traverse(self, cb):
        cb.put_object("sigma_t", self.sigma_t_tex)
        cb.put_object("albedo", self.albedo_tex)


@register_plugin("medium", "heterogeneous")
class HeterogeneousMedium(_MediumImpl):
    """(heterogeneous.cpp) grid-based extinction with a global majorant."""

    is_homogeneous = False

    def __init__(self, props=None, sigma_t=None, albedo=0.75, scale=1.0,
                 to_world=None):
        super().__init__(props)
        p = props
        if p is not None:
            sigma_t = p.volume("sigma_t", 1.0)
            albedo = p.get("albedo", 0.75)
            scale = p.float_("scale", 1.0)
            to_world = p.transform("to_world", Transform.identity())
        else:
            to_world = to_world or Transform.identity()
        self.sigma_t_vol = as_volume(sigma_t if sigma_t is not None else 1.0)
        if isinstance(albedo, (int, float, list, tuple, np.ndarray)):
            albedo = ConstantVolume(value=albedo)
        self.albedo_vol = as_volume(albedo)
        self.scale = float(scale)
        self.to_world = to_world
        self.to_local = to_world.inverse()
        # volumes without their own to_world live in the medium's local frame
        for vol in (self.sigma_t_vol, self.albedo_vol):
            if getattr(vol, "identity_transform", True):
                vol.to_local = self.to_local
        self.majorant = self.sigma_t_vol.max() * self.scale

    def has_spectral_extinction(self):
        return False

    def intersect_aabb(self, ray):
        """Ray vs the unit-cube medium bounds in local space."""
        o = self.to_local.transform_point(ray.o)
        d = self.to_local.transform_vector(ray.d)
        from ..core.bbox import BoundingBox
        bb = BoundingBox(jnp.zeros(3, ray.o.dtype), jnp.ones(3, ray.o.dtype))
        hit, t0, t1 = bb.ray_intersect(o, d)
        return hit, jnp.maximum(t0, 0.0), t1

    def get_combined_extinction(self, mi, active=True):
        nch = current_variant().n_channels
        n = mi.t.shape[0]
        return jnp.full((n, nch), self.majorant, mi.t.dtype)

    def get_scattering_coefficients(self, mi, active=True):
        nch = current_variant().n_channels
        sigma_t = self.sigma_t_vol.eval_1(mi.p, active)[..., None] * self.scale
        sigma_t = jnp.repeat(sigma_t, nch, axis=-1)
        albedo = self.albedo_vol.eval(mi.p, active)
        if albedo.ndim == sigma_t.ndim - 1:
            albedo = albedo[..., None]
        sigma_s = sigma_t * albedo
        sigma_n = jnp.maximum(self.majorant - sigma_t, 0.0)
        return sigma_s, sigma_n, sigma_t

    def traverse(self, cb):
        cb.put_object("sigma_t", self.sigma_t_vol)
        cb.put_object("albedo", self.albedo_vol)
