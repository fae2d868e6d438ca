"""Texture plugins (reference: src/textures/{bitmap,checkerboard,
mesh_attribute}.cpp plus the implicit constant/srgb textures created by the
scene loaders, xml.cpp:774-850).

Variant binding: color data is converted to the active variant's spectrum
representation at construction (rgb passthrough / luminance / rgb2spec
coefficients), so eval() is pure traced gather+math.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core.properties import Properties
from ..core import spectrum as spec
from ..render.texture import Texture
from ..variants import current as current_variant


def _is_tracer(x):
    import jax.core
    return isinstance(x, jax.core.Tracer)


class _SpectrumData:
    """Pre-converted per-texel color payload for the active variant."""

    def __init__(self, rgb):
        rgb = np.asarray(rgb, np.float32)
        self.rgb = jnp.asarray(rgb)
        var = current_variant()
        self.mode = var.color_mode
        if var.is_spectral:
            from ..render.srgb import srgb_model_fetch
            self.coeff = srgb_model_fetch(rgb)
        elif var.is_monochromatic:
            self.mono = spec.luminance(jnp.asarray(rgb))[..., None]

    def eval(self, idx, wavelengths):
        """idx: integer texel index or None for 0-d data."""
        if self.mode == "rgb":
            data = self.rgb
        elif self.mode == "mono":
            data = self.mono
        else:
            data = self.coeff
        if idx is not None:
            data = data[idx]
        if self.mode == "spectral":
            from ..render.srgb import srgb_model_eval
            return srgb_model_eval(data, wavelengths)
        return data

    def eval_interp(self, w00, i00, w10, i10, w01, i01, w11, i11, wavelengths):
        vals = (w00[..., None] * self.eval(i00, wavelengths)
                + w10[..., None] * self.eval(i10, wavelengths)
                + w01[..., None] * self.eval(i01, wavelengths)
                + w11[..., None] * self.eval(i11, wavelengths))
        return vals


@register_plugin("texture", "srgb")
class ConstantTexture(Texture):
    """Uniform color, stored as sRGB-upsampled reflectance in spectral mode
    (role of the srgb spectrum texture, src/spectra/srgb.cpp)."""

    def __init__(self, props=None, color=None):
        super().__init__(props)
        if color is None:
            color = props.get("color", props.get("value", 0.5))
        color = np.asarray(color, np.float32)
        if color.ndim == 0:
            color = np.broadcast_to(color, (3,)).copy()
        self._rgb_np = color
        self.data = _SpectrumData(color)

    def eval(self, si, active=True):
        out = self.data.eval(None, si.wavelengths)
        return jnp.broadcast_to(out, si.t.shape + out.shape[-1:])

    def eval_1(self, si, active=True):
        # host-side luminance (jit-safe: no traced ops on constants)
        v = float(np.asarray(self._rgb_np, np.float64)
                  @ [0.212671, 0.715160, 0.072169])
        return jnp.full(si.t.shape, v, si.t.dtype)

    def eval_3(self, si, active=True):
        return jnp.broadcast_to(self.data.rgb, si.t.shape + (3,))

    def mean(self):
        return float(np.asarray(self._rgb_np, np.float64)
                     @ [0.212671, 0.715160, 0.072169])

    def traverse(self, cb):
        cb.put_parameter("value", self.data.rgb)

    # differentiable leaf: the rgb payload (spectral coeffs refresh on
    # concrete updates only — tracers keep the stale coeff table)
    PARAM_ATTRS = {"value": "data.rgb"}

    def set_parameter(self, name, value):
        super().set_parameter(name, value)
        if name == "value" and not _is_tracer(value):
            self._rgb_np = np.asarray(value)
            self.data = _SpectrumData(self._rgb_np)


@register_plugin("texture", "checkerboard")
class CheckerboardTexture(Texture):
    """(checkerboard.cpp) two colors in a uv checker, with uv transform."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props or Properties("checkerboard")
        self.color0 = as_texture(p.get("color0", 0.4))
        self.color1 = as_texture(p.get("color1", 0.2))
        self.to_uv = p.transform("to_uv", None) \
            if p.has_property("to_uv") else None

    def _select(self, si):
        uv = si.uv
        if self.to_uv is not None:
            uvw = jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], -1)
            uv = self.to_uv.transform_point(uvw)[..., :2]
        mask = ((jnp.floor(uv[..., 0]).astype(jnp.int32)
                 + jnp.floor(uv[..., 1]).astype(jnp.int32)) % 2) == 0
        return mask

    def eval(self, si, active=True):
        mask = self._select(si)
        return jnp.where(mask[..., None], self.color0.eval(si, active),
                         self.color1.eval(si, active))

    def eval_1(self, si, active=True):
        mask = self._select(si)
        return jnp.where(mask, self.color0.eval_1(si, active),
                         self.color1.eval_1(si, active))

    def eval_3(self, si, active=True):
        mask = self._select(si)
        return jnp.where(mask[..., None], self.color0.eval_3(si, active),
                         self.color1.eval_3(si, active))

    def mean(self):
        return 0.5 * (self.color0.mean() + self.color1.mean())

    def is_spatially_varying(self):
        return True


@register_plugin("texture", "bitmap")
class BitmapTexture(Texture):
    """(bitmap.cpp) float32 image texture with bilinear filtering; spectral
    upsampling precomputed per texel at load time like the reference."""

    def __init__(self, props=None, data=None, raw=False):
        super().__init__(props)
        if data is None:
            from ..utils import io_image
            p = props
            filename = p.string("filename")
            raw = p.bool_("raw", False)
            data = io_image.read_image(filename)
        data = np.asarray(data, np.float32)
        if data.ndim == 2:
            data = data[..., None]
        if data.shape[-1] == 1:
            data = np.repeat(data, 3, axis=-1)
        if data.shape[-1] == 4:
            data = data[..., :3]
        self.resolution = (data.shape[1], data.shape[0])
        self.raw = raw
        self._rgb_np = data
        self.data = _SpectrumData(data.reshape(-1, 3))
        self._rgb_flat = jnp.asarray(data.reshape(-1, 3))

    def _bilinear(self, si):
        w, h = self.resolution
        # uv wraps (repeat); v flipped like the reference (origin top-left)
        u = si.uv[..., 0] * w - 0.5
        v = si.uv[..., 1] * h - 0.5
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        iu0 = jnp.mod(u0.astype(jnp.int32), w)
        iv0 = jnp.mod(v0.astype(jnp.int32), h)
        iu1 = jnp.mod(iu0 + 1, w)
        iv1 = jnp.mod(iv0 + 1, h)
        i00 = iv0 * w + iu0
        i10 = iv0 * w + iu1
        i01 = iv1 * w + iu0
        i11 = iv1 * w + iu1
        w00 = (1 - fu) * (1 - fv)
        w10 = fu * (1 - fv)
        w01 = (1 - fu) * fv
        w11 = fu * fv
        return (w00, i00, w10, i10, w01, i01, w11, i11)

    def eval(self, si, active=True):
        w00, i00, w10, i10, w01, i01, w11, i11 = self._bilinear(si)
        return self.data.eval_interp(w00, i00, w10, i10, w01, i01, w11, i11,
                                     si.wavelengths)

    def eval_3(self, si, active=True):
        w00, i00, w10, i10, w01, i01, w11, i11 = self._bilinear(si)
        g = self._rgb_flat
        return (w00[..., None] * g[i00] + w10[..., None] * g[i10]
                + w01[..., None] * g[i01] + w11[..., None] * g[i11])

    def eval_1(self, si, active=True):
        return spec.luminance(self.eval_3(si, active))

    def mean(self):
        return float(np.mean(spec.luminance(jnp.asarray(self._rgb_np))))

    def is_spatially_varying(self):
        return True

    def traverse(self, cb):
        cb.put_parameter("data", self._rgb_flat)

    PARAM_ATTRS = {"data": "_rgb_flat"}

    def set_parameter(self, name, value):
        super().set_parameter(name, value)
        if name == "data":
            # keep the variant payload in sync (rgb path reads _rgb_flat
            # directly; mono/spectral refresh on concrete updates)
            if not _is_tracer(value):
                self._rgb_np = np.asarray(value).reshape(self._rgb_np.shape)
                self.data = _SpectrumData(np.asarray(value).reshape(-1, 3))
            else:
                self.data.rgb = value


@register_plugin("texture", "mesh_attribute")
class MeshAttributeTexture(Texture):
    """(mesh_attribute.cpp) reads a named per-vertex/face mesh attribute
    (``vertex_*`` / ``face_*``, added via Mesh.add_attribute). The Scene
    wires in a packed per-face corner table at pack time; eval() is one
    one-hot gather + barycentric interpolation. 3-channel attributes go
    through the variant's spectrum conversion (srgb upsampling per corner
    in spectral mode, mesh_attribute.cpp:106 srgb_model_eval)."""

    def __init__(self, props=None, name=None, scale=1.0):
        super().__init__(props)
        if props is not None:
            name = props.string("name")
            scale = props.float_("scale", 1.0)
        self.name = name or "vertex_color"
        self.scale = scale
        self._k = None
        self._corners = None   # _SpectrumData over (3F, k) corner rows

    def wire(self, scene):
        if self.name not in scene.mesh_attr_tables:
            raise RuntimeError(
                f"mesh_attribute '{self.name}': no mesh in the scene "
                f"carries this attribute")
        k, flat = scene.mesh_attr_tables[self.name]
        self._k = k
        self._rgb_flat = flat                      # (F, 3k) raw values
        if k == 3:
            raw = np.asarray(flat).reshape(-1, 3)  # (3F, 3)
            self._corners = _SpectrumData(raw)

    def _interp_raw(self, si):
        from ..ops.gather import gather_rows
        if self._k is None:
            raise RuntimeError("mesh_attribute texture was never wired "
                               "into a scene")
        A = gather_rows(self._rgb_flat,
                        jnp.clip(si.prim_idx, 0,
                                 self._rgb_flat.shape[0] - 1))
        A = A.reshape(si.t.shape + (3, self._k))
        bu, bv = si.prim_uv[..., 0], si.prim_uv[..., 1]
        w = jnp.stack([1.0 - bu - bv, bu, bv], -1)[..., None]
        return (A * w).sum(-2)                     # (N, k)

    def eval(self, si, active=True):
        var = current_variant()
        if self._k == 3 and var.is_spectral:
            # interpolate the per-corner upsampled spectra (bitmap-style)
            from ..render.srgb import srgb_model_eval
            from ..ops.gather import gather_rows
            coeff = self._corners.coeff.reshape(-1, 9)     # (F, 9)
            C = gather_rows(coeff, jnp.clip(si.prim_idx, 0,
                                            coeff.shape[0] - 1))
            C = C.reshape(si.t.shape + (3, 3))
            bu, bv = si.prim_uv[..., 0], si.prim_uv[..., 1]
            ws = (1.0 - bu - bv, bu, bv)
            out = 0.0
            for c in range(3):
                out = out + ws[c][..., None] * srgb_model_eval(
                    C[..., c, :], si.wavelengths)
            return out * self.scale
        v = self._interp_raw(si)
        if self._k == 3 and var.is_monochromatic:
            v = spec.luminance(v)[..., None]
        elif self._k == 1 and not var.is_monochromatic:
            v = jnp.repeat(v, 3, axis=-1)
        return v * self.scale

    def eval_1(self, si, active=True):
        v = self._interp_raw(si)
        if self._k == 3:
            return spec.luminance(v) * self.scale
        return v[..., 0] * self.scale

    def eval_3(self, si, active=True):
        v = self._interp_raw(si)
        if self._k == 1:
            v = jnp.repeat(v, 3, axis=-1)
        return v * self.scale

    def mean(self):
        if self._k == 3:
            return float(np.asarray(
                spec.luminance(jnp.mean(self._rgb_flat.reshape(-1, 3),
                                        axis=0))) * self.scale)
        return float(np.mean(np.asarray(self._rgb_flat))) * self.scale

    def is_spatially_varying(self):
        return True


def as_texture(v, within_emitter: bool = False) -> Texture:
    """Auto-wrap scalars / colors into textures (properties.h:281-343 +
    the rgb/spectrum auto-instantiation rules of xml.cpp:774-850).

    within_emitter: rgb values become D65-weighted emission spectra in
    spectral mode (srgb_d65), matching create_texture_from_rgb."""
    from ..core.dictio import ColorValue
    from ..variants import current
    if isinstance(v, Texture):
        return v
    if isinstance(v, ColorValue):
        if v.kind == "rgb":
            v = v.payload  # fall through to color handling below
        elif v.kind == "spectrum-uniform":
            if within_emitter and current().is_spectral:
                # uniform emitter spectra become D65 with that scale
                # (xml.cpp:1100-1104)
                from .spectra import D65Spectrum
                return D65Spectrum(scale=v.payload)
            from .spectra import UniformSpectrum
            return UniformSpectrum(value=v.payload)
        else:
            from .spectra import IrregularSpectrum
            from ..core.spectrum import MTS_CIE_Y_NORMALIZATION
            wl = [a for a, _ in v.payload]
            vals = [b for _, b in v.payload]
            if within_emitter and current().is_spectral:
                # emitter curves are scaled so integrating against the CIE
                # curves yields unit luminance (xml.cpp:1113-1125)
                vals = [x * MTS_CIE_Y_NORMALIZATION for x in vals]
            return IrregularSpectrum(wavelengths=wl, values=vals)
    if isinstance(v, (int, float, list, tuple, np.ndarray)):
        if within_emitter and current().is_spectral:
            from .spectra import SRGBD65Spectrum
            return SRGBD65Spectrum(color=v)
        return ConstantTexture(color=v)
    if isinstance(v, dict):
        from ..core.dictio import load_dict
        obj = load_dict(v)
        return as_texture(obj, within_emitter)
    raise TypeError(f"cannot interpret {type(v)} as a texture")
