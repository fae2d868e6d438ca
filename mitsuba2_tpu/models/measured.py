"""Measured BSDF (reference: src/bsdfs/measured.cpp:1-428 — the RGL
data-driven material model of Dupuy & Jakob 2018).

Scope: isotropic materials (phi_i.shape <= 2, like most of the RGL database).
Visible-NDF importance sampling over the measured tables with the reference's
square <-> spherical mappings (theta2u/u2theta with the sqrt warp).

Like the reference's parameterized Marginal2D (measured.cpp:22-24,
distr_2d.h:336), each lane's warp is the LINEAR INTERPOLATION of its two
bracketing theta_i slices: sampling inverts the blended piecewise-bilinear
CDF exactly (a blend of bilinear densities stays bilinear), and
eval/pdf/spectra use the same blended tables, so sample/pdf stay mutually
consistent and there is no discontinuity at slice boundaries.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core.frame import cos_theta
from ..render.bsdf import BSDF, BSDFFlags, TransportMode
from ..render.records import BSDFSample
from ..variants import current as current_variant
from ..ops.gather import gather_rows


def _theta2u(theta):
    return jnp.sqrt(theta * (2.0 / m.Pi))


def _u2theta(u):
    return u * u * (m.Pi / 2.0)


def _phi2u(phi):
    return (phi + m.Pi) * m.InvTwoPi


def _u2phi(u):
    return (2.0 * u - 1.0) * m.Pi


def _elevation(d):
    """Numerically stable elevation (measured.cpp elevation)."""
    dist = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2 + (d[..., 2] - 1.0) ** 2)
    return 2.0 * m.safe_asin(0.5 * dist)


class _SlicedMarginal2D:
    """theta_i-interpolated marginal/conditional warp over [0,1]^2.

    data: (T, h, w) densities. A lane's warp is the LINEAR BLEND of its
    two bracketing theta_i slices (wt in [0,1]) — the reference
    Marginal2D's parameter interpolation (measured.cpp:22-24,
    distr_2d.h:336) — and sampling inverts the blended piecewise-bilinear
    CDF exactly (a blend of bilinear densities is bilinear)."""

    def __init__(self, data: np.ndarray):
        data = np.asarray(data, np.float32)
        self.T, self.h, self.w = data.shape
        self.data = jnp.asarray(data)                       # (T,h,w)
        row_int = (0.5 * (data[:, :, 1:] + data[:, :, :-1])).sum(-1) \
            / (self.w - 1)                                   # (T,h)
        slab = 0.5 * (row_int[:, 1:] + row_int[:, :-1]) / (self.h - 1)
        self.marg_cdf = jnp.asarray(np.cumsum(slab, -1))     # (T,h-1)
        self.integral = jnp.asarray(slab.sum(-1))            # (T,)
        self.row_int = jnp.asarray(row_int)                  # (T,h)
        self.data_np = data

    def _lerp_t(self, X, sl):
        """Gather rows of X at slices t0/t0+1 and blend by wt."""
        t0, wt = sl
        a = gather_rows(X, t0)
        b = gather_rows(X, jnp.minimum(t0 + 1, self.T - 1))
        return a + (b - a) * wt[:, None]

    def _rows(self, sl, iy):
        """Blended data rows (N, w) for slice pair sl, row iy."""
        t0, wt = sl
        flat = self.data.reshape(self.T * self.h, self.w)
        a = gather_rows(flat, t0 * self.h + iy)
        b = gather_rows(flat, jnp.minimum(t0 + 1, self.T - 1)
                        * self.h + iy)
        return a + (b - a) * wt[:, None]

    def sample(self, sl, u2):
        h, w = self.h, self.w
        integral = self._lerp_t(self.integral[:, None], sl)[:, 0]
        marg = self._lerp_t(self.marg_cdf, sl)               # (N,h-1)
        ty = u2[..., 1] * integral
        iy = jnp.clip(jnp.sum(marg < ty[:, None], -1), 0, h - 2)
        cdf_lo = jnp.where(iy > 0,
                           jnp.take_along_axis(marg,
                                               jnp.maximum(iy - 1, 0)[:, None],
                                               1)[:, 0], 0.0)
        row_int = self._lerp_t(self.row_int, sl)             # (N,h)
        r0 = jnp.take_along_axis(row_int, iy[:, None], 1)[:, 0]
        r1 = jnp.take_along_axis(row_int, (iy + 1)[:, None], 1)[:, 0]
        rem = (ty - cdf_lo) * (h - 1)
        wy = _invert_linear(r0, r1, rem)
        y = (iy.astype(wy.dtype) + wy) / (h - 1)
        d0 = self._rows(sl, iy)
        d1 = self._rows(sl, iy + 1)
        row = d0 + (d1 - d0) * wy[:, None]
        ccdf = jnp.cumsum(0.5 * (row[:, 1:] + row[:, :-1]), -1)
        total = ccdf[:, -1]
        tx = u2[..., 0] * total
        ix = jnp.clip(jnp.sum(ccdf < tx[:, None], -1), 0, w - 2)
        c_lo = jnp.where(ix > 0,
                         jnp.take_along_axis(ccdf,
                                             jnp.maximum(ix - 1, 0)[:, None],
                                             1)[:, 0], 0.0)
        p0 = jnp.take_along_axis(row, ix[:, None], 1)[:, 0]
        p1 = jnp.take_along_axis(row, (ix + 1)[:, None], 1)[:, 0]
        wx = _invert_linear(p0, p1, tx - c_lo)
        x = (ix.astype(wx.dtype) + wx) / (w - 1)
        pos = jnp.stack([x, y], -1)
        return pos, self.eval(sl, pos)

    def eval(self, sl, pos):
        h, w = self.h, self.w
        fx = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
        fy = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
        cx = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
        cy = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
        tx = (fx - cx)[:, None]
        rows0 = self._rows(sl, cy)
        rows1 = self._rows(sl, cy + 1)
        v00 = jnp.take_along_axis(rows0, cx[:, None], 1)[:, 0]
        v10 = jnp.take_along_axis(rows0, (cx + 1)[:, None], 1)[:, 0]
        v01 = jnp.take_along_axis(rows1, cx[:, None], 1)[:, 0]
        v11 = jnp.take_along_axis(rows1, (cx + 1)[:, None], 1)[:, 0]
        ty = fy - cy
        f = (v00 * (1 - tx[:, 0]) * (1 - ty) + v10 * tx[:, 0] * (1 - ty)
             + v01 * (1 - tx[:, 0]) * ty + v11 * tx[:, 0] * ty)
        integral = self._lerp_t(self.integral[:, None], sl)[:, 0]
        return m.safe_div(f, integral, 0.0)


def _invert_linear(p0, p1, rem):
    dp = p1 - p0
    disc = m.safe_sqrt(p0 * p0 + 2.0 * dp * rem)
    t_lin = m.safe_div(rem, p0, 0.0)
    t_quad = m.safe_div(disc - p0, dp, t_lin)
    return jnp.clip(jnp.where(jnp.abs(dp) > 1e-9 * (p0 + p1 + 1e-30),
                              t_quad, t_lin), 0.0, 1.0)


@register_plugin("bsdf", "measured")
class MeasuredBSDF(BSDF):
    """(measured.cpp) isotropic RGL measured material."""

    def __init__(self, props=None, filename=None):
        super().__init__(props)
        if props is not None:
            filename = props.string("filename")
        from ..utils.tensorfile import TensorFile
        from ..core.fresolver import file_resolver
        tf = TensorFile(file_resolver().resolve(filename))
        theta_i = tf.field("theta_i").astype(np.float32)
        phi_i = tf.field("phi_i").astype(np.float32)
        if phi_i.shape[0] > 2:
            raise NotImplementedError(
                "anisotropic measured materials not yet supported")
        ndf = tf.field("ndf").astype(np.float32)           # (h,w)
        sigma = tf.field("sigma").astype(np.float32)
        vndf = tf.field("vndf").astype(np.float32)         # (P,T,h,w)
        lum = tf.field("luminance").astype(np.float32)
        spectra = tf.field("spectra").astype(np.float32)   # (P,T,L,h,w)
        wav = tf.field("wavelengths").astype(np.float32)
        self.jacobian = bool(tf.field("jacobian")[0]) \
            if tf.has_field("jacobian") else True
        self.theta_i = jnp.asarray(theta_i)
        self.n_theta = theta_i.shape[0]
        # isotropic: use phi slice 0
        self.vndf = _SlicedMarginal2D(vndf[0])
        self.lum = _SlicedMarginal2D(lum[0])
        self.ndf = jnp.asarray(ndf)
        self.sigma = jnp.asarray(sigma)
        self.wavelengths = jnp.asarray(wav)
        spectra0 = spectra[0]                              # (T,L,h,w)
        var = current_variant()
        if var.is_spectral:
            self.spectra = jnp.asarray(spectra0)
        else:
            # pre-integrate spectra against the CIE CMFs -> per-(T,h,w) rgb
            from ..core import spectrum as spec_mod
            T, L, hh, ww = spectra0.shape
            rgb = np.zeros((T, hh, ww, 3), np.float32)
            for t in range(T):
                flat = spectra0[t].reshape(L, hh * ww)
                # integrate curve per texel
                cmf = np.asarray(spec_mod.cie1931_xyz(
                    jnp.asarray(wav)))                     # (L,3)
                d65 = np.asarray(spec_mod.cie_d65(jnp.asarray(wav)))
                wgt = cmf * d65[:, None]
                wgt = wgt / max(wgt[:, 1].sum(), 1e-9)
                xyz = flat.T @ wgt                          # (hw,3)
                rgb[t] = np.asarray(spec_mod.xyz_to_srgb(
                    jnp.asarray(xyz))).reshape(hh, ww, 3)
            self.spectra_rgb = jnp.asarray(np.maximum(rgb, 0.0))
        self.m_components = [BSDFFlags.GlossyReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0]

    def _slice(self, theta):
        """Bracketing theta_i slice pair per lane -> (t0, wt): the warp
        and spectra interpolate linearly between slices t0 and t0+1
        (measured.cpp:22-24 Marginal2D parameter interpolation)."""
        t0 = jnp.clip(
            jnp.sum((self.theta_i[None, :] <= theta[:, None])
                    .astype(jnp.int32), -1) - 1,
            0, self.n_theta - 2).astype(jnp.int32)
        lo = self.theta_i[t0]
        hi = self.theta_i[jnp.minimum(t0 + 1, self.n_theta - 1)]
        wt = jnp.clip(m.safe_div(theta - lo, hi - lo, 0.0), 0.0, 1.0)
        return t0, wt

    def _spectrum_at(self, sl, pos, si, active):
        h, w = self.vndf.h, self.vndf.w
        fx = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
        fy = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
        ix = jnp.clip(jnp.round(fx).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(fy).astype(jnp.int32), 0, h - 1)
        t0, wt = sl
        var = current_variant()
        if var.is_spectral:
            # nearest wavelength bin + nearest texel, theta_i-lerped
            # (spectral tables are smooth; bilinear upgrade tracked)
            T, L, hh, ww = self.spectra.shape
            t1 = jnp.minimum(t0 + 1, T - 1)
            out = []
            for k in range(si.wavelengths.shape[-1]):
                wl = si.wavelengths[..., k]
                li = jnp.argmin(jnp.abs(self.wavelengths[None, :]
                                        - wl[:, None]), -1)
                flat = self.spectra.reshape(T * L * hh * ww)[:, None]
                idx0 = ((t0 * L + li) * hh + iy) * ww + ix
                idx1 = ((t1 * L + li) * hh + iy) * ww + ix
                a = gather_rows(flat, idx0)[:, 0]
                b = gather_rows(flat, idx1)[:, 0]
                out.append(a + (b - a) * wt)
            return jnp.stack(out, -1)
        T = self.spectra_rgb.shape[0]
        t1 = jnp.minimum(t0 + 1, T - 1)
        flat = self.spectra_rgb.reshape(-1, 3)
        hh = self.spectra_rgb.shape[1]
        ww = self.spectra_rgb.shape[2]
        a = gather_rows(flat, (t0 * hh + iy) * ww + ix)
        b = gather_rows(flat, (t1 * hh + iy) * ww + ix)
        return a + (b - a) * wt[:, None]

    def sample(self, ctx, si, sample1, sample2, active):
        n = si.t.shape[0]
        dt = si.t.dtype
        wi = si.wi
        active = jnp.asarray(active) & (cos_theta(wi) > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        theta_i = _elevation(wi)
        phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
        sl = self._slice(theta_i)
        u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)

        sample = jnp.stack([sample2[..., 1], sample2[..., 0]], -1)
        sample, lum_pdf = self.lum.sample(sl, sample)
        u_m, ndf_pdf = self.vndf.sample(sl, sample)
        phi_m = _u2phi(u_m[..., 1]) + phi_i   # isotropic
        theta_m = _u2theta(u_m[..., 0])
        sp, cp = jnp.sin(phi_m), jnp.cos(phi_m)
        st, ct = jnp.sin(theta_m), jnp.cos(theta_m)
        mvec = m.vec3(cp * st, sp * st, ct)
        jac = jnp.maximum(2.0 * m.sqr(m.Pi) * u_m[..., 0] * st, 1e-6) \
            * 4.0 * m.dot(wi, mvec)
        wo = mvec * (2.0 * m.dot(wi, mvec))[..., None] - wi
        pdf = m.safe_div(ndf_pdf * lum_pdf, jac, 0.0)
        active = active & (cos_theta(wo) > 0) & (pdf > 0)

        spec = self._spectrum_at(sl, sample, si, active)
        if self.jacobian:
            ndf_v = self._eval_grid(self.ndf, u_m)
            sigma_v = self._eval_grid(self.sigma, u_wi)
            spec = spec * m.safe_div(ndf_v, 4.0 * sigma_v, 0.0)[..., None]
        value = jnp.where(active[..., None],
                          spec * m.safe_div(1.0, pdf, 0.0)[..., None], 0.0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones((n,), dt),
            sampled_type=jnp.full((n,), int(BSDFFlags.GlossyReflection),
                                  jnp.uint32),
            sampled_component=jnp.zeros((n,), jnp.int32))
        return bs, value

    def _eval_grid(self, grid, uv):
        h, w = grid.shape
        fx = jnp.clip(uv[..., 0], 0.0, 1.0) * (w - 1)
        fy = jnp.clip(uv[..., 1], 0.0, 1.0) * (h - 1)
        ix = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
        iy = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
        tx = fx - ix
        ty = fy - iy
        flat = grid.reshape(-1, 1)
        g = lambda yy, xx: gather_rows(flat, yy * w + xx)[:, 0]
        return (g(iy, ix) * (1 - tx) * (1 - ty) + g(iy, ix + 1) * tx * (1 - ty)
                + g(iy + 1, ix) * (1 - tx) * ty + g(iy + 1, ix + 1) * tx * ty)

    def _invert(self, si, wo, active):
        """Map (wi, wo) to (slice, warp-uv, u_m, u_wi) for eval/pdf."""
        wi = si.wi
        theta_i = _elevation(wi)
        phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
        sl = self._slice(theta_i)
        mvec = m.normalize(wi + wo)
        theta_m = _elevation(mvec)
        phi_m = jnp.arctan2(mvec[..., 1], mvec[..., 0])
        u_m0 = _theta2u(theta_m)
        u_m1 = _phi2u(phi_m - phi_i)
        u_m1 = u_m1 - jnp.floor(u_m1)
        u_m = jnp.stack([u_m0, u_m1], -1)
        u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)
        jac = jnp.maximum(2.0 * m.sqr(m.Pi) * u_m0
                          * jnp.sin(theta_m), 1e-6) * 4.0 * m.dot(wi, mvec)
        return sl, u_m, u_wi, jac

    def eval(self, ctx, si, wo, active):
        nch = current_variant().n_channels
        active = jnp.asarray(active) & (cos_theta(si.wi) > 0) \
            & (cos_theta(wo) > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        sl, u_m, u_wi, jac = self._invert(si, wo, active)
        # the spectra tables are indexed by the WARP's unit square; recover
        # it by inverting the vndf warp — approximated by the vndf cdf
        # position of u_m (exact inverse tracked): use u_m directly against
        # the vndf-eval-based pdf identity instead.
        spec = self._spectrum_at_um(sl, u_m, si, active)
        if self.jacobian:
            ndf_v = self._eval_grid(self.ndf, u_m)
            sigma_v = self._eval_grid(self.sigma, u_wi)
            spec = spec * m.safe_div(ndf_v, 4.0 * sigma_v, 0.0)[..., None]
        return jnp.where(active[..., None], spec, 0.0)

    def _spectrum_at_um(self, sl, u_m, si, active):
        """Spectra lookup at the warp position corresponding to u_m: the
        tables are stored over the warp's output square, which equals the
        vndf's unit square under the stored parameterization."""
        return self._spectrum_at(sl, self._vndf_forward_cdf(sl, u_m), si,
                                 active)

    def _vndf_forward_cdf(self, sl, u_m):
        """Forward CDF of the vndf warp (maps micro-normal uv back to the
        sample square) — piecewise-linear evaluation of the marginal /
        conditional CDFs."""
        h, w = self.vndf.h, self.vndf.w
        # marginal over y (theta_i-blended like the sampling warp)
        integral = self.vndf._lerp_t(self.vndf.integral[:, None],
                                     sl)[:, 0]
        marg = self.vndf._lerp_t(self.vndf.marg_cdf, sl)     # (N,h-1)
        fy = jnp.clip(u_m[..., 1], 0.0, 1.0) * (h - 1)
        iy = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
        wy = fy - iy
        row_int = self.vndf._lerp_t(self.vndf.row_int, sl)
        r0 = jnp.take_along_axis(row_int, iy[:, None], 1)[:, 0]
        r1 = jnp.take_along_axis(row_int, (iy + 1)[:, None], 1)[:, 0]
        cdf_lo = jnp.where(iy > 0,
                           jnp.take_along_axis(marg,
                                               jnp.maximum(iy - 1, 0)[:, None],
                                               1)[:, 0], 0.0)
        part = (r0 * wy + 0.5 * (r1 - r0) * wy * wy) / (h - 1)
        sy = m.safe_div(cdf_lo + part, integral, 0.0)
        # conditional over x at the interpolated row
        d0 = self.vndf._rows(sl, iy)
        d1 = self.vndf._rows(sl, iy + 1)
        row = d0 + (d1 - d0) * wy[:, None]
        ccdf = jnp.cumsum(0.5 * (row[:, 1:] + row[:, :-1]), -1)
        total = ccdf[:, -1]
        fx = jnp.clip(u_m[..., 0], 0.0, 1.0) * (w - 1)
        ix = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
        wx = fx - ix
        c_lo = jnp.where(ix > 0,
                         jnp.take_along_axis(ccdf,
                                             jnp.maximum(ix - 1, 0)[:, None],
                                             1)[:, 0], 0.0)
        p0 = jnp.take_along_axis(row, ix[:, None], 1)[:, 0]
        p1 = jnp.take_along_axis(row, (ix + 1)[:, None], 1)[:, 0]
        part = p0 * wx + 0.5 * (p1 - p0) * wx * wx
        sx = m.safe_div(c_lo + part, total, 0.0)
        return jnp.stack([sx, sy], -1)

    def pdf(self, ctx, si, wo, active):
        active = jnp.asarray(active) & (cos_theta(si.wi) > 0) \
            & (cos_theta(wo) > 0) \
            & ctx.is_enabled(BSDFFlags.GlossyReflection)
        sl, u_m, u_wi, jac = self._invert(si, wo, active)
        ndf_pdf = self.vndf.eval(sl, u_m)
        s_pos = self._vndf_forward_cdf(sl, u_m)
        lum_pdf = self.lum.eval(sl, s_pos)
        pdf = m.safe_div(ndf_pdf * lum_pdf, jac, 0.0)
        return jnp.where(active, pdf, 0.0)

    def to_string(self):
        return f"MeasuredBSDF[{self.n_theta} incident angles]"


# =============================================================================
# Polarized measured pBRDF (measured_polarized.cpp:100-396)
# =============================================================================

def _rot_z(v, angle):
    """Rotate vectors around +z (measured_polarized.cpp rotate_vector with
    the z axis)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], -1)


def _rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the isotropic Rusinkiewicz
    parameterization (measured_polarized.cpp directions_to_rusinkiewicz).
    i/o are unit vectors in the local +z hemisphere."""
    h = m.normalize(i + o)
    z = jnp.zeros_like(h).at[..., 2].set(1.0)
    bxn = m.cross(z, h)
    deg = m.squared_norm(bxn) < 1e-12            # h ~ +z: phi_d ill-defined
    b = m.normalize(jnp.where(deg[..., None],
                              jnp.zeros_like(h).at[..., 1].set(1.0), bxn))
    t = m.normalize(m.cross(b, h))
    td = m.safe_acos(jnp.clip(m.dot(h, i), -1.0, 1.0))
    th = m.safe_acos(jnp.clip(h[..., 2], -1.0, 1.0))
    i_prj = m.normalize(i - m.dot(i, h, keepdims=True) * h)
    pd = jnp.arctan2(jnp.clip(m.dot(b, i_prj), -1.0, 1.0),
                     jnp.clip(m.dot(t, i_prj), -1.0, 1.0))
    return pd, th, td


_COS_LOBE_WEIGHT = 0.1   # COSINE_HEMISPHERE_PDF_WEIGHT


@register_plugin("bsdf", "measured_polarized")
class MeasuredPolarizedBSDF(BSDF):
    """(measured_polarized.cpp) pBRDF from the Baek et al. 2020 KAIST
    dataset: 4x4 Mueller matrices tabulated over the Rusinkiewicz angles
    (phi_d, theta_d, theta_h) and 5 wavelength bands. eval() interpolates
    multilinearly over the four axes; in polarized variants the matrix is
    re-expressed from the measurement's reflection-plane Stokes bases into
    the transport bases (rotate_mueller_basis). Sampling is the reference's
    fixed 0.1 cosine + 0.9 GGX(alpha_sample) mixture."""

    def __init__(self, props=None, filename=None):
        super().__init__(props)
        var = current_variant()
        wavelength = -1.0
        alpha = 0.1
        if props is not None:
            filename = props.string("filename")
            alpha = props.float_("alpha_sample", 0.1)
            wavelength = props.float_("wavelength", -1.0)
        if not var.is_spectral and wavelength < 0:
            raise RuntimeError(
                "measured_polarized: non-spectral variants require the "
                "`wavelength` parameter (measured_polarized.cpp:110)")
        self.alpha_sample = float(alpha)
        self.wavelength = float(wavelength)
        from ..utils.tensorfile import TensorFile
        from ..core.fresolver import file_resolver
        tf = TensorFile(file_resolver().resolve(filename))
        theta_h = tf.field("theta_h").astype(np.float32).reshape(-1)
        theta_d = tf.field("theta_d").astype(np.float32).reshape(-1)
        phi_d = tf.field("phi_d").astype(np.float32).reshape(-1)
        wvls = tf.field("wvls").astype(np.float32).reshape(-1)
        M = tf.field("M").astype(np.float32)
        P, D, H, W = (len(phi_d), len(theta_d), len(theta_h), len(wvls))
        if M.shape != (P, D, H, W, 4, 4):
            raise RuntimeError(
                f"measured_polarized: invalid file structure {M.shape}")
        # NaNs mark invalid configurations; zero them here and let the
        # M00>=0 clamp handle the rest (reference zeroes on NaN at eval)
        self._nan_mask = jnp.asarray(
            np.isnan(M[..., 0, 0]).astype(np.float32))
        self.table = jnp.asarray(np.nan_to_num(M).reshape(P, D, H, W, 16))
        self.grid_p = jnp.asarray(phi_d)
        self.grid_d = jnp.asarray(theta_d)
        self.grid_h = jnp.asarray(theta_h)
        self.grid_w = jnp.asarray(wvls)
        self.m_components = [BSDFFlags.GlossyReflection | BSDFFlags.FrontSide]
        self.m_flags = self.m_components[0]

    # ---- 4-axis multilinear interpolation --------------------------------
    @staticmethod
    def _locate(grid, x):
        from ..ops.gather import searchsorted_small
        k = grid.shape[0]
        i = jnp.clip(searchsorted_small(grid, x) - 1, 0, k - 2)
        g0 = grid[i]
        g1 = grid[i + 1]
        w = jnp.clip((x - g0) / jnp.maximum(g1 - g0, 1e-9), 0.0, 1.0)
        return i, w

    def _interp(self, pd, td, th, wav):
        """pd/td/th: (N,), wav: (N,C) -> Mueller (N, C, 4, 4) + valid."""
        ip, wp = self._locate(self.grid_p, pd)
        id_, wd = self._locate(self.grid_d, td)
        ih, wh = self._locate(self.grid_h, th)
        iw, ww = self._locate(self.grid_w, wav.reshape(-1))
        C = wav.shape[-1]
        n = pd.shape[0]
        # broadcast (N,) axes over the channel axis
        rep = lambda a: jnp.repeat(a, C)
        ip, wp, id_, wd, ih, wh = (rep(a) for a in (ip, wp, id_, wd, ih, wh))
        P, D, H, W = (self.grid_p.shape[0], self.grid_d.shape[0],
                      self.grid_h.shape[0], self.grid_w.shape[0])
        flat = self.table.reshape(-1, 16)
        nan_flat = self._nan_mask.reshape(-1)
        out = 0.0
        bad = 0.0
        for ap in (0, 1):
            for ad in (0, 1):
                for ah in (0, 1):
                    for aw in (0, 1):
                        idx = (((ip + ap) * D + (id_ + ad)) * H
                               + (ih + ah)) * W + (iw + aw)
                        w = (jnp.where(ap, wp, 1 - wp)
                             * jnp.where(ad, wd, 1 - wd)
                             * jnp.where(ah, wh, 1 - wh)
                             * jnp.where(aw, ww, 1 - ww))
                        out = out + w[:, None] * jnp.take(flat, idx, axis=0)
                        bad = bad + w * jnp.take(nan_flat, idx, axis=0)
        M = out.reshape(n, C, 4, 4)
        valid = (bad.reshape(n, C) < 1e-6)
        return jnp.where(valid[..., None, None], M, 0.0)

    def _mueller(self, ctx, si, wo, active):
        """Interpolated + basis-rotated Mueller spectrum (N, C, 4, 4)."""
        from ..render import mueller as mm
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        act = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0)
        # light arrives along -wo_hat, leaves along +wi_hat
        radiance = ctx.mode == TransportMode.Radiance
        wo_hat = wo if radiance else si.wi
        wi_hat = si.wi if radiance else wo
        phi_std = jnp.arctan2(wi_hat[..., 1], wi_hat[..., 0])
        wo_std = _rot_z(wo_hat, -phi_std)
        wi_std = _rot_z(wi_hat, -phi_std)
        pd, th, td = _rusinkiewicz(wo_std, wi_std)
        pd = jnp.where(pd < 0, pd + 2 * jnp.pi, pd)
        var = current_variant()
        if var.is_spectral:
            wav = si.wavelengths
        else:
            nch = var.n_channels
            wav = jnp.full(si.t.shape + (nch,), self.wavelength,
                           si.t.dtype)
        M = self._interp(pd, td, th, wav)
        M = M.at[..., 0, 0].set(jnp.maximum(M[..., 0, 0], 0.0))

        # Stokes frames of the measurement lie in the reflection plane
        zo = -wo_std
        to = m.normalize(m.cross(wo_std - wi_std, zo))
        yo = m.normalize(m.cross(to, zo))
        xo = m.cross(yo, zo)
        zi = wi_std
        ti = m.normalize(m.cross(wi_std - wo_std, zi))
        yi = m.normalize(m.cross(ti, zi))
        xi = m.cross(yi, zi)
        xo_hat = _rot_z(xo, phi_std)
        xi_hat = _rot_z(xi, phi_std)
        R_in = mm.rotate_stokes_basis(-wo_hat, mm.stokes_basis(-wo_hat),
                                      xo_hat)
        R_out = mm.rotate_stokes_basis(wi_hat, xi_hat,
                                       mm.stokes_basis(wi_hat))
        M = R_out[:, None] @ M @ R_in[:, None]
        M = M * (cos_o * act)[..., None, None, None]
        return M, act

    def eval_pol(self, ctx, si, wo, active=True):
        M, _ = self._mueller(ctx, si, wo, active)
        return M

    def eval(self, ctx, si, wo, active=True):
        M, _ = self._mueller(ctx, si, wo, active)
        return M[..., 0, 0]

    def pdf(self, ctx, si, wo, active=True):
        from ..core import warp
        from ..render.microfacet import MicrofacetDistribution
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        act = jnp.asarray(active) & (cos_i > 0) & (cos_o > 0)
        a = jnp.asarray(self.alpha_sample, si.t.dtype)
        distr = MicrofacetDistribution("ggx", a, a, True)
        h = m.normalize(si.wi + wo)
        pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
        pdf_m = m.safe_div(distr.pdf(si.wi, h),
                           4.0 * jnp.abs(m.dot(wo, h)), 0.0)
        pdf = (_COS_LOBE_WEIGHT * pdf_d
               + (1.0 - _COS_LOBE_WEIGHT) * pdf_m)
        return jnp.where(act, pdf, 0.0)

    def sample(self, ctx, si, sample1, sample2, active=True):
        bs, M = self.sample_pol(ctx, si, sample1, sample2, active)
        return bs, M[..., 0, 0]

    def sample_pol(self, ctx, si, sample1, sample2, active=True):
        from ..core import warp
        from ..render.microfacet import MicrofacetDistribution
        n = si.t.shape[0]
        dt = si.t.dtype
        cos_i = si.wi[..., 2]
        act = jnp.asarray(active) & (cos_i > 0)
        a = jnp.asarray(self.alpha_sample, si.t.dtype)
        distr = MicrofacetDistribution("ggx", a, a, True)
        wo_diff = warp.square_to_cosine_hemisphere(sample2)
        mh, _ = distr.sample(si.wi, sample2)
        from ..render.fresnel import reflect
        wo_spec = reflect(si.wi, mh)
        use_diff = sample1 < _COS_LOBE_WEIGHT
        wo = jnp.where(use_diff[..., None], wo_diff, wo_spec)
        pdf = self.pdf(ctx, si, wo, act)
        M, act_e = self._mueller(ctx, si, wo, act)
        ok = act & (pdf > 0)
        weight = jnp.where(ok[..., None, None, None],
                           M / jnp.maximum(pdf, 1e-12)[..., None, None,
                                                       None], 0.0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(ok, pdf, 0.0),
            eta=jnp.ones((n,), dt),
            sampled_type=jnp.where(
                ok, jnp.uint32(int(self.m_flags)), jnp.uint32(0)),
            sampled_component=jnp.where(ok, 0, -1))
        return bs, weight
