"""2D sampling warps (reference: include/mitsuba/core/distr_2d.h).

Reference classes: ``Hierarchical2D`` (mip-descent warp, envmap.cpp:67),
``Marginal2D`` (measured BSDF), ``DiscreteDistribution2D``.

TPU design note: the reference descends a mip hierarchy (log-depth pointer
chase) because it targets scalar/SIMD CPUs. On TPU a flat CDF +
``searchsorted`` is a single vectorized gather chain and beats an explicit
mip walk, so ``Hierarchical2D`` here keeps the reference's *contract*
(sample/invert/eval a bilinear-interpolated 2D density) on top of a flat
row-marginal/column-conditional CDF — mathematically identical distribution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as m
from .warp import square_to_bilinear, square_to_bilinear_pdf, interval_to_linear


class DiscreteDistribution2D(NamedTuple):
    """Discrete distribution over texels (distr_2d.h:819)."""

    pmf: jnp.ndarray        # (h, w)
    cond_cdf: jnp.ndarray   # (h, w) row-wise cumsum
    marg_cdf: jnp.ndarray   # (h,)  cumsum of row sums
    sum: jnp.ndarray

    @staticmethod
    def create(pmf) -> "DiscreteDistribution2D":
        pmf = jnp.asarray(pmf)
        cond = jnp.cumsum(pmf, axis=-1)
        marg = jnp.cumsum(cond[..., -1], axis=-1)
        return DiscreteDistribution2D(pmf, cond, marg, marg[..., -1])

    def sample(self, u2):
        """(..., 2) uniforms -> ((x, y) integer texel, pmf, reused u2)."""
        uy = u2[..., 1] * self.sum
        y = jnp.clip(jnp.searchsorted(self.marg_cdf, uy, side="right"),
                     0, self.marg_cdf.shape[0] - 1)
        row_lo = jnp.where(y > 0, self.marg_cdf[jnp.maximum(y - 1, 0)], 0.0)
        row_sum = self.cond_cdf[y, -1]
        uy2 = m.safe_div(uy - row_lo, row_sum, 0.0)
        ux = u2[..., 0] * row_sum
        cond_rows = self.cond_cdf[y]
        x = jnp.clip(_searchsorted_rows(cond_rows, ux),
                     0, self.pmf.shape[-1] - 1)
        col_lo = jnp.where(x > 0, jnp.take_along_axis(
            cond_rows, jnp.maximum(x - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
        pmf_xy = self.pmf[y, x]
        ux2 = m.safe_div(ux - col_lo, pmf_xy, 0.0)
        pmf_norm = m.safe_div(pmf_xy, self.sum, 0.0)
        u_reuse = jnp.stack([jnp.clip(ux2, 0.0, 1.0 - m.Epsilon),
                             jnp.clip(uy2, 0.0, 1.0 - m.Epsilon)], axis=-1)
        return jnp.stack([x, y], axis=-1), pmf_norm, u_reuse

    def eval(self, pos):
        x, y = pos[..., 0], pos[..., 1]
        return m.safe_div(self.pmf[y, x], self.sum, 0.0)

    def pdf(self, pos):
        return self.eval(pos)


def _searchsorted_rows(cdf_rows, targets):
    """searchsorted along the last axis for batched rows."""
    # cdf_rows: (..., n), targets: (...,)
    return jnp.sum(cdf_rows < targets[..., None], axis=-1)


class Hierarchical2D(NamedTuple):
    """Continuous bilinear 2D warp over [0,1]^2 (contract of distr_2d.h:199).

    ``data`` holds density values at the vertices of an (h-1)x(w-1) cell grid.
    sample(): pick a cell ~ its bilinear integral, then warp inside the cell
    with ``square_to_bilinear``. eval(): bilinear interpolation * norm.
    """

    data: jnp.ndarray       # (h, w) vertex densities, unnormalized
    cell: DiscreteDistribution2D  # over (h-1, w-1) cells
    normalization: jnp.ndarray    # 1 / mean density (so pdf integrates to 1)

    @staticmethod
    def create(data) -> "Hierarchical2D":
        data = jnp.asarray(data, jnp.result_type(data, 1.0))
        v00 = data[:-1, :-1]
        v10 = data[:-1, 1:]
        v01 = data[1:, :-1]
        v11 = data[1:, 1:]
        cell_int = 0.25 * (v00 + v10 + v01 + v11)
        cells = DiscreteDistribution2D.create(cell_int)
        h, w = data.shape
        n_cells = (h - 1) * (w - 1)
        mean = m.safe_div(cells.sum, n_cells, 0.0)
        return Hierarchical2D(data, cells, m.safe_div(1.0, mean, 0.0))

    @property
    def res(self):
        return self.data.shape

    def sample(self, u2):
        """(..., 2) -> (pos in [0,1]^2, pdf)."""
        h, w = self.data.shape
        xy, cell_pmf, u_r = self.cell.sample(u2)
        cx, cy = xy[..., 0], xy[..., 1]
        v00 = self.data[cy, cx]
        v10 = self.data[cy, cx + 1]
        v01 = self.data[cy + 1, cx]
        v11 = self.data[cy + 1, cx + 1]
        p_local, _ = square_to_bilinear(v00, v10, v01, v11, u_r)
        pos = jnp.stack([
            (cx.astype(p_local.dtype) + p_local[..., 0]) / (w - 1),
            (cy.astype(p_local.dtype) + p_local[..., 1]) / (h - 1)],
            axis=-1)
        return pos, self.eval(pos)

    def eval(self, pos):
        """Normalized pdf over [0,1]^2 at continuous positions (..., 2)."""
        h, w = self.data.shape
        fx = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
        fy = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
        cx = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
        cy = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
        tx = fx - cx.astype(fx.dtype)
        ty = fy - cy.astype(fy.dtype)
        v00 = self.data[cy, cx]
        v10 = self.data[cy, cx + 1]
        v01 = self.data[cy + 1, cx]
        v11 = self.data[cy + 1, cx + 1]
        f = (v00 * (1 - tx) * (1 - ty) + v10 * tx * (1 - ty)
             + v01 * (1 - tx) * ty + v11 * tx * ty)
        return f * self.normalization

    pdf = eval


class Marginal2D(NamedTuple):
    """Row-marginal / column-conditional continuous warp (distr_2d.h:336,
    non-parameterized MarginalContinuous2D0). Density is piecewise-bilinear
    over an (h, w) vertex grid; sampling is exact inversion of the marginal
    then the conditional, both piecewise-quadratic CDFs."""

    data: jnp.ndarray       # (h, w)
    marg_cdf: jnp.ndarray   # (h-1,) cumulative row-slab integrals
    cond_cdf: jnp.ndarray   # (h, w-1) per-row cumulative cell integrals
    integral: jnp.ndarray

    @staticmethod
    def create(data) -> "Marginal2D":
        data = jnp.asarray(data, jnp.result_type(data, 1.0))
        h, w = data.shape
        row_int = (0.5 * (data[:, 1:] + data[:, :-1])).sum(-1) / (w - 1)  # (h,)
        slab = 0.5 * (row_int[1:] + row_int[:-1]) / (h - 1)               # (h-1,)
        marg_cdf = jnp.cumsum(slab)
        cond_cdf = jnp.cumsum(0.5 * (data[:, 1:] + data[:, :-1]), axis=-1)
        return Marginal2D(data, marg_cdf, cond_cdf, marg_cdf[-1])

    def sample(self, u2):
        h, w = self.data.shape
        # --- marginal over y ---
        ty = u2[..., 1] * self.integral
        iy = jnp.clip(jnp.searchsorted(self.marg_cdf, ty, side="right"), 0, h - 2)
        cdf_lo = jnp.where(iy > 0, self.marg_cdf[jnp.maximum(iy - 1, 0)], 0.0)
        row_int = (0.5 * (self.data[:, 1:] + self.data[:, :-1])).sum(-1) / (w - 1)
        r0, r1 = row_int[iy], row_int[iy + 1]
        rem = (ty - cdf_lo) * (h - 1)
        wy = _invert_linear_cdf(r0, r1, rem)
        y = (iy.astype(wy.dtype) + wy) / (h - 1)
        # --- conditional over x at interpolated row ---
        d0 = self.data[iy]      # (..., w)
        d1 = self.data[iy + 1]
        row = d0 + (d1 - d0) * wy[..., None]
        ccdf = jnp.cumsum(0.5 * (row[..., 1:] + row[..., :-1]), axis=-1)
        row_total = ccdf[..., -1]
        tx = u2[..., 0] * row_total
        ix = jnp.clip(jnp.sum(ccdf < tx[..., None], axis=-1), 0, w - 2)
        c_lo = jnp.where(ix > 0, jnp.take_along_axis(
            ccdf, jnp.maximum(ix - 1, 0)[..., None], -1)[..., 0], 0.0)
        p0 = jnp.take_along_axis(row, ix[..., None], -1)[..., 0]
        p1 = jnp.take_along_axis(row, (ix + 1)[..., None], -1)[..., 0]
        wx = _invert_linear_cdf(p0, p1, tx - c_lo)
        x = (ix.astype(wx.dtype) + wx) / (w - 1)
        pos = jnp.stack([x, y], axis=-1)
        return pos, self.eval(pos)

    def eval(self, pos):
        h, w = self.data.shape
        fx = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
        fy = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
        cx = jnp.clip(fx.astype(jnp.int32), 0, w - 2)
        cy = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
        tx = fx - cx.astype(fx.dtype)
        ty = fy - cy.astype(fy.dtype)
        v00 = self.data[cy, cx]
        v10 = self.data[cy, cx + 1]
        v01 = self.data[cy + 1, cx]
        v11 = self.data[cy + 1, cx + 1]
        f = (v00 * (1 - tx) * (1 - ty) + v10 * tx * (1 - ty)
             + v01 * (1 - tx) * ty + v11 * tx * ty)
        return m.safe_div(f, self.integral, 0.0)

    pdf = eval


def _invert_linear_cdf(p0, p1, rem):
    """Solve p0*t + (p1-p0)*t^2/2 = rem for t in [0,1]."""
    dp = p1 - p0
    disc = m.safe_sqrt(p0 * p0 + 2.0 * dp * rem)
    t_lin = m.safe_div(rem, p0, 0.0)
    t_quad = m.safe_div(disc - p0, dp, t_lin)
    return jnp.clip(jnp.where(jnp.abs(dp) > 1e-9 * (p0 + p1 + 1e-30),
                              t_quad, t_lin), 0.0, 1.0)
