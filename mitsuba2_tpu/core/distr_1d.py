"""1D sampling distributions (reference: include/mitsuba/core/distr_1d.h).

All three classes are immutable pytrees built host- or trace-side from value
arrays; sampling is a `searchsorted` over the CDF (binary search, log-depth —
the same algorithmic shape the reference uses, and gather-friendly on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import math as m
from ..ops.gather import gather_rows, searchsorted_small


def _take_small(arr, idx):
    """TPU-friendly take for wavefront-sized index vectors."""
    idx = jnp.asarray(idx)
    if idx.ndim != 1 or arr.ndim != 1:
        return jnp.take(arr, idx, axis=-1)
    return gather_rows(arr[:, None], idx)[:, 0]


class DiscreteDistribution(NamedTuple):
    """Distribution over {0..n-1} from unnormalized weights (distr_1d.h:19)."""

    pmf: jnp.ndarray        # (n,) unnormalized
    cdf: jnp.ndarray        # (n,) inclusive cumulative sum (unnormalized)
    sum: jnp.ndarray        # scalar total
    normalization: jnp.ndarray  # 1/sum

    @staticmethod
    def create(pmf) -> "DiscreteDistribution":
        pmf = jnp.asarray(pmf)
        cdf = jnp.cumsum(pmf, axis=-1)
        total = cdf[..., -1]
        return DiscreteDistribution(pmf, cdf, total,
                                    m.safe_div(1.0, total, 0.0))

    @property
    def size(self) -> int:
        return self.pmf.shape[-1]

    def eval_pmf(self, index):
        return _take_small(self.pmf, index)

    def eval_pmf_normalized(self, index):
        return _take_small(self.pmf, index) * self.normalization

    def eval_cdf_normalized(self, index):
        return _take_small(self.cdf, index) * self.normalization

    def sample(self, u):
        """u in [0,1) -> index."""
        target = u * self.sum
        u_flat = jnp.asarray(target)
        if u_flat.ndim == 1:
            idx = searchsorted_small(self.cdf, u_flat)
        else:
            idx = jnp.searchsorted(self.cdf, target, side="right")
        return jnp.clip(idx, 0, self.size - 1)

    def sample_pmf(self, u):
        idx = self.sample(u)
        return idx, self.eval_pmf_normalized(idx)

    def sample_reuse(self, u):
        """Sample and rescale u for reuse (distr_1d.h sample_reuse)."""
        idx = self.sample(u)
        cdf_lo = jnp.where(idx > 0,
                           _take_small(self.cdf, jnp.maximum(idx - 1, 0)),
                           0.0)
        pmf_i = self.eval_pmf(idx)
        u2 = m.safe_div(u * self.sum - cdf_lo, pmf_i, 0.0)
        return idx, jnp.clip(u2, 0.0, 1.0 - m.Epsilon)

    def sample_reuse_pmf(self, u):
        idx, u2 = self.sample_reuse(u)
        return idx, u2, self.eval_pmf_normalized(idx)


class ContinuousDistribution(NamedTuple):
    """Piecewise-linear density on [a, b] over n uniform nodes
    (distr_1d.h ContinuousDistribution)."""

    pdf: jnp.ndarray        # (n,) unnormalized density at nodes
    cdf: jnp.ndarray        # (n-1,) cumulative cell integrals (unnormalized)
    range: jnp.ndarray      # (2,)
    integral: jnp.ndarray   # scalar: total unnormalized integral
    normalization: jnp.ndarray
    interval_size: jnp.ndarray

    @staticmethod
    def create(range_, pdf) -> "ContinuousDistribution":
        pdf = jnp.asarray(pdf, jnp.result_type(pdf, 1.0))
        range_ = jnp.asarray(range_, pdf.dtype)
        n = pdf.shape[-1]
        h = (range_[1] - range_[0]) / (n - 1)
        cell = 0.5 * (pdf[..., 1:] + pdf[..., :-1]) * h
        cdf = jnp.cumsum(cell, axis=-1)
        integral = cdf[..., -1]
        return ContinuousDistribution(pdf, cdf, range_, integral,
                                      m.safe_div(1.0, integral, 0.0), h)

    @property
    def size(self) -> int:
        return self.pdf.shape[-1]

    def eval_pdf(self, x):
        t = (x - self.range[0]) / self.interval_size
        i0 = jnp.clip(t.astype(jnp.int32), 0, self.size - 2)
        w1 = t - i0.astype(t.dtype)
        v = m.lerp(self.pdf[i0], self.pdf[i0 + 1], w1)
        ok = (x >= self.range[0]) & (x <= self.range[1])
        return jnp.where(ok, v, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) * self.normalization

    def eval_cdf(self, x):
        t = (x - self.range[0]) / self.interval_size
        i0 = jnp.clip(t.astype(jnp.int32), 0, self.size - 2)
        w = t - i0.astype(t.dtype)
        cdf_lo = jnp.where(i0 > 0, self.cdf[jnp.maximum(i0 - 1, 0)], 0.0)
        p0, p1 = self.pdf[i0], self.pdf[i0 + 1]
        part = (p0 * w + 0.5 * (p1 - p0) * w * w) * self.interval_size
        return cdf_lo + part

    def sample(self, u):
        target = u * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, target, side="right"),
                       0, self.size - 2)
        cdf_lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        rem = (target - cdf_lo) / self.interval_size  # integral within cell
        p0 = self.pdf[idx]
        p1 = self.pdf[idx + 1]
        # solve p0*t + (p1-p0)*t^2/2 = rem for t in [0,1]
        dp = p1 - p0
        disc = m.safe_sqrt(p0 * p0 + 2.0 * dp * rem)
        t_lin = m.safe_div(rem, p0, 0.0)
        t_quad = m.safe_div(disc - p0, dp, t_lin)
        t = jnp.clip(jnp.where(jnp.abs(dp) > 1e-9 * (p0 + p1 + 1e-30),
                               t_quad, t_lin), 0.0, 1.0)
        return self.range[0] + (idx.astype(t.dtype) + t) * self.interval_size

    def sample_pdf(self, u):
        x = self.sample(u)
        return x, self.eval_pdf_normalized(x)


class IrregularContinuousDistribution(NamedTuple):
    """Piecewise-linear density with explicit node positions
    (distr_1d.h IrregularContinuousDistribution)."""

    nodes: jnp.ndarray      # (n,)
    pdf: jnp.ndarray        # (n,)
    cdf: jnp.ndarray        # (n-1,)
    integral: jnp.ndarray
    normalization: jnp.ndarray

    @staticmethod
    def create(nodes, pdf) -> "IrregularContinuousDistribution":
        nodes = jnp.asarray(nodes, jnp.result_type(nodes, 1.0))
        pdf = jnp.asarray(pdf, nodes.dtype)
        h = nodes[..., 1:] - nodes[..., :-1]
        cell = 0.5 * (pdf[..., 1:] + pdf[..., :-1]) * h
        cdf = jnp.cumsum(cell, axis=-1)
        integral = cdf[..., -1]
        return IrregularContinuousDistribution(
            nodes, pdf, cdf, integral, m.safe_div(1.0, integral, 0.0))

    @property
    def size(self) -> int:
        return self.pdf.shape[-1]

    def eval_pdf(self, x):
        idx = jnp.clip(jnp.searchsorted(self.nodes, x, side="right") - 1,
                       0, self.size - 2)
        x0, x1 = self.nodes[idx], self.nodes[idx + 1]
        w = m.safe_div(x - x0, x1 - x0, 0.0)
        v = m.lerp(self.pdf[idx], self.pdf[idx + 1], w)
        ok = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(ok, v, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) * self.normalization

    def sample(self, u):
        target = u * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, target, side="right"),
                       0, self.size - 2)
        cdf_lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        x0, x1 = self.nodes[idx], self.nodes[idx + 1]
        h = x1 - x0
        rem = m.safe_div(target - cdf_lo, h, 0.0)
        p0, p1 = self.pdf[idx], self.pdf[idx + 1]
        dp = p1 - p0
        disc = m.safe_sqrt(p0 * p0 + 2.0 * dp * rem)
        t_lin = m.safe_div(rem, p0, 0.0)
        t_quad = m.safe_div(disc - p0, dp, t_lin)
        t = jnp.clip(jnp.where(jnp.abs(dp) > 1e-9 * (p0 + p1 + 1e-30),
                               t_quad, t_lin), 0.0, 1.0)
        return x0 + t * h

    def sample_pdf(self, u):
        x = self.sample(u)
        return x, self.eval_pdf_normalized(x)
