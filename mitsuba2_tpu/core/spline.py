"""Catmull-Rom spline evaluation / integration / inversion / sampling
(reference: include/mitsuba/core/spline.h, used by measured BSDFs and
reconstruction filters).

All evaluators are vectorized over query points; node arrays are static-shape.
Newton iterations use a fixed trip count (TPU-friendly, no dynamic loops).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite on [0,1] (spline.h eval_spline)."""
    t2 = t * t
    t3 = t2 * t
    return ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
            + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)


def eval_spline_d(f0, f1, d0, d1, t):
    """(value, derivative wrt t) (spline.h eval_spline_d)."""
    t2 = t * t
    v = eval_spline(f0, f1, d0, d1, t)
    d = ((6 * t2 - 6 * t) * f0 + (-6 * t2 + 6 * t) * f1
         + (3 * t2 - 4 * t + 1) * d0 + (3 * t2 - 2 * t) * d1)
    return v, d


def eval_spline_i(f0, f1, d0, d1, t):
    """(integral from 0 to t, value at t) (spline.h eval_spline_i)."""
    t2 = t * t
    t3 = t2 * t
    t4 = t2 * t2
    h00 = 0.5 * t4 - t3 + t
    h10 = 0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2
    h01 = -0.5 * t4 + t3
    h11 = 0.25 * t4 - t3 / 3.0
    integ = h00 * f0 + h10 * d0 + h01 * f1 + h11 * d1
    return integ, eval_spline(f0, f1, d0, d1, t)


def _segment_uniform(values, idx):
    """Hermite coefficients for uniform-node segment idx (vectorized)."""
    n = values.shape[-1]
    f0 = values[..., :][idx] if False else jnp.take(values, idx, axis=-1)
    f1 = jnp.take(values, idx + 1, axis=-1)
    fm = jnp.take(values, jnp.maximum(idx - 1, 0), axis=-1)
    fp = jnp.take(values, jnp.minimum(idx + 2, n - 1), axis=-1)
    d0 = jnp.where(idx > 0, 0.5 * (f1 - fm), f1 - f0)
    d1 = jnp.where(idx + 2 < n, 0.5 * (fp - f0), f1 - f0)
    return f0, f1, d0, d1


def eval_1d(min_, max_, values, x):
    """Catmull-Rom eval on uniform nodes over [min, max] (spline.h eval_1d)."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    t = (x - min_) * ((n - 1) / (max_ - min_))
    idx = jnp.clip(t.astype(jnp.int32), 0, n - 2)
    tt = t - idx.astype(t.dtype)
    f0, f1, d0, d1 = _segment_uniform(values, idx)
    v = eval_spline(f0, f1, d0, d1, tt)
    ok = (x >= min_) & (x <= max_)
    return jnp.where(ok, v, 0.0)


def _segment_nonuniform(nodes, values, idx):
    n = values.shape[-1]
    x0 = jnp.take(nodes, idx, axis=-1)
    x1 = jnp.take(nodes, idx + 1, axis=-1)
    w = x1 - x0
    f0 = jnp.take(values, idx, axis=-1)
    f1 = jnp.take(values, idx + 1, axis=-1)
    fm = jnp.take(values, jnp.maximum(idx - 1, 0), axis=-1)
    fp = jnp.take(values, jnp.minimum(idx + 2, n - 1), axis=-1)
    xm = jnp.take(nodes, jnp.maximum(idx - 1, 0), axis=-1)
    xp = jnp.take(nodes, jnp.minimum(idx + 2, n - 1), axis=-1)
    d0 = jnp.where(idx > 0, w * m.safe_div(f1 - fm, x1 - xm, 0.0), f1 - f0)
    d1 = jnp.where(idx + 2 < n, w * m.safe_div(fp - f0, xp - x0, 0.0), f1 - f0)
    return x0, w, f0, f1, d0, d1


def eval_1d_nonuniform(nodes, values, x):
    """Catmull-Rom eval on explicit nodes (spline.h eval_1d overload)."""
    nodes = jnp.asarray(nodes)
    values = jnp.asarray(values)
    n = values.shape[-1]
    idx = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0, w, f0, f1, d0, d1 = _segment_nonuniform(nodes, values, idx)
    t = m.safe_div(x - x0, w, 0.0)
    v = eval_spline(f0, f1, d0, d1, t)
    ok = (x >= nodes[..., 0]) & (x <= nodes[..., -1])
    return jnp.where(ok, v, 0.0)


def eval_spline_weights(min_, max_, size, x):
    """(valid, base_index, weights[4]) such that f(x) ~= sum_k w_k f[i+k-1]
    (spline.h eval_spline_weights) — used for tensor-product spline eval."""
    t = (x - min_) * ((size - 1) / (max_ - min_))
    idx = jnp.clip(t.astype(jnp.int32), 0, size - 2)
    tt = t - idx.astype(t.dtype)
    t2 = tt * tt
    t3 = t2 * tt
    w_f0 = 2 * t3 - 3 * t2 + 1
    w_f1 = -2 * t3 + 3 * t2
    w_d0 = t3 - 2 * t2 + tt
    w_d1 = t3 - t2
    # distribute derivative weights onto neighbor nodes:
    # d0 = 0.5*(f[i+1]-f[i-1]) or one-sided f[i+1]-f[i]; likewise d1.
    has_left = idx > 0
    has_right = idx + 2 < size
    w0 = jnp.where(has_left, -0.5 * w_d0, 0.0)
    w1 = w_f0 + jnp.where(has_left, 0.0, -w_d0) \
        + jnp.where(has_right, -0.5 * w_d1, -w_d1)
    w2 = w_f1 + jnp.where(has_left, 0.5 * w_d0, w_d0) \
        + jnp.where(has_right, 0.0, w_d1)
    w3 = jnp.where(has_right, 0.5 * w_d1, 0.0)
    # base index points at node (idx - 1)
    base = idx - 1
    valid = (x >= min_) & (x <= max_)
    return valid, base, jnp.stack([w0, w1, w2, w3], axis=-1)


def integrate_1d(min_, max_, values):
    """Cumulative integrals at nodes (spline.h integrate_1d), uniform grid."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    h = (max_ - min_) / (n - 1)
    idx = jnp.arange(n - 1)
    f0, f1, d0, d1 = _segment_uniform(values, idx)
    seg, _ = eval_spline_i(f0, f1, d0, d1, jnp.ones_like(f0))
    cdf = jnp.concatenate([jnp.zeros(values.shape[:-1] + (1,), values.dtype),
                           jnp.cumsum(seg * h, axis=-1)], axis=-1)
    return cdf


def invert_1d(min_, max_, values, y, n_iter: int = 10):
    """Invert a monotonic spline: find x with f(x) = y (spline.h invert_1d)."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    idx = jnp.clip(jnp.searchsorted(values, y, side="right") - 1, 0, n - 2)
    f0, f1, d0, d1 = _segment_uniform(values, idx)
    t = jnp.clip(m.safe_div(y - f0, f1 - f0, 0.5), 0.0, 1.0)
    lo = jnp.zeros_like(t)
    hi = jnp.ones_like(t)
    for _ in range(n_iter):
        v, d = eval_spline_d(f0, f1, d0, d1, t)
        err = v - y
        lo = jnp.where(err <= 0, t, lo)
        hi = jnp.where(err > 0, t, hi)
        t_newton = t - m.safe_div(err, d, 0.0)
        inside = (t_newton > lo) & (t_newton < hi)
        t = jnp.where(inside, t_newton, 0.5 * (lo + hi))
    h = (max_ - min_) / (n - 1)
    return min_ + (idx.astype(t.dtype) + t) * h


def sample_1d(min_, max_, values, cdf, sample, n_iter: int = 10):
    """Importance sample the spline density (spline.h sample_1d).

    Returns (position, function value, normalized pdf)."""
    values = jnp.asarray(values)
    cdf = jnp.asarray(cdf)
    n = values.shape[-1]
    h = (max_ - min_) / (n - 1)
    total = cdf[..., -1]
    target = sample * total
    idx = jnp.clip(jnp.searchsorted(cdf, target, side="right") - 1, 0, n - 2)
    f0, f1, d0, d1 = _segment_uniform(values, idx)
    c0 = jnp.take(cdf, idx, axis=-1)
    rem = (target - c0) / h
    # bracketed Newton-bisection on the segment CDF (monotone for f >= 0)
    t = jnp.clip(m.safe_div(rem, f0, 0.5), 0.0, 1.0)
    lo = jnp.zeros_like(t)
    hi = jnp.ones_like(t)
    for _ in range(n_iter):
        integ, v = eval_spline_i(f0, f1, d0, d1, t)
        err = integ - rem
        lo = jnp.where(err <= 0, t, lo)
        hi = jnp.where(err > 0, t, hi)
        t_newton = t - m.safe_div(err, v, 0.0)
        inside = (t_newton > lo) & (t_newton < hi)
        t = jnp.where(inside, t_newton, 0.5 * (lo + hi))
    _, v = eval_spline_i(f0, f1, d0, d1, t)
    x = min_ + (idx.astype(t.dtype) + t) * h
    return x, v, m.safe_div(v, total, 0.0)


def eval_2d(nodes_x, nodes_y, values, x, y):
    """Tensor-product Catmull-Rom on a 2D grid (spline.h eval_2d).

    values has shape (ny, nx); query points broadcast."""
    nodes_x = jnp.asarray(nodes_x)
    nodes_y = jnp.asarray(nodes_y)
    values = jnp.asarray(values)
    ny, nx = values.shape[-2], values.shape[-1]
    okx, bx, wx = _weights_nonuniform(nodes_x, x)
    oky, by, wy = _weights_nonuniform(nodes_y, y)
    out = 0.0
    for iy in range(4):
        row = 0.0
        ry = jnp.clip(by + iy, 0, ny - 1)
        for ix in range(4):
            rx = jnp.clip(bx + ix, 0, nx - 1)
            row = row + wx[..., ix] * values[ry, rx]
        out = out + wy[..., iy] * row
    return jnp.where(okx & oky, out, 0.0)


def _weights_nonuniform(nodes, x):
    n = nodes.shape[-1]
    idx = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0 = jnp.take(nodes, idx, axis=-1)
    x1 = jnp.take(nodes, idx + 1, axis=-1)
    w = x1 - x0
    t = m.safe_div(x - x0, w, 0.0)
    t2 = t * t
    t3 = t2 * t
    w_f0 = 2 * t3 - 3 * t2 + 1
    w_f1 = -2 * t3 + 3 * t2
    w_d0 = (t3 - 2 * t2 + t)
    w_d1 = (t3 - t2)
    xm = jnp.take(nodes, jnp.maximum(idx - 1, 0), axis=-1)
    xp = jnp.take(nodes, jnp.minimum(idx + 2, n - 1), axis=-1)
    has_left = idx > 0
    has_right = idx + 2 < n
    s_l = m.safe_div(w, x1 - xm, 0.0)
    s_r = m.safe_div(w, xp - x0, 0.0)
    w0 = jnp.where(has_left, -w_d0 * s_l, 0.0)
    w1 = w_f0 + jnp.where(has_left, 0.0, -w_d0) \
        + jnp.where(has_right, -w_d1 * s_r, -w_d1)
    w2 = w_f1 + jnp.where(has_left, w_d0 * s_l, w_d0) \
        + jnp.where(has_right, 0.0, w_d1)
    w3 = jnp.where(has_right, w_d1 * s_r, 0.0)
    ok = (x >= nodes[..., 0]) & (x <= nodes[..., -1])
    return ok, idx - 1, jnp.stack([w0, w1, w2, w3], axis=-1)
