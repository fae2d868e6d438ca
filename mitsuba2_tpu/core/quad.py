"""Quadrature rules (reference: include/mitsuba/core/quad.h).

Host-side numpy computation of nodes/weights (static per rule order); returned
as jnp arrays for use inside jitted integrands. Rules: Gauss-Legendre,
Gauss-Lobatto, composite Simpson and Simpson 3/8 — same surface as the
reference's quad.h.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gauss_legendre_np(n: int):
    # numpy's leggauss is a battle-tested Golub-Welsch implementation
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_legendre(n: int):
    """Nodes and weights on [-1, 1] (quad.h gauss_legendre)."""
    x, w = _gauss_legendre_np(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


@functools.lru_cache(maxsize=None)
def _gauss_lobatto_np(n: int):
    if n < 2:
        raise ValueError("gauss_lobatto requires n >= 2")
    # interior nodes are roots of P'_{n-1}; find via eigen-decomposition of
    # the Jacobi matrix for Jacobi(1,1) polynomials, then rescale weights.
    m = n - 2
    if m > 0:
        k = np.arange(1, m)
        # Jacobi(1,1) recurrence coefficients
        b = np.sqrt(k * (k + 2) / ((2 * k + 1) * (2 * k + 3)))
        J = np.diag(b, 1) + np.diag(b, -1)
        interior = np.linalg.eigvalsh(J)
    else:
        interior = np.empty(0)
    x = np.concatenate([[-1.0], interior, [1.0]])
    # weights: w_i = 2 / (n (n-1) P_{n-1}(x_i)^2)
    Pn1 = np.polynomial.legendre.Legendre.basis(n - 1)(x)
    w = 2.0 / (n * (n - 1) * Pn1 ** 2)
    return x, w


def gauss_lobatto(n: int):
    """Nodes and weights on [-1, 1] including endpoints (quad.h gauss_lobatto)."""
    x, w = _gauss_lobatto_np(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def composite_simpson(n: int):
    """Composite Simpson rule on [-1, 1]; n must be odd (quad.h)."""
    if n % 2 != 1 or n < 3:
        raise ValueError("composite_simpson requires odd n >= 3")
    x = np.linspace(-1.0, 1.0, n)
    h = 2.0 / (n - 1)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= h / 3.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def composite_simpson_38(n: int):
    """Composite Simpson 3/8 rule on [-1, 1]; (n-1) divisible by 3 (quad.h)."""
    if (n - 1) % 3 != 0 or n < 4:
        raise ValueError("composite_simpson_38 requires n = 3k+1 >= 4")
    x = np.linspace(-1.0, 1.0, n)
    h = 2.0 / (n - 1)
    w = np.full(n, 3.0)
    w[0] = w[-1] = 1.0
    w[3:-1:3] = 2.0
    w *= h * 3.0 / 8.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)
