"""Spectral upsampling of sRGB colors (role of reference srgb.h:9 /
srgb.cpp:14-37 + ext/rgb2spec).

Model: Jakob & Hanika 2019 sigmoid-polynomial reflectance
    S(lambda) = sigmoid(c0*x^2 + c1*x + c2),  x = normalized wavelength,
    sigmoid(t) = 0.5 + t / (2*sqrt(1+t^2)).

The reference ships a precomputed 64^3 coefficient table (data/srgb.coeff)
built by an offline optimizer (rgb2spec_opt.cpp). Here coefficients are
*fitted on demand* at scene-load time with a vectorized Gauss-Newton solve in
JAX (milliseconds for thousands of colors) and cached — the same model, no
binary blob. ``srgb_model_eval`` is the trace-time evaluator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spectrum as spec

_WL_MIN = spec.MTS_CIE_MIN
_WL_MAX = spec.MTS_CIE_MAX


def _normalize_wl(wl):
    return (wl - _WL_MIN) / (_WL_MAX - _WL_MIN) * 2.0 - 1.0


def srgb_model_eval(coeff, wavelengths):
    """Evaluate the reflectance model. coeff (..., 3), wavelengths (..., S)
    -> (..., S). (parity: srgb_model_eval, srgb.h)"""
    x = _normalize_wl(wavelengths)
    t = (coeff[..., 0:1] * x * x + coeff[..., 1:2] * x + coeff[..., 2:3])
    return 0.5 + t / (2.0 * jnp.sqrt(1.0 + t * t))


def srgb_model_mean(coeff):
    """Average reflectance over the visible range (srgb.h srgb_model_mean)."""
    wl = jnp.linspace(_WL_MIN, _WL_MAX, 64)
    return jnp.mean(srgb_model_eval(coeff, wl), axis=-1)


# ----------------------------------------------------------------------------
# Fitting (host-side, scene-load time)
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _fit_tables():
    """Dense CMF*D65 integration weights for round-trip fitting."""
    wl = np.linspace(_WL_MIN, _WL_MAX, 95, dtype=np.float32)
    cmf = np.asarray(spec.cie1931_xyz(jnp.asarray(wl)))          # (95,3)
    d65 = np.asarray(spec.cie_d65(jnp.asarray(wl)))              # (95,)
    w = cmf * d65[:, None]
    # normalize so a unit reflectance maps to the D65 whitepoint with Y=1
    w = w / w[:, 1].sum()
    return jnp.asarray(wl), jnp.asarray(w)


def _coeff_to_rgb(coeff):
    wl, w = _fit_tables()
    refl = srgb_model_eval(coeff, wl)              # (..., 95)
    xyz = refl @ w                                  # (..., 3)
    return spec.xyz_to_srgb(xyz)


@jax.jit
def _fit_batch(rgb):
    """Gauss-Newton fit of model coefficients for a batch of linear sRGB
    values in [0,1]. Returns (B, 3) coefficients."""
    b = rgb.shape[0]
    # initialization: flat spectrum matching luminance
    y = jnp.clip(spec.luminance(rgb), 1e-4, 0.9999)
    t0 = (y - 0.5) / jnp.sqrt(jnp.maximum(y * (1.0 - y), 1e-6))
    coeff = jnp.stack([jnp.zeros_like(t0), jnp.zeros_like(t0), t0], axis=-1)

    target = rgb

    def residual(c):
        return _coeff_to_rgb(c) - target

    def step(carry, _):
        c = carry
        r = residual(c)                               # (B,3)
        J = jax.vmap(jax.jacfwd(lambda cc: _coeff_to_rgb(cc[None])[0]))(c)
        # J: (B,3,3) d rgb / d coeff; Levenberg damping
        JtJ = jnp.einsum("bij,bik->bjk", J, J)
        JtJ = JtJ + 1e-4 * jnp.eye(3)
        Jtr = jnp.einsum("bij,bi->bj", J, r)
        delta = jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
        return c - delta, None

    coeff, _ = jax.lax.scan(step, coeff, None, length=25)
    return coeff


_cache: dict[bytes, np.ndarray] = {}


def srgb_model_fetch(rgb) -> jnp.ndarray:
    """Fit (or look up) model coefficients for linear sRGB values.

    HOST-SIDE ONLY (scene load / texture construction) — not traceable.
    rgb: array-like (..., 3) in [0, 1]. Returns (..., 3) coefficients.
    (parity: srgb_model_fetch, srgb.cpp:14-37 — table lookup there)
    """
    _fit_tables()  # build the CIE tables eagerly (outside any jit trace)
    rgb_np = np.asarray(rgb, np.float32)
    shape = rgb_np.shape
    flat = np.clip(rgb_np.reshape(-1, 3), 0.0, 1.0)
    # quantize key for caching
    key = np.round(flat * 4095).astype(np.uint16).tobytes()
    hit = _cache.get(key)
    if hit is None:
        # dedupe identical colors (textures often have few unique values)
        uniq, inv = np.unique(np.round(flat * 4095).astype(np.uint16),
                              axis=0, return_inverse=True)
        fitted = np.asarray(_fit_batch(jnp.asarray(uniq.astype(np.float32)
                                                   / 4095.0)))
        hit = fitted[inv]
        if len(key) < (1 << 20):
            _cache[key] = hit
    return jnp.asarray(hit.reshape(shape))
