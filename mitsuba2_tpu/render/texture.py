"""Texture base (reference: include/mitsuba/render/texture.h:23-189).

Interface: ``eval`` (color-mode-dependent spectrum using si.wavelengths in
spectral mode), ``eval_1`` (scalar), ``eval_3`` (raw RGB),
``sample_spectrum``/``pdf_spectrum``, ``mean``. 3D ``Volume`` lives in
models/media.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.object import Object
from ..core import spectrum as spec
from ..variants import current as current_variant


class Texture(Object):
    def __init__(self, props=None):
        super().__init__(props)

    # color-mode aware evaluation ---------------------------------------------
    def eval(self, si, active=True):
        """Spectrum at si (channels follow the active variant)."""
        raise NotImplementedError

    def eval_1(self, si, active=True):
        """Monochromatic/raw scalar value."""
        raise NotImplementedError

    def eval_3(self, si, active=True):
        """Raw linear RGB triple (trichromatic modes only)."""
        raise NotImplementedError

    def sample_spectrum(self, si, sample, active=True):
        """Importance sample the spectral dimension; default: rgb-importance
        sampling like the reference base (texture.cpp)."""
        var = current_variant()
        if not var.is_spectral:
            return si.wavelengths, self.eval(si, active)
        wav, weight = spec.sample_rgb_spectrum(sample)
        si2 = si._replace(wavelengths=wav)
        return wav, self.eval(si2, active) * weight

    def pdf_spectrum(self, si, active=True):
        var = current_variant()
        if not var.is_spectral:
            return jnp.zeros_like(si.wavelengths)
        return spec.pdf_rgb_spectrum(si.wavelengths)

    def mean(self) -> float:
        raise NotImplementedError

    def is_spatially_varying(self) -> bool:
        return False


def rgb_to_variant_spectrum(rgb, wavelengths):
    """Convert stored linear sRGB to the active variant's spectrum type.

    - rgb mode: identity
    - mono mode: luminance
    - spectral: rgb2spec polynomial upsampling at the hero wavelengths
      (reference srgb.cpp:14-37 / srgb spectrum plugin)
    """
    var = current_variant()
    if var.is_rgb:
        return rgb
    if var.is_monochromatic:
        return spec.luminance(rgb)[..., None]
    from .srgb import srgb_model_fetch, srgb_model_eval
    coeff = srgb_model_fetch(rgb)
    return srgb_model_eval(coeff, wavelengths)
