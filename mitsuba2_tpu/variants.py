"""Variant system.

The reference instantiates one C++ codebase into up to 36 compile-time variants
(reference: resources/mitsuba.conf.template:95-278, docs variants.rst). Here a
variant is a runtime configuration consumed at jit/trace time — the compute
backend axis (scalar/packet/gpu) collapses because XLA handles vectorization;
what remains is color representation, polarization and precision.

API parity: ``mitsuba.set_variant(name)`` / ``variant()`` / ``variants()``
(reference: src/python/__init__.py:120-180) — thread-local, like the reference.
"""

from __future__ import annotations

import dataclasses
import threading

import jax.numpy as jnp

__all__ = [
    "Variant", "set_variant", "variant", "variants", "variant_config",
    "current", "mode_mono", "mode_rgb", "mode_spectral", "mode_polarized",
]

_COLOR_MODES = ("mono", "rgb", "spectral")
# Hero-wavelength count in spectral mode (reference: include/mitsuba/core/
# spectrum.h:15 MTS_WAVELENGTH_SAMPLES = 4).
SPECTRUM_SAMPLES = 4
# Visible range sampled by the spectral variants (spectrum.h:18-20).
MTS_WAVELENGTH_MIN = 360.0
MTS_WAVELENGTH_MAX = 830.0


@dataclasses.dataclass(frozen=True)
class Variant:
    """Trace-time configuration replacing the reference's template variants."""

    color_mode: str = "rgb"            # mono | rgb | spectral
    polarized: bool = False
    double_precision: bool = False

    def __post_init__(self):
        if self.color_mode not in _COLOR_MODES:
            raise ValueError(f"unknown color mode {self.color_mode!r}")

    # ---- derived properties ------------------------------------------------
    @property
    def dtype(self):
        return jnp.float64 if self.double_precision else jnp.float32

    @property
    def n_channels(self) -> int:
        """Channels of a Color/Spectrum value."""
        return {"mono": 1, "rgb": 3, "spectral": SPECTRUM_SAMPLES}[self.color_mode]

    @property
    def is_spectral(self) -> bool:
        return self.color_mode == "spectral"

    @property
    def is_monochromatic(self) -> bool:
        return self.color_mode == "mono"

    @property
    def is_rgb(self) -> bool:
        return self.color_mode == "rgb"

    @property
    def name(self) -> str:
        n = "scalar_" + self.color_mode
        if self.polarized:
            n += "_polarized"
        if self.double_precision:
            n += "_double"
        return n


def _parse(name: str) -> Variant:
    """Parse a reference-style variant name.

    The backend prefix (scalar/packet/gpu/gpu_autodiff) is accepted for
    compatibility and ignored: every variant runs on the same jitted wavefront.
    """
    parts = name.split("_")
    # strip backend prefix tokens
    while parts and parts[0] in ("scalar", "packet", "gpu", "autodiff", "ad"):
        parts.pop(0)
    if not parts or parts[0] not in _COLOR_MODES:
        raise ValueError(f"cannot parse variant name {name!r}")
    color = parts.pop(0)
    polarized = "polarized" in parts
    double = "double" in parts
    leftover = [p for p in parts if p not in ("polarized", "double")]
    if leftover:
        raise ValueError(f"cannot parse variant name {name!r} (tokens {leftover})")
    return Variant(color, polarized, double)


class _State(threading.local):
    def __init__(self):
        self.variant = Variant("rgb")
        self.name = "scalar_rgb"


_state = _State()


def set_variant(name: str) -> None:
    """Select the active variant for this thread (reference API parity)."""
    _state.variant = _parse(name)
    _state.name = name


def variant() -> str:
    """Name of the currently active variant."""
    return _state.name


def current() -> Variant:
    """The active :class:`Variant` configuration object."""
    return _state.variant


def variant_config(name: str | None = None) -> Variant:
    """Resolve a name (or the active variant) to a :class:`Variant`."""
    return _state.variant if name is None else _parse(name)


def variants() -> list[str]:
    """All supported variant names (every one is always 'compiled' here)."""
    out = []
    for backend in ("scalar", "packet", "gpu", "gpu_autodiff"):
        for color in _COLOR_MODES:
            for pol in ("", "_polarized"):
                for dbl in ("", "_double"):
                    out.append(f"{backend}_{color}{pol}{dbl}")
    return out
