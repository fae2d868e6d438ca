"""BSDF abstraction.

Parity: include/mitsuba/render/bsdf.h — ``BSDFFlags`` lobe bitfield
(bsdf.h:38-100), ``TransportMode``, ``BSDFContext`` (bsdf.h:217-244), and the
``sample/eval/pdf/eval_null_transmission`` interface (bsdf.h:328-408).

TPU dispatch design: the reference partitions SIMD lanes by BSDF pointer via
Enoki vcalls (bsdf.h:522-532). Here the scene keeps a static list of BSDF
instances; the integrator evaluates each instance's vectorized eval/sample on
the wavefront masked by ``si.bsdf_idx == i`` and blends with ``where`` — see
render/scene.py. Material-sorted queues are the planned upgrade for scenes
with many materials.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp

from ..core.object import Object
from .records import BSDFSample


class BSDFFlags(enum.IntFlag):
    # (bsdf.h:38-100)
    Empty = 0x00000
    Null = 0x00001
    DiffuseReflection = 0x00002
    DiffuseTransmission = 0x00004
    GlossyReflection = 0x00008
    GlossyTransmission = 0x00010
    DeltaReflection = 0x00020
    DeltaTransmission = 0x00040
    Anisotropic = 0x01000
    SpatiallyVarying = 0x02000
    NonSymmetric = 0x04000
    FrontSide = 0x08000
    BackSide = 0x10000
    NeedsDifferentials = 0x20000
    # composites
    Reflection = (DiffuseReflection | GlossyReflection | DeltaReflection)
    Transmission = (DiffuseTransmission | GlossyTransmission
                    | DeltaTransmission | Null)
    Diffuse = DiffuseReflection | DiffuseTransmission
    Glossy = GlossyReflection | GlossyTransmission
    Smooth = Diffuse | Glossy
    Delta = DeltaReflection | DeltaTransmission
    Delta1D = 0x0  # unused placeholder for parity
    All = Reflection | Transmission


class TransportMode(enum.IntEnum):
    Radiance = 0
    Importance = 1


class BSDFContext(NamedTuple):
    """Query context (bsdf.h:217): transport mode, enabled lobe types,
    component selection (-1 = all)."""
    mode: int = TransportMode.Radiance
    type_mask: int = int(BSDFFlags.All)
    component: int = -1

    def is_enabled(self, flags: BSDFFlags, component: int = 0) -> bool:
        return ((self.type_mask & int(flags)) == int(flags)
                and (self.component == -1 or self.component == component))

    def reverse(self) -> "BSDFContext":
        return self._replace(mode=1 - self.mode)


class BSDF(Object):
    """Base BSDF. Subclasses implement sample/eval/pdf over wavefronts.

    All directions are in the local shading frame; ``si.wi`` points away from
    the surface. ``active`` masks dead lanes. Return conventions match
    bsdf.h:328-391: sample -> (BSDFSample, value/pdf with cosine foreshortening
    folded in); eval -> value * cos(theta_o)."""

    def __init__(self, props=None):
        super().__init__(props)
        self.m_flags = BSDFFlags.Empty
        self.m_components: list[BSDFFlags] = []

    # subclass interface -------------------------------------------------------
    def sample(self, ctx: BSDFContext, si, sample1, sample2, active):
        raise NotImplementedError

    def eval(self, ctx: BSDFContext, si, wo, active):
        raise NotImplementedError

    def pdf(self, ctx: BSDFContext, si, wo, active):
        raise NotImplementedError

    def eval_null_transmission(self, si, active):
        """Spectrum passed straight through a Null lobe (bsdf.h:408)."""
        del si, active
        return 0.0

    # introspection ------------------------------------------------------------
    def flags(self, component: int | None = None) -> BSDFFlags:
        if component is None:
            return self.m_flags
        return self.m_components[component]

    def component_count(self) -> int:
        return len(self.m_components)

    def needs_differentials(self) -> bool:
        return bool(self.m_flags & BSDFFlags.NeedsDifferentials)


def zero_bsdf_sample(n, dtype=jnp.float32) -> BSDFSample:
    z = jnp.zeros((n,), dtype)
    return BSDFSample(
        wo=jnp.zeros((n, 3), dtype).at[..., 2].set(1.0),
        pdf=z, eta=jnp.ones((n,), dtype),
        sampled_type=jnp.zeros((n,), jnp.uint32),
        sampled_component=jnp.full((n,), -1, jnp.int32))


# -----------------------------------------------------------------------------
# Polarized evaluation hooks (used by the stokes/polarized transport)
# -----------------------------------------------------------------------------

def _depolarize_value(value):
    """(N, C) scalar spectrum -> (N, C, 4, 4) depolarizer Mueller matrices."""
    out = jnp.zeros(value.shape + (4, 4), value.dtype)
    return out.at[..., 0, 0].set(value)


def _mueller_base_eval_pol(self, ctx, si, wo, active):
    """Default: non-polarizing BSDFs act as depolarizers (the reference's
    `unpolarized<Spectrum>()` wrapper)."""
    return _depolarize_value(self.eval(ctx, si, wo, active))


def _mueller_base_sample_pol(self, ctx, si, sample1, sample2, active):
    bs, value = self.sample(ctx, si, sample1, sample2, active)
    return bs, _depolarize_value(value)


BSDF.eval_pol = _mueller_base_eval_pol
BSDF.sample_pol = _mueller_base_sample_pol
