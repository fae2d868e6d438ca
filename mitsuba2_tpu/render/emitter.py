"""Emitters / endpoints.

Parity: include/mitsuba/render/endpoint.h:42 (sample_ray, sample_direction,
pdf_direction, eval) and emitter.h:61 (EmitterFlags incl. Surface/
Environment). Emitter pointers become integer indices into the scene's
emitter list; uniform emitter selection with MIS pdf matches
scene.cpp:165-214.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from ..core.object import Object


class EmitterFlags(enum.IntFlag):
    # (emitter.h:14-44)
    Empty = 0x00000
    DeltaPosition = 0x00001
    DeltaDirection = 0x00002
    Infinite = 0x00004
    Surface = 0x00008
    SpatiallyVarying = 0x00010
    Delta = DeltaPosition | DeltaDirection


class Emitter(Object):
    def __init__(self, props=None):
        super().__init__(props)
        self.m_flags = EmitterFlags.Empty
        self.shape = None          # set when attached to a shape
        self._scene_bsphere = None  # set by Scene for infinite emitters

    def set_shape(self, shape):
        self.shape = shape

    def set_scene(self, scene):
        """Environment emitters need the scene bounds (envmap.cpp set_scene)."""
        self._scene_bsphere = scene.bounding_sphere()

    def is_environment(self) -> bool:
        return bool(self.m_flags & EmitterFlags.Infinite) and \
            not bool(self.m_flags & EmitterFlags.Delta)

    def flags(self):
        return self.m_flags

    # -- endpoint interface (endpoint.h:86-163) --------------------------------
    def sample_ray(self, time, sample1, sample2, sample3, active):
        """Sample an emitted ray (position x direction x wavelength)."""
        raise NotImplementedError

    def sample_direction(self, it, sample, active):
        """-> (DirectionSample, spectrum / pdf)."""
        raise NotImplementedError

    def pdf_direction(self, it, ds, active):
        raise NotImplementedError

    def eval(self, si, active):
        """Emitted radiance at si toward si.wi."""
        raise NotImplementedError
