"""Samplers.

The reference threads a stateful per-lane PCG32 (sampler.h:49,127); on TPU we
use a *stateless* counter design: a SamplerState carries (per-lane key,
dimension counter); every draw hashes (key, dim) and bumps dim. This is
order-independent, replayable, and `lax.while_loop`-safe.

Deterministic per (seed, pixel, sample_index) like the reference's
``seed(block_id * pixel_count + i)`` contract (sampler.cpp:17-50), which the
low-discrepancy samplers rely on (ldsampler.cpp:90-118).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import rng
from ..core.object import Object


class SamplerState(NamedTuple):
    key: jnp.ndarray          # (N,) uint32 per-lane stream key
    dim: jnp.ndarray          # () or (N,) uint32 dimension counter
    sample_index: jnp.ndarray  # (N,) uint32 index of the sample in the pixel
    # static metadata for structured samplers
    lane_id: jnp.ndarray      # (N,) uint32 pixel id (stratification key)


class Sampler(Object):
    """Base sampler. Subclasses override the draw strategy; the wavefront
    state/bookkeeping is shared."""

    plugin_name = "independent"

    def __init__(self, props=None):
        super().__init__(props if hasattr(props, "id") else None)
        props = props or {}
        self.sample_count = int(props.get("sample_count", 4))
        self.base_seed = int(props.get("seed", 0))

    # -- wavefront API --------------------------------------------------------
    def seed(self, seed, pixel_id, sample_index) -> SamplerState:
        """Create per-lane state. pixel_id/sample_index: (N,) uint32.

        The (pixel, sample) pair is mixed through TEA so streams stay
        collision-free for any spp, across passes and across chips."""
        pixel_id = jnp.asarray(pixel_id, jnp.uint32)
        sample_index = jnp.asarray(sample_index, jnp.uint32)
        mixed, _ = rng.sample_tea_32(pixel_id, sample_index)
        full_seed = jnp.uint32(self.base_seed) ^ jnp.uint32(seed)
        key = rng.lane_key(full_seed, mixed)
        # lane_id is the structured samplers' per-pixel scramble key: it
        # must be constant across a pixel's spp samples but MUST mix the
        # seed, or ldsampler/stratified scrambles repeat across seeded
        # re-renders (reference compute_per_sequence_seed takes the seed,
        # ldsampler.cpp:90-118)
        lane = rng.lane_key(full_seed, pixel_id)
        return SamplerState(key, jnp.uint32(0), sample_index, lane)

    def next_1d(self, state: SamplerState):
        v = self._draw(state, 0)
        return v, state._replace(dim=state.dim + jnp.uint32(1))

    def next_2d(self, state: SamplerState):
        v0 = self._draw(state, 0)
        v1 = self._draw(state, 1)
        return (jnp.stack([v0, v1], axis=-1),
                state._replace(dim=state.dim + jnp.uint32(2)))

    def _draw(self, state: SamplerState, offset: int):
        return rng.uniform_float(state.key, state.dim + jnp.uint32(offset))

    def clone(self):
        return type(self)({"sample_count": self.sample_count,
                           "seed": self.base_seed})

    def traverse(self, cb):
        pass
