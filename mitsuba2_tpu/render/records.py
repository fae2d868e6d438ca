"""Sampling records (reference: include/mitsuba/render/records.h:20,121 and
bsdf.h BSDFSample3f). Object pointers become integer emitter indices."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PositionSample(NamedTuple):
    p: jnp.ndarray       # (N,3)
    n: jnp.ndarray       # (N,3)
    uv: jnp.ndarray      # (N,2)
    time: jnp.ndarray    # (N,)
    pdf: jnp.ndarray     # (N,) area measure
    delta: jnp.ndarray   # (N,) bool


class DirectionSample(NamedTuple):
    """Direction toward an endpoint, solid-angle measure (records.h:121)."""
    p: jnp.ndarray
    n: jnp.ndarray
    uv: jnp.ndarray
    time: jnp.ndarray
    pdf: jnp.ndarray
    delta: jnp.ndarray
    d: jnp.ndarray          # (N,3) direction from reference point
    dist: jnp.ndarray       # (N,)
    emitter_idx: jnp.ndarray  # (N,) int32, -1 = none (records.h `object`)


class BSDFSample(NamedTuple):
    """Result of BSDF::sample (bsdf.h BSDFSample3f)."""
    wo: jnp.ndarray            # (N,3) local frame
    pdf: jnp.ndarray
    eta: jnp.ndarray           # relative IOR change
    sampled_type: jnp.ndarray  # (N,) uint32 BSDFFlags of sampled lobe
    sampled_component: jnp.ndarray  # (N,) int32
