"""Sampler plugins (reference: src/samplers/{independent,stratified,
multijitter,orthogonal,ldsampler}.cpp).

All are *stateless/counter-based* (render/sampler.py): a draw is a pure
function of (seed, pixel, sample_index, dimension) — the property the
reference's deterministic seeding guarantees (sampler.cpp:17-50), achieved
here without threading RNG state through the wavefront.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import rng, qmc
from ..render.sampler import Sampler, SamplerState


@register_plugin("sampler", "independent")
class IndependentSampler(Sampler):
    """(independent.cpp) pure white noise."""


class _StratifiedBase(Sampler):
    """Shared logic: dimension-decorrelated stratum permutation via TEA."""

    def __init__(self, props=None):
        super().__init__(props)
        props = props or {}
        self.jitter = bool(props.get("jitter", True)) \
            if not hasattr(props, "bool_") else props.bool_("jitter", True)

    def _perm(self, state: SamplerState, offset: int, n: int):
        """Per-(pixel, dimension) random permutation of sample indices via
        Kensler-style cycle-walking hash; here: TEA-feistel on index."""
        dim_key = rng.hash_combine(state.lane_id,
                                   state.dim + jnp.uint32(offset))
        # random invertible mapping: XOR with hash then modular add
        idx = state.sample_index
        x = (idx + rng.pcg_hash(dim_key)) % jnp.uint32(max(n, 1))
        return x, dim_key


@register_plugin("sampler", "stratified")
class StratifiedSampler(_StratifiedBase):
    """(stratified.cpp) jittered strata; 1D draws use `sample_count` strata,
    2D draws an (rx, ry) grid."""

    def __init__(self, props=None):
        super().__init__(props)
        c = int(np.ceil(np.sqrt(self.sample_count)))
        self.res = c
        self.sample_count = c * c

    def _draw(self, state, offset):
        n = self.sample_count
        s, dim_key = self._perm(state, offset, n)
        j = rng.uniform_float(state.key, state.dim + jnp.uint32(offset)) \
            if self.jitter else 0.5
        return (s.astype(jnp.float32) + j) / n

    def next_2d(self, state):
        n = self.sample_count
        r = self.res
        s, dim_key = self._perm(state, 0, n)
        sx = (s % r).astype(jnp.float32)
        sy = (s // r).astype(jnp.float32)
        if self.jitter:
            jx = rng.uniform_float(state.key, state.dim)
            jy = rng.uniform_float(state.key, state.dim + jnp.uint32(1))
        else:
            jx = jy = 0.5
        v = jnp.stack([(sx + jx) / r, (sy + jy) / r], axis=-1)
        return v, state._replace(dim=state.dim + jnp.uint32(2))


@register_plugin("sampler", "multijitter")
class MultijitterSampler(_StratifiedBase):
    """(multijitter.cpp) correlated multi-jittered sampling
    (Kensler 2013): stratified in both the fine n-grid and the coarse
    (r x r) grid."""

    def __init__(self, props=None):
        super().__init__(props)
        c = int(np.ceil(np.sqrt(self.sample_count)))
        self.res = c
        self.sample_count = c * c

    def _draw(self, state, offset):
        n = self.sample_count
        s, _ = self._perm(state, offset, n)
        j = rng.uniform_float(state.key, state.dim + jnp.uint32(offset)) \
            if self.jitter else 0.5
        return (s.astype(jnp.float32) + j) / n

    def next_2d(self, state):
        n = self.sample_count
        r = self.res
        s, dim_key = self._perm(state, 0, n)
        x = s % r
        y = s // r
        # CMJ sub-stratum shuffles keyed per row/column
        sx = (y + rng.pcg_hash(dim_key ^ jnp.uint32(0x51633e2d) ^ x)
              % jnp.uint32(r)).astype(jnp.float32)
        sy = (x + rng.pcg_hash(dim_key ^ jnp.uint32(0x68bc21eb) ^ y)
              % jnp.uint32(r)).astype(jnp.float32)
        sx = (x.astype(jnp.float32)
              + ((y + rng.pcg_hash(dim_key ^ (x * jnp.uint32(2654435761))))
                 % jnp.uint32(r)).astype(jnp.float32) / r)
        sy = (y.astype(jnp.float32)
              + ((x + rng.pcg_hash(dim_key ^ (y * jnp.uint32(40503))))
                 % jnp.uint32(r)).astype(jnp.float32) / r)
        if self.jitter:
            jx = rng.uniform_float(state.key, state.dim)
            jy = rng.uniform_float(state.key, state.dim + jnp.uint32(1))
        else:
            jx = jy = 0.5
        v = jnp.stack([(sx + jx / r) / r, (sy + jy / r) / r], axis=-1)
        return v, state._replace(dim=state.dim + jnp.uint32(2))


@register_plugin("sampler", "ldsampler")
class LowDiscrepancySampler(Sampler):
    """(ldsampler.cpp:90-118) scrambled (0,2)-sequence: per-(pixel, dim)
    TEA-derived scramble + XOR-shuffled sample index, radical-inverse base 2
    and Sobol' second dimension."""

    def _keys(self, state, offset):
        seq_key = rng.hash_combine(state.lane_id,
                                   state.dim + jnp.uint32(offset))
        # permute sample order within the sequence (compute_per_sequence_seed)
        index = state.sample_index ^ (seq_key >> jnp.uint32(16))
        return seq_key, index

    def _draw(self, state, offset):
        seq_key, index = self._keys(state, offset)
        return qmc.radical_inverse_2(index, seq_key)

    def next_2d(self, state):
        seq_key, index = self._keys(state, 0)
        key2 = rng.pcg_hash(seq_key)
        x = qmc.radical_inverse_2(index, seq_key)
        y = qmc.sobol_2(index, key2)
        return (jnp.stack([x, y], axis=-1),
                state._replace(dim=state.dim + jnp.uint32(2)))


@register_plugin("sampler", "orthogonal")
class OrthogonalSampler(Sampler):
    """(orthogonal.cpp) orthogonal-array sampling (Jarosz et al. 2019).

    Bush-construction OA of strength 2 with prime base p: the per-dimension
    coordinate of sample i is (i/p + (i%p + dim-offset hash) ) permuted.
    Falls back to strength-2 OA over p^2 samples; p chosen as the smallest
    prime with p^2 >= sample_count."""

    def __init__(self, props=None):
        super().__init__(props)
        p = 2
        while p * p < self.sample_count or not _is_prime(p):
            p += 1
        self.p = p
        self.sample_count = p * p

    def _coord(self, state, offset):
        p = jnp.uint32(self.p)
        i = state.sample_index
        a = i % p
        b = i // p
        # Bush construction: x_d = (a * k_d + b) mod p. k_d must DIFFER
        # across dimensions or the 2D projections collapse onto
        # diagonals; a hash modulo (p-1) collides for ~1/(p-1) of dim
        # pairs, so use a per-pixel ROTATION of the dimension index —
        # bijective on [1, p-1] by construction.
        rot = rng.hash_combine(state.lane_id, jnp.uint32(0x9E3779B9))
        d = state.dim + jnp.uint32(offset)
        k = ((d + rot) % (p - jnp.uint32(1))) + jnp.uint32(1)
        s = (a * k + b) % p
        # per-stratum jitter
        j = rng.uniform_float(state.key, state.dim + jnp.uint32(offset))
        return (s.astype(jnp.float32) + j) / self.p

    def _draw(self, state, offset):
        return self._coord(state, offset)


def _is_prime(n):
    if n < 2:
        return False
    k = 2
    while k * k <= n:
        if n % k == 0:
            return False
        k += 1
    return True
