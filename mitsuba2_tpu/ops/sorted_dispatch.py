"""Material-sorted vectorized dispatch for heterogeneous wavefront scenes.

The reference partitions Enoki wavefront lanes by BSDF instance and runs
each callee once over a gathered lane packet (bsdf.h:522-532 vcall
dispatch). The TPU-native equivalent here: sort lanes by family index,
reshape into fixed tiles, and `lax.map` over tiles with a `lax.switch`
on each tile's (scalar) family id — a uniform tile executes exactly ONE
family's code instead of every family masked. Mixed tiles at family
boundaries (at most n_families-1 of them after the sort) take a fallback
branch that runs the classic masked sweep on that tile only.

Per-lane results are independent of lane order, so after the inverse
permutation the image is bit-identical to the masked-sweep path.

Cost model (why this wins only for many-family scenes): one argsort +
two pytree gathers (sort operands, unsort outputs) per call, against a
masked sweep that pays every family's full-width evaluation per bounce.
Callers gate on n_families and lane count (Scene.bsdf_* methods).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dispatch_sorted(idx, operands, branches, fallback, tile: int = 8192):
    """Sorted-queue dispatch over per-lane branch indices.

    idx: (N,) int32 in [-1, F) — -1 lanes are inactive (zero output).
    operands: pytree of (N, ...) arrays handed to every branch.
    branches: list of F callables f(operands_tile) -> out pytree; each
        must mask its own lanes (it still receives the full operand tile,
        including the per-lane mask the caller packed in) and produce
        zeros elsewhere.
    fallback: f(operands_tile) -> same struct; handles mixed tiles
        (typically the caller's existing masked sweep).
    Returns the out pytree in ORIGINAL lane order, length N.
    """
    N = idx.shape[0]
    F = len(branches)
    n_pad = (-N) % tile
    if n_pad:
        idx_p = jnp.concatenate(
            [idx, jnp.full((n_pad,), -1, idx.dtype)])
        operands = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]), operands)
    else:
        idx_p = idx
    perm = jnp.argsort(idx_p)
    sorted_ops = jax.tree_util.tree_map(lambda a: a[perm], operands)
    sidx = idx_p[perm]
    n_tiles = (N + n_pad) // tile
    tiles = jax.tree_util.tree_map(
        lambda a: a.reshape((n_tiles, tile) + a.shape[1:]), sorted_ops)
    tidx = sidx.reshape(n_tiles, tile)

    example = jax.tree_util.tree_map(lambda a: a[0], tiles)
    out_struct = jax.eval_shape(fallback, example)

    def zero_branch(_ops):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_struct)

    table = [zero_branch] + list(branches) + [fallback]

    def tile_body(args):
        ops_t, ti = args
        tmin = jnp.min(ti)
        tmax = jnp.max(ti)
        uniform = tmin == tmax
        branch_ix = jnp.where(
            tmax < 0, 0,
            jnp.where(uniform, tmin + 1, F + 1)).astype(jnp.int32)
        return jax.lax.switch(branch_ix, table, ops_t)

    outs = jax.lax.map(tile_body, (tiles, tidx))
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_tiles * tile,) + a.shape[2:])[inv][:N],
        outs)


def worth_sorting(n_lanes: int, n_families: int, tile: int = 8192,
                  min_families: int = 7) -> bool:
    """Gate: the sort + two full-width gathers only amortize when there
    are enough families to skip and enough tiles that boundary (mixed)
    tiles are a small fraction. min_families retuned from the measured
    TPU A/B (benchmarks/logs/sorted_dispatch_r5.log, bit-identical
    images): 10 distinct families run 1.33x over the masked sweeps,
    5 families are a wash (0.98x) — the crossover sits ~6-7."""
    if n_families < min_families:
        return False
    n_tiles = (n_lanes + tile - 1) // tile
    return n_tiles >= 4 * n_families
