#!/usr/bin/env python
"""Measure the ACHIEVED logical-f32 MXU rate of the megakernel's exact
Woop-sweep matmul shape ((4,3C)@(4,2R) via the 3-pass bf16 _dot3T) as a
standalone Pallas kernel.

Motivation (VERDICT r4 weak #4 -> r5): the MFU table's analytic K4
ceiling (197 TF x 4/128 / 3 = 2.05 TF logical f32) UNDERESTIMATES what
the hardware actually achieves on this shape — measured bounce rates
reached 316% of it, so the derate model (4 of 128 contraction rows +
3-pass split, each taken as a pure multiplicative loss) is wrong on the
real chip (Mosaic packs/pipelines the small-K passes better than the
naive model). Rather than keep guessing derates, this microbench
measures the shape's ceiling directly; core/profiler.py uses the
measured value so no utilization row can exceed 100% against a rate the
chip demonstrably sustains.

    python benchmarks/mxu_shape_ceiling.py [--chunks 16] [--iters 64]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=16,
                    help="face chunks per iteration (C=128 each)")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=64)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from mitsuba2_tpu.ops.megakernel import _dot3T

    C, R = 128, 2048
    n_chunks, iters = args.chunks, args.iters

    def kernel(w_ref, odh_ref, out_ref):
        acc = jnp.zeros((8, R), jnp.float32)
        for it in range(iters):
            for c in range(n_chunks):
                W = w_ref[:, c * 3 * C:(c + 1) * 3 * C]
                OD = _dot3T(W, odh_ref[:])          # (3C, 2R)
                # minimal consumer so nothing is dead-code eliminated
                acc = acc + OD[(it % 48) * 8:(it % 48) * 8 + 8, :R]
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, n_chunks * 3 * C)),
                    jnp.float32)
    odh = jnp.asarray(rng.standard_normal((4, 2 * R)), jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(args.tiles,),
        in_specs=[pl.BlockSpec(w.shape, lambda i: (0, 0)),
                  pl.BlockSpec(odh.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((args.tiles * 8, R),
                                       jnp.float32))
    g = jax.jit(lambda a, b: jnp.sum(f(a, b)))
    float(g(w, odh))                                # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(w, odh))
        best = min(best, time.perf_counter() - t0)
    # logical f32 FLOPs: (3C x 4 x 2R) madds x 2, per chunk/iter/tile
    flops = 2.0 * (3 * C) * 4 * (2 * R) * n_chunks * iters * args.tiles
    tf = flops / best / 1e12
    print(f"shape=(4,{3*C})@(4,{2*R}) x {n_chunks} chunks x {iters} "
          f"iters x {args.tiles} tiles  best={best*1e3:.1f} ms")
    print(f"achieved logical-f32 rate: {tf:.2f} TFLOP/s "
          f"(naive K4/3-pass model predicted 2.05)")


if __name__ == "__main__":
    main()
