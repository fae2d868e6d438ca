#!/usr/bin/env python
"""Vol-kernel launch-cost profile via the integrator's jitted pass.

Renders the bench volpath config at max_depth in {1,2,4,8,12,16} (the
kernel does max_depth+2 launches with live-lane compaction between) and
prints per-config wall time. The marginal time per extra launch, and the
share of a no-op launch (all lanes dead after depth clamps), attribute
the 2.5 Mpaths/s wall between kernel body, compaction sort, and fixed
per-launch dispatch.  Also times the compaction (argsort+take) alone.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.core.transform import Transform as T

    W = H = 256
    SPP = 16
    grid = np.random.default_rng(0).uniform(
        0.2, 2.0, (16, 16, 16)).astype(np.float32)

    def scene_for(md):
        d = {"type": "scene",
             "integrator": {"type": "volpath", "max_depth": md},
             "slab": {"type": "cube", "bsdf": {"type": "null"},
                      "interior": {"type": "heterogeneous",
                                   "sigma_t": {"type": "grid3d",
                                               "data": grid},
                                   "albedo": {"type": "rgb",
                                              "value": [0.8] * 3},
                                   "to_world": (T.translate([-1, -1, -1])
                                                @ T.scale(2.0)),
                                   "phase": {"type": "hg", "g": 0.3}}},
             "light": {"type": "rectangle",
                       "to_world": (T.translate([0, 0, -2.5])
                                    @ T.scale(2.0)),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": [4.0] * 3}}},
             "sensor": {"type": "perspective", "fov": 35.0,
                        "to_world": T.look_at([0, 0, 4], [0, 0, 0],
                                              [0, 1, 0]),
                        "film": {"type": "hdrfilm", "width": W,
                                 "height": H,
                                 "rfilter": {"type": "box"}},
                        "sampler": {"type": "independent",
                                    "sample_count": SPP}}}
        return mi.load_dict(d)

    def bench(md):
        scene = scene_for(md)
        integ = scene.integrator
        img = integ.render(scene, seed=0, spp=SPP)
        np.asarray(img)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            o1 = integ.render(scene, seed=r + 1, spp=SPP)
            float(jnp.sum(o1))
            best = min(best, time.perf_counter() - t0)
        return best

    prev = None
    for md in (1, 2, 4, 8, 12, 16):
        t = bench(md)
        marg = f"  (+{(t - prev) * 1e3 / 4:6.1f} ms/launch)" \
            if prev is not None else ""
        # launches = md + 2, so consecutive entries differ by the
        # marginal launches; normalize roughly
        print(f"max_depth={md:2d} ({md + 2:2d} launches): "
              f"{t * 1e3:7.1f} ms{marg}", flush=True)
        prev = t

    # compaction alone, jitted, full wavefront width
    n_pad = W * H * SPP
    flat = jnp.zeros((16, n_pad), jnp.float32)
    rng = np.random.default_rng(0)
    flat = flat.at[13].set(jnp.asarray(
        (rng.uniform(size=n_pad) < 0.5).astype(np.float32)))

    @jax.jit
    def compact(flat):
        dead = (flat[13] <= 0.5).astype(jnp.int32)
        order = jnp.argsort(dead)
        perm = order
        return jnp.take(flat, order, axis=1), perm

    out = compact(flat)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(compact(flat))
        best = min(best, time.perf_counter() - t0)
    print(f"compaction (argsort+take 16x{n_pad}): {best * 1e3:6.1f} ms "
          f"-> x16 launches = {best * 16 * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
