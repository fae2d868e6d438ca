#!/usr/bin/env python
"""Stage-level profile of the volumetric megakernel bench config.

Times, on the attached backend:
  1. the full render (bench.py volpath config),
  2. ONE kernel launch over all tiles (init + continuation),
  3. the between-launch compaction (argsort + 16-row take) alone,
  4. the batched trilinear fetch alone (NULL_BUDGET x R points),
so the 2.5 Mpaths/s wall (VERDICT r3 #2) can be attributed.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def sync(x):
    import jax.numpy as jnp
    float(jnp.sum(x))


def timeit(fn, n=6):
    fn()                       # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


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
    d = {"type": "scene",
         "integrator": {"type": "volpath", "max_depth": 16},
         "slab": {"type": "cube", "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "grid3d", "data": grid},
                               "albedo": {"type": "rgb", "value": [0.8] * 3},
                               "to_world": (T.translate([-1, -1, -1])
                                            @ T.scale(2.0)),
                               "phase": {"type": "hg", "g": 0.3}}},
         "light": {"type": "rectangle",
                   "to_world": T.translate([0, 0, -2.5]) @ T.scale(2.0),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb",
                                            "value": [4.0] * 3}}},
         "sensor": {"type": "perspective", "fov": 35.0,
                    "to_world": T.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": W, "height": H,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": SPP}}}
    scene = mi.load_dict(d)
    integ = scene.integrator

    t_full = timeit(lambda: sync(integ.render(scene, seed=1, spp=SPP)),
                    n=3)
    n_paths = W * H * SPP
    print(f"full render:        {t_full * 1e3:8.1f} ms  "
          f"({n_paths / t_full / 1e6:.2f} Mpaths/s)  "
          f"engine={integ.last_engine}")

    # ---- single-launch cost (init and continuation) ----
    from mitsuba2_tpu.ops import volmegakernel as vk
    eng = integ._vol_megakernel_for(scene, scene.sensors[0])
    print("kernel object:", type(eng).__name__)

    sensor = scene.sensors[0]
    film = sensor.film
    n = W * H * SPP
    n_pad = int(np.ceil(n / vk.RAY_TILE)) * vk.RAY_TILE
    n_tiles = n_pad // vk.RAY_TILE

    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # reuse render_pass internals by monkey-timing individual launches:
    # run a bisected render that stops after k launches
    orig_pallas_call = pl.pallas_call
    state0 = jnp.zeros((vk._VROWS, n_pad // 128, 128), jnp.float32)

    # time launch 0 (init) and launch 1 (continuation on live state)
    # by calling render_pass with max_depth temporarily clamped
    import types
    md_save = eng.max_depth

    def render_k_launches(k):
        eng.max_depth = max(k - vk.LAUNCH_SLACK, 1)
        try:
            img = eng.render_pass(sensor, 1, 0, SPP)
            sync(img)
        finally:
            eng.max_depth = md_save

    for k in (1, 2, 4, 8, 18):
        t = timeit(lambda: render_k_launches(k), n=3)
        print(f"launches<={k:2d}:       {t * 1e3:8.1f} ms")

    # ---- compaction alone ----
    flat = jnp.zeros((vk._VROWS, n_pad), jnp.float32)
    rng = np.random.default_rng(0)
    alive = (rng.uniform(size=n_pad) < 0.5).astype(np.float32)
    flat = flat.at[13].set(jnp.asarray(alive))

    @jax.jit
    def compact(flat):
        dead = (flat[13] <= 0.5).astype(jnp.int32)
        order = jnp.argsort(dead)
        return jnp.take(flat, order, axis=1)

    t_c = timeit(lambda: sync(compact(flat)))
    print(f"compaction (1 of ~17): {t_c * 1e3:6.1f} ms -> "
          f"x17 = {t_c * 17 * 1e3:.1f} ms")

    # ---- batched trilinear fetch alone (NULL_BUDGET x 2048 pts) ----
    R = vk.RAY_TILE
    K = vk.NULL_BUDGET
    gridj = eng.grid

    @jax.jit
    def fetch(pts):
        lx, ly, lz = pts
        return vk._trilinear_sigma(gridj, None, lx, ly, lz,
                                   eng.D, eng.H, eng.W, eng.scale)

    pts = tuple(jnp.asarray(rng.uniform(size=K * R), jnp.float32)
                for _ in range(3))
    t_f = timeit(lambda: sync(fetch(pts)))
    per_launch = t_f * n_tiles * 2   # delta + TR walks per launch
    print(f"batched fetch ({K}x{R} pts): {t_f * 1e3:6.2f} ms as XLA op; "
          f"x{n_tiles} tiles x2 walks = {per_launch * 1e3:.1f} ms/launch "
          f"IF it were the whole cost (upper bound, XLA != pallas)")


if __name__ == "__main__":
    main()
