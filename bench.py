#!/usr/bin/env python
"""Benchmark: Cornell box path tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.json): >= 50 Mpaths/s/chip at 256^2 @ 64 spp, path
integrator, scalar_rgb. A "path" = one camera sample (up to max_depth
bounces + NEE shadow rays), matching the north-star metric definition.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict

    width = height = 256
    spp = 64
    max_depth = 6

    d = cornell_box_dict(width=width, height=height, spp=spp,
                         max_depth=max_depth)
    scene = load_dict(d)
    integrator = scene.integrator

    # warmup / compile
    img = scene.integrator.render(scene, seed=0, spp=spp)
    np.asarray(img)

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        img = integrator.render(scene, seed=i + 1, spp=spp)
    np.asarray(img)  # sync
    dt = (time.perf_counter() - t0) / n_runs

    n_paths = width * height * spp
    mpaths = n_paths / dt / 1e6
    print(json.dumps({
        "metric": "cornell_box_path_throughput",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s/chip",
        "vs_baseline": round(mpaths / 50.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
