#!/usr/bin/env python
"""Vol-kernel scaling probes: throughput vs max_depth, spp, and combined
ablations — separates per-launch fixed cost from per-event compute."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time, os
sys.path.insert(0, %r)
import numpy as np, jax.numpy as jnp
import mitsuba2_tpu as mi
mi.set_variant("scalar_rgb")
from mitsuba2_tpu.core.transform import Transform as T
depth = int(os.environ.get("P_DEPTH", "16"))
spp = int(os.environ.get("P_SPP", "16"))
grid = np.random.default_rng(0).uniform(0.2, 2.0, (16, 16, 16)).astype(np.float32)
d = {"type": "scene",
     "integrator": {"type": "volpath", "max_depth": depth},
     "slab": {"type": "cube", "bsdf": {"type": "null"},
              "interior": {"type": "heterogeneous",
                           "sigma_t": {"type": "grid3d", "data": grid},
                           "albedo": {"type": "rgb", "value": [0.8] * 3},
                           "to_world": (T.translate([-1, -1, -1]) @ T.scale(2.0)),
                           "phase": {"type": "hg", "g": 0.3}}},
     "light": {"type": "rectangle",
               "to_world": T.translate([0, 0, -2.5]) @ T.scale(2.0),
               "emitter": {"type": "area", "radiance": {"type": "rgb", "value": [4.0] * 3}}},
     "sensor": {"type": "perspective", "fov": 35.0,
                "to_world": T.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                "film": {"type": "hdrfilm", "width": 256, "height": 256,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": spp}}}
scene = mi.load_dict(d)
integ = scene.integrator
np.asarray(integ.render(scene, seed=0, spp=spp))
best = 1e9
for r in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(integ.render(scene, seed=r + 1, spp=spp)))
    best = min(best, time.perf_counter() - t0)
print("RESULT %%7.1f ms  %%6.3f Mpaths/s  engine=%%s"
      %% (best * 1e3, 256 * 256 * spp / best / 1e6, integ.last_engine),
      flush=True)
""" % (REPO,)

CONFIGS = [
    ("d16", {}),
    ("d8", {"P_DEPTH": "8"}),
    ("d4", {"P_DEPTH": "4"}),
    ("d2", {"P_DEPTH": "2"}),
    ("spp4", {"P_SPP": "4"}),
    ("d16_lean", {"VK_NO_NEE": "1", "VK_NO_FETCH": "1"}),
    ("d4_lean", {"P_DEPTH": "4", "VK_NO_NEE": "1", "VK_NO_FETCH": "1"}),
]


def main():
    names = sys.argv[1:] or [n for n, _ in CONFIGS]
    for name, env in CONFIGS:
        if name not in names:
            continue
        e = dict(os.environ)
        e.update(env)
        r = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=900)
        line = [ln for ln in r.stdout.splitlines() if "RESULT" in ln]
        print(f"{name:10s} {line[0] if line else 'FAILED: ' + r.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    main()
