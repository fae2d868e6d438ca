#!/usr/bin/env python
"""HBM-tier cost split for biggeo: runs one render config per subprocess
with ablation env knobs and prints Mpaths/s for each.

NO_LEAF / NO_SWEEP bias the ray paths (everything misses the mesh), so
their numbers are optimistic bounds on "traversal only" / "traversal+DMA"
cost — still enough to rank where the time goes.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time
sys.path.insert(0, %r)
import numpy as np, jax.numpy as jnp
import mitsuba2_tpu as mi
mi.set_variant("scalar_rgb")
from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
spp = 16
scene = mi.load_dict(bumpy_sphere_dict(width=256, height=256, spp=spp,
                                       max_depth=5, nu=512, nv=257))
integ = scene.integrator
np.asarray(integ.render(scene, seed=0, spp=spp))
best = 1e9
for r in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(integ.render(scene, seed=r + 1, spp=spp)))
    best = min(best, time.perf_counter() - t0)
print("RESULT %%.3f Mpaths/s  (%%d ms)" %% (256 * 256 * spp / best / 1e6,
                                            best * 1000), flush=True)
""" % (REPO,)

CONFIGS = [
    ("base", {}),
    ("no_shadow", {"MK_NO_SHADOW": "1"}),
    ("no_leaf", {"MK_NO_LEAF": "1"}),
    ("no_sweep", {"MK_NO_SWEEP": "1"}),
    ("leaf1", {"MK_LEAF_CHUNKS": "1"}),
    ("leaf4", {"MK_LEAF_CHUNKS": "4"}),
    # keeps the per-row pl.when dispatch but empties the sweep body:
    # isolates the predicated-region entry + DMA-wait + accumulator
    # cost from the face math (op-lean epilogue moved biggeo 0.604 ->
    # 0.610, so the sweep is NOT bound by its vector ops)
    ("sweep_empty", {"MK_SWEEP_EMPTY": "1"}),
    ("leaf1_noshadow", {"MK_LEAF_CHUNKS": "1", "MK_NO_SHADOW": "1"}),
]


def main():
    names = sys.argv[1:] or [n for n, _ in CONFIGS]
    for name, env in CONFIGS:
        if name not in names:
            continue
        e = dict(os.environ)
        e.update(env)
        try:
            r = subprocess.run([sys.executable, "-c", CHILD], env=e,
                               capture_output=True, text=True,
                               timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name:12s} TIMEOUT (1800 s)", flush=True)
            continue
        line = [ln for ln in r.stdout.splitlines() if "RESULT" in ln]
        print(f"{name:12s} {line[0] if line else 'FAILED: ' + r.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    main()
