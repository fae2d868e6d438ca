#!/usr/bin/env python
"""Per-knob ablation timings for the matpreview (GGX+envmap+MIS) config.

Each knob runs in a fresh subprocess (env vars are read at module import
by ops/megakernel.py). VERDICT r3 #4: the env NEE arm cost matpreview
35.3 -> 27.5 Mpaths/s; this isolates where the time went.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(spp=64, depth=6):
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import matpreview_dict
    scene = mi.load_dict(matpreview_dict(width=256, height=256,
                                         spp=spp, max_depth=depth))
    integ = scene.integrator
    img = integ.render(scene, seed=0, spp=spp)
    np.asarray(img)
    best = float("inf")
    K = 3
    for r in range(2):
        t0 = time.perf_counter()
        outs = [integ.render(scene, seed=r * K + i + 1, spp=spp)
                for i in range(K)]
        for o in outs:
            float(jnp.sum(o))
        best = min(best, (time.perf_counter() - t0) / K)
    n = 256 * 256 * spp
    print(f"RESULT {n / best / 1e6:.3f} Mpaths/s  engine="
          f"{getattr(integ, 'last_engine', '?')}", flush=True)


SWEEP = [
    {},
    {"MK_NO_ENVNEE": "1"},
    {"MK_NO_SHADOW": "1"},
    {"MK_NO_NEE": "1"},
]


def main():
    if "--one" in sys.argv:
        run_one()
        return
    for knobs in SWEEP:
        env = dict(os.environ, **knobs)
        label = ",".join(f"{k}={v}" for k, v in knobs.items()) or "base"
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=env, capture_output=True, text=True, cwd=REPO,
            timeout=900)
        res = [ln for ln in out.stdout.splitlines()
               if ln.startswith("RESULT")]
        print(f"{label:24s} {res[0] if res else 'FAILED'} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if not res:
            print(out.stderr[-2000:])


if __name__ == "__main__":
    main()
