#!/usr/bin/env python
"""Per-knob ablation timings for the biggeo (262k faces) HBM BVH tier.

Run:  python benchmarks/prof_biggeo.py [--spp 32] [--knob KEY=VAL ...]
Each run is a full render (same config as bench.py biggeo) timed
pipelined; knobs are env vars read by ops/megakernel.py at import, so
each setting runs in a fresh subprocess when driven by the sweep below.
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(spp=32, nu=512, nv=257, depth=5):
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
    scene = mi.load_dict(bumpy_sphere_dict(width=256, height=256,
                                           spp=spp, max_depth=depth,
                                           nu=nu, nv=nv))
    integ = scene.integrator
    img = integ.render(scene, seed=0, spp=spp)
    np.asarray(img)
    best = float("inf")
    K = 2
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
    {"MK_LEAF_CHUNKS": "1"},
    {"MK_LEAF_CHUNKS": "4"},
    {"MK_NO_SHADOW": "1"},
    {"MK_NO_NEE": "1"},
    {"MK_SORT_EVERY": "2"},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true",
                    help="run a single timing in-process (knobs from env)")
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--nu", type=int, default=512)
    ap.add_argument("--nv", type=int, default=257)
    args = ap.parse_args()
    if args.one:
        run_one(args.spp, args.nu, args.nv, args.depth)
        return
    for knobs in SWEEP:
        env = dict(os.environ, **knobs)
        tag = ",".join(f"{k}={v}" for k, v in knobs.items()) or "baseline"
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, __file__, "--one", "--spp", str(args.spp),
             "--depth", str(args.depth)],
            env=env, capture_output=True, text=True, cwd=REPO,
            timeout=900)
        line = [l for l in out.stdout.splitlines() if "RESULT" in l]
        print(f"{tag:28s} {line[0] if line else 'FAIL: ' + out.stderr[-200:]}"
              f"  ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
