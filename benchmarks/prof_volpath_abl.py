#!/usr/bin/env python
"""Vol-kernel cost split on the BENCH volpath config: one subprocess per
ablation knob, prints Mpaths/s. NO_* knobs bias the image (timing only)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time
sys.path.insert(0, %r)
import numpy as np, jax.numpy as jnp
sys.argv = ["bench.py", "--scene", "volpath"]
import runpy
t0 = time.perf_counter()
runpy.run_path(%r, run_name="__main__")
""" % (REPO, os.path.join(REPO, "bench.py"))

CONFIGS = [
    ("base", {}),
    ("no_compact", {"VK_NO_COMPACT": "1"}),
    ("no_nee", {"VK_NO_NEE": "1"}),
    ("no_tr", {"VK_NO_TR": "1"}),
    ("no_fetch", {"VK_NO_FETCH": "1"}),
    ("nb8", {"VK_NULL_BUDGET": "8"}),
    ("nb8_tr8", {"VK_NULL_BUDGET": "8", "VK_TR_BUDGET": "8"}),
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
        line = [ln for ln in r.stdout.splitlines() if "volpath" in ln]
        print(f"{name:12s} {line[0] if line else 'FAILED: ' + r.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    main()
