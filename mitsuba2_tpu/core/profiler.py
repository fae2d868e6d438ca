"""Profiling hooks (parity role: include/mitsuba/core/profiler.h — the
reference samples a per-thread phase bitfield at 100 Hz via SIGPROF,
profiler.cpp:53-75).

On TPU the device timeline is the ground truth, so the TPU-native design is:
- ``ScopedPhase``/``profiler_phase``: wraps code in ``jax.named_scope`` so
  phases appear in XLA/xprof traces (the role of MTS_MASKED_FUNCTION's
  ProfilerPhase annotations).
- ``trace()``: capture a device trace with jax.profiler.
- ``device_op_summary()``: aggregate per-op device time from the captured
  trace — a printable report like the reference's CLI exit summary.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import re
from collections import Counter

import jax

# the 24 phases of the reference (profiler.h:18-43), kept for parity
PHASES = [
    "InitScene", "LoadGeometry", "LoadTexture", "InitKDTree", "Render",
    "SamplingIntegratorSample", "SampleEmitterRay", "SampleEmitterDirection",
    "RayTest", "RayIntersect", "CreateSurfaceInteraction", "ImageBlockPut",
    "BSDFEvaluate", "BSDFSample", "PhaseFunctionEvaluate",
    "PhaseFunctionSample", "MediumEvaluate", "MediumSample",
    "EndpointEvaluate", "EndpointSampleRay", "EndpointSampleDirection",
    "EndpointSamplePosition", "TextureSample", "TextureEvaluate",
]


@contextlib.contextmanager
def profiler_phase(name: str):
    """RAII phase annotation (ScopedPhase, profiler.h:90)."""
    with jax.named_scope(name):
        yield


ScopedPhase = profiler_phase


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mitsuba2_tpu_profile"):
    with jax.profiler.trace(log_dir):
        yield


def device_op_summary(log_dir: str = "/tmp/mitsuba2_tpu_profile",
                      top: int = 20) -> str:
    """Aggregate per-op device durations from the latest captured trace."""
    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        return "no trace captured"
    data = json.load(gzip.open(files[-1]))
    pids = {p.get("pid"): p.get("args", {}).get("name", "")
            for p in data["traceEvents"]
            if p.get("ph") == "M" and p.get("name") == "process_name"}
    agg = Counter()
    for e in data["traceEvents"]:
        pname = pids.get(e.get("pid"), "")
        if e.get("ph") == "X" and "dur" in e and "TPU" in pname:
            name = e["name"]
            # keep XLA-op-shaped names only (drop host-tracer frames)
            if not re.fullmatch(r"[A-Za-z0-9_.\-]+", name) \
                    or name.startswith(("jit_", "while", "body", "cond")):
                continue
            agg[name.split(".")[0].split("(")[0]] += e["dur"]
    if not agg:
        return ("no device ops in trace — the CPU backend records host "
                "activity only; run under the TPU backend for per-op "
                "device timings")
    total = sum(agg.values())
    lines = [f"device total: {total/1e3:.1f} ms"]
    for name, dur in agg.most_common(top):
        lines.append(f"  {dur/1e3:9.2f} ms {100*dur/max(total,1):5.1f}%  "
                     f"{name[:60]}")
    return "\n".join(lines)
