#!/usr/bin/env python
"""Benchmark: path-tracing throughput on one chip.

Default (driver contract) prints ONE JSON line for the Cornell box:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`--scene {cornell,matpreview,volpath,spectral,all}` covers the remaining
BASELINE.json configs (matpreview GGX+envmap+MIS, heterogeneous volpath,
hero-wavelength spectral) — each prints its own JSON line.

Baseline (BASELINE.json): >= 50 Mpaths/s/chip at 256^2 @ 64 spp, path
integrator, scalar_rgb. A "path" = one camera sample (up to max_depth
bounces + NEE shadow rays), matching the north-star metric definition.
"""

import argparse
import json
import sys
import time

import numpy as np

WIDTH = HEIGHT = 256
SPP = 64


def _throughput(scene, spp, n_runs=2, k_pipeline=4):
    """Pipelined best-of-N timing. The shared TPU rides an HTTP tunnel
    whose artifacts are NOT chip speed: ~25 ms RPC round-trip per
    dispatch and ~20 ms to download the 1 MB image (measured; a local
    deployment has neither). So each measurement dispatches K renders
    back-to-back and syncs on device-side reductions — the RPC latency
    amortizes under compute and only 4 bytes/render cross the tunnel.
    Transient tunnel stalls are worth 10-15% run-to-run; the fastest
    round is the least-noisy estimate of the kernel's actual speed."""
    import jax.numpy as jnp
    integrator = scene.integrator
    img = integrator.render(scene, seed=0, spp=spp)
    np.asarray(img)                      # warmup / compile + sync
    best = float("inf")
    for r in range(n_runs):
        t0 = time.perf_counter()
        outs = [integrator.render(scene, seed=r * k_pipeline + i + 1,
                                  spp=spp) for i in range(k_pipeline)]
        sums = [jnp.sum(o) for o in outs]
        for s in sums:
            float(s)                     # sync (4-byte pulls)
        best = min(best, (time.perf_counter() - t0) / k_pipeline)
    w, h = scene.sensors[0].film.crop_size
    engine = getattr(integrator, "last_engine", "wavefront")
    return w * h * spp / best / 1e6, engine


def bench_cornell():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    scene = mi.load_dict(cornell_box_dict(width=WIDTH, height=HEIGHT,
                                          spp=SPP, max_depth=6))
    mpaths, engine = _throughput(scene, SPP)
    return {"metric": "cornell_box_path_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_matpreview():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import matpreview_dict
    scene = mi.load_dict(matpreview_dict(width=WIDTH, height=HEIGHT,
                                         spp=SPP, max_depth=6))
    mpaths, engine = _throughput(scene, SPP)
    return {"metric": "matpreview_path_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_spectral():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_spectral")
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    scene = mi.load_dict(cornell_box_dict(width=WIDTH, height=HEIGHT,
                                          spp=SPP, max_depth=6))
    mpaths, engine = _throughput(scene, SPP)
    mi.set_variant("scalar_rgb")
    return {"metric": "cornell_spectral_path_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_volpath():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.core.transform import Transform as T
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
                    "film": {"type": "hdrfilm", "width": WIDTH,
                             "height": HEIGHT,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 16}}}
    scene = mi.load_dict(d)
    mpaths, engine = _throughput(scene, 16)
    return {"metric": "volpath_hetero_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_hero():
    """~203k-face smooth .serialized hero x GGX x envmap x MIS on a
    checker floor — the production-shaped config (VERDICT r4 task #5):
    composes the HBM BVH tier with the env NEE arm."""
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import hero_serialized_dict
    scene = mi.load_dict(hero_serialized_dict(width=WIDTH, height=HEIGHT,
                                              spp=32, max_depth=5))
    mpaths, engine = _throughput(scene, 32)
    return {"metric": "hero_serialized_path_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_biggeo():
    """262,144-face displaced sphere: the production-size-geometry config
    (VERDICT r2 #7 — absolute number for the HBM BVH traversal tier)."""
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
    scene = mi.load_dict(bumpy_sphere_dict(width=WIDTH, height=HEIGHT,
                                           spp=32, max_depth=5,
                                           nu=512, nv=257))
    mpaths, engine = _throughput(scene, 32)
    return {"metric": "biggeo_262k_path_throughput",
            "value": round(mpaths, 3), "unit": "Mpaths/s/chip",
            "vs_baseline": round(mpaths / 50.0, 4), "engine": engine}


def bench_equal_time():
    """Equal-time quality of the env-NEE estimator on matpreview
    (VERDICT r3 #4: the env NEE arm costs paths/s — this line shows the
    variance it buys at MATCHED wall-clock). Renders the kernel with and
    without the env NEE arm at the same time budget (spp scaled by the
    measured throughput ratio) and reports MSE vs a 1024-spp reference:
    value = mse_no_envnee / mse_envnee (>1 means env NEE is net-positive
    at equal time)."""
    import os
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.ops.megakernel import DiffusePathMegakernel
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import matpreview_dict
    scene = mi.load_dict(matpreview_dict(width=128, height=128, spp=64,
                                         max_depth=6))
    sensor = scene.sensors[0]

    import jax
    import jax.numpy as jnp

    _render_cache = {}

    def render(mk, seed, spp):
        # jit the whole pass: render_pass traced eagerly dispatches one
        # ~25 ms tunnel RPC per op (profiler.py:158-161) — the r4 table
        # timed RPC overhead, not kernels (VERDICT r4 weak #5)
        key = (id(mk), spp)
        if key not in _render_cache:
            _render_cache[key] = jax.jit(
                lambda s, _mk=mk, _spp=spp: _mk.render_pass(
                    sensor, s, 0, _spp))
        img = np.asarray(_render_cache[key](jnp.int32(seed)))
        return img[..., :3] / spp

    def timed(mk, spp, reps=3, k_pipeline=4):
        fn = jax.jit(lambda s: jnp.sum(mk.render_pass(sensor, s, 0,
                                                      spp)))
        float(fn(jnp.int32(0)))          # compile + warm
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            outs = [fn(jnp.int32(r * k_pipeline + i + 1))
                    for i in range(k_pipeline)]
            for o in outs:
                float(o)                 # sync (4-byte pulls)
            best = min(best, (time.perf_counter() - t0) / k_pipeline)
        return best

    mk_env = DiffusePathMegakernel(scene)
    os.environ["MK_NO_ENVNEE"] = "1"
    try:
        mk_no = DiffusePathMegakernel(scene)
    finally:
        del os.environ["MK_NO_ENVNEE"]
    for mk in (mk_env, mk_no):
        mk.max_depth = 6
        mk.rr_depth = scene.integrator.rr_depth
    assert mk_env.p_env > 0.0 and mk_no.p_env == 0.0
    spp_env = 64
    t_env = timed(mk_env, spp_env)
    t_no = timed(mk_no, spp_env)
    # equal-time spp for the no-env-NEE arm (it runs faster per spp)
    spp_no = max(4, int(round(spp_env * t_env / max(t_no, 1e-9) / 4))
                 * 4)
    ref = sum(render(mk_env, 100 + k, 256) for k in range(4)) / 4.0
    mse_env = float(np.mean((render(mk_env, 7, spp_env) - ref) ** 2))
    mse_no = float(np.mean((render(mk_no, 8, spp_no) - ref) ** 2))
    return {"metric": "matpreview_equal_time_mse_ratio",
            "value": round(mse_no / max(mse_env, 1e-12), 3),
            "unit": "mse_no_envnee/mse_envnee@equal_time",
            "vs_baseline": 1.0,
            "detail": {"spp_envnee": spp_env, "spp_no_envnee": spp_no,
                       "t_envnee_ms": round(t_env * 1e3, 1),
                       "t_no_envnee_ms": round(t_no * 1e3, 1)}}


BENCHES = {"cornell": bench_cornell, "matpreview": bench_matpreview,
           "spectral": bench_spectral, "volpath": bench_volpath,
           "biggeo": bench_biggeo, "hero": bench_hero,
           "equal_time": bench_equal_time}


def main():
    ap = argparse.ArgumentParser()
    # default "all": the headline Cornell line prints FIRST, then the
    # remaining BASELINE.json configs get their own lines (VERDICT r1 #8)
    ap.add_argument("--scene", default="all",
                    choices=list(BENCHES) + ["all"])
    args = ap.parse_args()
    names = list(BENCHES) if args.scene == "all" else [args.scene]
    for name in names:
        # one config must never take down the others (the headline
        # Cornell line prints first); TPU worker faults surface as an
        # error line instead of a dead process
        try:
            print(json.dumps(BENCHES[name]()), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"metric": f"{name}_path_throughput",
                              "value": 0.0, "unit": "Mpaths/s/chip",
                              "vs_baseline": 0.0,
                              "error": str(exc)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
