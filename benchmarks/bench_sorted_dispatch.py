"""Measure the material-sorted tile dispatch (ops/sorted_dispatch.py)
against the masked-sweep wavefront on a many-family scene (VERDICT r2 #9
bar: >=3x on a 10-distinct-family scene, identical image).

Run ON TPU (falls back to whatever backend JAX picks):
    python benchmarks/bench_sorted_dispatch.py [--families 10] [--spp 64]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def hetero_scene(n_families, width, spp):
    from mitsuba2_tpu.core.transform import Transform as T
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "light": {"type": "rectangle",
                  "to_world": (T.translate([0, 0, 6]) @ T.scale(2.5)
                               @ T.rotate([1, 0, 0], 180)),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 15.0}}},
        "floor": {"type": "rectangle", "to_world": T.scale([12, 12, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.5}}},
        "sensor": {
            "type": "perspective", "fov": 55.0,
            "to_world": T.look_at(origin=[0, -8, 4], target=[0, 0, 0.6],
                                  up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": width, "height": width,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp}},
    }
    # distinct families (merging cannot collapse these)
    mats = [
        {"type": "diffuse",
         "reflectance": {"type": "rgb", "value": [0.7, 0.3, 0.2]}},
        {"type": "roughconductor", "alpha": 0.3, "distribution": "ggx",
         "material": "Al"},
        {"type": "dielectric"},
        {"type": "plastic",
         "diffuse_reflectance": {"type": "rgb", "value": [0.2, 0.5, 0.7]}},
        {"type": "roughplastic", "alpha": 0.2,
         "diffuse_reflectance": {"type": "rgb", "value": [0.5, 0.2, 0.4]}},
        {"type": "conductor", "material": "Au"},
        {"type": "thindielectric"},
        {"type": "roughdielectric", "alpha": 0.3},
        {"type": "diffuse",
         "reflectance": {"type": "checkerboard",
                         "color0": {"type": "rgb", "value": 0.2},
                         "color1": {"type": "rgb", "value": 0.8}}},
        {"type": "blendbsdf", "weight": 0.4,
         "a": {"type": "diffuse"},
         "b": {"type": "roughconductor", "alpha": 0.15,
               "distribution": "ggx"}},
    ][:n_families]
    k = 0
    for row in range(2):
        for col in range(5):
            if k >= len(mats):
                break
            x = -4.0 + col * 2.0
            y = -1.0 + row * 2.5
            d[f"ball{k}"] = {"type": "sphere", "radius": 0.8,
                             "center": [x, y, 0.8], "bsdf": mats[k]}
            k += 1
    return d


def run(mode, d, spp, runs=3):
    import mitsuba2_tpu as mi
    os.environ["MI_SORTED_DISPATCH"] = mode
    scene = mi.load_dict(d)
    integ = scene.integrator
    img = np.asarray(integ.render(scene, seed=0, spp=spp))  # warm/compile
    best = float("inf")
    for i in range(runs):
        t0 = time.perf_counter()
        img = np.asarray(integ.render(scene, seed=i + 1, spp=spp))
        best = min(best, time.perf_counter() - t0)
    return best, img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=10)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    args = ap.parse_args()
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    d = hetero_scene(args.families, args.width, args.spp)
    t_off, img_off = run("off", d, args.spp)
    t_on, img_on = run("on", d, args.spp)
    n_paths = args.width * args.width * args.spp
    diff = float(np.abs(img_on - img_off).max())
    print(f"families={args.families} lanes/pass<= {n_paths}")
    print(f"masked sweeps : {t_off*1e3:9.1f} ms  "
          f"{n_paths/t_off/1e6:6.2f} Mpaths/s")
    print(f"sorted tiles  : {t_on*1e3:9.1f} ms  "
          f"{n_paths/t_on/1e6:6.2f} Mpaths/s")
    print(f"speedup {t_off/t_on:.2f}x   max|img diff| = {diff:.2e}")


if __name__ == "__main__":
    main()
