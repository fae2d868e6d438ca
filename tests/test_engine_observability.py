"""Engine selection observability + infra contracts (VERDICT r1 #5):
the fast-path routing must be inspectable and its fallbacks explain
themselves; bench/graft entry contracts stay stable."""

import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T
from mitsuba2_tpu.ops.megakernel import megakernel_ineligibility


def _base(**extra):
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 2},
         "light": {"type": "rectangle",
                   "to_world": (T.translate([0, 2.5, 0]) @ T.scale(0.8)
                                @ T.rotate([1, 0, 0], 90)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 5.0}}},
         "floor": {"type": "rectangle",
                   "bsdf": {"type": "diffuse"}},
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": T.look_at([0, 0, 4], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 8, "height": 8,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 4}}}
    d.update(extra)
    return d


def test_eligible_scene_reports_none(variant_scalar_rgb):
    scene = mi.load_dict(_base())
    assert megakernel_ineligibility(scene) is None


def test_reason_media(variant_scalar_rgb):
    scene = mi.load_dict(_base(
        slab={"type": "cube", "bsdf": {"type": "null"},
              "interior": {"type": "homogeneous",
                           "sigma_t": {"type": "rgb", "value": [1.0] * 3},
                           "albedo": {"type": "rgb", "value": [0.5] * 3}}}))
    assert "media" in megakernel_ineligibility(scene)


def test_reason_unsupported_bsdf(variant_scalar_rgb):
    scene = mi.load_dict(_base(
        m={"type": "rectangle", "bsdf": {"type": "conductor"}}))
    r = megakernel_ineligibility(scene)
    assert r is not None and "BSDF" in r


def test_reason_spectral(variant_scalar_spectral):
    """Spectral scenes within the srgb-coefficient + D65 scope ride the
    fast path; conductor IOR spectra still explain their fallback."""
    scene = mi.load_dict(_base())
    assert megakernel_ineligibility(scene) is None
    scene2 = mi.load_dict(_base(
        m={"type": "rectangle",
           "bsdf": {"type": "roughconductor", "alpha": 0.3}}))
    r = megakernel_ineligibility(scene2)
    assert r is not None and "spectral" in r


def test_reason_instances(variant_scalar_rgb):
    from mitsuba2_tpu.python.test.scenes import _bumpy_sphere_obj_path
    group = {"type": "shapegroup", "id": "g9",
             "m": {"type": "obj",
                   "filename": _bumpy_sphere_obj_path(40, 20),
                   "bsdf": {"type": "diffuse"}}}
    scene = mi.load_dict(_base(
        grp=group,
        inst={"type": "instance", "shapegroup": {"type": "ref",
                                                 "id": "g9"},
              "materialize": False}))
    r = megakernel_ineligibility(scene)
    assert r is not None and "instance" in r


def test_engine_recorded_after_render(variant_scalar_rgb):
    scene = mi.load_dict(_base())
    integ = scene.integrator
    np.asarray(integ.render(scene, seed=0, spp=4))
    assert integ.last_engine in ("megakernel", "wavefront")
    # on the CPU test rig the megakernel stays off (interpret-only)
    assert integ.last_engine == "wavefront"
    assert integ.engine_reason is not None


def test_disable_flag_forces_wavefront(variant_scalar_rgb):
    scene = mi.load_dict(_base())
    integ = scene.integrator
    integ._disable_megakernel = True
    np.asarray(integ.render(scene, seed=0, spp=4))
    assert integ.last_engine == "wavefront"


def test_bench_emits_valid_json_lines():
    import json
    import subprocess
    import sys
    import os
    # parse-only contract check: --help exits 0 and the module imports
    r = subprocess.run([sys.executable, "bench.py", "--help"],
                       capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0
    assert "--scene" in r.stdout


def test_graft_entry_signature():
    import __graft_entry__ as g
    assert callable(g.entry)
    assert callable(g.dryrun_multichip)


def test_wavefront_cap_for_volumetric(variant_scalar_rgb):
    """Volumetric integrators cap their wavefront below the surface
    path's (the 1M-lane HBM crash guard)."""
    from mitsuba2_tpu.models.integrators import (
        PathIntegrator, VolumetricPathIntegrator)
    assert VolumetricPathIntegrator.MAX_WAVEFRONT \
        < PathIntegrator.MAX_WAVEFRONT


def test_engine_reason_cleared_when_eligible(variant_scalar_rgb):
    scene = mi.load_dict(_base())
    integ = scene.integrator
    np.asarray(integ.render(scene, seed=0, spp=4))
    # on CPU the reason is the non-TPU backend note
    assert "TPU" in integ.engine_reason or integ.engine_reason is None


def test_scene_reports_counts(variant_scalar_rgb):
    scene = mi.load_dict(_base(ball={"type": "sphere", "radius": 0.3,
                                     "bsdf": {"type": "diffuse"}}))
    assert scene.n_spheres == 1
    assert scene.n_quads == 0
    assert scene.n_instances == 0


def test_viewer_makes_html(variant_scalar_rgb):
    from mitsuba2_tpu.viewer import make_html
    img = np.random.rand(8, 8, 3).astype(np.float32)
    text = make_html(img)
    assert "<!doctype html" in text.lower() and len(text) > 500


def test_progress_reporter(variant_scalar_rgb):
    from mitsuba2_tpu.core.logger import ProgressReporter
    pr = ProgressReporter("TestOp", total=4)
    for i in range(4):
        pr.update(i + 1)   # final update prints the done line


def test_biggeo_bench_scene_eligible(variant_scalar_rgb):
    """bench.py's 262k-face config must ride the HBM BVH tier (the gate
    accepts it; VERDICT r2 #7's absolute-number config)."""
    from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
    scene = mi.load_dict(bumpy_sphere_dict(width=8, height=8, spp=2,
                                           max_depth=2, nu=512, nv=257))
    assert scene.geom.v0.shape[0] >= 262144
    assert megakernel_ineligibility(scene) is None
