"""Fast smoke-tier coverage for code paths whose full tests live in the
slow tier (ADVICE r4: test_parallel.py's multichip-megakernel band path
and test_golden_stats.py's recaptured volpath estimator had no smoke-tier
representative). Tiny resolutions/spp keep each test in seconds."""

import jax
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


def test_smoke_pixel_sharded_megakernel_band(variant_scalar_rgb):
    """Tiny pixel-sharded megakernel render equals the single-chip
    kernel exactly (the render_pass(row0, n_rows) band path,
    parallel/mesh.py:118-184 — full test:
    test_parallel.py::test_pixel_sharded_megakernel)."""
    from jax.sharding import Mesh
    from mitsuba2_tpu.parallel.mesh import render_multichip_pixel_sharded
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    scene = mi.load_dict(cornell_box_dict(width=8, height=8, spp=4,
                                          max_depth=2))
    integ = scene.integrator
    integ._force_megakernel = True
    try:
        single = np.asarray(integ.render(scene, seed=3, spp=4))
        assert integ.last_engine == "megakernel"
    finally:
        integ._force_megakernel = False
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("chips",))
    multi = np.asarray(render_multichip_pixel_sharded(
        scene, seed=3, spp=4, mesh=mesh, force_megakernel=True))
    assert multi.shape == single.shape
    assert np.allclose(multi, single, rtol=1e-4, atol=1e-5), \
        np.abs(multi - single).max()


def test_smoke_volpath_ratio_tracking_weight(variant_scalar_rgb):
    """The wavefront volpath's NEE shadow-walk transmittance matches the
    analytic Tr on a grid medium whose sigma is constant ALONG the ray
    but varies across it (majorant > sigma, so the ratio-tracking null
    weight — the r4-recaptured estimator, integrators.py:934-950 — is
    exercised; the pre-fix estimator returned Tr == 1 here). A camera
    ray through the slab toward a constant emitter behind it measures
    Tr * Le directly at max_depth=2 with absorption-only albedo=0."""
    # sigma varies along z only; rays travel along -y at the slab's
    # z-center => constant sigma on the ray, analytic Tr = exp(-s*L)
    data = np.zeros((4, 2, 2), np.float32)       # (D=z, H=y, W=x)
    data[:] = np.asarray([0.2, 0.2, 1.4, 1.4],
                         np.float32).reshape(4, 1, 1)
    d = {"type": "scene",
         "integrator": {"type": "volpath", "max_depth": 2},
         "slab": {"type": "cube", "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "grid3d", "data": data},
                               "albedo": {"type": "rgb", "value": [0.0] * 3},
                               "to_world": (T.translate([-1, -1, -1])
                                            @ T.scale(2.0)),
                               "phase": {"type": "isotropic"}}},
         "light": {"type": "rectangle",
                   "to_world": (T.translate([0, 4.0, 0])
                                @ T.rotate([1, 0, 0], 90.0)
                                @ T.scale(40.0)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 1.0}}},
         "sensor": {
             "type": "perspective", "fov": 8.0,
             "to_world": T.look_at(origin=[0, -6, 0], target=[0, 0, 0],
                                   up=[0, 0, 1]),
             "film": {"type": "hdrfilm", "width": 4, "height": 4,
                      "rfilter": {"type": "box"}},
             "sampler": {"type": "independent", "sample_count": 64}}}
    scene = mi.load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=5, spp=64))
    assert np.isfinite(img).all()
    # central pixels cross the full slab at z~0 where trilinear sigma
    # ~(1.4+0.2)/2 = 0.8 over length 2 => Tr ~ exp(-1.6) ~ 0.2019;
    # allow MC + ray-spread slack (the biased pre-r4 estimator gave ~1.0)
    center = img[1:3, 1:3, :3].mean()
    assert 0.10 <= center <= 0.35, center
