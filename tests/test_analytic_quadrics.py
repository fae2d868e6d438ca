"""Analytic disk & cylinder prims (models/shapes.py DiskShape /
CylinderShape; parity: src/shapes/disk.cpp:85-225 and
src/shapes/cylinder.cpp:83-390 exact quadric intersection semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.ray import Ray
from mitsuba2_tpu.core.transform import Transform as T
from mitsuba2_tpu.render.scene import Scene


def _rays(os_, ds_):
    o = np.asarray(os_, np.float32)
    d = np.asarray(ds_, np.float32)
    n = len(o)
    return Ray.make(jnp.asarray(o), jnp.asarray(d),
                    mint=jnp.full(n, 1e-4), maxt=jnp.full(n, np.inf),
                    time=jnp.zeros(n), wavelengths=jnp.zeros((n, 0)))


def _scene_of(d):
    mi.set_variant("scalar_rgb")
    shp = mi.load_dict(d)
    shapes = shp.expand()
    return Scene(shapes=shapes), shapes[0]


def test_disk_is_analytic():
    scene, s = _scene_of({"type": "disk"})
    assert s.is_analytic() and s.is_quadric()
    assert scene.n_quads == 1
    assert scene.geom.v0.shape[0] == 1      # only the dummy face


def test_disk_exact_hit_and_uv():
    scene, _ = _scene_of({"type": "disk"})
    # axial hit at t=3 (exact); a ray aimed outside r=1 misses; a ray at
    # r=0.999999 hits — no tessellation silhouette error
    si = scene.ray_intersect(_rays(
        [[0.5, 0.5, 3], [1.2, 0, 3], [0.999999, 0, 3]],
        [[0, 0, -1]] * 3))
    t = np.asarray(si.t)
    assert abs(t[0] - 3.0) < 1e-5
    assert np.isinf(t[1])
    assert abs(t[2] - 3.0) < 1e-5
    # uv = (r, phi/2pi) (disk.cpp:202-208)
    uv = np.asarray(si.uv)[0]
    assert abs(uv[0] - np.sqrt(0.5)) < 1e-5
    assert abs(uv[1] - 0.125) < 1e-5        # phi = 45deg
    n = np.asarray(si.n)[0]
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)


def test_disk_affine_ellipse():
    # non-uniform scale: an ellipse with semi-axes (2, 1). Point (1.9, 0)
    # is inside; (0, 1.9) is outside — tessellation-free exactness
    scene, _ = _scene_of({"type": "disk",
                          "to_world": T.scale([2.0, 1.0, 1.0])})
    si = scene.ray_intersect(_rays(
        [[1.9, 0, 2], [0, 1.9, 2]], [[0, 0, -1]] * 2))
    t = np.asarray(si.t)
    assert abs(t[0] - 2.0) < 1e-5
    assert np.isinf(t[1])


def test_cylinder_exact_hit_roots():
    # unit-radius cylinder along +z, length 1
    scene, s = _scene_of({"type": "cylinder"})
    assert scene.n_quads == 1
    assert abs(s.radius - 1.0) < 1e-6 and abs(s.length - 1.0) < 1e-6
    si = scene.ray_intersect(_rays(
        [[3, 0, 0.5],    # outside: near root at t=2
         [0, 0, 0.5],    # on the axis: far root at t=1
         [3, 0, 2.0]],   # z out of range: miss
        [[-1, 0, 0], [1, 0, 0], [-1, 0, 0]]))
    t = np.asarray(si.t)
    assert abs(t[0] - 2.0) < 1e-5
    assert abs(t[1] - 1.0) < 1e-5
    assert np.isinf(t[2])
    # normal at the first hit points +x; uv = (phi/2pi, z/len)
    n = np.asarray(si.n)[0]
    np.testing.assert_allclose(n, [1, 0, 0], atol=1e-5)
    uv = np.asarray(si.uv)[0]
    assert abs(uv[0] - 0.0) < 1e-5 and abs(uv[1] - 0.5) < 1e-5


def test_cylinder_p0_p1_radius():
    scene, s = _scene_of({"type": "cylinder", "radius": 0.25,
                          "p0": [0, -1, 0], "p1": [0, 1, 0]})
    assert abs(s.radius - 0.25) < 1e-5
    assert abs(s.length - 2.0) < 1e-5
    si = scene.ray_intersect(_rays([[2, 0.5, 0]], [[-1, 0, 0]]))
    assert abs(np.asarray(si.t)[0] - 1.75) < 1e-4
    # normal is radial (+x here)
    np.testing.assert_allclose(np.asarray(si.n)[0], [1, 0, 0], atol=1e-4)


def test_quadric_occludes_shadow_rays():
    scene, _ = _scene_of({"type": "disk", "to_world": T.scale(2.0)})
    r = _rays([[0, 0, 2], [3, 3, 2]], [[0, 0, -1], [0, 0, -1]])
    hit = np.asarray(scene.ray_test(r))
    assert hit[0] and not hit[1]


def test_emitter_quadric_tessellates():
    mi.set_variant("scalar_rgb")
    d = mi.load_dict({"type": "disk",
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": 5.0}}})
    out = d.expand()
    assert len(out) == 1 and out[0].is_mesh()
    assert out[0].emitter is not None


def test_render_matches_tessellated_disk():
    """Analytic vs finely-tessellated disk render (z-test-style mean
    comparison, same estimator otherwise)."""
    mi.set_variant("scalar_rgb")

    def make(analytic):
        d = {"type": "scene",
             "integrator": {"type": "path", "max_depth": 3},
             "light": {"type": "rectangle",
                       "to_world": (T.translate([0, 2.5, 0])
                                    @ T.scale(0.8)
                                    @ T.rotate([1, 0, 0], 90)),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": 10.0}}},
             "sensor": {"type": "perspective", "fov": 45,
                        "to_world": T.look_at([0, 1.2, 3.2], [0, 0, 0],
                                              [0, 1, 0]),
                        "film": {"type": "hdrfilm", "width": 24,
                                 "height": 24,
                                 "rfilter": {"type": "box"}},
                        "sampler": {"type": "independent",
                                    "sample_count": 64}}}
        disk = {"type": "disk",
                "to_world": T.rotate([1, 0, 0], -90) @ T.scale(1.2),
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb",
                                         "value": [0.6, 0.4, 0.3]}}}
        if not analytic:
            disk["resolution_hint"] = 512
        scene = mi.load_dict(d | {"disk": disk})
        if not analytic:
            # force tessellation by replacing with the mesh version
            q = scene.shapes
            assert q
        return scene

    sa = make(True)
    assert sa.n_quads == 1
    img_a = np.asarray(sa.integrator.render(sa, seed=3, spp=64))
    # tessellated comparison scene: build the mesh via _tessellate()
    st = make(True)
    st.shapes  # loaded
    from mitsuba2_tpu.render.scene import Scene as _S
    quad = [s for s in st.shapes if getattr(s, "is_quadric",
                                            lambda: False)()][0]
    mesh = quad._tessellate()
    shapes = [mesh if s is quad else s for s in st.shapes]
    st2 = _S(shapes=shapes, integrator=st.integrator,
             sensors=st.sensors, emitters=st.emitters)
    img_t = np.asarray(st2.integrator.render(st2, seed=8, spp=64))
    assert abs(img_a.mean() - img_t.mean()) \
        <= 0.05 * max(img_t.mean(), 1e-3)


def test_render_matches_tessellated_cylinder():
    mi.set_variant("scalar_rgb")
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 3},
         "light": {"type": "rectangle",
                   "to_world": (T.translate([0, 2.5, 0.5]) @ T.scale(0.8)
                                @ T.rotate([1, 0, 0], 90)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 10.0}}},
         "cyl": {"type": "cylinder", "radius": 0.5,
                 "p0": [-1, 0, 0], "p1": [1, 0, 0],
                 "resolution_hint": 512,
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.3, 0.5, 0.7]}}},
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": T.look_at([0, 0.8, 3.2], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 24, "height": 24,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 64}}}
    sa = mi.load_dict(d)
    assert sa.n_quads == 1
    img_a = np.asarray(sa.integrator.render(sa, seed=3, spp=64))
    from mitsuba2_tpu.render.scene import Scene as _S
    quad = [s for s in sa.shapes if getattr(s, "is_quadric",
                                            lambda: False)()][0]
    mesh = quad._tessellate()
    shapes = [mesh if s is quad else s for s in sa.shapes]
    st2 = _S(shapes=shapes, integrator=sa.integrator,
             sensors=sa.sensors, emitters=sa.emitters)
    img_t = np.asarray(st2.integrator.render(st2, seed=8, spp=64))
    assert np.isfinite(img_a).all()
    assert abs(img_a.mean() - img_t.mean()) \
        <= 0.05 * max(img_t.mean(), 1e-3)
