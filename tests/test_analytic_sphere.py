"""Analytic sphere shape (models/shapes.py SphereShape, parity:
src/shapes/sphere.cpp exact quadric intersection)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.ray import Ray
from mitsuba2_tpu.core.transform import Transform
from mitsuba2_tpu.render.scene import Scene


def _rays(os_, ds_):
    o = np.asarray(os_, np.float32)
    d = np.asarray(ds_, np.float32)
    n = len(o)
    return Ray.make(jnp.asarray(o), jnp.asarray(d),
                    mint=jnp.full(n, 1e-4), maxt=jnp.full(n, np.inf),
                    time=jnp.zeros(n), wavelengths=jnp.zeros((n, 0)))


def _sphere_scene(**kw):
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere", **kw})
    shapes = ball.expand()
    return Scene(shapes=shapes), shapes[0]


def test_is_analytic_by_default():
    scene, s = _sphere_scene(radius=2.0, center=[1, 0, 0])
    assert s.is_analytic()
    assert scene.n_spheres == 1
    np.testing.assert_allclose(np.asarray(scene.sph_table)[0, :4],
                               [1, 0, 0, 2], atol=1e-6)


def test_exact_intersection_distance():
    scene, _ = _sphere_scene(radius=1.0)
    # axial ray from z=5: hit exactly at t=4; grazing ray at x=1-eps hits,
    # x=1+eps misses — a tessellated sphere gets the silhouette wrong
    eps = 1e-3
    ray = _rays([[0, 0, 5], [1 - eps, 0, 5], [1 + eps, 0, 5], [0, 0.5, 5]],
                [[0, 0, -1]] * 4)
    si = scene.ray_intersect(ray)
    t = np.asarray(si.t)
    assert abs(t[0] - 4.0) < 1e-5
    assert np.isfinite(t[1]) and not np.isfinite(t[2])
    # exact normal: hit at (0, .5, sqrt(.75)) -> normal = position
    n = np.asarray(si.sh_frame.n)[3]
    np.testing.assert_allclose(n, [0, 0.5, np.sqrt(0.75)], atol=1e-5)


def test_inside_hit_uses_far_root():
    scene, _ = _sphere_scene(radius=1.0)
    ray = _rays([[0, 0, 0]], [[0, 0, 1]])  # origin at the center
    si = scene.ray_intersect(ray)
    assert abs(float(si.t[0]) - 1.0) < 1e-5
    # normal still points outward
    np.testing.assert_allclose(np.asarray(si.sh_frame.n)[0], [0, 0, 1],
                               atol=1e-5)


def test_uv_parameterization():
    scene, _ = _sphere_scene(radius=1.0)
    # hit the north pole and the +x equator point
    ray = _rays([[0, 0, 3], [3, 0, 0]], [[0, 0, -1], [-1, 0, 0]])
    si = scene.ray_intersect(ray)
    uv = np.asarray(si.uv)
    assert abs(uv[0, 1] - 0.0) < 1e-3          # pole: theta = 0
    assert abs(uv[1, 1] - 0.5) < 1e-3          # equator: theta = pi/2
    # tangent frame is orthonormal
    fr = si.sh_frame
    s, t, n = (np.asarray(x) for x in (fr.s, fr.t, fr.n))
    np.testing.assert_allclose((s * n).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose((s * s).sum(-1), 1, atol=1e-4)


def test_sphere_occludes_shadow_rays():
    scene, _ = _sphere_scene(radius=1.0)
    ray = _rays([[0, 0, 5], [0, 3, 5]], [[0, 0, -1], [0, 0, -1]])
    hit = np.asarray(scene.ray_test(ray))
    assert hit[0] and not hit[1]


def test_mixed_mesh_and_sphere():
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere", "radius": 0.5,
                         "center": [0, 0, 1]}).expand()[0]
    floor = mi.load_dict({"type": "rectangle",
                          "to_world": Transform.scale([5, 5, 1])})
    floor = (floor.expand() if hasattr(floor, "expand") else [floor])[0]
    scene = Scene(shapes=[floor, ball])
    # one ray hits the ball (closer), one passes beside it onto the floor
    ray = _rays([[0, 0, 5], [2, 0, 5]], [[0, 0, -1], [0, 0, -1]])
    si = scene.ray_intersect(ray)
    t = np.asarray(si.t)
    assert abs(t[0] - 3.5) < 1e-5      # sphere top at z=1.5
    assert abs(t[1] - 5.0) < 1e-4      # floor at z=0
    shp = np.asarray(si.shape_idx)
    assert shp[0] == 1 and shp[1] == 0


def test_emitter_sphere_tessellates():
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere", "radius": 1.0,
                         "emitter": {"type": "area"}})
    shapes = ball.expand()
    assert len(shapes) == 1 and shapes[0].is_mesh()


def test_nonuniform_scale_tessellates():
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere",
                         "to_world": Transform.scale([1, 2, 1])})
    shapes = ball.expand()
    assert shapes[0].is_mesh()


def test_uniform_scale_stays_analytic():
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere", "radius": 2.0,
                         "to_world": Transform.scale([3, 3, 3])
                         @ Transform.translate([1, 0, 0])})
    shapes = ball.expand()
    s = shapes[0]
    assert s.is_analytic()
    assert abs(s.radius - 6.0) < 1e-5
    np.testing.assert_allclose(s.center, [3, 0, 0], atol=1e-5)


def test_render_matches_tessellated():
    # radiometry: analytic vs finely tessellated sphere under a constant
    # light agree away from the silhouette
    mi.set_variant("scalar_rgb")

    def render(analytic):
        d = {"type": "scene",
             "integrator": {"type": "path", "max_depth": 3},
             "light": {"type": "constant"},
             "sensor": {
                 "type": "perspective",
                 "to_world": Transform.look_at(
                     origin=[0, 0, 4], target=[0, 0, 0], up=[0, 1, 0]),
                 "film": {"type": "hdrfilm", "width": 32, "height": 32,
                          "rfilter": {"type": "box"}},
                 "sampler": {"type": "independent", "sample_count": 32}}}
        if analytic:
            d["ball"] = {"type": "sphere", "bsdf": {"type": "diffuse"}}
        else:
            d["ball"] = {"type": "sphere", "resolution_hint": 128,
                         "emitter": {"type": "area",
                                     "radiance": {"type": "rgb",
                                                  "value": 0.0}},
                         "bsdf": {"type": "diffuse"}}
        scene = mi.load_dict(d)
        return np.asarray(scene.integrator.render(scene, seed=1))

    a = render(True)
    b = render(False)
    # compare the central disk (silhouette pixels differ by construction)
    c = slice(10, 22)
    diff = np.abs(a[c, c] - b[c, c]).mean()
    assert diff < 0.03, f"analytic vs tessellated diverge: {diff}"


def test_flip_normals():
    mi.set_variant("scalar_rgb")
    ball = mi.load_dict({"type": "sphere", "flip_normals": True}).expand()[0]
    scene = Scene(shapes=[ball])
    ray = _rays([[0, 0, 5]], [[0, 0, -1]])
    si = scene.ray_intersect(ray)
    np.testing.assert_allclose(np.asarray(si.sh_frame.n)[0], [0, 0, -1],
                               atol=1e-5)
