"""Reconstruction filter + sensor plugin batteries (reference
src/rfilters + src/sensors test roles)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T

RFILTERS = ["box", "tent", "gaussian", "mitchell", "catmullrom",
            "lanczos"]


def _mk_filter(name):
    mi.set_variant("scalar_rgb")
    return mi.load_dict({"type": name})


@pytest.mark.parametrize("name", RFILTERS)
def test_rfilter_center_and_support(variant_scalar_rgb, name):
    f = _mk_filter(name)
    r = float(f.radius)
    assert r > 0
    c = float(np.asarray(f.eval(jnp.asarray([0.0]))))
    beyond = float(np.asarray(f.eval(jnp.asarray([r + 0.25]))))
    assert c > 0
    assert abs(beyond) < 1e-3


@pytest.mark.parametrize("name", RFILTERS)
def test_rfilter_discrete_integral(variant_scalar_rgb, name):
    """Filters have positive integral over their support; ImageBlock
    renormalizes by the accumulated weight, so exact unit integral is
    not required (gaussian.cpp is intentionally unnormalized)."""
    f = _mk_filter(name)
    r = float(f.radius)
    x = jnp.linspace(-r, r, 4097)
    v = np.asarray(f.eval(x))
    integral = v.sum() * (2 * r / 4096)
    assert 0.5 < integral < 1.5, integral
    # symmetric
    assert np.allclose(v, v[::-1], atol=1e-5)


@pytest.mark.parametrize("name", RFILTERS)
def test_render_with_filter(variant_scalar_rgb, name):
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 2},
         "env": {"type": "constant",
                 "radiance": {"type": "rgb", "value": 0.5}},
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": T.look_at([0, 0, 3], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 8, "height": 8,
                             "rfilter": {"type": name}},
                    "sampler": {"type": "independent",
                                "sample_count": 32}}}
    scene = mi.load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=32))
    assert np.isfinite(img).all()
    # constant environment: every filter reproduces the constant
    assert np.allclose(img.mean(), 0.5, atol=0.03), img.mean()


def _ray_through_center(sensor_dict):
    scene = mi.load_dict({
        "type": "scene", "s": sensor_dict,
        "integrator": {"type": "path", "max_depth": 2}})
    sensor = scene.sensors[0]
    pos01 = jnp.asarray([[0.5, 0.5]], jnp.float32)
    ap = jnp.asarray([[0.5, 0.5]], jnp.float32)
    ray, w = sensor.sample_ray(0.0, jnp.asarray([0.5]), pos01, ap, True)
    return np.asarray(ray.o)[0], np.asarray(ray.d)[0], np.asarray(w)


def test_perspective_center_ray(variant_scalar_rgb):
    o, d, w = _ray_through_center(
        {"type": "perspective", "fov": 45,
         "to_world": T.look_at([0, 0, 4], [0, 0, -1], [0, 1, 0]),
         "film": {"type": "hdrfilm", "width": 8, "height": 8,
                  "rfilter": {"type": "box"}},
         "sampler": {"type": "independent", "sample_count": 4}})
    assert np.allclose(o, [0, 0, 4], atol=2e-2)
    assert np.allclose(d, [0, 0, -1], atol=1e-4)
    assert np.all(np.asarray(w) > 0)


def test_thinlens_aperture_spreads_origins(variant_scalar_rgb):
    sensor_dict = {"type": "thinlens", "fov": 45,
                   "aperture_radius": 0.2, "focus_distance": 4.0,
                   "to_world": T.look_at([0, 0, 4], [0, 0, -1],
                                         [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": 4}}
    scene = mi.load_dict({"type": "scene", "s": sensor_dict,
                          "integrator": {"type": "path", "max_depth": 2}})
    sensor = scene.sensors[0]
    rs = np.random.RandomState(0)
    n = 256
    pos01 = jnp.full((n, 2), 0.5, jnp.float32)
    ap = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    ray, _ = sensor.sample_ray(0.0, jnp.full((n,), 0.5), pos01, ap, True)
    o = np.asarray(ray.o)
    # origins spread over the aperture disk
    spread = np.linalg.norm(o - o.mean(0), axis=-1)
    assert spread.max() > 0.1
    # all rays focus at the focal plane (z = 0): positions at t where
    # z reaches 0 coincide
    d = np.asarray(ray.d)
    t = -o[:, 2] / d[:, 2]
    hit = o + t[:, None] * d
    assert np.abs(hit[:, :2] - hit[:, :2].mean(0)).max() < 1e-2


def test_radiancemeter(variant_scalar_rgb):
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 2},
         "env": {"type": "constant",
                 "radiance": {"type": "rgb", "value": 0.8}},
         "sensor": {"type": "radiancemeter",
                    "to_world": T.look_at([0, 0, 1], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 1, "height": 1,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 16}}}
    scene = mi.load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    assert np.allclose(img.mean(), 0.8, atol=0.02)


def test_irradiancemeter(variant_scalar_rgb):
    """A shape-attached irradiancemeter in a unit-radiance constant
    environment measures E = pi (irradiancemeter.cpp contract)."""
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 2},
         "env": {"type": "constant",
                 "radiance": {"type": "rgb", "value": 1.0}},
         "sphere": {"type": "sphere", "radius": 0.2,
                    "sensor": {"type": "irradiancemeter",
                               "film": {"type": "hdrfilm", "width": 1,
                                        "height": 1,
                                        "rfilter": {"type": "box"}},
                               "sampler": {"type": "independent",
                                           "sample_count": 256}}},
         }
    scene = mi.load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=256))
    assert np.isfinite(img).all()
    assert abs(img.mean() - np.pi) < 0.15, img.mean()
