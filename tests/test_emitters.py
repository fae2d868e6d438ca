"""Emitter tests (parity: src/emitters/tests/test_*.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba2_tpu.python.chi2 import ChiSquareTest, SphericalDomain


def _it(n=1, p=(0, 0, 0)):
    from mitsuba2_tpu.render.testutil import dummy_si
    si = dummy_si(n)
    return si._replace(p=jnp.broadcast_to(jnp.asarray(p, jnp.float32),
                                          (n, 3)))


def _envmap(data, scale=1.0):
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.models.emitters import EnvironmentMap
    e = EnvironmentMap(data=data, scale=scale)
    e._scene_bsphere = (jnp.zeros(3), 1.0)
    e._emitter_index = 0
    return e


def test_envmap_sample_pdf_chi2():
    rs = np.random.RandomState(0)
    data = (rs.rand(16, 32, 3) + 0.05).astype(np.float32) ** 2
    e = _envmap(data)

    def sample_func(u):
        it = _it(u.shape[0])
        ds, spec = e.sample_direction(it, u[..., :2], jnp.ones(u.shape[0],
                                                               bool))
        w = jnp.where(ds.pdf > 0, 1.0, 0.0)
        return ds.d, w

    def pdf_func(d):
        it = _it(d.shape[0])
        from mitsuba2_tpu.render.records import DirectionSample
        n = d.shape[0]
        ds = DirectionSample(
            p=d, n=-d, uv=jnp.zeros((n, 2)), time=jnp.zeros(n),
            pdf=jnp.zeros(n), delta=jnp.zeros(n, bool), d=d,
            dist=jnp.ones(n), emitter_idx=jnp.zeros(n, jnp.int32))
        return e.pdf_direction(it, ds, jnp.ones(n, bool))

    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_dim=2, sample_count=200000, res=31, ires=16,
                         seed=0)
    assert test.run(0.01, test_count=10), test.messages


def test_envmap_importance_weighting():
    """Sampled radiance/pdf must be (near) constant for an envmap whose
    importance table matches its content — MC estimate of total power."""
    rs = np.random.RandomState(1)
    data = (rs.rand(8, 16, 3) + 0.1).astype(np.float32)
    e = _envmap(data)
    it = _it(100000)
    u = jnp.asarray(rs.rand(100000, 2).astype(np.float32))
    ds, spec = e.sample_direction(it, u, jnp.ones(100000, bool))
    # MC estimate of env integral: mean(radiance/pdf) over samples
    est = np.asarray(spec).mean(0)
    # analytic: integral of bilinear-interpolated lat-long radiance
    h, w = data.shape[:2]
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = np.sin(theta)[:, None, None]
    ref = (data * weights).sum((0, 1)) / (h * w) * (2 * np.pi * np.pi)
    assert np.allclose(est, ref, rtol=0.05), (est, ref)


def test_envmap_eval_matches_data(variant_scalar_rgb):
    data = np.zeros((4, 8, 3), np.float32)
    data[1, 2] = [5.0, 1.0, 0.5]
    e = _envmap(data)
    # eval at the direction of texel (2,1): u=(2+.5)/8, v=(1+.5)/4
    u = (2 + 0.5) / 8
    v = (1 + 0.5) / 4
    phi = (u - 0.5) * 2 * np.pi
    theta = v * np.pi
    d = np.asarray([np.sin(theta) * np.sin(phi), np.cos(theta),
                    -np.sin(theta) * np.cos(phi)], np.float32)
    from mitsuba2_tpu.render.testutil import dummy_si
    from mitsuba2_tpu.core.frame import Frame
    si = dummy_si(1)
    frame = Frame.from_normal(jnp.asarray(-d)[None])
    si = si._replace(sh_frame=frame, wi=frame.to_local(jnp.asarray(-d)[None]))
    out = np.asarray(e.eval(si, jnp.ones(1, bool)))
    assert np.allclose(out[0], [5.0, 1.0, 0.5], atol=1e-4), out


def test_spot_falloff(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform
    e = mi.load_dict({
        "type": "spot", "cutoff_angle": 30.0, "beam_width": 20.0,
        "intensity": {"type": "rgb", "value": [4.0, 4.0, 4.0]},
        "to_world": Transform.look_at([0, 2, 0], [0, 0, 0], [1, 0, 0])})
    e._emitter_index = 0
    # point directly below: inside beam -> full intensity / dist^2
    it = _it(3, p=(0, 0, 0))
    it = it._replace(p=jnp.asarray([[0, 0, 0], [0.93, 0, 0], [3, 0, 0]],
                                   jnp.float32))
    ds, spec = e.sample_direction(it, jnp.zeros((3, 2)), jnp.ones(3, bool))
    spec = np.asarray(spec)
    assert np.allclose(spec[0], 1.0, atol=1e-5)   # 4 / 2^2, inside beam
    assert spec[1].mean() > 0                      # transition region
    assert np.allclose(spec[2], 0.0)               # outside cutoff


def test_directional_render(variant_scalar_rgb):
    """A plane lit by a directional emitter head-on: L = E * albedo / pi."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": Transform.look_at([0, 3, 0.01], [0, 0, 0],
                                                 [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "plane": {"type": "rectangle",
                  "to_world": (Transform.rotate([1, 0, 0], -90)
                               @ Transform.scale(50.0)),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.5, 0.5, 0.5]}}},
        "sun": {"type": "directional", "direction": [0, -1, 0],
                "irradiance": {"type": "rgb", "value": [2.0, 2.0, 2.0]}},
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    # direct: L = E * cos(0) * albedo / pi = 2*0.5/pi
    assert np.allclose(img, 2 * 0.5 / np.pi, rtol=0.02), img.mean()


def test_point_inverse_square(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    e = mi.load_dict({"type": "point", "position": [0, 2, 0],
                      "intensity": {"type": "rgb", "value": [8, 8, 8]}})
    e._emitter_index = 0
    it = _it(1, p=(0, 0, 0))
    ds, spec = e.sample_direction(it, jnp.zeros((1, 2)), jnp.ones(1, bool))
    assert np.allclose(np.asarray(spec), 8 / 4.0, atol=1e-5)
    assert np.allclose(np.asarray(ds.dist), 2.0)


# ---------------------------------------------------------------------------
# sample_ray (endpoint.h:86-135): weights are flux estimators
# ---------------------------------------------------------------------------

def _uni(n, d, seed):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, d).astype(np.float32))


def test_sample_ray_constant_flux(variant_scalar_rgb):
    """constant.cpp:59-78: weight == L * 4 (pi r)^2; origins on the
    bounding sphere; directions inward-cosine."""
    from mitsuba2_tpu.models.emitters import ConstantEmitter
    e = ConstantEmitter()
    r = 2.0
    e._scene_bsphere = (jnp.zeros(3), r)
    n = 4096
    t = jnp.zeros(n)
    ray, w = e.sample_ray(t, _uni(n, 1, 0)[:, 0], _uni(n, 2, 1),
                          _uni(n, 2, 2), jnp.ones(n, bool))
    w = np.asarray(w)
    assert np.allclose(w, 4.0 * (np.pi * r) ** 2, rtol=1e-5)
    o = np.asarray(ray.o)
    assert np.allclose(np.linalg.norm(o, axis=-1), r, atol=1e-4)
    inward = (np.asarray(ray.d) * (-o / r)).sum(-1)
    assert (inward >= -1e-5).all()


def test_sample_ray_directional_flux(variant_scalar_rgb):
    """directional.cpp:80-105: weight == E * pi r^2; origins on the
    perpendicular disk behind the scene."""
    from mitsuba2_tpu.models.emitters import DirectionalEmitter
    e = DirectionalEmitter(direction=[0, 0, -1], irradiance=2.0)
    r = 3.0
    e._scene_bsphere = (jnp.zeros(3), r)
    n = 2048
    t = jnp.zeros(n)
    ray, w = e.sample_ray(t, _uni(n, 1, 3)[:, 0], _uni(n, 2, 4),
                          _uni(n, 2, 5), jnp.ones(n, bool))
    assert np.allclose(np.asarray(w), 2.0 * np.pi * r * r, rtol=1e-5)
    o = np.asarray(ray.o)
    d = np.asarray(ray.d)
    assert np.allclose(d, [0, 0, -1], atol=1e-6)
    # o = center + (perp - d) r: along-axis offset -r, radial <= r
    assert np.allclose((o * d).sum(-1), -r, atol=1e-4)
    radial = np.linalg.norm(o - (o * d).sum(-1, keepdims=True) * d, axis=-1)
    assert (radial <= r + 1e-4).all()


def test_sample_ray_envmap_flux(variant_scalar_rgb):
    """Envmap sample_ray: E[weight] -> pi r^2 * integral of L over the
    sphere (the emitted flux through the bounding disk), per channel."""
    rs = np.random.RandomState(7)
    data = (rs.rand(16, 32, 3) + 0.1).astype(np.float32)
    e = _envmap(data)
    r = 1.0
    n = 200000
    t = jnp.zeros(n)
    ray, w = e.sample_ray(t, _uni(n, 1, 8)[:, 0], _uni(n, 2, 9),
                          _uni(n, 2, 10), jnp.ones(n, bool))
    h, wd = data.shape[0], data.shape[1]
    theta = (np.arange(h) + 0.5) / h * np.pi
    dw = np.sin(theta)[:, None] * (np.pi / h) * (2 * np.pi / wd)
    flux = (data * dw[..., None]).sum((0, 1)) * np.pi * r * r
    est = np.asarray(w).mean(0)
    assert np.allclose(est, flux, rtol=0.03), (est, flux)


def test_sample_ray_projector_roundtrip(variant_scalar_rgb):
    """Projector rays exit through the film sample they were generated
    from: projecting a point on the ray back through sample_direction
    recovers the uv."""
    from mitsuba2_tpu.models.emitters import ProjectorEmitter
    from mitsuba2_tpu.core.properties import Properties
    p = Properties("projector")
    p["fov"] = 40.0
    e = ProjectorEmitter(p)
    e._scene_bsphere = (jnp.zeros(3), 1.0)
    e._emitter_index = 0
    n = 512
    uv_in = _uni(n, 2, 11) * 0.9 + 0.05
    t = jnp.zeros(n)
    ray, w = e.sample_ray(t, _uni(n, 1, 12)[:, 0], _uni(n, 2, 13),
                          uv_in, jnp.ones(n, bool))
    assert (np.asarray(w) > 0).all()
    pt = ray.o + ray.d * 3.0
    it = _it(n)._replace(p=pt)
    ds, spec = e.sample_direction(it, _uni(n, 2, 14), jnp.ones(n, bool))
    assert np.allclose(np.asarray(ds.uv), np.asarray(uv_in), atol=1e-3)
    assert (np.asarray(spec) > 0).all()
