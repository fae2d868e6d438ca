"""Volumetric transport tests (parity: src/media/tests + volpath behavior)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _slab_scene(sigma_t, albedo, light=(4.0, 4.0, 4.0), thickness=1.0,
                spp=64, max_depth=16, medium_type="homogeneous",
                grid=None):
    """Camera looking +(-z) through a medium-filled cube at an area light
    behind it."""
    from mitsuba2_tpu.core.transform import Transform as T
    if medium_type == "homogeneous":
        medium = {"type": "homogeneous",
                  "sigma_t": {"type": "rgb", "value": [sigma_t] * 3},
                  "albedo": {"type": "rgb", "value": [albedo] * 3}}
    else:
        medium = {"type": "heterogeneous",
                  "sigma_t": {"type": "grid3d", "data": grid},
                  "albedo": {"type": "rgb", "value": [albedo] * 3},
                  "to_world": (T.translate([-1, -1, -thickness / 2])
                               @ T.scale([2, 2, thickness]))}
    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": max_depth},
        "sensor": {"type": "perspective", "fov": 10.0,
                   "to_world": T.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 6, "height": 6,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "slab": {"type": "cube",
                 "to_world": T.scale([1.0, 1.0, thickness / 2]),
                 "bsdf": {"type": "null"},
                 "interior": medium},
        "light": {"type": "rectangle",
                  "to_world": T.translate([0, 0, -2.5]) @ T.scale(2.0),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": list(light)}}},
    }


def test_homogeneous_absorption(variant_scalar_rgb):
    """Pure absorber: pixel = L * exp(-sigma_t * thickness) (Beer-Lambert)."""
    import mitsuba2_tpu as mi
    sigma = 1.3
    scene = mi.load_dict(_slab_scene(sigma, albedo=0.0, spp=400))
    img = np.asarray(scene.integrator.render(scene, seed=0))
    expect = 4.0 * np.exp(-sigma * 1.0)  # default slab thickness is 1
    assert np.allclose(img.mean(axis=(0, 1)), expect, rtol=0.05), \
        (img.mean(), expect)


def test_vacuum_volpath_matches_path(variant_scalar_rgb):
    """With no media, volpath must agree with the path tracer."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    d = cornell_box_dict(width=16, height=16, spp=128, max_depth=4)
    scene_p = mi.load_dict(d)
    img_p = np.asarray(scene_p.integrator.render(scene_p, seed=0, spp=128))
    d2 = cornell_box_dict(width=16, height=16, spp=128, max_depth=4)
    d2["integrator"] = {"type": "volpath", "max_depth": 4}
    scene_v = mi.load_dict(d2)
    img_v = np.asarray(scene_v.integrator.render(scene_v, seed=0, spp=128))
    ratio = img_v.mean() / img_p.mean()
    assert abs(ratio - 1.0) < 0.03, ratio


def test_scattering_furnace(variant_scalar_rgb):
    """Albedo-1 scattering slab inside a uniform furnace: energy conserved,
    every pixel returns the environment radiance."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform as T
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 64, "rr_depth": 1000},
        "sensor": {"type": "perspective", "fov": 10.0,
                   "to_world": T.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 4, "height": 4,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 256}},
        "slab": {"type": "cube", "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous",
                              "sigma_t": {"type": "rgb", "value": [1.0] * 3},
                              "albedo": {"type": "rgb", "value": [1.0] * 3}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.isfinite(img).all()
    assert abs(img.mean() - 1.0) < 0.03, img.mean()


def test_heterogeneous_absorption(variant_scalar_rgb):
    """Heterogeneous constant-density grid must reproduce Beer-Lambert via
    delta tracking."""
    import mitsuba2_tpu as mi
    grid = np.full((4, 4, 4), 0.8, np.float32)
    scene = mi.load_dict(_slab_scene(0.0, albedo=0.0, spp=600,
                                     medium_type="heterogeneous",
                                     grid=grid, thickness=2.0))
    img = np.asarray(scene.integrator.render(scene, seed=0))
    expect = 4.0 * np.exp(-0.8 * 2.0)
    assert np.allclose(img.mean(axis=(0, 1)), expect, rtol=0.08), \
        (img.mean(), expect)


def test_heterogeneous_varying_grid(variant_scalar_rgb):
    """Linearly varying density: transmittance = exp(-integral sigma)."""
    import mitsuba2_tpu as mi
    # density ramp along z from 0.2 to 1.4 -> integral over thickness 2:
    # grid cells: trilinear interp; approximate with analytic line integral
    z_vals = np.linspace(0.2, 1.4, 8).astype(np.float32)
    grid = np.broadcast_to(z_vals[:, None, None], (8, 4, 4)).copy()
    scene = mi.load_dict(_slab_scene(0.0, albedo=0.0, spp=800,
                                     medium_type="heterogeneous",
                                     grid=grid, thickness=2.0))
    img = np.asarray(scene.integrator.render(scene, seed=0))
    # numeric line integral of the trilinear profile through z
    ts = np.linspace(0, 1, 2001)
    fz = ts * 8 - 0.5
    iz = np.clip(np.floor(fz).astype(int), 0, 7)
    iz1 = np.minimum(iz + 1, 7)
    w = np.clip(fz - iz, 0, 1)
    dens = z_vals[iz] * (1 - w) + z_vals[iz1] * w
    integral = np.trapezoid(dens, ts) * 2.0  # thickness 2
    expect = 4.0 * np.exp(-integral)
    assert np.allclose(img.mean(axis=(0, 1)), expect, rtol=0.1), \
        (img.mean(axis=(0, 1)), expect)


def test_vol_file_roundtrip(tmp_path, variant_scalar_rgb):
    from mitsuba2_tpu.utils.vol import write_vol, read_vol
    rs = np.random.RandomState(0)
    data = rs.rand(4, 5, 6, 1).astype(np.float32)
    f = str(tmp_path / "test.vol")
    write_vol(f, data)
    back, bbox = read_vol(f)
    assert np.allclose(back, data)
    assert bbox == (0.0, 0.0, 0.0, 1.0, 1.0, 1.0)


def test_volpath_large_light_matches_path(variant_scalar_rgb):
    """Regression: NEE-only volpath lost ~17% with large area lights (NEE
    was MIS-downweighted while the directional arm only ran on specular
    chains). Both volpath and volpathmis must agree with path."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform as T

    def scene_d(integ):
        return {
            "type": "scene", "integrator": integ,
            "floor": {"type": "rectangle", "to_world": T.scale([3, 3, 1]),
                      "bsdf": {"type": "diffuse"}},
            "biglight": {"type": "rectangle",
                         "to_world": (T.translate([0, 0, 4])
                                      @ T.scale([3, 3, 1])
                                      @ T.rotate([1, 0, 0], 180)),
                         "emitter": {"type": "area",
                                     "radiance": {"type": "rgb",
                                                  "value": 1.0}}},
            "sensor": {"type": "perspective",
                       "to_world": T.look_at([0, -6, 2.5], [0, 0, 1],
                                             [0, 0, 1]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 48}}}

    means = {}
    for name in ("path", "volpath", "volpathmis"):
        s = mi.load_dict(scene_d({"type": name, "max_depth": 4}))
        means[name] = float(np.asarray(
            s.integrator.render(s, seed=2)).mean())
    assert abs(means["volpath"] - means["path"]) < 0.004 * 4, means
    assert abs(means["volpathmis"] - means["path"]) < 0.004 * 4, means


def test_volpathmis_matches_volpath_in_media(variant_scalar_rgb):
    """The MIS estimator must agree with the NEE-only estimator through an
    actual scattering medium."""
    import mitsuba2_tpu as mi
    d = _slab_scene(sigma_t=1.0, albedo=0.8, spp=96, max_depth=12)
    a = np.asarray(mi.load_dict(d).integrator.render(
        mi.load_dict(d), seed=5))
    d["integrator"] = {"type": "volpathmis", "max_depth": 12}
    s2 = mi.load_dict(d)
    b = np.asarray(s2.integrator.render(s2, seed=5))
    assert abs(a.mean() - b.mean()) < 0.05 * max(a.mean(), 1e-3), \
        (a.mean(), b.mean())


def test_volpathmis_spectral_matches_rgb(variant_scalar_rgb):
    """(VERDICT r1 #8) spectral volpathmis carries the per-channel MIS
    weight matrix (ratio form) through null collisions; with
    wavelength-flat medium coefficients the spectral render must agree
    with the rgb render of the same scene."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform as T

    grid = np.random.default_rng(3).uniform(
        0.3, 2.2, (8, 8, 8)).astype(np.float32)
    d = {"type": "scene",
         "integrator": {"type": "volpathmis", "max_depth": 12},
         "slab": {"type": "cube", "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "grid3d", "data": grid},
                               "albedo": {"type": "rgb",
                                          "value": [0.7, 0.7, 0.7]},
                               "to_world": (T.translate([-1, -1, -1])
                                            @ T.scale(2.0)),
                               "phase": {"type": "hg", "g": 0.2}}},
         "light": {"type": "rectangle",
                   "to_world": T.translate([0, 0, -2.5]) @ T.scale(2.0),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb",
                                            "value": [5.0] * 3}}},
         "sensor": {"type": "perspective", "fov": 40.0,
                    "to_world": T.look_at([0, 0, 4], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 16, "height": 16,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 96}}}
    mi.set_variant("scalar_rgb")
    s_rgb = mi.load_dict(d)
    img_rgb = np.asarray(s_rgb.integrator.render(s_rgb, seed=2, spp=96))
    mi.set_variant("scalar_spectral")
    try:
        s_sp = mi.load_dict(d)
        img_sp = np.asarray(s_sp.integrator.render(s_sp, seed=7, spp=96))
    finally:
        mi.set_variant("scalar_rgb")
    assert np.isfinite(img_sp).all()
    m_rgb = img_rgb.mean()
    m_sp = img_sp.mean()
    assert abs(m_sp - m_rgb) <= 0.12 * max(m_rgb, 1e-3), (m_sp, m_rgb)
