"""Cross-variant consistency matrix (the reference's generated
variant_* fixtures, src/conftest.py:35-60): the same scene body renders
under every color mode x polarization x precision, and physically
equivalent configurations agree."""

import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T

RENDER_VARIANTS = [
    "scalar_rgb", "scalar_rgb_double", "scalar_rgb_polarized",
    "scalar_mono", "scalar_mono_double",
    "scalar_spectral", "scalar_spectral_double",
    "scalar_spectral_polarized",
]


def _scene_dict(spp=32):
    return {"type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "light": {"type": "rectangle",
                      "to_world": (T.translate([0, 2.5, 0.5])
                                   @ T.scale(0.8)
                                   @ T.rotate([1, 0, 0], 90)),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": 8.0}}},
            "floor": {"type": "rectangle",
                      "to_world": (T.translate([0, -1, 0])
                                   @ T.rotate([1, 0, 0], -90)
                                   @ T.scale(3)),
                      "bsdf": {"type": "diffuse",
                               "reflectance": {"type": "rgb",
                                               "value": 0.5}}},
            "ball": {"type": "sphere", "radius": 0.6,
                     "bsdf": {"type": "roughplastic", "alpha": 0.2,
                              "distribution": "ggx"}},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": T.look_at([0, 0.4, 4], [0, 0, 0],
                                             [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": spp}}}


@pytest.fixture(params=RENDER_VARIANTS)
def each_variant(request):
    mi.set_variant(request.param)
    yield request.param
    mi.set_variant("scalar_rgb")


def test_renders_in_variant(each_variant):
    scene = mi.load_dict(_scene_dict())
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=32))
    assert np.isfinite(img).all()
    assert img.mean() > 0.005
    from mitsuba2_tpu.variants import current
    assert current().name == each_variant


def test_double_matches_single(variant_scalar_rgb):
    d = _scene_dict(spp=64)
    mi.set_variant("scalar_rgb")
    a = np.asarray(mi.load_dict(d).integrator.render(
        mi.load_dict(d), seed=0, spp=64))
    mi.set_variant("scalar_rgb_double")
    try:
        b = np.asarray(mi.load_dict(d).integrator.render(
            mi.load_dict(d), seed=0, spp=64))
    finally:
        mi.set_variant("scalar_rgb")
    assert abs(a.mean() - b.mean()) < 0.03 * max(a.mean(), 1e-3)


def test_polarized_s0_matches_unpolarized(variant_scalar_rgb):
    """The S0 (intensity) component of a polarized render equals the
    unpolarized render for the same scene (stokes.cpp invariant)."""
    d = _scene_dict(spp=64)
    mi.set_variant("scalar_rgb")
    a = np.asarray(mi.load_dict(d).integrator.render(
        mi.load_dict(d), seed=0, spp=64))
    mi.set_variant("scalar_rgb_polarized")
    try:
        b = np.asarray(mi.load_dict(d).integrator.render(
            mi.load_dict(d), seed=0, spp=64))
    finally:
        mi.set_variant("scalar_rgb")
    assert abs(a.mean() - b.mean()) < 0.04 * max(a.mean(), 1e-3)


def test_mono_matches_rgb_luminance_scale(variant_scalar_rgb):
    d = _scene_dict(spp=64)
    mi.set_variant("scalar_rgb")
    a = np.asarray(mi.load_dict(d).integrator.render(
        mi.load_dict(d), seed=0, spp=64))
    mi.set_variant("scalar_mono")
    try:
        b = np.asarray(mi.load_dict(d).integrator.render(
            mi.load_dict(d), seed=0, spp=64))
    finally:
        mi.set_variant("scalar_rgb")
    # grey scene: mono ~ rgb mean
    assert abs(a.mean() - b.mean()) < 0.08 * max(a.mean(), 1e-3)


@pytest.mark.parametrize("integrator", ["direct", "depth", "aov"])
def test_aux_integrators_all_color_modes(variants_color, integrator):
    d = _scene_dict(spp=16)
    if integrator == "aov":
        d["integrator"] = {"type": "aov", "aovs": "nn:sh_normal,dd:depth",
                          "sub": {"type": "path", "max_depth": 2}}
    else:
        d["integrator"] = {"type": integrator}
    scene = mi.load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    assert np.isfinite(img).all()
