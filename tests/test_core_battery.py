"""Core-runtime battery: object model (expand/traverse/epoch), film and
ImageBlock behavior, media dispatch API, distr edge cases, geometry
primitives — the libcore/librender invariants the focused suites don't
individually pin down."""

import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


# ---------------------------------------------------------- object model
def test_plugin_registry_unknown_type(variant_scalar_rgb):
    with pytest.raises(Exception):
        mi.load_dict({"type": "definitely_not_a_plugin"})


def test_expand_called_by_scene(variant_scalar_rgb):
    # a sphere with an emitter expands to a mesh inside a scene
    s = mi.load_dict({"type": "scene",
                      "a": {"type": "sphere",
                            "emitter": {"type": "area",
                                        "radiance": {"type": "rgb",
                                                     "value": 1.0}}},
                      "integrator": {"type": "path", "max_depth": 2}})
    assert all(sh.is_mesh() for sh in s.shapes)


def test_traverse_reaches_nested(variant_scalar_rgb):
    from mitsuba2_tpu.python.util import traverse
    s = mi.load_dict({"type": "scene",
                      "m": {"type": "rectangle",
                            "bsdf": {"type": "twosided",
                                     "bsdf": {"type": "diffuse"}}},
                      "integrator": {"type": "path", "max_depth": 2}})
    params = traverse(s)
    assert any("reflectance" in k for k in params.keys())


def test_param_update_invalidates_render_cache(variant_scalar_rgb):
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.test.scenes import furnace_dict
    s = mi.load_dict(furnace_dict(albedo=0.5, env_radiance=1.0,
                                  width=8, height=8, spp=16,
                                  max_depth=2))
    a = np.asarray(s.integrator.render(s, seed=0, spp=16)).mean()
    params = traverse(s)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params[key] = jnp.asarray([0.9, 0.9, 0.9])
    params.update()
    b = np.asarray(s.integrator.render(s, seed=0, spp=16)).mean()
    assert b > a * 1.3    # brighter albedo actually took effect


def test_object_id_roundtrip(variant_scalar_rgb):
    b = mi.load_dict({"type": "diffuse", "id": "my_mat"})
    assert "my_mat" in repr(b) or getattr(b, "id", "") == "my_mat"


# ------------------------------------------------------------------ film
def test_film_crop_size(variant_scalar_rgb):
    s = mi.load_dict({"type": "scene",
                      "integrator": {"type": "path", "max_depth": 2},
                      "env": {"type": "constant",
                              "radiance": {"type": "rgb", "value": 1.0}},
                      "sensor": {"type": "perspective", "fov": 45,
                                 "film": {"type": "hdrfilm",
                                          "width": 20, "height": 12,
                                          "rfilter": {"type": "box"}},
                                 "sampler": {"type": "independent",
                                             "sample_count": 4}}})
    img = np.asarray(s.integrator.render(s, seed=0, spp=4))
    assert img.shape[0] == 12 and img.shape[1] == 20


def test_imageblock_splat_conserves_energy(variant_scalar_rgb):
    from mitsuba2_tpu.render.film import ImageBlock
    from mitsuba2_tpu.models.rfilters import GaussianFilter
    blk = ImageBlock((8, 8), 3, GaussianFilter())
    st = blk.create()
    pos = jnp.asarray([[3.5, 3.5], [1.2, 6.7]], jnp.float32)
    val = jnp.asarray([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]], jnp.float32)
    st = blk.put(st, pos, val)
    img = np.asarray(blk.develop(st))
    # developed image normalizes by weight: bounded by the max splat
    assert np.nanmax(img) <= 3.0 + 1e-4
    assert np.isfinite(img[np.nonzero(~np.isnan(img))]).all()


def test_imageblock_border_padding(variant_scalar_rgb):
    from mitsuba2_tpu.render.film import ImageBlock
    from mitsuba2_tpu.models.rfilters import GaussianFilter, BoxFilter
    assert ImageBlock((8, 8), 3, BoxFilter()).border == 0
    assert ImageBlock((8, 8), 3, GaussianFilter()).border >= 1


def test_spiral_center_first(variant_scalar_rgb):
    from mitsuba2_tpu.render.spiral import Spiral
    sp = Spiral((64, 64), block_size=16)
    blocks = list(sp)
    # first block contains the image center
    (x0, y0), (w, h) = blocks[0][:2] if isinstance(
        blocks[0][0], tuple) else ((blocks[0][0], blocks[0][1]),
                                   (blocks[0][2], blocks[0][3]))
    assert x0 <= 32 <= x0 + w + 16
    assert y0 <= 32 <= y0 + h + 16


# ----------------------------------------------------------------- media
def test_homogeneous_beer_lambert(variant_scalar_rgb):
    """Transmittance through a homogeneous slab follows exp(-sigma_t d)
    (homogeneous.cpp contract via a backlit render)."""
    def scene_with(sigma):
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": 8},
            "slab": {"type": "cube", "bsdf": {"type": "null"},
                     "interior": {"type": "homogeneous",
                                  "sigma_t": {"type": "rgb",
                                              "value": [sigma] * 3},
                                  "albedo": {"type": "rgb",
                                             "value": [0.0] * 3}}},
            "light": {"type": "rectangle",
                      "to_world": (T.translate([0, 0, -3])
                                   @ T.scale(4.0)),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": [2.0] * 3}}},
            "sensor": {"type": "perspective", "fov": 8.0,
                       "to_world": T.look_at([0, 0, 4], [0, 0, 0],
                                             [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 4,
                                "height": 4,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 512}}})

    s1 = scene_with(0.4)
    m1 = np.asarray(s1.integrator.render(s1, seed=0, spp=512)).mean()
    # slab thickness 2: T = exp(-0.8)
    expect = 2.0 * np.exp(-0.8)
    assert abs(m1 - expect) < 0.08 * expect, (m1, expect)


def test_medium_transition_tracks_interfaces(variant_scalar_rgb):
    s = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 4},
        "slab": {"type": "cube", "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous",
                              "sigma_t": {"type": "rgb",
                                          "value": [0.5] * 3},
                              "albedo": {"type": "rgb",
                                         "value": [0.3] * 3}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": T.look_at([0, 0, 4], [0, 0, 0],
                                         [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 6, "height": 6,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": 64}}})
    assert s.has_media and len(s.media) == 1
    img = np.asarray(s.integrator.render(s, seed=0, spp=64))
    assert np.isfinite(img).all() and img.mean() > 0.2


# ------------------------------------------------------------- distr edge
def test_discrete_distribution_single_entry(variant_scalar_rgb):
    from mitsuba2_tpu.core.distr_1d import DiscreteDistribution
    d = DiscreteDistribution.create(jnp.asarray([3.0]))
    idx = np.asarray(d.sample(jnp.asarray([0.1, 0.9])))
    assert (idx == 0).all()


def test_discrete_distribution_zero_mass_entries(variant_scalar_rgb):
    from mitsuba2_tpu.core.distr_1d import DiscreteDistribution
    d = DiscreteDistribution.create(jnp.asarray([0.0, 2.0, 0.0, 1.0]))
    u = jnp.linspace(0.001, 0.999, 512)
    idx = np.asarray(d.sample(u))
    assert set(np.unique(idx)).issubset({1, 3})
    # proportions 2:1
    frac1 = (idx == 1).mean()
    assert abs(frac1 - 2.0 / 3.0) < 0.05


def test_continuous_distribution_inverse(variant_scalar_rgb):
    from mitsuba2_tpu.core.distr_1d import ContinuousDistribution
    pdf = jnp.asarray([0.0, 1.0, 2.0, 1.0, 0.0])
    d = ContinuousDistribution.create(jnp.asarray([0.0, 1.0]), pdf)
    u = jnp.linspace(0.01, 0.99, 1024)
    x = np.asarray(d.sample(u))
    assert (x >= 0).all() and (x <= 1).all()
    # mass concentrates near the center
    assert abs(np.median(x) - 0.5) < 0.02


# ---------------------------------------------------------- geometry prims
def test_bbox_contains_and_expand(variant_scalar_rgb):
    from mitsuba2_tpu.core.bbox import BoundingBox
    bb = BoundingBox(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 1, 1]))
    assert bool(np.asarray(bb.contains(jnp.asarray([0.5, 0.5, 0.5]))))
    assert not bool(np.asarray(bb.contains(jnp.asarray([1.5, 0.5,
                                                        0.5]))))


def test_ray_pointing_parameterization(variant_scalar_rgb):
    from mitsuba2_tpu.core.ray import Ray
    r = Ray.make(jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[0.0, 0, 2]]),
                 mint=jnp.asarray([0.0]), maxt=jnp.asarray([np.inf]),
                 time=jnp.asarray([0.0]),
                 wavelengths=jnp.zeros((1, 0)))
    p = np.asarray(r(jnp.asarray([2.0])))
    assert np.allclose(p, [[0, 0, 4]], atol=1e-6)


def test_frame_local_world_inverse(variant_scalar_rgb):
    from mitsuba2_tpu.core.frame import Frame
    rs = np.random.RandomState(0)
    n = rs.randn(64, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    f = Frame.from_normal(jnp.asarray(n))
    v = rs.randn(64, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = np.asarray(f.to_world(f.to_local(jnp.asarray(v))))
    assert np.allclose(w, v, atol=1e-5)


def test_transform_inverse_consistent(variant_scalar_rgb):
    t = (T.translate([1, 2, 3]) @ T.rotate([0, 1, 0], 30)
         @ T.scale([2, 1, 0.5]))
    p = jnp.asarray([[0.3, -0.7, 1.1]])
    q = t.inverse().transform_point(t.transform_point(p))
    assert np.allclose(np.asarray(q), np.asarray(p), atol=1e-5)


def test_animated_transform_interpolates(variant_scalar_rgb):
    from mitsuba2_tpu.core.transform import AnimatedTransform
    a = AnimatedTransform()
    a.append(0.0, T.translate([0, 0, 0]))
    a.append(1.0, T.translate([2, 0, 0]))
    mid = a.eval(jnp.asarray([0.5]))
    M = np.asarray(mid.matrix)
    assert np.allclose(M.reshape(-1, 4, 4)[0][0, 3], 1.0, atol=1e-5)


# ------------------------------------------------------------- spectrum
def test_sample_rgb_spectrum_pdf_consistency(variant_scalar_rgb):
    from mitsuba2_tpu.core import spectrum as sp
    u = jnp.linspace(0.01, 0.99, 512)
    wav, pdf = sp.sample_rgb_spectrum(u)
    wavn = np.asarray(wav)
    assert (wavn >= 360.0).all() and (wavn <= 830.0).all()
    assert (np.asarray(pdf) > 0).all()


def test_cie_y_peak_near_555(variant_scalar_rgb):
    from mitsuba2_tpu.core import spectrum as sp
    wav = jnp.linspace(400.0, 700.0, 301)
    y = np.asarray(sp.cie1931_xyz(wav))[:, 1]
    assert abs(float(wav[np.argmax(y)]) - 555.0) < 10.0


def test_luminance_weights(variant_scalar_rgb):
    from mitsuba2_tpu.core import spectrum as sp
    g = np.asarray(sp.luminance(jnp.asarray([[0.0, 1.0, 0.0]])))
    r = np.asarray(sp.luminance(jnp.asarray([[1.0, 0.0, 0.0]])))
    b = np.asarray(sp.luminance(jnp.asarray([[0.0, 0.0, 1.0]])))
    assert g > r > b  # Rec.709 weights ordering
