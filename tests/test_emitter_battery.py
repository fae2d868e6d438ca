"""Per-emitter sampling/consistency battery (parity role: the
reference's src/emitters/tests — one suite per plugin with
sample_direction/pdf_direction/eval invariants and a render smoke)."""

import numpy as np

import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


def _probe_scene(emitter_dict, with_floor=True):
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 2},
         "em": emitter_dict,
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": T.look_at([0, 0.5, 4], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 12, "height": 12,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 16}}}
    if with_floor:
        d["floor"] = {"type": "rectangle",
                      "to_world": (T.translate([0, -1, 0])
                                   @ T.rotate([1, 0, 0], -90)
                                   @ T.scale(3)),
                      "bsdf": {"type": "diffuse"}}
    return mi.load_dict(d)


def _sample_pdf_consistency(scene, n=256, delta_ok=False):
    """sample_emitter_direction's claimed pdf must match
    pdf_emitter_direction at the sampled directions (scene.cpp:165-214
    MIS contract) for non-delta emitters."""
    from mitsuba2_tpu.render.testutil import dummy_si
    rs = np.random.RandomState(0)
    si = dummy_si(n)
    si = si._replace(p=jnp.zeros((n, 3)) + jnp.asarray([0, -0.5, 0.0]))
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    ds, spec = scene.sample_emitter_direction(si, u, False, True)
    pdf = np.asarray(ds.pdf)
    spec = np.asarray(spec)
    assert np.isfinite(spec).all() and (spec >= 0).all()
    assert np.isfinite(pdf).all() and (pdf >= 0).all()
    delta = np.asarray(ds.delta)
    if delta_ok:
        assert delta.all()
        return
    ok = (pdf > 1e-6) & ~delta
    if ok.any():
        pdf2 = np.asarray(scene.pdf_emitter_direction(si, ds, True))
        r = pdf2[ok] / pdf[ok]
        assert np.quantile(np.abs(r - 1.0), 0.95) < 5e-2, r


def _area_light(radiance=6.0):
    return {"type": "rectangle",
            "to_world": (T.translate([0, 2.5, 0]) @ T.scale(0.8)
                         @ T.rotate([1, 0, 0], 90)),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": radiance}}}


def test_area_sample_pdf_consistent(variant_scalar_rgb):
    _sample_pdf_consistency(_probe_scene(_area_light()))


def test_area_radiance_eval(variant_scalar_rgb):
    scene = _probe_scene(_area_light(radiance=6.0), with_floor=False)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    # looking away from the light: black; the light itself reads 6.0
    assert img.max() < 6.5


def test_point_is_delta(variant_scalar_rgb):
    scene = _probe_scene({"type": "point", "position": [0, 2, 0],
                          "intensity": {"type": "rgb", "value": 5.0}})
    _sample_pdf_consistency(scene, delta_ok=True)


def test_point_inverse_square(variant_scalar_rgb):
    from mitsuba2_tpu.render.testutil import dummy_si
    scene = _probe_scene({"type": "point", "position": [0, 4, 0],
                          "intensity": {"type": "rgb", "value": 1.0}})
    si1 = dummy_si(1)._replace(p=jnp.asarray([[0.0, 0.0, 0.0]]))
    si2 = dummy_si(1)._replace(p=jnp.asarray([[0.0, 2.0, 0.0]]))
    u = jnp.asarray([[0.5, 0.5]], jnp.float32)
    _, s1 = scene.sample_emitter_direction(si1, u, False, True)
    _, s2 = scene.sample_emitter_direction(si2, u, False, True)
    # distance 4 vs 2: irradiance ratio 1/4
    r = float(np.asarray(s1).mean() / max(np.asarray(s2).mean(), 1e-9))
    assert abs(r - 0.25) < 0.02, r


def test_constant_furnace_value(variant_scalar_rgb):
    scene = _probe_scene({"type": "constant",
                          "radiance": {"type": "rgb", "value": 0.7}},
                         with_floor=False)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    assert np.allclose(img.mean(), 0.7, atol=0.02)


def test_constant_sample_pdf_consistent(variant_scalar_rgb):
    _sample_pdf_consistency(_probe_scene(
        {"type": "constant", "radiance": {"type": "rgb", "value": 1.0}}))


def test_envmap_sample_pdf_consistent(variant_scalar_rgb):
    from mitsuba2_tpu.python.test.scenes import _sky_exr_path
    _sample_pdf_consistency(_probe_scene(
        {"type": "envmap", "filename": _sky_exr_path()}))


def test_envmap_importance_targets_sun(variant_scalar_rgb):
    """The Hierarchical2D warp concentrates samples near the synthetic
    sun (envmap.cpp:67 importance sampling)."""
    from mitsuba2_tpu.python.test.scenes import _sky_exr_path
    from mitsuba2_tpu.render.testutil import dummy_si
    scene = _probe_scene({"type": "envmap",
                          "filename": _sky_exr_path()})
    rs = np.random.RandomState(1)
    n = 2048
    si = dummy_si(n)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    ds, spec = scene.sample_emitter_direction(si, u, False, True)
    env = scene.environment_emitter
    n_ = np.asarray(ds.d).shape[0]
    emi = jnp.full(n_, env._emitter_index, jnp.int32)
    si_esc = si._replace(t=jnp.full(n_, np.inf),
                         shape_idx=jnp.full(n_, -1, jnp.int32),
                         emitter_idx=emi)
    rad_imp = np.asarray(scene.eval_emitter(si_esc, ds.d, True)).mean()
    du = rs.randn(n_, 3).astype(np.float32)
    du /= np.linalg.norm(du, axis=-1, keepdims=True)
    rad_uni = np.asarray(scene.eval_emitter(
        si_esc, jnp.asarray(du), True)).mean()
    # importance samples land on radiance far above the uniform mean
    assert rad_imp > 10.0 * max(rad_uni, 1e-6), (rad_imp, rad_uni)


def test_directional_is_delta(variant_scalar_rgb):
    scene = _probe_scene({"type": "directional",
                          "direction": [0, -1, 0],
                          "irradiance": {"type": "rgb", "value": 2.0}})
    _sample_pdf_consistency(scene, delta_ok=True)


def test_directional_flat_floor_irradiance(variant_scalar_rgb):
    scene = _probe_scene({"type": "directional",
                          "direction": [0, -1, 0],
                          "irradiance": {"type": "rgb", "value": 2.0}})
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=64))
    # white-ish diffuse floor lit head-on: L = E * albedo/pi
    mid = img[9, 6, :3].mean()
    assert abs(mid - 2.0 * 0.5 / np.pi) < 0.05, mid


def test_spot_cone_cutoff(variant_scalar_rgb):
    scene = _probe_scene({"type": "spot",
                          "to_world": T.look_at([0, 2, 0], [0, 0, 0],
                                                [1, 0, 0]),
                          "cutoff_angle": 12.0,
                          "intensity": {"type": "rgb", "value": 20.0}})
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=64))
    h, w, _ = img.shape
    # lit spot in the middle of the floor, dark near the edges
    assert img[h // 2 + 2, w // 2].mean() >= 0.0
    center = img[:, w // 2, :3].max()
    corner = img[0, 0, :3].max()
    assert center > corner


def test_projector_textured_cone(variant_scalar_rgb):
    import tempfile, os
    from mitsuba2_tpu.utils.io_exr import write_exr
    tex = np.zeros((16, 16, 3), np.float32)
    tex[:, :8, 0] = 5.0          # left half red
    tex[:, 8:, 2] = 5.0          # right half blue
    path = os.path.join(tempfile.gettempdir(), "proj_tex.exr")
    write_exr(path, tex)
    scene = _probe_scene({"type": "projector",
                          "to_world": T.look_at([0, 2, 0], [0, 0, 0],
                                                [1, 0, 0]),
                          "fov": 40.0,
                          "irradiance": {"type": "bitmap",
                                         "filename": path}})
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=64))
    assert np.isfinite(img).all()
    # both tints land on the floor somewhere
    assert img[..., 0].max() > 0.0 or img[..., 2].max() > 0.0


def test_two_emitters_mis_unbiased(variant_scalar_rgb):
    """Area + constant env together: scene-level emitter picking with
    renormalized pdfs stays unbiased (mean equals the sum of the
    single-emitter renders)."""
    base = {"type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "floor": {"type": "rectangle",
                      "to_world": (T.translate([0, -1, 0])
                                   @ T.rotate([1, 0, 0], -90)
                                   @ T.scale(2)),
                      "bsdf": {"type": "diffuse"}},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": T.look_at([0, 0.5, 4], [0, 0, 0],
                                             [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 12,
                                "height": 12,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 128}}}
    both = dict(base)
    both["l1"] = _area_light(radiance=4.0)
    both["l2"] = {"type": "constant",
                  "radiance": {"type": "rgb", "value": 0.3}}
    s_both = mi.load_dict(both)
    m_both = np.asarray(
        s_both.integrator.render(s_both, seed=0, spp=128)).mean()
    only1 = dict(base)
    only1["l1"] = _area_light(radiance=4.0)
    s1 = mi.load_dict(only1)
    m1 = np.asarray(s1.integrator.render(s1, seed=1, spp=128)).mean()
    only2 = dict(base)
    only2["l2"] = {"type": "constant",
                   "radiance": {"type": "rgb", "value": 0.3}}
    s2 = mi.load_dict(only2)
    m2 = np.asarray(s2.integrator.render(s2, seed=2, spp=128)).mean()
    assert abs(m_both - (m1 + m2)) < 0.06 * max(m1 + m2, 1e-3), \
        (m_both, m1, m2)
