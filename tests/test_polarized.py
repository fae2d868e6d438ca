"""Polarization tests (parity: src/librender/tests/test_mueller.py + the
polarized plugin suites)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba2_tpu.render import mueller as mu
from mitsuba2_tpu.core import math as m


def test_linear_polarizer_malus():
    """Malus's law: I = I0/2 * cos^2(theta) through two polarizers."""
    S_in = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    P0 = mu.linear_polarizer(1.0)
    for theta_deg in (0.0, 30.0, 45.0, 60.0, 90.0):
        th = np.deg2rad(theta_deg)
        P1 = mu.rotated_element(jnp.asarray(th), mu.linear_polarizer(1.0))
        S_out = P1 @ (P0 @ S_in)
        expect = 0.5 * np.cos(th) ** 2
        assert np.isclose(float(S_out[0]), expect, atol=1e-6), \
            (theta_deg, S_out)


def test_polarizer_produces_polarized_light():
    S = mu.linear_polarizer(1.0) @ jnp.asarray([1.0, 0, 0, 0])
    assert np.allclose(np.asarray(S), [0.5, 0.5, 0, 0])
    # degree of polarization = 1
    dop = np.linalg.norm(np.asarray(S[1:])) / float(S[0])
    assert np.isclose(dop, 1.0)


def test_quarter_wave_plate_circular():
    """Linear 45-degree light through a quarter-wave plate -> circular."""
    # 45-degree linear polarized: S = (1, 0, 1, 0)
    S = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    QWP = mu.linear_retarder(jnp.asarray(np.pi / 2))
    S_out = np.asarray(QWP @ S)
    assert np.allclose(S_out, [1, 0, 0, 1], atol=1e-6)


def test_rotator_roundtrip():
    th = jnp.asarray(0.7)
    R = mu.rotator(th) @ mu.rotator(-th)
    assert np.allclose(np.asarray(R), np.eye(4), atol=1e-6)


def test_specular_reflection_brewster():
    """At Brewster's angle, reflected light is fully s-polarized."""
    eta = 1.5
    brewster = np.arctan(eta)
    M = mu.specular_reflection(jnp.asarray(np.cos(brewster)), eta)
    M = np.asarray(M)
    # p-reflectance 0 -> M00 == M01 (DOP 1)
    assert np.isclose(M[0, 0], M[0, 1], atol=1e-6)
    assert M[0, 0] > 0


def test_specular_reflection_matches_scalar_fresnel():
    from mitsuba2_tpu.render.fresnel import fresnel
    for ci in (0.2, 0.5, 0.9):
        M = mu.specular_reflection(jnp.asarray(ci), 1.5)
        F, _, _, _ = fresnel(jnp.asarray(ci), 1.5)
        assert np.isclose(float(M[0, 0]), float(F), atol=1e-5), ci


def test_stokes_integrator_malus(variant_scalar_rgb):
    """Render through two polarizer plates at varying angles; S0 follows
    Malus's law."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform as T

    def scene_dict(theta2):
        return {
            "type": "scene",
            "integrator": {"type": "stokes", "max_depth": 4},
            "sensor": {"type": "perspective", "fov": 5.0,
                       "to_world": T.look_at([0, 0, 5], [0, 0, 0],
                                             [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 4, "height": 4,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 8}},
            "pol_a": {"type": "rectangle", "to_world": T.translate([0, 0, 2]),
                      "bsdf": {"type": "polarizer", "theta": 0.0}},
            "pol_b": {"type": "rectangle", "to_world": T.translate([0, 0, 1]),
                      "bsdf": {"type": "polarizer", "theta": theta2}},
            "light": {"type": "rectangle",
                      "to_world": T.translate([0, 0, -1]) @ T.scale(3.0),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": [1.0, 1.0, 1.0]}}},
        }

    vals = {}
    for theta2 in (0.0, 45.0, 90.0):
        scene = mi.load_dict(scene_dict(theta2))
        img = np.asarray(scene.integrator.render(scene, seed=0))
        vals[theta2] = img[..., :3].mean()
    # light passes polarizer B then A (camera-side): I = 1/2 cos^2(dtheta)
    assert np.isclose(vals[0.0], 0.5, atol=0.02), vals
    assert np.isclose(vals[45.0], 0.25, atol=0.02), vals
    assert np.isclose(vals[90.0], 0.0, atol=0.02), vals


def test_stokes_aov_polarized_state(variant_scalar_rgb):
    """One horizontal polarizer: the S1 AOV equals S0 (DOP 1)."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform as T
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "stokes", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 5.0,
                   "to_world": T.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 4, "height": 4,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "pol": {"type": "rectangle", "to_world": T.translate([0, 0, 1]),
                "bsdf": {"type": "polarizer", "theta": 0.0}},
        "light": {"type": "rectangle",
                  "to_world": T.translate([0, 0, -1]) @ T.scale(3.0),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [1.0, 1.0, 1.0]}}},
    })
    state = scene.integrator.render(scene, seed=0, develop=False)
    from mitsuba2_tpu.render.film import ImageBlock
    film = scene.sensors[0].film
    block = ImageBlock(film.crop_size, 3 + 9, film.rfilter)
    img = np.asarray(block.develop(state))
    S0 = img[..., 0]
    S1 = img[..., 3]
    assert np.allclose(S0, 0.5, atol=0.02)
    assert np.allclose(np.abs(S1), S0, atol=0.02), (S0.mean(), S1.mean())
