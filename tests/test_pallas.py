"""Pallas/MXU intersector tests (interpret mode on the CPU rig)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _scene_geom():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    scene = load_dict(cornell_box_dict(width=8, height=8, spp=4))
    return scene, scene.geom


def test_woop_matches_scan(variant_scalar_rgb):
    from mitsuba2_tpu.ops.intersect_pallas import WoopIntersector
    from mitsuba2_tpu.ops.intersect import ray_intersect_packets
    scene, g = _scene_geom()
    rs = np.random.RandomState(0)
    n = 512
    o = (rs.rand(n, 3).astype(np.float32) - 0.5) * 1.8
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.zeros(n, np.float32)
    maxt = np.full(n, np.inf, np.float32)
    pi = ray_intersect_packets(g.v0, g.e1, g.e2, jnp.asarray(o),
                               jnp.asarray(d), jnp.asarray(mint),
                               jnp.asarray(maxt))
    wi = WoopIntersector(g.v0, g.e1, g.e2, interpret=True)
    t2, uv2, idx2 = wi(jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
                       jnp.asarray(maxt))
    t1 = np.asarray(pi.t)
    t2 = np.asarray(t2)
    assert (np.isfinite(t1) == np.isfinite(t2)).all()
    both = np.isfinite(t1)
    # tolerance = the split-bf16 Woop transform's design accuracy
    # (~2^-16 relative on unit-scale geometry, ops/megakernel.py _dot3)
    assert np.abs(t1[both] - t2[both]).max() < 3e-5
    # same face except equal-t edge ties
    same = np.asarray(pi.prim_idx) == np.asarray(idx2)
    assert (same | ~both).mean() > 0.99
    sb = same & both
    assert np.abs(np.asarray(pi.prim_uv)[sb] - np.asarray(uv2)[sb]).max() \
        < 5e-5


def test_woop_respects_maxt(variant_scalar_rgb):
    from mitsuba2_tpu.ops.intersect_pallas import WoopIntersector
    scene, g = _scene_geom()
    wi = WoopIntersector(g.v0, g.e1, g.e2, interpret=True)
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    mint = jnp.zeros(2)
    maxt = jnp.asarray([jnp.inf, 0.5])  # back wall at z=-1 is 1.0 away
    t, uv, idx = wi(o, d, mint, maxt)
    t = np.asarray(t)
    assert np.isclose(t[0], 1.0, atol=1e-5)
    assert np.isinf(t[1])


def test_woop_degenerate_triangles(variant_scalar_rgb):
    from mitsuba2_tpu.ops.intersect_pallas import WoopIntersector
    v0 = np.asarray([[0, 0, 0], [0, 0, -2]], np.float32)
    e1 = np.asarray([[1, 0, 0], [0, 0, 0]], np.float32)  # 2nd is degenerate
    e2 = np.asarray([[0, 1, 0], [0, 0, 0]], np.float32)
    wi = WoopIntersector(v0, e1, e2, interpret=True)
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, uv, idx = wi(o, d, jnp.zeros(1), jnp.full(1, jnp.inf))
    assert np.isclose(float(t[0]), 1.0, atol=1e-5)
    assert int(idx[0]) == 0
