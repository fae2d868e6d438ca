"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 — multi-chip logic tested with forced host device count)."""

import numpy as np
import pytest

import jax


def _cornell(w=16, h=16, spp=16, max_depth=3):
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    return load_dict(cornell_box_dict(width=w, height=h, spp=spp,
                                      max_depth=max_depth))


def test_sample_sharded_matches_single_chip(variant_scalar_rgb):
    """Sample-axis sharding is bit-equivalent to the single-chip render with
    the same total spp (stateless RNG keys depend only on (pixel, sample))."""
    from mitsuba2_tpu.parallel.mesh import render_multichip, default_mesh
    scene = _cornell(spp=16)
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = default_mesh(jax.devices()[:8])
    img_mc = np.asarray(render_multichip(scene, seed=0, spp=16, mesh=mesh))
    img_sc = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    assert np.allclose(img_mc, img_sc, atol=2e-5), \
        np.abs(img_mc - img_sc).max()


def test_pixel_sharded_matches_single_chip(variant_scalar_rgb):
    from mitsuba2_tpu.parallel.mesh import (render_multichip_pixel_sharded,
                                            default_mesh)
    scene = _cornell(w=16, h=16, spp=8)
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = default_mesh(jax.devices()[:8])
    img_px = np.asarray(render_multichip_pixel_sharded(scene, seed=0, spp=8,
                                                       mesh=mesh))
    img_sc = np.asarray(scene.integrator.render(scene, seed=0, spp=8))
    assert np.allclose(img_px, img_sc, atol=2e-5), \
        np.abs(img_px - img_sc).max()


def test_graft_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    g.dryrun_multichip(min(8, len(jax.devices())))
