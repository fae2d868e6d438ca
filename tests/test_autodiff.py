"""Differentiable rendering tests (parity: reference inverse-rendering smoke
tests, SURVEY.md §4.5 + BASELINE config 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_traverse_parameter_map(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    scene = mi.load_dict(cornell_box_dict(width=8, height=8, spp=4))
    params = traverse(scene)
    keys = [k for k in params.keys() if "reflectance" in k]
    assert len(keys) >= 5  # walls + boxes
    # update round trip
    k = keys[0]
    old = np.asarray(params[k])
    params[k] = jnp.asarray([0.9, 0.1, 0.1], jnp.float32)
    params.update()
    assert np.allclose(np.asarray(params[k]), [0.9, 0.1, 0.1])
    params[k] = jnp.asarray(old)
    params.update()


def test_grad_through_render(variant_scalar_rgb):
    """d(image)/d(albedo) is positive for the directly-lit furnace plane."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.autodiff import render_loss
    from mitsuba2_tpu.python.test.scenes import furnace_dict
    scene = mi.load_dict(furnace_dict(albedo=0.5, env_radiance=1.0,
                                      width=6, height=6, spp=16,
                                      max_depth=3))
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params.keep([key])
    loss, grads, img = render_loss(
        scene, params, lambda im: jnp.mean(im), spp=16, seed=0)
    g = np.asarray(grads[key])
    assert g.shape == (3,)
    # d(mean over pixels AND channels)/d(albedo_c) ~ env/3 = 1/3
    assert np.allclose(g, 1.0 / 3.0, atol=0.07), g


def test_texture_recovery_adam(variant_scalar_rgb):
    """End-to-end inverse rendering: recover a wall albedo with Adam
    (BASELINE config: 'texture/BSDF optimization converges')."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.autodiff import render_loss, render, Adam
    from mitsuba2_tpu.python.test.scenes import furnace_dict

    target_albedo = jnp.asarray([0.2, 0.5, 0.7], jnp.float32)
    scene = mi.load_dict(furnace_dict(albedo=0.5, env_radiance=1.0,
                                      width=8, height=8, spp=8,
                                      max_depth=3))
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params.keep([key])

    # reference image with the target albedo
    params[key] = target_albedo
    params.update()
    ref = jax.lax.stop_gradient(render(scene, spp=64, seed=99))

    # reset to a wrong initialization
    params[key] = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    params.update()

    opt = Adam(params, lr=0.08)
    losses = []
    for it in range(24):
        loss, grads, img = render_loss(
            scene, params, lambda im: jnp.mean((im - ref) ** 2),
            spp=8, seed=it)
        opt.step(grads)
        # keep albedo physical
        params[key] = jnp.clip(params[key], 0.0, 1.0)
        params.update()
        losses.append(float(loss))

    final = np.asarray(params[key])
    assert losses[-1] < 0.25 * losses[0], losses
    assert np.abs(final - np.asarray(target_albedo)).max() < 0.08, final


def test_unbiased_mode_runs(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.autodiff import render_loss
    from mitsuba2_tpu.python.test.scenes import furnace_dict
    scene = mi.load_dict(furnace_dict(albedo=0.4, env_radiance=1.0,
                                      width=4, height=4, spp=4, max_depth=2))
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params.keep([key])
    loss, grads, img = render_loss(scene, params, lambda im: jnp.mean(im),
                                   spp=4, seed=0, unbiased=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads[key])).all()


def test_bitmap_texture_gradients(variant_scalar_rgb):
    """Per-texel gradients flow through bilinear bitmap lookups."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.transform import Transform
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.autodiff import render_loss
    tex = np.full((4, 4, 3), 0.5, np.float32)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": Transform.look_at([0, 2, 0.01], [0, 0, 0],
                                                 [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "plane": {"type": "rectangle",
                  "to_world": Transform.rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse", "reflectance": 0.5}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
    })
    # swap in an in-memory bitmap (the dict path requires a filename)
    from mitsuba2_tpu.models.textures import BitmapTexture
    scene.shapes[0].bsdf.reflectance = BitmapTexture(data=tex)
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.data" in k][0]
    params.keep([key])
    loss, grads, img = render_loss(scene, params, lambda im: jnp.mean(im),
                                   spp=8, seed=0)
    g = np.asarray(grads[key])
    assert g.shape == (16, 3)
    assert (g > 0).sum() > 8  # most visible texels receive gradient


def test_param_update_invalidates_render_cache(variant_scalar_rgb):
    """Regression: integrator.render() caches a compiled pass; a
    params.update() must not serve an image rendered with the old values
    (the executable baked them in as constants)."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.test.scenes import furnace_dict
    scene = mi.load_dict(furnace_dict(albedo=0.2, env_radiance=1.0,
                                      width=6, height=6, spp=8,
                                      max_depth=2))
    img_a = np.asarray(scene.integrator.render(scene, seed=0))
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params.keep([key])
    params[key] = jnp.asarray([0.9, 0.9, 0.9])
    params.update()
    img_b = np.asarray(scene.integrator.render(scene, seed=0))
    assert img_b.mean() > img_a.mean() * 2, (
        "render() returned a stale image after params.update()")
