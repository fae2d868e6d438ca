"""Radiative backprop / path-replay adjoint (models/rb.py)."""

import numpy as np
import jax
import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.python.util import traverse
from mitsuba2_tpu.python.autodiff import render_loss, render_loss_rb, Adam
from mitsuba2_tpu.python.test.scenes import furnace_dict, cornell_box_dict


def _furnace_params(spp=16):
    scene = mi.load_dict(furnace_dict(albedo=0.5, env_radiance=1.0,
                                      width=6, height=6, spp=spp,
                                      max_depth=3))
    params = traverse(scene)
    key = [k for k in params.keys() if "reflectance.value" in k][0]
    params.keep([key])
    return scene, params, key


def test_rb_analytic_gradient(variant_scalar_rgb):
    """Same closed-form check as the taped path: for the directly-lit
    furnace plane, d(mean image)/d(albedo_c) ~ 1/3."""
    scene, params, key = _furnace_params()
    loss, grads, img = render_loss_rb(
        scene, params, lambda im: jnp.mean(im), spp=16, seed=0)
    g = np.asarray(grads[key])
    assert g.shape == (3,)
    assert np.allclose(g, 1.0 / 3.0, atol=0.07), g


def test_rb_matches_taped_estimator(variant_scalar_rgb):
    """RB and tape-based AD estimate the same gradient (cornell box,
    red-wall albedo, L2 loss against a darker render)."""
    scene = mi.load_dict(cornell_box_dict(width=16, height=16, spp=8,
                                          max_depth=3))
    params = traverse(scene)
    key = [k for k in params.keys()
           if k == "left.bsdf.reflectance.value"][0]
    params.keep([key])

    def loss_fn(im):
        return jnp.mean((im - 0.1) ** 2)

    _, g_tape, _ = render_loss(scene, params, loss_fn, spp=32, seed=3)
    _, g_rb, _ = render_loss_rb(scene, params, loss_fn, spp=32, seed=3)
    gt = np.asarray(g_tape[key])
    gr = np.asarray(g_rb[key])
    assert gt.shape == gr.shape == (3,)
    # independent MC estimators: agree in sign and to ~35% relative where
    # the gradient is significant
    scale = np.abs(gt).max()
    assert scale > 0
    np.testing.assert_allclose(gr, gt, atol=0.35 * scale)


def test_rb_adam_converges(variant_scalar_rgb):
    """A few RB-driven Adam steps move the albedo toward the target."""
    scene, params, key = _furnace_params(spp=8)
    target = jnp.asarray([0.2, 0.6, 0.4], jnp.float32)
    params[key] = target
    params.update()
    from mitsuba2_tpu.python.autodiff import render
    ref = jax.lax.stop_gradient(render(scene, spp=64, seed=99))
    start = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    params[key] = start
    params.update()

    opt = Adam(params, lr=0.1)
    losses = []
    for it in range(8):
        loss, grads, _ = render_loss_rb(
            scene, params, lambda im: jnp.mean((im - ref) ** 2),
            spp=8, seed=it)
        losses.append(float(loss))
        opt.step(grads)
        opt.finish()
    final = np.asarray(params[key])
    assert losses[-1] < losses[0] * 0.5, losses
    assert np.abs(final - np.asarray(target)).mean() \
        < np.abs(np.asarray(start) - np.asarray(target)).mean() * 0.6


def test_rb_plugin_registered(variant_scalar_rgb):
    integ = mi.load_dict({"type": "rb", "max_depth": 4})
    from mitsuba2_tpu.models.rb import RBIntegrator
    assert isinstance(integ, RBIntegrator)
    integ2 = mi.load_dict({"type": "prb"})
    assert isinstance(integ2, RBIntegrator)


def test_rb_emitter_gradient(variant_scalar_rgb):
    """Gradients also flow into emitter radiance through the replay's
    attached emitter evals."""
    scene = mi.load_dict(cornell_box_dict(width=12, height=12, spp=8,
                                          max_depth=3))
    params = traverse(scene)
    key = "light.emitter.radiance.value"
    params.keep([key])
    _, grads, _ = render_loss_rb(scene, params,
                                 lambda im: jnp.mean(im), spp=16, seed=0)
    g = np.asarray(grads[key])
    assert np.all(g > 0), g  # brighter light -> brighter image
