"""Differentiable rendering + optimizers.

Parity: src/python/python/autodiff.py — ``render(scene, spp, unbiased,
optimizer, sensor_index)`` (autodiff.py:121), ``Optimizer/SGD/Adam``
(autodiff.py:197,240,309). Enoki's autodiff tape becomes ``jax.grad``
through the wavefront renderer; intersections are detached like
HitComputeFlags::NonDifferentiable (scene_optix.inl:432-440).

Typical loop::

    params = traverse(scene).keep([key])
    opt = Adam(params, lr=0.05)
    for it in range(100):
        loss, grads, image = render_loss(
            scene, params,
            lambda img: jnp.mean((img - ref) ** 2), spp=4, seed=it)
        opt.step(grads)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .util import traverse, ParameterMap  # noqa: F401 (re-export)


def render(scene, spp=None, seed=0, sensor_index=0, params=None,
           values=None, unbiased=False, seed_grad=None):
    """Differentiable render. With ``params``+``values``, the image is a
    function of the traced ``values`` dict.

    unbiased=True decorrelates the primal and derivative estimates
    (autodiff.py:153,176-186): value comes from ``seed``, gradients from
    ``seed_grad`` — removes the correlation bias at ~2x cost."""
    sensor = scene.sensors[sensor_index]
    integrator = scene.integrator
    sampler = sensor.sampler
    if spp is None:
        spp = sampler.sample_count

    def render_once(vals, s):
        def go():
            from ..render.film import ImageBlock
            film = sensor.film
            w, h = film.crop_size
            integrator._differentiable = True  # scan-based bounce loop
            try:
                data = integrator.render_wavefront(
                    scene, sensor, sampler, jnp.uint32(s), jnp.uint32(0),
                    spp, spp)
            finally:
                integrator._differentiable = False
            block = ImageBlock((w, h), 3 + len(integrator.aov_names()),
                               film.rfilter)
            state = block.create()._replace(data=data)
            return block.develop(state)

        if params is not None and vals is not None:
            with params.bind(vals):
                return go()
        return go()

    if not unbiased:
        return render_once(values, seed)
    if seed_grad is None:
        seed_grad = seed + 0x9E37
    primal = jax.lax.stop_gradient(render_once(values, seed))
    deriv = render_once(values, seed_grad)
    return primal + (deriv - jax.lax.stop_gradient(deriv))


def render_loss(scene, params: ParameterMap, loss_fn, spp=4, seed=0,
                unbiased=False, sensor_index=0):
    """-> (loss, grads dict, image). The jit-compiled inverse-rendering
    step."""
    values = params.to_dict()

    def f(vals):
        img = render(scene, spp=spp, seed=seed, sensor_index=sensor_index,
                     params=params, values=vals, unbiased=unbiased)
        return loss_fn(img), img

    (loss, img), grads = jax.value_and_grad(f, has_aux=True)(values)
    return loss, grads, img


def render_loss_rb(scene, params: ParameterMap, loss_fn, spp=4, seed=0,
                   sensor_index=0, spp_primal=None):
    """-> (loss, grads dict, image), gradients via the radiative-backprop
    path-replay adjoint (models/rb.py) instead of taping the renderer —
    memory stays bounded in path depth. The scene's integrator must be
    ``rb`` (or any PathIntegrator subclass; an RB shim is built around it).
    """
    from ..models.rb import RBIntegrator
    integrator = scene.integrator
    if not isinstance(integrator, RBIntegrator):
        rb = RBIntegrator()
        rb.max_depth = integrator.max_depth
        rb.rr_depth = getattr(integrator, "rr_depth", 5)
        rb.hide_emitters = getattr(integrator, "hide_emitters", False)
        integrator = rb

    # primal image (detached) -> loss and its image-space gradient. The
    # primal must see the CURRENT parameter values as traced jit arguments
    # (a plain integrator.render would bake the first iteration's params
    # into its cached executable and the adjoint direction would go stale).
    values = params.to_dict()
    cache = getattr(integrator, "_rb_primal_cache", None)
    if cache is None:
        cache = integrator._rb_primal_cache = {}
    pk = (id(scene), sensor_index, spp_primal or spp,
          tuple(sorted(values)))
    if pk not in cache:
        def primal(vals, s):
            return render(scene, spp=spp_primal or spp, seed=s,
                          sensor_index=sensor_index, params=params,
                          values=vals)
        cache[pk] = jax.jit(primal)
    img = jax.lax.stop_gradient(cache[pk](values, jnp.uint32(seed)))
    loss, grad_image = jax.value_and_grad(loss_fn)(img)

    # adjoint pass with a decorrelated seed (unbiased gradient estimate)
    grads = integrator.render_backward(
        scene, params, values, grad_image, seed=seed + 0x51,
        spp=spp, sensor_index=sensor_index)
    return loss, grads, img


class Optimizer:
    """(autodiff.py:197) base optimizer over a ParameterMap."""

    def __init__(self, params: ParameterMap, lr: float):
        self.params = params
        self.lr = lr

    def step(self, grads: dict):
        raise NotImplementedError

    def _apply(self, key, new_value):
        self.params[key] = new_value

    def finish(self):
        self.params.update()


class SGD(Optimizer):
    """(autodiff.py:240) stochastic gradient descent with optional
    momentum."""

    def __init__(self, params, lr, momentum=0.0):
        super().__init__(params, lr)
        self.momentum = momentum
        self.state = {k: jnp.zeros_like(v) for k, v in params.items()} \
            if momentum != 0 else {}

    def step(self, grads):
        for k in list(self.params.keys()):
            g = grads.get(k)
            if g is None:
                continue
            if self.momentum != 0:
                self.state[k] = self.momentum * self.state[k] + g
                g = self.state[k]
            self._apply(k, self.params[k] - self.lr * g)
        self.params.update()


class Adam(Optimizer):
    """(autodiff.py:309) Adam with bias correction."""

    def __init__(self, params, lr, beta_1=0.9, beta_2=0.999, epsilon=1e-8):
        super().__init__(params, lr)
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.t = 0
        self.m = {k: jnp.zeros_like(v) for k, v in params.items()}
        self.v = {k: jnp.zeros_like(v) for k, v in params.items()}

    def step(self, grads):
        self.t += 1
        lr_t = self.lr * (1 - self.beta_2 ** self.t) ** 0.5 \
            / (1 - self.beta_1 ** self.t)
        for k in list(self.params.keys()):
            g = grads.get(k)
            if g is None:
                continue
            self.m[k] = self.beta_1 * self.m[k] + (1 - self.beta_1) * g
            self.v[k] = self.beta_2 * self.v[k] + (1 - self.beta_2) * g * g
            self._apply(k, self.params[k] - lr_t * self.m[k]
                        / (jnp.sqrt(self.v[k]) + self.epsilon))
        self.params.update()

    # -- checkpointing (no reference counterpart; SURVEY.md §5) ----------------
    def state_dict(self):
        return {"t": self.t, "m": self.m, "v": self.v,
                "params": self.params.to_dict()}

    def load_state_dict(self, state):
        self.t = state["t"]
        self.m = dict(state["m"])
        self.v = dict(state["v"])
        for k, val in state["params"].items():
            self.params[k] = val
        self.params.update()
