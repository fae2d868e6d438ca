"""Radiative backprop / path-replay adjoint rendering.

Role in the reference: the Enoki autodiff variants tape every wavefront op
(SURVEY.md §2 "Autodiff"), which is memory-unbounded in path depth; the
radiative-backprop family replaces the tape with adjoint transport. The
TPU-native formulation here is path REPLAY: two lockstep passes over the
same RNG stream —

1. a detached pass computing each lane's total radiance ``L``;
2. a replay pass that re-walks the identical trajectory, keeping the
   *transport* (throughput, directions, intersections, MIS, RR) detached
   and attaching only the local differentiable factors (BSDF evals,
   BSDF-sample weights, emitter radiances). Each multiplicative factor
   ``w`` contributes the surrogate term ``w * detach(tail / w)`` where
   ``tail`` is the radiance that factor scales — so the surrogate's
   gradient equals the differential-path-tracing estimator, while its
   tape holds only per-bounce local-shading subgraphs (O(1) in scene
   complexity, tiny per depth) instead of the full transport tape.

Discontinuous (visibility/silhouette) derivatives are out of scope, as in
the reference autodiff integrators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..render.bsdf import BSDFContext, BSDFFlags
from ..render.integrator import mis_weight
from ..render.records import DirectionSample
from ..variants import current as current_variant
from .integrators import PathIntegrator

_sg = jax.lax.stop_gradient


def _ratio(att, det, tail):
    """Per-channel surrogate term: att * detach(tail/det) where det > 0."""
    det = _sg(det)
    safe = jnp.where(det > 1e-12, det, 1.0)
    return jnp.where(det > 1e-12, att * _sg(tail / safe), 0.0)


@register_plugin("integrator", "rb")
class RBIntegrator(PathIntegrator):
    """Path-replay radiative backprop (registered as ``rb``, alias
    ``prb``). Renders like ``path`` in the forward direction; gradients
    flow through :meth:`render_backward` / python.autodiff.render_rb."""

    def replay(self, scene, sampler, state, ray, L_total, active=True):
        """Replay pass: same RNG stream and trajectory as
        PathIntegrator.sample, returning the surrogate spectrum whose
        gradient w.r.t. bound scene parameters is the RB estimate."""
        n = ray.o.shape[0]
        dt = ray.o.dtype
        nch = current_variant().n_channels
        ctx = BSDFContext()
        L_total = _sg(L_total)

        active = jnp.broadcast_to(jnp.asarray(active), (n,))
        si = scene.ray_intersect(ray, active)

        one = jnp.ones_like(ray.o[..., 0])
        throughput = jnp.ones((n, nch), dt) * one[..., None]
        result = jnp.zeros((n, nch), dt) * one[..., None]
        surr = jnp.zeros((n, nch), dt) * one[..., None]
        eta = one

        # depth-1 emission: attached through the emitter's radiance params
        e0 = scene.eval_emitter(si, ray.d, active)
        surr = surr + jnp.where(active[..., None], e0, 0.0)
        result = result + _sg(jnp.where(active[..., None], e0, 0.0))
        active = active & si.is_valid()

        smooth_flag = jnp.uint32(int(BSDFFlags.Smooth))

        def cond(carry):
            depth, active = carry[0], carry[1]
            return (depth < self.max_depth) & jnp.any(active)

        def body(carry):
            (depth, active, si, ray_d, throughput, result, surr, eta,
             state) = carry

            rr_u, state = sampler.next_1d(state)
            q = jnp.minimum(jnp.max(_sg(throughput), axis=-1) * m.sqr(eta),
                            0.95)
            do_rr = depth > self.rr_depth
            cont = ~do_rr | (rr_u < q)
            active = active & cont
            throughput = jnp.where(
                do_rr, throughput * m.safe_div(1.0, q, 0.0)[..., None],
                throughput)

            # --- NEE: attach the BSDF eval and the emitter value ---------
            flags = scene.bsdf_flags_at(si)
            active_e = active & ((flags & smooth_flag) != 0)
            em_sample, state = sampler.next_2d(state)
            ds, emitter_val = scene.sample_emitter_direction(
                si, em_sample, True, active_e)
            active_e = active_e & (_sg(ds.pdf) != 0)
            wo = si.to_local(ds.d)
            bsdf_val = scene.bsdf_eval(ctx, si, wo, active_e)
            bsdf_pdf = _sg(scene.bsdf_pdf(ctx, si, wo, active_e))
            mis = _sg(jnp.where(ds.delta, 1.0,
                                mis_weight(_sg(ds.pdf), bsdf_pdf)))
            c_nee = mis[..., None] * _sg(throughput) * bsdf_val * emitter_val
            c_nee = jnp.where(active_e[..., None], c_nee, 0.0)
            surr = surr + c_nee
            result = result + _sg(c_nee)

            # --- BSDF sampling: the weight scales ALL later radiance -----
            b1, state = sampler.next_1d(state)
            b2, state = sampler.next_2d(state)
            bs, bsdf_weight = scene.bsdf_sample(ctx, si, b1, b2, active)
            tail = _sg(L_total - result)      # radiance still downstream
            surr = surr + jnp.where(
                active[..., None], _ratio(bsdf_weight, bsdf_weight, tail),
                0.0)
            throughput = _sg(throughput * jnp.where(active[..., None],
                                                    bsdf_weight, 1.0))
            active = active & jnp.any(throughput != 0.0, axis=-1)
            eta = jnp.where(active, eta * _sg(bs.eta), eta)

            new_ray = si.spawn_ray(si.to_world(_sg(bs.wo)))
            si_next = scene.ray_intersect(new_ray, active)

            ds_next = DirectionSample(
                p=si_next.p, n=si_next.n, uv=si_next.uv, time=si_next.time,
                pdf=jnp.zeros((n,), dt), delta=jnp.zeros((n,), bool),
                d=new_ray.d,
                dist=jnp.where(si_next.is_valid(), si_next.t, jnp.inf),
                emitter_idx=scene.emitter_index_at(si_next))
            delta_lobe = (bs.sampled_type
                          & jnp.uint32(int(BSDFFlags.Delta))) != 0
            emitter_pdf = jnp.where(
                (ds_next.emitter_idx >= 0) & ~delta_lobe,
                _sg(scene.pdf_emitter_direction(si, ds_next, active)), 0.0)
            ew = _sg(mis_weight(_sg(bs.pdf), emitter_pdf))

            emitted = scene.eval_emitter(si_next, new_ray.d, active)
            c_emit = jnp.where(active[..., None],
                               ew[..., None] * throughput * emitted, 0.0)
            surr = surr + c_emit
            result = result + _sg(c_emit)

            active = active & si_next.is_valid()
            return (depth + 1, active, si_next, new_ray.d, throughput,
                    result, surr, eta, state)

        carry = (jnp.int32(1), active, si, ray.d, throughput, result, surr,
                 eta, state)
        depth_cap = min(self.max_depth, 32)

        # remat: the reverse pass re-executes each bounce instead of taping
        # its intermediates — the memory-bounded property of RB
        body_ckpt = jax.checkpoint(body)

        def scan_body(c, _):
            return jax.lax.cond(cond(c), body_ckpt, lambda c_: c_, c), None

        carry, _ = jax.lax.scan(scan_body, carry, None, length=depth_cap)
        return carry[6]

    # -- adjoint entry point ------------------------------------------------
    def render_backward(self, scene, params, values, grad_image, seed=0,
                        spp=4, sensor_index=0):
        """RB gradient of ``sum(image * grad_image)`` w.r.t. ``values``
        (the role of the reference's render_backward adjoint API). Returns
        a dict of gradients matching ``values``.

        The whole adjoint (detached pass + replay + grad) is jitted ONCE
        per (scene, sensor, spp) with the parameter values, gradient image
        and seed as traced arguments — param updates between optimizer
        steps never go stale inside the compiled executable."""
        import mitsuba2_tpu.core.spectrum as spec_mod

        sensor = scene.sensors[sensor_index] \
            if isinstance(sensor_index, int) else sensor_index
        sampler = sensor.sampler
        film = sensor.film
        w, h = film.crop_size
        n_pixels = w * h
        n = n_pixels * spp
        var = current_variant()
        dt = var.dtype

        cache = getattr(self, "_adj_cache", None)
        if cache is None:
            cache = self._adj_cache = {}
        ck = (id(scene), id(sensor), spp, tuple(sorted(values)))

        if ck not in cache:
            def adjoint_objective(vals, gi_flat, s):
                # lane -> pixel mapping and ray generation, mirroring
                # render_wavefront (the replay must consume the same RNG
                # stream as the detached pass)
                lane = jnp.arange(n, dtype=jnp.uint32)
                pixel_id = lane // jnp.uint32(spp)
                sample_id = lane % jnp.uint32(spp)
                px = (pixel_id % jnp.uint32(w)).astype(dt)
                py = (pixel_id // jnp.uint32(w)).astype(dt)
                state0 = sampler.seed(s, pixel_id, sample_id)
                jitter, state = sampler.next_2d(state0)
                pos01 = (jnp.stack([px, py], -1) + jitter) \
                    / jnp.asarray([w, h], dt)
                ap_sample, state = sampler.next_2d(state)
                _, state = sampler.next_1d(state)      # time
                wav_sample, state = sampler.next_1d(state)
                ray, ray_weight = sensor.sample_ray(
                    sensor.shutter_open, wav_sample, pos01, ap_sample, True)
                adj = gi_flat[pixel_id.astype(jnp.int32)] / spp      # (n,3)

                with params.bind(vals):
                    # pass 1: detached per-lane totals (same bound values,
                    # fully stop-gradiented)
                    spec, _, _ = PathIntegrator.sample(
                        self, scene, sampler, state, ray)
                    L_total = _sg(spec)
                    surr = self.replay(scene, sampler, state, ray, L_total)
                surr = surr * _sg(ray_weight)
                if var.is_spectral:
                    xyz = spec_mod.spectrum_to_xyz(surr, ray.wavelengths)
                    rgb = spec_mod.xyz_to_srgb(xyz)
                elif var.is_monochromatic:
                    rgb = jnp.repeat(surr, 3, axis=-1)
                else:
                    rgb = surr
                return jnp.sum(rgb * adj)

            cache[ck] = jax.jit(jax.grad(adjoint_objective))

        gi = jnp.asarray(grad_image, dt).reshape(n_pixels, -1)[:, :3]
        return cache[ck](values, gi, jnp.uint32(seed))


# reference-era alias: path-replay backprop
register_plugin("integrator", "prb")(RBIntegrator)
