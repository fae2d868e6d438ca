"""Integrator plugins (reference: src/integrators/ — path, direct, depth,
aov, moment, stokes, volpath, volpathmis; SURVEY.md §2.3).

The path tracer mirrors path.cpp:92-234 (NEE + BSDF sampling with power-2
MIS, RR after rr_depth) as a `lax.while_loop` over masked SoA wavefront
state — the reference's CUDA wavefront (integrator.cpp:140-172) without the
JIT-tracing indirection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.object import register_plugin
from ..core import math as m
from ..core.ray import Ray
from ..render.bsdf import BSDFContext, BSDFFlags
from ..render.integrator import (SamplingIntegrator, MonteCarloIntegrator,
                                 mis_weight)
from ..render.records import DirectionSample
from ..variants import current as current_variant


@register_plugin("integrator", "path")
class PathIntegrator(MonteCarloIntegrator):
    """MIS path tracer (path.cpp:92-234)."""

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        n = ray.o.shape[0]
        dt = ray.o.dtype
        nch = current_variant().n_channels
        ctx = BSDFContext()

        active = jnp.broadcast_to(jnp.asarray(active), (n,))
        si = scene.ray_intersect(ray, active)
        valid_ray = si.is_valid()

        # derive from ray data so the values carry shard_map's 'varying'
        # type and the while_loop carry stays type-stable under pjit
        one = jnp.ones_like(ray.o[..., 0])
        throughput = jnp.ones((n, nch), dt) * one[..., None]
        result = jnp.zeros((n, nch), dt) * one[..., None]
        eta = one

        # first emitter hit (depth-1 emission, path.cpp:127-129)
        result = result + jnp.where(
            active[..., None], scene.eval_emitter(si, ray.d, active), 0.0)
        active = active & si.is_valid()

        smooth_flag = jnp.uint32(int(BSDFFlags.Smooth))

        def cond(carry):
            depth, active = carry[0], carry[1]
            return (depth < self.max_depth) & jnp.any(active)

        def body(carry):
            (depth, active, si, ray_d, throughput, result, eta, state) = carry

            # --- russian roulette (path.cpp:133-141) ---
            rr_u, state = sampler.next_1d(state)
            q = jnp.minimum(jnp.max(throughput, axis=-1) * m.sqr(eta), 0.95)
            do_rr = depth > self.rr_depth
            cont = ~do_rr | (rr_u < q)
            active = active & cont
            throughput = jnp.where(do_rr,
                                   throughput * m.safe_div(1.0, q, 0.0)[..., None],
                                   throughput)

            # --- emitter sampling / NEE (path.cpp:152-173) ---
            flags = scene.bsdf_flags_at(si)
            active_e = active & ((flags & smooth_flag) != 0)
            em_sample, state = sampler.next_2d(state)
            ds, emitter_val = scene.sample_emitter_direction(
                si, em_sample, True, active_e)
            active_e = active_e & (ds.pdf != 0)
            wo = si.to_local(ds.d)
            bsdf_val = scene.bsdf_eval(ctx, si, wo, active_e)
            bsdf_pdf = scene.bsdf_pdf(ctx, si, wo, active_e)
            mis = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf))
            contrib = mis[..., None] * throughput * bsdf_val * emitter_val
            result = result + jnp.where(active_e[..., None], contrib, 0.0)

            # --- BSDF sampling (path.cpp:177-208) ---
            b1, state = sampler.next_1d(state)
            b2, state = sampler.next_2d(state)
            bs, bsdf_weight = scene.bsdf_sample(ctx, si, b1, b2, active)
            throughput = throughput * jnp.where(active[..., None],
                                                bsdf_weight, 1.0)
            active = active & jnp.any(throughput != 0.0, axis=-1)
            eta = jnp.where(active, eta * bs.eta, eta)

            new_ray = si.spawn_ray(si.to_world(bs.wo))
            si_next = scene.ray_intersect(new_ray, active)

            # emitter-hit MIS weight for the NEXT vertex
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
                scene.pdf_emitter_direction(si, ds_next, active), 0.0)
            emission_weight = mis_weight(bs.pdf, emitter_pdf)

            emitted = scene.eval_emitter(si_next, new_ray.d, active)
            result = result + jnp.where(
                active[..., None],
                emission_weight[..., None] * throughput * emitted, 0.0)

            active = active & si_next.is_valid()
            return (depth + 1, active, si_next, new_ray.d, throughput,
                    result, eta, state)

        carry = (jnp.int32(1), active, si, ray.d, throughput, result, eta,
                 state)
        carry = jax.lax.while_loop(cond, body, carry)
        result = carry[5]
        return result, valid_ray, []


@register_plugin("integrator", "depth")
class DepthIntegrator(SamplingIntegrator):
    """(depth.cpp) distance to the first hit."""

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        si = scene.ray_intersect(ray, active)
        nch = current_variant().n_channels
        valid = si.is_valid()
        depth = jnp.where(valid, si.t, 0.0)
        return jnp.repeat(depth[..., None], nch, axis=-1), valid, []


@register_plugin("integrator", "direct")
class DirectIntegrator(SamplingIntegrator):
    """(direct.cpp:1-226) direct illumination with MIS between
    `emitter_samples` and `bsdf_samples` strategies."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        if p is not None and (p.has_property("shading_samples")):
            ss = p.int_("shading_samples")
            self.emitter_samples = ss
            self.bsdf_samples = ss
        else:
            self.emitter_samples = p.int_("emitter_samples", 1) if p else 1
            self.bsdf_samples = p.int_("bsdf_samples", 1) if p else 1
        self.weight_em = 1.0 / max(self.emitter_samples, 1)
        self.weight_bsdf = 1.0 / max(self.bsdf_samples, 1)
        frac = self.bsdf_samples / max(self.emitter_samples
                                       + self.bsdf_samples, 1)
        self.frac_bsdf = frac
        self.frac_lum = 1.0 - frac

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        n = ray.o.shape[0]
        dt = ray.o.dtype
        nch = current_variant().n_channels
        ctx = BSDFContext()
        active = jnp.broadcast_to(jnp.asarray(active), (n,))
        si = scene.ray_intersect(ray, active)
        valid_ray = si.is_valid()
        result = jnp.where(active[..., None],
                           scene.eval_emitter(si, ray.d, active), 0.0)
        active = active & si.is_valid()

        flags = scene.bsdf_flags_at(si)
        smooth = (flags & jnp.uint32(int(BSDFFlags.Smooth))) != 0

        # emitter sampling strategies
        for _ in range(self.emitter_samples):
            em_sample, state = sampler.next_2d(state)
            active_e = active & smooth
            ds, emitter_val = scene.sample_emitter_direction(
                si, em_sample, True, active_e)
            active_e = active_e & (ds.pdf != 0)
            wo = si.to_local(ds.d)
            bsdf_val = scene.bsdf_eval(ctx, si, wo, active_e)
            bsdf_pdf = scene.bsdf_pdf(ctx, si, wo, active_e)
            mis = jnp.where(ds.delta, 1.0,
                            _mis_w(ds.pdf * self.frac_lum,
                                   bsdf_pdf * self.frac_bsdf))
            contrib = mis[..., None] * bsdf_val * emitter_val * self.weight_em
            result = result + jnp.where(active_e[..., None], contrib, 0.0)

        # bsdf sampling strategies
        for _ in range(self.bsdf_samples):
            b1, state = sampler.next_1d(state)
            b2, state = sampler.next_2d(state)
            bs, bsdf_weight = scene.bsdf_sample(ctx, si, b1, b2, active)
            active_b = active & jnp.any(bsdf_weight != 0, axis=-1)
            new_ray = si.spawn_ray(si.to_world(bs.wo))
            si_next = scene.ray_intersect(new_ray, active_b)
            emitted = scene.eval_emitter(si_next, new_ray.d, active_b)
            ds = DirectionSample(
                p=si_next.p, n=si_next.n, uv=si_next.uv, time=si_next.time,
                pdf=jnp.zeros((n,), dt), delta=jnp.zeros((n,), bool),
                d=new_ray.d,
                dist=jnp.where(si_next.is_valid(), si_next.t, jnp.inf),
                emitter_idx=scene.emitter_index_at(si_next))
            delta_lobe = (bs.sampled_type
                          & jnp.uint32(int(BSDFFlags.Delta))) != 0
            emitter_pdf = jnp.where(
                (ds.emitter_idx >= 0) & ~delta_lobe,
                scene.pdf_emitter_direction(si, ds, active_b), 0.0)
            mis = jnp.where(delta_lobe, 1.0,
                            _mis_w(bs.pdf * self.frac_bsdf,
                                   emitter_pdf * self.frac_lum))
            contrib = mis[..., None] * bsdf_weight * emitted * self.weight_bsdf
            result = result + jnp.where(active_b[..., None], contrib, 0.0)

        return result, valid_ray, []


def _mis_w(pdf_a, pdf_b):
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    return m.safe_div(pdf_a, pdf_a + pdf_b, 0.0)


@register_plugin("integrator", "aov")
class AOVIntegrator(SamplingIntegrator):
    """(aov.cpp) arbitrary output variables: geometric quantities of the
    first intersection plus any nested integrators' outputs.

    ``aovs`` property: comma-separated "name:type" pairs with types
    depth, position, uv, geo_normal, sh_normal, prim_index, shape_index
    (aov.cpp's type list)."""

    TYPES = ("depth", "position", "uv", "geo_normal", "sh_normal",
             "dp_du", "dp_dv", "prim_index", "shape_index")

    def __init__(self, props=None):
        super().__init__(props)
        self.outputs = []       # (name, type)
        self.nested = []
        if props is not None:
            spec = props.string("aovs", "")
            for item in [x for x in spec.split(",") if x.strip()]:
                name, _, typ = item.partition(":")
                typ = typ.strip()
                if typ not in self.TYPES:
                    raise ValueError(f"unknown AOV type {typ!r}; "
                                     f"supported: {self.TYPES}")
                self.outputs.append((name.strip(), typ))
            for _, obj in props.objects():
                if getattr(obj, "plugin_category", "") == "integrator":
                    self.nested.append(obj)

    def aov_names(self):
        names = []
        for name, typ in self.outputs:
            k = {"depth": 1, "uv": 2, "prim_index": 1, "shape_index": 1}.get(
                typ, 3)
            if k == 1:
                names.append(name)
            else:
                names.extend(f"{name}.{c}" for c in "xyz"[:k])
        for i, nested in enumerate(self.nested):
            names.extend([f"nested_{i}.{c}" for c in "rgb"]
                         + nested.aov_names())
        return names

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        si = scene.ray_intersect(ray, active)
        valid = si.is_valid()
        aovs = []
        for name, typ in self.outputs:
            if typ == "depth":
                aovs.append(jnp.where(valid, si.t, 0.0))
            elif typ == "position":
                aovs.extend(si.p[..., i] for i in range(3))
            elif typ == "uv":
                aovs.extend(si.uv[..., i] for i in range(2))
            elif typ == "geo_normal":
                aovs.extend(si.n[..., i] for i in range(3))
            elif typ == "sh_normal":
                aovs.extend(si.sh_frame.n[..., i] for i in range(3))
            elif typ == "dp_du":
                aovs.extend(si.dp_du[..., i] for i in range(3))
            elif typ == "dp_dv":
                aovs.extend(si.dp_dv[..., i] for i in range(3))
            elif typ == "prim_index":
                aovs.append(si.prim_idx.astype(si.t.dtype))
            elif typ == "shape_index":
                aovs.append(si.shape_idx.astype(si.t.dtype))
        n = ray.o.shape[0]
        nch = current_variant().n_channels
        result = jnp.zeros((n, nch), ray.o.dtype)
        for nested in self.nested:
            r, v, sub_aovs = nested.sample(scene, sampler, state, ray,
                                           medium, active)
            result = result + r  # nested rgb also mirrored into aovs
            aovs.extend(r[..., i] for i in range(min(3, r.shape[-1])))
            if r.shape[-1] < 3:
                aovs.extend([r[..., 0]] * (3 - r.shape[-1]))
            aovs.extend(sub_aovs)
        if self.nested:
            result = result / len(self.nested)
        return result, valid, aovs


@register_plugin("integrator", "moment")
class MomentIntegrator(SamplingIntegrator):
    """(moment.cpp) second moments of nested integrators — used to produce
    the variance images consumed by the golden-image z-tests
    (test_renders.py:64-80)."""

    def __init__(self, props=None):
        super().__init__(props)
        self.nested = []
        if props is not None:
            for _, obj in props.objects():
                if getattr(obj, "plugin_category", "") == "integrator":
                    self.nested.append(obj)
        if not self.nested:
            raise RuntimeError("moment integrator needs nested integrators")

    def aov_names(self):
        names = []
        for i, nested in enumerate(self.nested):
            names.extend([f"m2_{i}.{c}" for c in "rgb"])
        return names

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        n = ray.o.shape[0]
        nch = current_variant().n_channels
        result = jnp.zeros((n, nch), ray.o.dtype)
        valid = jnp.zeros((n,), bool)
        aovs = []
        for nested in self.nested:
            r, v, _ = nested.sample(scene, sampler, state, ray, medium,
                                    active)
            result = result + r
            valid = valid | v
            r3 = r if r.shape[-1] == 3 else jnp.repeat(r[..., :1], 3, -1)
            sq = r3 * r3
            aovs.extend(sq[..., i] for i in range(3))
        result = result / len(self.nested)
        return result, valid, aovs
