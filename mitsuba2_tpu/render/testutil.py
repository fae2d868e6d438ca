"""Test adapters (parity: chi2.py BSDFAdapter/PhaseFunctionAdapter and
src/python/python/test/scenes.py fixture scenes)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.frame import Frame
from ..render.bsdf import BSDFContext
from ..render.interaction import SurfaceInteraction


def dummy_si(n, wi=(0, 0, 1), dtype=jnp.float32, n_wav=0):
    wi = m.normalize(jnp.asarray(wi, dtype))
    z = jnp.zeros((n, 3), dtype)
    frame = Frame(jnp.broadcast_to(jnp.asarray([1.0, 0, 0], dtype), (n, 3)),
                  jnp.broadcast_to(jnp.asarray([0, 1.0, 0], dtype), (n, 3)),
                  jnp.broadcast_to(jnp.asarray([0, 0, 1.0], dtype), (n, 3)))
    return SurfaceInteraction(
        t=jnp.ones((n,), dtype), p=z, n=frame.n, sh_frame=frame,
        uv=jnp.full((n, 2), 0.5, dtype),
        wi=jnp.broadcast_to(wi, (n, 3)),
        dp_du=frame.s, dp_dv=frame.t,
        shape_idx=jnp.zeros((n,), jnp.int32),
        prim_idx=jnp.zeros((n,), jnp.int32),
        wavelengths=jnp.full((n, n_wav), 550.0, dtype),
        time=jnp.zeros((n,), dtype),
        bsdf_idx=jnp.zeros((n,), jnp.int32),
        emitter_idx=jnp.full((n,), -1, jnp.int32))


def make_bsdf_adapter(bsdf_type, extra: dict | None = None, wi=(0, 0, 1),
                      ctx=None):
    """-> (sample_func(u3), pdf_func(wo)) for the chi2 harness."""
    from ..core.dictio import load_dict
    d = {"type": bsdf_type}
    d.update(extra or {})
    bsdf = load_dict(d)
    ctx = ctx or BSDFContext()

    def sample_func(u):
        n = u.shape[0]
        si = dummy_si(n, wi, u.dtype)
        u1 = u[..., 2] if u.shape[-1] > 2 else jnp.zeros((n,), u.dtype)
        bs, value = bsdf.sample(ctx, si, u1, u[..., :2], jnp.ones((n,), bool))
        # zero-valued samples drop out via histogram weights
        # (reference chi2.py BSDFAdapter:516-519)
        w = jnp.where(jnp.all(value == 0, axis=-1), 0.0, 1.0)
        return bs.wo, w

    def pdf_func(wo):
        n = wo.shape[0]
        si = dummy_si(n, wi, wo.dtype)
        return bsdf.pdf(ctx, si, wo, jnp.ones((n,), bool))

    return sample_func, pdf_func


def make_phase_adapter(phase_type, extra: dict | None = None, wi=(0, 0, 1)):
    from ..core.dictio import load_dict
    d = {"type": phase_type}
    d.update(extra or {})
    phase = load_dict(d)

    class _MI:
        pass

    def mi_for(n, dtype):
        mi = _MI()
        mi.wi = jnp.broadcast_to(m.normalize(jnp.asarray(wi, dtype)), (n, 3))
        return mi

    def sample_func(u):
        mi = mi_for(u.shape[0], u.dtype)
        wo, pdf = phase.sample(mi, u[..., :2])
        return wo

    def pdf_func(wo):
        mi = mi_for(wo.shape[0], wo.dtype)
        return phase.eval(mi, wo)

    return sample_func, pdf_func
