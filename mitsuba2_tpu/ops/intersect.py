"""Ray-triangle intersection kernels.

Role of the reference's kd-tree / Embree / OptiX backends (kdtree.h:2079,
scene_embree.inl, scene_optix.inl) — re-designed for TPU:

- ``ray_intersect_packets``: fully vectorized Moller-Trumbore over
  (ray_chunk x face_chunk) tiles driven by ``lax.scan`` so XLA fuses the
  broadcast-elementwise-reduce chain without materializing N*F temporaries.
- A Woop-transform formulation that maps the inner product work onto the MXU
  lives in ops/intersect_pallas.py (fused Pallas kernel).
- For large scenes a two-level BVH restricts the candidate set (ops/bvh.py).

All kernels are exact Moller-Trumbore (mesh.h:180-195 semantics): barycentric
(u, v), one-sided epsilon on the determinant only (both-sided hit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..render.interaction import PreliminaryIntersection

# faces processed per scan step — bounds the fused tile working set
FACE_CHUNK = 512


def _pad_faces(arrs, chunk):
    f = arrs[0].shape[0]
    pad = (-f) % chunk
    if pad == 0:
        return arrs, f
    out = []
    for a in arrs:
        pad_width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad_width))
    return out, f


def moller_trumbore(o, d, v0, e1, e2, det_eps=1e-9):
    """Batched intersection: rays (N,3) x triangles (C,3) -> t,u,v,valid of
    shape (N,C). Two-sided."""
    o = o[:, None, :]
    d = d[:, None, :]
    v0 = v0[None, :, :]
    e1 = e1[None, :, :]
    e2 = e2[None, :, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > det_eps, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = ((jnp.abs(det) > det_eps) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0))
    return t, u, v, valid


def ray_intersect_packets(tri_v0, tri_e1, tri_e2, ray_o, ray_d, mint, maxt,
                          face_chunk: int = FACE_CHUNK):
    """Closest hit over all faces. Returns PreliminaryIntersection with
    prim_idx into the packed face table (shape resolution happens in Scene).
    """
    n = ray_o.shape[0]
    dt = ray_o.dtype
    if tri_v0.shape[0] == 0:  # empty scene: every ray misses
        return PreliminaryIntersection(
            t=jnp.full((n,), jnp.inf, dt),
            prim_uv=jnp.zeros((n, 2), dt),
            shape_idx=jnp.full((n,), -1, jnp.int32),
            prim_idx=jnp.full((n,), -1, jnp.int32))
    (v0, e1, e2), n_faces = _pad_faces([tri_v0, tri_e1, tri_e2], face_chunk)
    n_chunks = v0.shape[0] // face_chunk
    v0 = v0.reshape(n_chunks, face_chunk, 3)
    e1 = e1.reshape(n_chunks, face_chunk, 3)
    e2 = e2.reshape(n_chunks, face_chunk, 3)

    init = (jnp.full((n,), jnp.inf, dt),              # best t
            jnp.zeros((n, 2), dt),                    # best (u, v)
            jnp.full((n,), -1, jnp.int32))            # best face

    def step(carry, inputs):
        best_t, best_uv, best_f = carry
        cv0, ce1, ce2, base = inputs
        t, u, v, valid = moller_trumbore(ray_o, ray_d, cv0, ce1, ce2)
        face_ids = base + jax.lax.broadcasted_iota(jnp.int32,
                                                   (face_chunk,), 0)
        valid &= (t >= mint[:, None]) & (t <= maxt[:, None]) \
            & (face_ids < n_faces)[None, :]
        t = jnp.where(valid, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        closer = tk < best_t
        uk = jnp.take_along_axis(u, k[:, None], axis=-1)[:, 0]
        vk = jnp.take_along_axis(v, k[:, None], axis=-1)[:, 0]
        best_uv = jnp.where(closer[:, None],
                            jnp.stack([uk, vk], axis=-1), best_uv)
        best_f = jnp.where(closer, base + k, best_f)
        best_t = jnp.minimum(best_t, tk)
        return (best_t, best_uv, best_f), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk
    if n_chunks == 1:
        (best_t, best_uv, best_f), _ = step(init, (v0[0], e1[0], e2[0],
                                                   bases[0]))
    else:
        (best_t, best_uv, best_f), _ = jax.lax.scan(
            step, init, (v0, e1, e2, bases))
    return PreliminaryIntersection(
        t=best_t, prim_uv=best_uv,
        shape_idx=jnp.full_like(best_f, -1),  # resolved by Scene
        prim_idx=best_f)


def ray_test_packets(tri_v0, tri_e1, tri_e2, ray_o, ray_d, mint, maxt,
                     face_chunk: int = FACE_CHUNK):
    """Any-hit occlusion query (scene.h ray_test)."""
    if tri_v0.shape[0] == 0:
        return jnp.zeros((ray_o.shape[0],), bool)
    (v0, e1, e2), n_faces = _pad_faces([tri_v0, tri_e1, tri_e2], face_chunk)
    n_chunks = v0.shape[0] // face_chunk
    v0 = v0.reshape(n_chunks, face_chunk, 3)
    e1 = e1.reshape(n_chunks, face_chunk, 3)
    e2 = e2.reshape(n_chunks, face_chunk, 3)
    n = ray_o.shape[0]

    def step(carry, inputs):
        hit = carry
        cv0, ce1, ce2, base = inputs
        t, _, _, valid = moller_trumbore(ray_o, ray_d, cv0, ce1, ce2)
        face_ids = base + jax.lax.broadcasted_iota(jnp.int32, (face_chunk,), 0)
        valid &= (t >= mint[:, None]) & (t <= maxt[:, None]) \
            & (face_ids < n_faces)[None, :]
        return hit | jnp.any(valid, axis=-1), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk
    if n_chunks == 1:
        hit, _ = step(jnp.zeros((n,), bool), (v0[0], e1[0], e2[0], bases[0]))
        return hit
    hit, _ = jax.lax.scan(step, jnp.zeros((n,), bool), (v0, e1, e2, bases))
    return hit
