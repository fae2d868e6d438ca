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


def _slab_test(ray_o, ray_d, mint, tmax_cap, lo, hi):
    """Ray/AABB overlap on the active [mint, tmax_cap] segment — the
    culling primitive of the BVH-leaf chunks (role of kd-tree node tests,
    kdtree.h:2079). lo/hi: (3,)."""
    safe_d = jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, 1e-12)
    inv = 1.0 / safe_d
    t0 = (lo[None, :] - ray_o) * inv
    t1 = (hi[None, :] - ray_o) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_far >= t_near) & (t_far >= mint) & (t_near <= tmax_cap)


def ray_intersect_packets(tri_v0, tri_e1, tri_e2, ray_o, ray_d, mint, maxt,
                          face_chunk: int = FACE_CHUNK,
                          chunk_bounds=None):
    """Closest hit over all faces. Returns PreliminaryIntersection with
    prim_idx into the packed face table (shape resolution happens in Scene).

    chunk_bounds: optional (n_chunks, 6) AABBs of each face chunk (BVH leaf
    order, ops/bvh.py) — chunks whose box misses EVERY ray's live segment
    are skipped entirely via lax.cond; the carried best-t tightens the
    segment as the scan proceeds (ordered-traversal flavor)."""
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
    use_bounds = chunk_bounds is not None and n_chunks > 1
    if use_bounds:
        assert chunk_bounds.shape == (n_chunks, 6), chunk_bounds.shape

    init = (jnp.full((n,), jnp.inf, dt),              # best t
            jnp.zeros((n, 2), dt),                    # best (u, v)
            jnp.full((n,), -1, jnp.int32))            # best face

    def compute(carry, cv0, ce1, ce2, base):
        best_t, best_uv, best_f = carry
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
        return (best_t, best_uv, best_f)

    def step(carry, inputs):
        if not use_bounds:
            cv0, ce1, ce2, base = inputs
            return compute(carry, cv0, ce1, ce2, base), None
        cv0, ce1, ce2, base, bounds = inputs
        cap = jnp.minimum(maxt, carry[0])
        any_hit = jnp.any(_slab_test(ray_o, ray_d, mint, cap,
                                     bounds[:3], bounds[3:]))
        carry = jax.lax.cond(
            any_hit,
            lambda c: compute(c, cv0, ce1, ce2, base),
            lambda c: c, carry)
        return carry, None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk
    if n_chunks == 1:
        (best_t, best_uv, best_f) = compute(init, v0[0], e1[0], e2[0],
                                            bases[0])
    else:
        xs = (v0, e1, e2, bases) if not use_bounds \
            else (v0, e1, e2, bases, chunk_bounds)
        (best_t, best_uv, best_f), _ = jax.lax.scan(step, init, xs)
    return PreliminaryIntersection(
        t=best_t, prim_uv=best_uv,
        shape_idx=jnp.full_like(best_f, -1),  # resolved by Scene
        prim_idx=best_f)


def ray_test_packets(tri_v0, tri_e1, tri_e2, ray_o, ray_d, mint, maxt,
                     face_chunk: int = FACE_CHUNK, chunk_bounds=None):
    """Any-hit occlusion query (scene.h ray_test)."""
    if tri_v0.shape[0] == 0:
        return jnp.zeros((ray_o.shape[0],), bool)
    (v0, e1, e2), n_faces = _pad_faces([tri_v0, tri_e1, tri_e2], face_chunk)
    n_chunks = v0.shape[0] // face_chunk
    v0 = v0.reshape(n_chunks, face_chunk, 3)
    e1 = e1.reshape(n_chunks, face_chunk, 3)
    e2 = e2.reshape(n_chunks, face_chunk, 3)
    n = ray_o.shape[0]
    use_bounds = chunk_bounds is not None and n_chunks > 1

    def compute(hit, cv0, ce1, ce2, base):
        t, _, _, valid = moller_trumbore(ray_o, ray_d, cv0, ce1, ce2)
        face_ids = base + jax.lax.broadcasted_iota(jnp.int32, (face_chunk,), 0)
        valid &= (t >= mint[:, None]) & (t <= maxt[:, None]) \
            & (face_ids < n_faces)[None, :]
        return hit | jnp.any(valid, axis=-1)

    def step(hit, inputs):
        if not use_bounds:
            cv0, ce1, ce2, base = inputs
            return compute(hit, cv0, ce1, ce2, base), None
        cv0, ce1, ce2, base, bounds = inputs
        # unoccluded lanes are the only ones that still matter
        cap = jnp.where(hit, -jnp.inf, maxt)
        any_hit = jnp.any(_slab_test(ray_o, ray_d, mint, cap,
                                     bounds[:3], bounds[3:]))
        return jax.lax.cond(
            any_hit, lambda h: compute(h, cv0, ce1, ce2, base),
            lambda h: h, hit), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk
    if n_chunks == 1:
        return compute(jnp.zeros((n,), bool), v0[0], e1[0], e2[0], bases[0])
    xs = (v0, e1, e2, bases) if not use_bounds \
        else (v0, e1, e2, bases, chunk_bounds)
    hit, _ = jax.lax.scan(step, jnp.zeros((n,), bool), xs)
    return hit
