"""Fused TPU intersection kernel (role of the OptiX launch,
scene_optix.inl:380-520 — redesigned for the MXU).

Design: each triangle gets a precomputed Woop affine transform mapping
(origin, direction) into unit-triangle space, so intersection becomes six
thin matmuls per (ray-tile x face-chunk):

    U = [o,1] @ Wu,  V = [o,1] @ Wv,  Z = [o,1] @ Wz      (R,4)x(4,C)
    DU = [d,0] @ Wu, DV = [d,0] @ Wv, DZ = [d,0] @ Wz

    t = -Z/DZ; u = U + t*DU; v = V + t*DV
    hit iff u>=0, v>=0, u+v<=1, t in [mint,maxt]

The grid streams face chunks while the per-ray running minimum stays in VMEM
(grid dim 1 revisits the same output block), so the (R,C) intermediates never
touch HBM — the fusion the XLA scan version can't guarantee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256
FACE_CHUNK = 128
_BIG = 3.0e38



def _split_bf16(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot3(a, b):
    """~f32-accurate matmul from 3 bf16 MXU passes (see megakernel._dot3:
    Mosaic's DEFAULT single bf16 pass loses ~1% of the geometry, HIGHEST
    costs 6 passes)."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    p = jax.lax.Precision.DEFAULT   # intentionally 1-pass bf16 per product
    return (jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32,
                    precision=p)
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32,
                      precision=p)
            + jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32,
                      precision=p))


def build_woop(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Per-triangle world->unit-triangle affine transforms.

    Returns (Wu, Wv, Wz) each (4, F) float32: for homogeneous point
    ph = [p, 1], u = ph @ Wu[:, f] etc. Degenerate triangles map to
    never-hit transforms."""
    f = len(v0)
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1).astype(np.float64)   # (F,3,3)
    det = np.linalg.det(A)
    ok = np.abs(det) > 1e-18
    A_safe = np.where(ok[:, None, None], A, np.eye(3))
    M = np.linalg.inv(A_safe)                                # (F,3,3)
    # local = M @ (p - v0) -> rows of M give (u, v, w)
    trans = -np.einsum("fij,fj->fi", M, v0.astype(np.float64))  # (F,3)
    W = np.concatenate([np.swapaxes(M, 1, 2),                # (F,3,3): p part
                        trans[:, None, :]], axis=1)          # (F,4,3)
    W = np.where(ok[:, None, None], W, 0.0)
    # never-hit fallback: Z row forces t = +inf path (DZ=0, Z=1)
    W[~ok, 3, 2] = 1.0
    W = W.astype(np.float32)
    return (np.ascontiguousarray(W[:, :, 0].T),
            np.ascontiguousarray(W[:, :, 1].T),
            np.ascontiguousarray(W[:, :, 2].T))


def _isect_kernel(oh_ref, dh_ref, mint_ref, maxt_ref, wu_ref, wv_ref,
                  wz_ref, aabb_ref, tuv_ref, idx_ref, n_faces_ref):
    j = pl.program_id(1)
    C = wu_ref.shape[1]

    @pl.when(j == 0)
    def _():
        tuv_ref[:] = jnp.full(tuv_ref.shape, _BIG, jnp.float32)
        idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)

    oh = oh_ref[:]            # (R, 4)
    dh = dh_ref[:]            # (R, 4)
    mint = mint_ref[:]        # (R, 1)
    maxt = maxt_ref[:]

    # --- chunk-AABB slab culling (kd-tree node test, VPU prologue):
    # if NO ray in this tile reaches this BVH-leaf chunk's box within its
    # live [mint, min(maxt, best)] segment, skip the 6 MXU passes entirely
    # (whole table resident; a per-chunk (1, 8) block would violate the
    # sublane-divisibility rule once n_chunks > 1)
    box = aabb_ref[pl.ds(j, 1), :]                   # (1, 8)
    best_prev = tuv_ref[:, 0:1]
    cap = jnp.minimum(maxt, best_prev)               # (R, 1)
    t_near = mint * 0.0 - _BIG
    t_far = mint * 0.0 + _BIG
    for ax in range(3):
        o_a = oh[:, ax:ax + 1]
        d_a = dh[:, ax:ax + 1]
        inv = 1.0 / jnp.where(jnp.abs(d_a) > 1e-12, d_a, 1e-12)
        ta = (box[0, ax] - o_a) * inv
        tb = (box[0, 3 + ax] - o_a) * inv
        t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
        t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
    box_hit = (t_far >= t_near) & (t_far >= mint) & (t_near <= cap)
    n_live = jnp.sum(box_hit.astype(jnp.float32))

    @pl.when(n_live > 0.0)
    def _():
        wu = wu_ref[:]            # (4, C)
        wv = wv_ref[:]
        wz = wz_ref[:]
        U = _dot3(oh, wu)
        V = _dot3(oh, wv)
        Z = _dot3(oh, wz)
        DU = _dot3(dh, wu)
        DV = _dot3(dh, wv)
        DZ = _dot3(dh, wz)

        dz_ok = jnp.abs(DZ) > 1e-12
        inv_dz = jnp.where(dz_ok, 1.0 / jnp.where(DZ == 0, 1.0, DZ), 0.0)
        t = -Z * inv_dz
        u = U + t * DU
        v = V + t * DV
        face_ids = j * C + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        valid = (dz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t >= mint) & (t <= maxt)
                 & (face_ids < n_faces_ref[0]))
        t = jnp.where(valid, t, _BIG)

        best = tuv_ref[:, 0:1]                          # (R, 1)
        tmin = jnp.min(t, axis=1, keepdims=True)        # (R, 1)
        improved = tmin < best
        # index of the chunk minimum (first match)
        is_min = (t <= tmin) & valid
        big_idx = jnp.where(is_min, face_ids, jnp.int32(0x7FFFFFFF))
        k = jnp.min(big_idx, axis=1, keepdims=True)     # global face id
        pick = face_ids == k
        u_best = jnp.sum(jnp.where(pick, u, 0.0), axis=1, keepdims=True)
        v_best = jnp.sum(jnp.where(pick, v, 0.0), axis=1, keepdims=True)

        old = tuv_ref[:]
        new_tuv = jnp.concatenate([tmin, u_best, v_best], axis=1)
        tuv_ref[:] = jnp.where(improved, new_tuv, old)
        idx_ref[:] = jnp.where(improved, k, idx_ref[:])


@functools.partial(jax.jit, static_argnames=("n_faces", "interpret"))
def _pallas_intersect(oh, dh, mint, maxt, wu, wv, wz, aabb, n_faces: int,
                      interpret: bool = False):
    n = oh.shape[0]
    n_tiles = n // RAY_TILE
    n_chunks = wu.shape[1] // FACE_CHUNK
    grid = (n_tiles, n_chunks)
    tuv, idx = pl.pallas_call(
        functools.partial(_isect_kernel_wrapped, n_faces=n_faces),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_TILE, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((4, FACE_CHUNK), lambda i, j: (0, j)),
            pl.BlockSpec((4, FACE_CHUNK), lambda i, j: (0, j)),
            pl.BlockSpec((4, FACE_CHUNK), lambda i, j: (0, j)),
            pl.BlockSpec(aabb.shape, lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(oh, dh, mint[:, None], maxt[:, None], wu, wv, wz, aabb)
    return tuv, idx


def _isect_kernel_wrapped(oh_ref, dh_ref, mint_ref, maxt_ref, wu_ref,
                          wv_ref, wz_ref, aabb_ref, tuv_ref, idx_ref, *,
                          n_faces):
    class _Const:
        def __getitem__(self, _):
            return n_faces
    _isect_kernel(oh_ref, dh_ref, mint_ref, maxt_ref, wu_ref, wv_ref,
                  wz_ref, aabb_ref, tuv_ref, idx_ref, _Const())


class WoopIntersector:
    """Scene-level handle: holds the device Woop tables and dispatches rays
    through the fused kernel (role of the OptiX pipeline object)."""

    def __init__(self, v0, e1, e2, interpret: bool = False):
        wu, wv, wz = build_woop(np.asarray(v0), np.asarray(e1),
                                np.asarray(e2))
        self.n_faces = wu.shape[1]
        pad = (-self.n_faces) % FACE_CHUNK
        if pad:
            z = np.zeros((4, pad), np.float32)
            nh = np.zeros((4, pad), np.float32)
            nh[3] = 1.0  # Z=1, DZ=0 -> never hits
            wu = np.concatenate([wu, z], 1)
            wv = np.concatenate([wv, z], 1)
            wz = np.concatenate([wz, nh], 1)
        self.wu = jnp.asarray(wu)
        self.wv = jnp.asarray(wv)
        self.wz = jnp.asarray(wz)
        # chunk AABBs for the in-kernel slab culling (BVH-leaf order);
        # padded with inverted boxes so pad chunks are always skipped
        from .bvh import chunk_bounds
        cb = chunk_bounds(np.asarray(v0), np.asarray(e1), np.asarray(e2),
                          FACE_CHUNK)
        aabb = np.concatenate(
            [cb, np.zeros((cb.shape[0], 2), np.float32)], -1)
        # pad rows to a sublane multiple (whole table is VMEM-resident;
        # extra rows carry inverted boxes so they can never pass the test)
        rpad = (-aabb.shape[0]) % 8
        if rpad:
            inv = np.zeros((rpad, 8), np.float32)
            inv[:, 0:3] = np.inf
            inv[:, 3:6] = -np.inf
            aabb = np.concatenate([aabb, inv], 0)
        self.aabb = jnp.asarray(aabb)
        self.interpret = interpret

    def __call__(self, ray_o, ray_d, mint, maxt):
        """-> (t, uv, prim_idx) with t = inf on miss."""
        n = ray_o.shape[0]
        pad = (-n) % RAY_TILE
        dt = ray_o.dtype
        o = ray_o.astype(jnp.float32)
        d = ray_d.astype(jnp.float32)
        mn = mint.astype(jnp.float32)
        mx = maxt.astype(jnp.float32)
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)))
            mn = jnp.pad(mn, (0, pad))
            mx = jnp.pad(mx, (0, pad), constant_values=-1.0)
        oh = jnp.concatenate([o, jnp.ones((o.shape[0], 1), jnp.float32)], 1)
        dh = jnp.concatenate([d, jnp.zeros((d.shape[0], 1), jnp.float32)], 1)
        tuv, idx = _pallas_intersect(oh, dh, mn, mx, self.wu, self.wv,
                                     self.wz, self.aabb,
                                     n_faces=self.n_faces,
                                     interpret=self.interpret)
        t = tuv[:n, 0]
        t = jnp.where(t >= _BIG * 0.5, jnp.inf, t).astype(dt)
        return t, tuv[:n, 1:3].astype(dt), idx[:n, 0]
