#!/usr/bin/env python
"""Offline culling study for the HBM BVH tier (262k-face bumpy sphere).

Simulates the megakernel's tile-uniform ordered BVH walk in numpy and
reports, per tile size, the mean number of leaf sweeps a tile performs
for (a) camera rays and (b) diffuse bounce rays sorted by the kernel's
octant-first morton key. Also reports the per-ray ideal (each ray
traversing alone with its own tightening cap) — the kd-tree work bound
(kdtree.h:2079) the tile walk should approach.

CPU-only; no TPU needed.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

# the JAX_PLATFORMS env var is IGNORED when the axon TPU plugin is
# installed; the config API reliably forces the CPU backend (otherwise
# scene loading hangs on the tunnel)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_scene(nu=512, nv=257):
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
    scene = mi.load_dict(bumpy_sphere_dict(width=64, height=64, spp=1,
                                           max_depth=2, nu=nu, nv=nv))
    return scene


def leaf_tables(scene, leaf_chunks=2, chunk=128):
    from mitsuba2_tpu.ops.bvh import chunk_bounds
    from mitsuba2_tpu.ops.megakernel import _build_range_bvh
    g = scene.geom
    v0 = np.asarray(g.v0)
    e1 = np.asarray(g.e1)
    e2 = np.asarray(g.e2)
    F = v0.shape[0]
    step = leaf_chunks * chunk
    Fp = int(np.ceil(F / step)) * step
    cb = chunk_bounds(v0, e1, e2, chunk)
    n_chunks = Fp // chunk
    cab = np.zeros((n_chunks, 6), np.float32)
    cab[:, 0:3] = np.inf
    cab[:, 3:6] = -np.inf
    cab[:len(cb)] = cb
    n_leaves = n_chunks // leaf_chunks
    lb = cab.reshape(n_leaves, leaf_chunks, 6)
    llo = lb[:, :, 0:3].min(1)
    lhi = lb[:, :, 3:6].max(1)
    nodes, ab = _build_range_bvh(
        np.concatenate([llo, lhi], 1).astype(np.float64))
    ab = ab.reshape(-1)     # kernel-side flat SMEM layout
    # pad face arrays to Fp
    pad = Fp - F
    v0p = np.concatenate([v0, np.zeros((pad, 3), np.float32)])
    e1p = np.concatenate([e1, np.zeros((pad, 3), np.float32)])
    e2p = np.concatenate([e2, np.zeros((pad, 3), np.float32)])
    return nodes, ab, (v0p, e1p, e2p), n_leaves, step


def tri_hits(v0, e1, e2, o, d, mint, maxt):
    """Moller-Trumbore: (n_tri, n_ray) t or +inf."""
    pv = np.cross(d[None, :, :], e2[:, None, :])          # (T, R, 3)
    det = np.einsum('tc,trc->tr', e1, pv)
    ok = np.abs(det) > 1e-12
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = o[None, :, :] - v0[:, None, :]
    u = np.einsum('trc,trc->tr', tv, pv) * inv
    qv = np.cross(tv, e1[:, None, :])
    v = np.einsum('rc,trc->tr', d, qv) * inv
    t = np.einsum('tc,trc->tr', e2, qv) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > mint) & (t < maxt)
    return np.where(ok, t, np.inf)


def traverse_tile(nodes, ab, tris, step, o, d):
    """Ordered tile-union PAIR-NODE walk with cap tightening via actual
    leaf sweeps (mirrors megakernel._bvh_traverse). Returns leaves
    swept."""
    v0, e1, e2 = tris
    R = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    best = np.full(R, np.inf)
    dpos = (inv.sum(0) >= 0.0)
    stack = [0]
    swept = 0

    def box_live(box):
        with np.errstate(invalid="ignore"):
            ta = (box[0:3][None] - o) * inv
            tb = (box[3:6][None] - o) * inv
            tn = np.minimum(ta, tb).max(1)
            tf = np.maximum(ta, tb).min(1)
            return bool(((tf >= tn) & (tf >= 0) & (tn <= best)).any())

    def sweep(lf):
        nonlocal best, swept
        swept += 1
        f0 = lf * step
        t = tri_hits(v0[f0:f0 + step], e1[f0:f0 + step],
                     e2[f0:f0 + step], o, d, 1e-4, best[None, :])
        best = np.minimum(best, t.min(0))

    while stack:
        nid = stack.pop()
        row = nodes[nid]
        la = box_live(row[0:6])
        lb = box_live(row[6:12])
        a, b, axis, alow = ab[4 * nid:4 * nid + 4]
        near_a = (alow > 0) == dpos[axis]
        near, far = ((a, la), (b, lb)) if near_a else ((b, lb), (a, la))
        for ref, live in (far, near):      # far first -> near pops next
            if live and ref >= 0:
                stack.append(ref)
        for ref, live in (near, far):      # near leaf sweeps first
            if live and ref < 0:
                sweep(-ref - 1)
    return swept


def spread3(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def sort_key(o, d, lo, hi):
    inv_ext = 255.0 / np.maximum(hi - lo, 1e-20)
    q = [spread3(np.clip((o[:, ax] - lo[ax]) * inv_ext[ax], 0, 255)
                 .astype(np.int64)) for ax in range(3)]
    octant = ((d[:, 0] > 0) + 2 * (d[:, 1] > 0) + 4 * (d[:, 2] > 0)
              ).astype(np.int64)
    morton = (q[0] << 2) | (q[1] << 1) | q[2]
    return (octant << 27) | morton


def main():
    rng = np.random.default_rng(0)
    scene = build_scene()
    leaf_chunks = int(os.environ.get("SIM_LEAF_CHUNKS", "2"))
    nodes, ab, tris, n_leaves, step = leaf_tables(scene, leaf_chunks)
    print(f"faces={tris[0].shape[0]} leaves={n_leaves} "
          f"leaf_size={step}")
    lo, hi = scene.bbox()
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)

    # camera rays for a 256x256 render
    sensor = scene.sensors[0]
    M = np.asarray(sensor.world_transform.matrix, np.float32)
    tan_half = np.tan(np.deg2rad(sensor.x_fov) * 0.5)
    W = H = 256
    spp = 32
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    px = np.repeat(px.ravel(), 1)
    py = np.repeat(py.ravel(), 1)
    sx = (px + 0.5) / W
    sy = (py + 0.5) / H
    cx = -(2 * sx - 1) * tan_half
    cy = (1 - 2 * sy) * tan_half
    ln = 1.0 / np.sqrt(cx * cx + cy * cy + 1.0)
    dl = np.stack([cx * ln, cy * ln, ln], -1)
    d = dl @ M[:3, :3].T
    o = np.broadcast_to(M[:3, 3], d.shape).copy()

    def study(o, d, label, tile_sizes=(8, 16, 32, 64, 128, 256, 512,
                                       1024), n_tiles=24):
        n = o.shape[0]
        for ts in tile_sizes:
            picks = rng.choice(n // ts, size=min(n_tiles, n // ts),
                               replace=False)
            counts = [traverse_tile(nodes, ab, tris, step,
                                    o[p * ts:(p + 1) * ts],
                                    d[p * ts:(p + 1) * ts])
                      for p in picks]
            print(f"{label:14s} tile={ts:5d}: leaves swept "
                  f"mean={np.mean(counts):7.1f} max={np.max(counts)}")
        # per-ray ideal on a few rays
        ridx = rng.choice(n, size=48, replace=False)
        ideal = [traverse_tile(nodes, ab, tris, step, o[r:r + 1],
                               d[r:r + 1]) for r in ridx]
        print(f"{label:14s} per-ray ideal: mean={np.mean(ideal):6.1f} "
              f"max={np.max(ideal)}")

    study(o, d, "primary")

    # bounce-1 rays: brute-hit via the BVH itself, cosine resample,
    # then the kernel's octant-first morton sort
    sub = rng.choice(o.shape[0], size=65536, replace=False)
    ob, db = o[sub], d[sub]
    v0, e1, e2 = tris
    best = np.full(len(sub), np.inf)
    # full traversal per 1024-chunk to get true hits
    for s0 in range(0, len(sub), 1024):
        sl = slice(s0, s0 + 1024)
        inv = 1.0 / np.where(np.abs(db[sl]) > 1e-12, db[sl], 1e-12)
        bb = best[sl]

        def blive(box):
            with np.errstate(invalid="ignore"):
                ta = (box[0:3][None] - ob[sl]) * inv
                tb = (box[3:6][None] - ob[sl]) * inv
                tn = np.minimum(ta, tb).max(1)
                tf = np.maximum(ta, tb).min(1)
                return bool(((tf >= tn) & (tf >= 0) & (tn <= bb)).any())

        stack = [0]
        while stack:
            nid = stack.pop()
            row = nodes[nid]
            for ref, live in ((ab[4 * nid], blive(row[0:6])),
                              (ab[4 * nid + 1], blive(row[6:12]))):
                if not live:
                    continue
                if ref >= 0:
                    stack.append(ref)
                else:
                    f0 = (-ref - 1) * step
                    t = tri_hits(v0[f0:f0 + step], e1[f0:f0 + step],
                                 e2[f0:f0 + step], ob[sl], db[sl], 1e-4,
                                 bb[None, :])
                    bb = np.minimum(bb, t.min(0))
        best[sl] = bb
    hit = np.isfinite(best)
    hp = ob[hit] + best[hit, None] * db[hit]
    # approximate normals: sphere-ish (normalize hp) — good enough for
    # direction statistics
    nrm = hp / np.linalg.norm(hp, axis=1, keepdims=True)
    u1 = rng.random(len(hp))
    u2 = rng.random(len(hp))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx = r * np.cos(phi)
    lyy = r * np.sin(phi)
    lz = np.sqrt(np.maximum(1 - u1, 0))
    t0 = np.where(np.abs(nrm[:, 0:1]) > 0.9,
                  np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    tang = np.cross(nrm, t0)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    bit = np.cross(nrm, tang)
    db2 = (lx[:, None] * tang + lyy[:, None] * bit + lz[:, None] * nrm)
    ob2 = hp + 1e-4 * nrm
    key = sort_key(ob2, db2, lo, hi)
    order = np.argsort(key)
    study(ob2[order], db2[order], "bounce1-sorted")


if __name__ == "__main__":
    main()
