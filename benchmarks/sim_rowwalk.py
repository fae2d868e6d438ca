#!/usr/bin/env python
"""Design study for the HBM BVH tier rework (round 5).

Compares, on the 262k-face bumpy sphere, for 1024-ray tiles split into
eight 128-ray rows:

  union : the shipping walk — ONE ordered pair-node traversal over the
          tile union; each leaf encounter sweeps only the rows whose
          per-row bitmask is live (megakernel._bvh_traverse).
  row   : eight INDEPENDENT per-row walks advanced in lockstep — each
          row pays only for ITS leaf overlap set; scalar iterations =
          max over rows of its walk length (the walks share one
          while_loop), DMA'd leaves = union of per-row encounters
          (2-slot pipeline, no cross-row reuse assumed -> upper bound).

for leaf sizes 64/128/256 faces. Reports the quantities the kernel's
cost model needs:

  pops        scalar while_loop iterations per tile-bounce
  leaves      leaf DMA starts per tile-bounce
  row_sweeps  (row x leaf) sweep launches -> VPU time ~ row_sweeps *
              (t0 + leaf_faces * ~0.8ns)
  ftest/ray   leaf_faces * row_sweeps / 1024 — the per-ray work bound
              (kdtree.h:2079 analogue)

CPU-only; no TPU needed.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sim_bvh_culling import (build_scene, leaf_tables, tri_hits,
                             sort_key)


def walk(nodes, ab, tris, step, o, d, row_ids, n_rows):
    """Ordered pair-node union walk with PER-ROW masks and caps.

    Returns (pops, leaf_encounters, row_sweeps, per-row sweep lists).
    """
    v0, e1, e2 = tris
    R = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    best = np.full(R, np.inf)
    dpos = (inv.sum(0) >= 0.0)
    stack = [0]
    pops = 0
    leaves = 0
    row_sweeps = 0

    def rowmask(box):
        with np.errstate(invalid="ignore"):
            ta = (box[0:3][None] - o) * inv
            tb = (box[3:6][None] - o) * inv
            tn = np.minimum(ta, tb).max(1)
            tf = np.maximum(ta, tb).min(1)
            hit = (tf >= tn) & (tf >= 0) & (tn <= best)
        m = np.zeros(n_rows, bool)
        for q in range(n_rows):
            m[q] = hit[row_ids == q].any()
        return m

    def sweep(lf, mask):
        nonlocal best, leaves, row_sweeps
        leaves += 1
        f0 = lf * step
        for q in range(n_rows):
            if not mask[q]:
                continue
            row_sweeps += 1
            sel = row_ids == q
            t = tri_hits(v0[f0:f0 + step], e1[f0:f0 + step],
                         e2[f0:f0 + step], o[sel], d[sel], 1e-4,
                         best[sel][None, :])
            best[sel] = np.minimum(best[sel], t.min(0))

    while stack:
        nid = stack.pop()
        pops += 1
        row = nodes[nid]
        ma = rowmask(row[0:6])
        mb = rowmask(row[6:12])
        a, b, axis, alow = ab[4 * nid:4 * nid + 4]
        near_a = (alow > 0) == dpos[axis]
        near, far = ((a, ma), (b, mb)) if near_a else ((b, mb), (a, ma))
        for ref, m in (far, near):
            if m.any() and ref >= 0:
                stack.append(ref)
        for ref, m in (near, far):
            if m.any() and ref < 0:
                sweep(-ref - 1, m)
    return pops, leaves, row_sweeps


def main():
    scene = build_scene()
    rng = np.random.default_rng(0)

    # primary rays (256x256) and bounce-1 sorted rays, as in
    # sim_bvh_culling.main
    sensor = scene.sensors[0]
    M = np.asarray(sensor.world_transform.matrix, np.float32)
    tan_half = np.tan(np.deg2rad(sensor.x_fov) * 0.5)
    W = H = 256
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    sx = (px.ravel() + 0.5) / W
    sy = (py.ravel() + 0.5) / H
    cx = -(2 * sx - 1) * tan_half
    cy = (1 - 2 * sy) * tan_half
    ln = 1.0 / np.sqrt(cx * cx + cy * cy + 1.0)
    dl = np.stack([cx * ln, cy * ln, ln], -1)
    d = dl @ M[:3, :3].T
    o = np.broadcast_to(M[:3, 3], d.shape).copy()
    lo, hi = scene.bbox()
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)

    ray_sets = {"primary": (o, d)}

    # bounce-1: hit points via one coarse sweep (reuse leaf tables at
    # 256), cosine hemisphere, octant-morton sort
    nodes0, ab0, tris0, _, step0 = leaf_tables(scene, 2, 128)
    sub = rng.choice(o.shape[0], size=16384, replace=False)
    ob, db = o[sub], d[sub]
    v0, e1, e2 = tris0
    best = np.full(len(sub), np.inf)
    for s0 in range(0, v0.shape[0], 4096):
        t = tri_hits(v0[s0:s0 + 4096], e1[s0:s0 + 4096],
                     e2[s0:s0 + 4096], ob, db, 1e-4, best[None, :])
        best = np.minimum(best, t.min(0))
    hit = np.isfinite(best)
    hp = ob[hit] + best[hit, None] * db[hit]
    nrm = hp / np.linalg.norm(hp, axis=1, keepdims=True)
    u1 = rng.random(len(hp))
    u2 = rng.random(len(hp))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lz = np.sqrt(np.maximum(1 - u1, 0))
    t0v = np.where(np.abs(nrm[:, 0:1]) > 0.9,
                   np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    tang = np.cross(nrm, t0v)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    bit = np.cross(nrm, tang)
    db2 = (r * np.cos(phi))[:, None] * tang \
        + (r * np.sin(phi))[:, None] * bit + lz[:, None] * nrm
    ob2 = hp + 1e-4 * nrm
    order = np.argsort(sort_key(ob2, db2, lo, hi))
    ray_sets["bounce1"] = (ob2[order], db2[order])

    TILE = 1024
    ROW = 128
    n_rows = TILE // ROW
    for leaf_chunks, chunk in ((1, 64), (1, 128), (2, 128)):
        nodes, ab, tris, n_leaves, step = leaf_tables(
            scene, leaf_chunks, chunk)
        print(f"--- leaf={step} faces ({n_leaves} leaves) ---")
        for label, (oo, dd) in ray_sets.items():
            n = oo.shape[0]
            picks = rng.choice(n // TILE, size=min(12, n // TILE),
                               replace=False)
            stats_u = []
            stats_r = []
            for p in picks:
                sl = slice(p * TILE, (p + 1) * TILE)
                ot, dt = oo[sl], dd[sl]
                rid = np.arange(TILE) // ROW
                stats_u.append(walk(nodes, ab, tris, step, ot, dt,
                                    rid, n_rows))
                # independent per-row walks
                rp = []
                for q in range(n_rows):
                    s2 = slice(p * TILE + q * ROW,
                               p * TILE + (q + 1) * ROW)
                    rp.append(walk(nodes, ab, tris, step, oo[s2],
                                   dd[s2], np.zeros(ROW, np.int64), 1))
                pops = [x[0] for x in rp]
                stats_r.append((max(pops), sum(x[1] for x in rp),
                                sum(x[2] for x in rp)))
            for name, st in (("union", stats_u), ("row", stats_r)):
                pops = np.mean([x[0] for x in st])
                lvs = np.mean([x[1] for x in st])
                rs = np.mean([x[2] for x in st])
                print(f"{label:8s} {name:6s} pops={pops:7.1f} "
                      f"leaves={lvs:7.1f} row_sweeps={rs:7.1f} "
                      f"ftest/ray={rs * step / TILE:7.1f}")


if __name__ == "__main__":
    main()
