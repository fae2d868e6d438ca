"""BVH construction + TPU-friendly cluster acceleration.

Parity role: include/mitsuba/render/kdtree.h (native SAH tree builder) +
src/render/scene_embree.inl (vendor BVH). The TPU-native design differs:

- The *builder* is native C++ (mitsuba2_tpu/native/bvh.cpp, binned SAH),
  loaded via ctypes with a pure-numpy fallback (median split) so the
  framework works without a compiler.
- The *consumer* is not a per-ray stack traversal (divergent, scalar —
  hostile to the VPU/MXU). Instead the BVH is flattened into fixed-size
  leaf CLUSTERS of up to `leaf_size` spatially-coherent faces with one
  AABB each. Device-side intersection then runs two dense phases:
    1. ray × cluster AABB slab tests — an (N, C) vectorized pass,
    2. ray × face tests only for clusters the ray's segment overlaps,
       via the existing chunked Möller–Trumbore with per-chunk masks.
  Both phases are static-shape, branch-free XLA ops; the BVH's job is
  reduced to making clusters compact so phase 2's mask prunes work.

The face ORDER produced here also feeds scene packing: spatially-sorted
faces make the megakernel/woop attribute tables cache-coherent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "bvh.cpp")

# Node record (native/bvh.cpp struct Node): 12 32-bit slots.
_NODE_SLOTS = 12
_LO, _LEFT, _HI, _COUNT, _RIGHT = slice(0, 3), 3, slice(4, 7), 7, 8


def _load_native():
    """Compile (once, cached in ~/.cache) and dlopen the native builder."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "mitsuba2_tpu")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, "libbvh.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            with tempfile.NamedTemporaryFile(
                    suffix=".so", dir=cache, delete=False) as tmp:
                tmp_path = tmp.name
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-o", tmp_path, _SRC],
                check=True, capture_output=True)
            os.replace(tmp_path, so)
        lib = ctypes.CDLL(so)
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class BVH:
    """Flattened BVH: ``nodes`` is (M, 12) float32 with int32 fields viewed
    in place; ``order`` is the face permutation (leaf-contiguous)."""

    def __init__(self, nodes: np.ndarray, order: np.ndarray):
        self.nodes = nodes
        self.order = order

    @property
    def n_nodes(self):
        return len(self.nodes)

    def _ints(self):
        return self.nodes.view(np.int32)

    def leaves(self):
        """Yield (first, count, lo, hi) per leaf, in node order."""
        ints = self._ints()
        for i in range(len(self.nodes)):
            cnt = int(ints[i, _COUNT])
            if cnt > 0:
                yield (int(ints[i, _LEFT]), cnt,
                       self.nodes[i, _LO].copy(), self.nodes[i, _HI].copy())

    def clusters(self, cluster_size: int):
        """Fixed-size clusters for the device: returns
        (lo (C,3), hi (C,3), face_index (C, cluster_size) padded with -1).
        Leaves are split/padded to exactly `cluster_size` slots."""
        los, his, idx = [], [], []
        for first, count, lo, hi in self.leaves():
            faces = self.order[first:first + count]
            for s in range(0, count, cluster_size):
                chunk = faces[s:s + cluster_size]
                pad = np.full(cluster_size, -1, np.int32)
                pad[:len(chunk)] = chunk
                idx.append(pad)
                los.append(lo)
                his.append(hi)
        return (np.stack(los).astype(np.float32),
                np.stack(his).astype(np.float32),
                np.stack(idx).astype(np.int32))


def _build_numpy(v0, e1, e2, leaf_size):
    """Median-split fallback builder (no SAH) — same node layout."""
    n = len(v0)
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    lo_f = np.minimum(np.minimum(p0, p1), p2)
    hi_f = np.maximum(np.maximum(p0, p1), p2)
    cen = 0.5 * (lo_f + hi_f)
    order = np.arange(n, dtype=np.int32)
    nodes = []

    def rec(begin, end):
        idx = len(nodes)
        nodes.append(np.zeros(_NODE_SLOTS, np.float32))
        sel = order[begin:end]
        lo = lo_f[sel].min(0)
        hi = hi_f[sel].max(0)
        node = nodes[idx]
        node[_LO] = lo
        node[_HI] = hi
        ints = node.view(np.int32)
        cnt = end - begin
        if cnt <= leaf_size:
            ints[_LEFT], ints[_COUNT], ints[_RIGHT] = begin, cnt, -1
            return idx
        axis = int(np.argmax((cen[sel].max(0) - cen[sel].min(0))))
        key = np.argsort(cen[sel, axis], kind="stable")
        order[begin:end] = sel[key]
        mid = begin + cnt // 2
        left = rec(begin, mid)
        right = rec(mid, end)
        ints[_LEFT], ints[_COUNT], ints[_RIGHT] = left, 0, right
        return idx

    if n:
        rec(0, n)
    else:
        node = np.zeros(_NODE_SLOTS, np.float32)
        node.view(np.int32)[_COUNT] = 0
        node.view(np.int32)[_RIGHT] = -1
        nodes.append(node)
    return BVH(np.stack(nodes), order)


def build_bvh(v0, e1, e2, leaf_size: int = 64,
              force_numpy: bool = False) -> BVH:
    """Build a BVH over triangles (v0 + u*e1 + v*e2). Uses the native
    binned-SAH builder when available, numpy median-split otherwise."""
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = len(v0)
    lib = None if force_numpy else _load_native()
    if lib is None or n == 0:
        return _build_numpy(v0, e1, e2, leaf_size)
    order = np.empty(n, np.int32)
    max_nodes = 4 * n + 4
    buf = np.empty((max_nodes, _NODE_SLOTS), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    written = lib.bvh_build(
        v0.ctypes.data_as(fp), e1.ctypes.data_as(fp), e2.ctypes.data_as(fp),
        n, leaf_size, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        buf.ctypes.data_as(fp), max_nodes)
    if written < 0:
        return _build_numpy(v0, e1, e2, leaf_size)
    return BVH(buf[:written].copy(), order)


def native_available() -> bool:
    return _load_native() is not None


def validate_bvh(bvh: BVH, v0, e1, e2) -> None:
    """Structural checks (used by tests): the order is a permutation,
    leaves cover every face exactly once, every node's AABB contains its
    faces, interior AABBs contain their children."""
    n = len(v0)
    assert sorted(bvh.order.tolist()) == list(range(n))
    ints = bvh._ints()
    p = np.stack([v0, v0 + e1, v0 + e2], 1)
    covered = np.zeros(n, bool)
    for first, count, lo, hi in bvh.leaves():
        faces = bvh.order[first:first + count]
        assert not covered[faces].any()
        covered[faces] = True
        pts = p[faces].reshape(-1, 3)
        assert (pts >= lo - 1e-4).all() and (pts <= hi + 1e-4).all()
    assert covered.all() or n == 0
    for i in range(bvh.n_nodes):
        if ints[i, _COUNT] == 0 and ints[i, _RIGHT] >= 0:
            for c in (ints[i, _LEFT], ints[i, _RIGHT]):
                assert (bvh.nodes[c, _LO] >= bvh.nodes[i, _LO] - 1e-4).all()
                assert (bvh.nodes[c, _HI] <= bvh.nodes[i, _HI] + 1e-4).all()


def chunk_bounds(v0, e1, e2, chunk: int) -> np.ndarray:
    """Per-face-chunk AABBs (n_chunks, 6) = [lo, hi] over each contiguous
    `chunk` of (BVH-ordered) faces — consumed by the intersectors' slab
    culling. Padding slots get inverted boxes so they never extend a
    chunk."""
    v0 = np.asarray(v0, np.float32)
    p = np.stack([v0, v0 + np.asarray(e1, np.float32),
                  v0 + np.asarray(e2, np.float32)], 1)       # (F,3,3)
    lo = p.min(1)
    hi = p.max(1)
    f = len(v0)
    pad = (-f) % chunk
    if pad:
        lo = np.concatenate([lo, np.full((pad, 3), np.inf, np.float32)])
        hi = np.concatenate([hi, np.full((pad, 3), -np.inf, np.float32)])
    n_chunks = len(lo) // chunk
    lo = lo.reshape(n_chunks, chunk, 3).min(1)
    hi = hi.reshape(n_chunks, chunk, 3).max(1)
    return np.concatenate([lo, hi], -1)
