"""Scene: geometry packing, intersection, emitter sampling.

Parity: include/mitsuba/render/scene.h:12 (ray_intersect / ray_test /
sample_emitter_direction / pdf_emitter_direction with uniform emitter picking,
scene.cpp:165-214) — re-designed for TPU:

- all meshes pack into global per-face SoA device tables at construction
  (corner attributes pre-gathered — one indirection instead of vertex-index
  chasing),
- intersection runs the fused Moller-Trumbore scan from ops/intersect.py
  (Pallas/BVH variants swap in behind the same interface),
- BSDF/emitter virtual calls become masked per-instance evaluation over the
  wavefront (bsdf.h:522-532's lane partitioning, done with `where`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.object import Object
from ..core import math as m
from ..core.frame import Frame
from ..render.interaction import SurfaceInteraction, PreliminaryIntersection
from ..render.records import DirectionSample
from ..render.emitter import EmitterFlags
from ..ops import intersect as isect_ops
from ..variants import current as current_variant


class GeometryTables(NamedTuple):
    """Packed device geometry (the role of Mesh's SoA buffers, mesh.h:48-60,
    merged scene-wide)."""
    v0: jnp.ndarray          # (F,3)
    e1: jnp.ndarray          # (F,3)
    e2: jnp.ndarray          # (F,3)
    ng: jnp.ndarray          # (F,3) geometric normal (unit)
    n0: jnp.ndarray          # (F,3) corner shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray         # (F,2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    dp_du: jnp.ndarray       # (F,3) uv-parameterization tangents
    dp_dv: jnp.ndarray
    face_shape: jnp.ndarray  # (F,) int32
    shape_bsdf: jnp.ndarray  # (S,) int32
    shape_emitter: jnp.ndarray  # (S,) int32 (-1 none)


class Scene(Object):
    def __init__(self, props=None, shapes=None, sensors=None, emitters=None,
                 integrator=None):
        super().__init__(props)
        # a scene belongs to the variant it was loaded under (the
        # reference compiles one module per variant — scene.cpp objects
        # can't cross variants either); integrator.render checks this
        # so a stale-scene render fails with a clear message instead of
        # a channel-count broadcast error deep in eval_emitter
        from ..variants import variant as _variant_name
        self.variant_name = _variant_name()
        self.shapes = list(shapes or [])
        self.sensors = list(sensors or [])
        self.emitters = list(emitters or [])
        self.integrator = integrator
        if props is not None:
            for _, obj in props.objects():
                kind = getattr(obj, "plugin_category", "")
                if kind == "shape":
                    for o in obj.expand():
                        self.shapes.append(o)
                elif kind == "sensor":
                    self.sensors.append(obj)
                elif kind == "emitter":
                    self.emitters.append(obj)
                elif kind == "integrator":
                    self.integrator = obj
        # emitter-carrying analytic prims need mesh area-sampling tables;
        # normally expand() handles this, this covers manual Scene(...)
        self.shapes = [s._tessellate()
                       if (s.is_analytic() and s.emitter is not None)
                       else s for s in self.shapes]
        # collect shape-attached emitters (scene.cpp:22-59 classification)
        for s in self.shapes:
            if s.emitter is not None and s.emitter not in self.emitters:
                self.emitters.append(s.emitter)
            sens = getattr(s, "sensor", None)
            if sens is not None and sens not in self.sensors:
                if hasattr(sens, "set_shape"):
                    sens.set_shape(s)   # re-point at the expanded shape
                self.sensors.append(sens)
        self.environment_emitter = None
        for e in self.emitters:
            if e.is_environment():
                if self.environment_emitter is not None:
                    raise RuntimeError("only one environment emitter allowed")
                self.environment_emitter = e
        self._compile()

    # ------------------------------------------------------------------ build
    def _compile(self):
        # unique BSDF instances
        self.bsdfs = []
        bsdf_index = {}
        for s in self.shapes:
            if s.bsdf is None:
                from ..models.bsdfs import SmoothDiffuse
                s.bsdf = SmoothDiffuse()
            if id(s.bsdf) not in bsdf_index:
                bsdf_index[id(s.bsdf)] = len(self.bsdfs)
                self.bsdfs.append(s.bsdf)
        for i, e in enumerate(self.emitters):
            e._emitter_index = i

        v0s, e1s, e2s, ngs = [], [], [], []
        n0s, n1s, n2s = [], [], []
        uv0s, uv1s, uv2s = [], [], []
        dpdus, dpdvs = [], []
        face_shape = []
        shape_bsdf = []
        shape_emitter = []
        bb_min = np.full(3, np.inf)
        bb_max = np.full(3, -np.inf)
        # per-shape plugin ids cover EVERY shape (analytic ones included);
        # face_shape/geometry cover meshes only
        analytic = []
        quadrics = []
        instanced = []
        # register shared-instance group children as scene shapes (their
        # bsdfs/media dispatch like any shape) but keep their geometry out
        # of the main tables — it packs ONCE per group below
        seen_groups = {}
        for s in list(self.shapes):
            if getattr(s, "is_instance", lambda: False)():
                g = s.group
                if id(g) not in seen_groups:
                    seen_groups[id(g)] = g
                    for child in g.children:
                        if child.emitter is not None:
                            raise NotImplementedError(
                                "emitters inside instanced shapegroups "
                                "are not supported (reference parity: "
                                "shapegroup.cpp forbids them)")
                        if not child.is_mesh():
                            continue
                        child._instanced_only = True
                        if child not in self.shapes:
                            if child.bsdf is None:
                                from ..models.bsdfs import SmoothDiffuse
                                child.bsdf = SmoothDiffuse()
                            self.shapes.append(child)
                            if id(child.bsdf) not in bsdf_index:
                                bsdf_index[id(child.bsdf)] = \
                                    len(self.bsdfs)
                                self.bsdfs.append(child.bsdf)
        for si_idx, s in enumerate(self.shapes):
            shape_bsdf.append(bsdf_index[id(s.bsdf)])
            em = -1
            if s.emitter is not None:
                em = s.emitter._emitter_index
            shape_emitter.append(em)
            if s.is_analytic():
                if getattr(s, "is_quadric", lambda: False)():
                    quadrics.append((si_idx, s))
                else:
                    analytic.append((si_idx, s))
                lo, hi = s.bbox()
                bb_min = np.minimum(bb_min, lo)
                bb_max = np.maximum(bb_max, hi)
                continue
            if not s.is_mesh():
                raise NotImplementedError(
                    f"non-mesh shape {type(s).__name__} not yet supported")
            if getattr(s, "_instanced_only", False):
                continue     # geometry lives in the shared group tables
            if getattr(s, "is_instance", lambda: False)():
                instanced.append((si_idx, s))
                M = np.asarray(s.to_world.matrix, np.float64)
                for child in s.group.children:
                    if not child.is_mesh() or not len(child.vertices):
                        continue
                    vw = child.vertices @ M[:3, :3].T + M[:3, 3]
                    bb_min = np.minimum(bb_min, vw.min(0))
                    bb_max = np.maximum(bb_max, vw.max(0))
                continue
            (v0, e1, e2, ng, ns, uvs, dp_du,
             dp_dv) = _mesh_face_arrays(s)
            v0s.append(v0); e1s.append(e1); e2s.append(e2); ngs.append(ng)
            n0s.append(ns[:, 0]); n1s.append(ns[:, 1]); n2s.append(ns[:, 2])
            uv0s.append(uvs[:, 0]); uv1s.append(uvs[:, 1]); uv2s.append(uvs[:, 2])
            dpdus.append(dp_du); dpdvs.append(dp_dv)
            face_shape.append(np.full(len(v0), si_idx, np.int32))
            lo, hi = s.bbox()
            bb_min = np.minimum(bb_min, lo)
            bb_max = np.maximum(bb_max, hi)

        # ---- merge same-family BSDF instances (vcall reduction) ----------
        # Role of material-sorted queues / Enoki's vcall partitioning
        # (SURVEY.md §2.4, bsdf.h:522-532): K masked wavefront sweeps per
        # family collapse to 1 with per-shape parameter gathers
        # (models/merged.py). Merged instances read the ORIGINAL plugin
        # objects at trace time, so traverse()/autodiff keep working.
        from ..models.merged import merge_signature, build_merged
        sig_groups: dict = {}
        for i, b in enumerate(self.bsdfs):
            sig = merge_signature(b)
            if sig is not None:
                sig_groups.setdefault(sig, []).append(i)
        sig_groups = {k: v for k, v in sig_groups.items() if len(v) > 1}
        if sig_groups:
            grouped = {i for v in sig_groups.values() for i in v}
            keep = [i for i in range(len(self.bsdfs)) if i not in grouped]
            remap = {old: new for new, old in enumerate(keep)}
            new_bsdfs = [self.bsdfs[i] for i in keep]
            for sig, members in sig_groups.items():
                slot_of = {b_idx: slot
                           for slot, b_idx in enumerate(members)}
                shape_slot = np.zeros(max(len(self.shapes), 1), np.int32)
                for s_idx, b_idx in enumerate(shape_bsdf):
                    if b_idx in slot_of:
                        shape_slot[s_idx] = slot_of[b_idx]
                merged = build_merged(
                    sig, [self.bsdfs[i] for i in members], shape_slot)
                m_idx = len(new_bsdfs)
                for i in members:
                    remap[i] = m_idx
                new_bsdfs.append(merged)
            shape_bsdf = [remap[b] for b in shape_bsdf]
            self.bsdfs = new_bsdfs

        if not v0s:
            # degenerate dummy face/shape so gathers stay well-formed in
            # geometry-free scenes (e1 = e2 = 0 can never be hit)
            z3 = np.zeros((1, 3), np.float32)
            z2 = np.zeros((1, 2), np.float32)
            v0s, e1s, e2s = [z3], [z3], [z3]
            ngs = [np.asarray([[0, 0, 1]], np.float32)]
            n0s = n1s = n2s = ngs
            uv0s, uv1s, uv2s = [z2], [z2], [z2]
            dpdus = dpdvs = [z3]
            face_shape = [np.zeros(1, np.int32)]
            if not shape_bsdf:        # truly shape-free scene
                shape_bsdf = [0]
                shape_emitter = [-1]
            if not self.bsdfs:
                from ..models.bsdfs import SmoothDiffuse
                self.bsdfs.append(SmoothDiffuse())

        # ---- BVH face ordering (native C++ builder, ops/bvh.py) ----------
        # Role of kdtree.h: the SAH tree is built on the host; on device its
        # leaf order makes the intersector's face chunks spatially coherent,
        # so chunked Möller–Trumbore / woop tiles prune better and the
        # attribute one-hot rows cluster. Order is a pure permutation —
        # every per-face array below is permuted consistently.
        self.bvh = None
        cat_v0 = np.concatenate(v0s).astype(np.float32)
        if len(cat_v0) > 1:
            from ..ops.bvh import build_bvh
            cat_e1 = np.concatenate(e1s).astype(np.float32)
            cat_e2 = np.concatenate(e2s).astype(np.float32)
            self.bvh = build_bvh(cat_v0, cat_e1, cat_e2, leaf_size=64)
            perm = self.bvh.order

            def permute(xs):
                return [np.concatenate(xs)[perm]]
            v0s, e1s, e2s, ngs = (permute(x) for x in
                                  (v0s, e1s, e2s, ngs))
            n0s, n1s, n2s = (permute(x) for x in (n0s, n1s, n2s))
            uv0s, uv1s, uv2s = (permute(x) for x in (uv0s, uv1s, uv2s))
            dpdus, dpdvs = permute(dpdus), permute(dpdvs)
            face_shape = permute(face_shape)

        def cat(xs, dtype=np.float32):
            return jnp.asarray(np.concatenate(xs).astype(dtype))

        self.geom = GeometryTables(
            v0=cat(v0s), e1=cat(e1s), e2=cat(e2s), ng=cat(ngs),
            n0=cat(n0s), n1=cat(n1s), n2=cat(n2s),
            uv0=cat(uv0s), uv1=cat(uv1s), uv2=cat(uv2s),
            dp_du=cat(dpdus), dp_dv=cat(dpdvs),
            face_shape=jnp.asarray(np.concatenate(face_shape)
                                   if face_shape else
                                   np.zeros(0, np.int32)),
            shape_bsdf=jnp.asarray(np.asarray(shape_bsdf, np.int32)),
            shape_emitter=jnp.asarray(np.asarray(shape_emitter, np.int32)))
        self._bb_min = bb_min
        self._bb_max = bb_max

        # media: collect + per-shape transition tables
        self.media = []
        medium_index = {}
        for s in self.shapes:
            for med in (s.interior_medium, s.exterior_medium):
                if med is not None and id(med) not in medium_index:
                    medium_index[id(med)] = len(self.media)
                    med._medium_index = len(self.media)
                    self.media.append(med)
        n_shapes = max(len(self.shapes), 1)
        med_int = np.full(n_shapes, -1, np.int32)
        med_ext = np.full(n_shapes, -1, np.int32)
        for i, s in enumerate(self.shapes):
            if s.interior_medium is not None:
                med_int[i] = medium_index[id(s.interior_medium)]
            if s.exterior_medium is not None:
                med_ext[i] = medium_index[id(s.exterior_medium)]
        self.shape_medium_int = jnp.asarray(med_int)
        self.shape_medium_ext = jnp.asarray(med_ext)
        self.has_media = len(self.media) > 0

        # ---- analytic sphere table (sphere.cpp exact quadric prims) ------
        # one dense (S, 10) row per analytic sphere: center 0:3, radius 3,
        # shape 4, bsdf 5, emitter 6, med_int 7, med_ext 8, flip 9. The
        # quadric pass in ray_intersect_preliminary encodes hits as
        # prim_idx = F + sphere_index.
        self.n_spheres = len(analytic)
        self.sph_table = None
        if analytic:
            rows = []
            for a_idx, s in analytic:
                rows.append(np.concatenate([
                    np.asarray(s.center, np.float32),
                    np.asarray([s.radius, a_idx, shape_bsdf[a_idx],
                                shape_emitter[a_idx], med_int[a_idx],
                                med_ext[a_idx],
                                -1.0 if s.flip_normals else 1.0],
                               np.float32)]))
            self.sph_table = jnp.asarray(np.stack(rows).astype(np.float32))

        # ---- analytic quadric table (disk.cpp / cylinder.cpp exact prims)
        # one dense (Q, 32) row per disk/cylinder: to_object A 0:9 b 9:12,
        # to_world linear B 12:21, kind 21 (1 disk, 2 cyl), radius 22,
        # length 23, shape 24, bsdf 25, emitter 26, med_int 27, med_ext 28,
        # flip 29. prim_idx = F + n_spheres + quad_index.
        self.n_quads = len(quadrics)
        self.quad_table = None
        if quadrics:
            rows = []
            for q_idx, s in quadrics:
                rows.append(np.concatenate([
                    s.prim_row(),
                    np.asarray([q_idx, shape_bsdf[q_idx],
                                shape_emitter[q_idx], med_int[q_idx],
                                med_ext[q_idx],
                                -1.0 if s.flip_normals else 1.0,
                                0.0, 0.0], np.float32)]))
            self.quad_table = jnp.asarray(np.stack(rows).astype(np.float32))

        # ---- shared-geometry instancing (shapegroup.h:15) ----------------
        # one packed LOCAL-space geometry + attr block per GROUP; one
        # (A | b | B | group) transform row per INSTANCE. Memory is O(1)
        # in the instance count; rays transform into the group frame
        # (t is preserved: affine map of an unnormalized-direction ray).
        # prim encoding: base + inst * G_max + local_face.
        self.n_instances = len(instanced)
        self._inst_groups = []          # per group: dict of jnp arrays
        self._inst_rows = None          # (I, 24) np
        self._inst_group_of = []        # group slot per instance
        self._inst_gmax = 0
        if instanced:
            group_slot = {}
            for s_idx, inst in instanced:
                if id(inst.group) not in group_slot:
                    group_slot[id(inst.group)] = len(self._inst_groups)
                    ch = [c for c in inst.group.children if c.is_mesh()]
                    parts = [(_mesh_face_arrays(c), c) for c in ch]
                    g_v0 = np.concatenate([p[0][0] for p in parts])
                    g_e1 = np.concatenate([p[0][1] for p in parts])
                    g_e2 = np.concatenate([p[0][2] for p in parts])
                    rows = []
                    for (v0c, e1c, e2c, ngc, nsc, uvc, duc,
                         dvc), child in parts:
                        c_sidx = self.shapes.index(child)
                        ints = np.stack([
                            np.full(len(v0c), c_sidx, np.float32),
                            # post-merge dispatch index (the merge block
                            # above rewrote shape_bsdf)
                            np.full(len(v0c), shape_bsdf[c_sidx],
                                    np.float32),
                            np.full(len(v0c), -1.0, np.float32),
                            np.full(len(v0c), -1.0, np.float32),
                            np.full(len(v0c), -1.0, np.float32)], axis=1)
                        rows.append(np.concatenate([
                            v0c, e1c, e2c, ngc, nsc[:, 0], nsc[:, 1],
                            nsc[:, 2], uvc[:, 0], uvc[:, 1], uvc[:, 2],
                            duc, dvc, ints], axis=1).astype(np.float32))
                    self._inst_groups.append({
                        "v0": jnp.asarray(g_v0.astype(np.float32)),
                        "e1": jnp.asarray(g_e1.astype(np.float32)),
                        "e2": jnp.asarray(g_e2.astype(np.float32)),
                        "attr": jnp.asarray(np.concatenate(rows)),
                        "n_faces": len(g_v0)})
                self._inst_group_of.append(group_slot[id(inst.group)])
            self._inst_gmax = max(g["n_faces"]
                                  for g in self._inst_groups)
            rows = []
            for s_idx, inst in instanced:
                rows.append(np.concatenate([
                    inst._A.reshape(9), inst._b.reshape(3),
                    inst._B.reshape(9),
                    np.asarray([self._inst_group_of[len(rows)],
                                s_idx, 0.0], np.float32)]))
            self._inst_rows = np.stack(rows).astype(np.float32)
            self._inst_table = jnp.asarray(self._inst_rows)

        # ---- packed per-face attribute table -----------------------------
        # TPU's dynamic gather is ~100x slower than arithmetic for wavefront
        # index vectors, so compute_surface_interaction fetches EVERY face
        # attribute with ONE one-hot matmul over this table (ops/gather.py).
        g = self.geom
        fs_np = np.asarray(g.face_shape)
        sb_np = np.asarray(g.shape_bsdf)
        se_np = np.asarray(g.shape_emitter)
        per_face_ints = np.stack([
            fs_np,
            sb_np[fs_np],
            se_np[fs_np],
            med_int[fs_np],
            med_ext[fs_np]], axis=1).astype(np.float32)       # (F, 5)
        self.attr_table = jnp.asarray(np.concatenate([
            np.asarray(g.v0), np.asarray(g.e1), np.asarray(g.e2),
            np.asarray(g.ng), np.asarray(g.n0), np.asarray(g.n1),
            np.asarray(g.n2), np.asarray(g.uv0), np.asarray(g.uv1),
            np.asarray(g.uv2), np.asarray(g.dp_du), np.asarray(g.dp_dv),
            per_face_ints], axis=1).astype(np.float32))        # (F, 41)

        # ---- mesh_attribute corner tables (mesh_attribute.cpp) -----------
        # per attribute name, one packed (F, 3k) corner table in the SAME
        # (BVH-permuted) global face order as attr_table, so one one-hot
        # gather + barycentric weights evaluates the attribute per lane.
        attr_names: dict = {}
        for s in self.shapes:
            if s.is_mesh():
                for nm, (k, _) in s.attributes.items():
                    attr_names.setdefault(nm, k)
        self.mesh_attr_tables = {}
        for nm, k in attr_names.items():
            per = []
            for s in self.shapes:
                nf = len(s.faces)
                if nm in s.attributes:
                    _, data = s.attributes[nm]
                    if nm.startswith("vertex_"):
                        corners = data[s.faces]                  # (f,3,k)
                    else:
                        corners = np.repeat(data[:, None, :], 3, 1)
                else:
                    corners = np.zeros((nf, 3, k), np.float32)
                per.append(corners.astype(np.float32))
            tab = np.concatenate(per)                            # (F,3,k)
            if self.bvh is not None:
                tab = tab[self.bvh.order]
            self.mesh_attr_tables[nm] = (
                k, jnp.asarray(tab.reshape(len(tab), 3 * k)))

        # BVH-leaf chunk AABBs for slab culling in the chunked intersector
        # (faces are already BVH-ordered, so chunks are spatially compact)
        self._chunk_bounds = None
        if self.bvh is not None \
                and self.geom.v0.shape[0] > isect_ops.FACE_CHUNK:
            from ..ops.bvh import chunk_bounds
            self._chunk_bounds = jnp.asarray(chunk_bounds(
                np.asarray(self.geom.v0), np.asarray(self.geom.e1),
                np.asarray(self.geom.e2), isect_ops.FACE_CHUNK))

        # intersector backend: fused Pallas/MXU kernel on TPU, the XLA scan
        # path elsewhere (ops/intersect_pallas.py design note)
        self._woop = None
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "cpu"
        if platform == "tpu" and self.geom.v0.shape[0] > 0:
            from ..ops.intersect_pallas import WoopIntersector
            self._woop = WoopIntersector(
                np.asarray(self.geom.v0), np.asarray(self.geom.e1),
                np.asarray(self.geom.e2))

        # emitter device tables
        for e in self.emitters:
            if hasattr(e, "prepare"):
                e.prepare(self)
            e.set_scene(self)

        # bind mesh_attribute textures to the packed corner tables
        self._wire_mesh_attr_textures()

    def _wire_mesh_attr_textures(self):
        """Find every `mesh_attribute` texture reachable from the scene's
        plugins and hand it its packed corner table (the role of
        si.shape->eval_attribute dispatch, mesh_attribute.cpp:85)."""
        from ..models.textures import MeshAttributeTexture
        seen = set()

        def walk(obj, depth=0):
            if obj is None or id(obj) in seen or depth > 6:
                return
            seen.add(id(obj))
            if isinstance(obj, MeshAttributeTexture):
                obj.wire(self)
                return
            d = getattr(obj, "__dict__", None)
            if not isinstance(d, dict):
                return
            for v in d.values():
                if hasattr(v, "__dict__") and not isinstance(
                        v, (np.ndarray, jnp.ndarray)):
                    walk(v, depth + 1)

        for root in (list(self.bsdfs) + list(self.emitters)
                      + list(self.media)):
            walk(root)

    def eval_attribute(self, name: str, si, active=True):
        """Interpolated named mesh attribute at si — (N, k).
        (shape.h eval_attribute; zero where the hit mesh lacks it.)"""
        from ..ops.gather import gather_rows
        k, flat = self.mesh_attr_tables[name]
        A = gather_rows(flat, jnp.clip(si.prim_idx, 0,
                                       flat.shape[0] - 1))
        A = A.reshape(si.t.shape + (3, k))
        bu, bv = si.prim_uv[..., 0], si.prim_uv[..., 1]
        w = jnp.stack([1.0 - bu - bv, bu, bv], -1)[..., None]
        return (A * w).sum(-2)

    def bounding_sphere(self):
        if not (np.all(np.isfinite(self._bb_min))
                and np.all(np.isfinite(self._bb_max))):
            return jnp.zeros(3, jnp.float32), 1.0
        c = 0.5 * (self._bb_min + self._bb_max)
        r = float(np.linalg.norm(self._bb_max - c))
        return jnp.asarray(c, jnp.float32), max(r, 1e-3)

    def bbox(self):
        return self._bb_min, self._bb_max

    # ------------------------------------------------------------ intersection
    def _sphere_closest_hit(self, o, d, mint, maxt):
        """Vectorized ray/quadric pass over the analytic sphere table:
        a dense (N, S) slab of quadratic solves — branch-free VPU math
        (role of sphere.cpp ray_intersect_preliminary). Returns
        (t (N,), sphere_index (N,) or -1)."""
        tab = self.sph_table
        c, r = tab[:, 0:3], tab[:, 3]
        oc = o[:, None, :] - c[None, :, :]                  # (N,S,3)
        a = jnp.sum(d * d, -1)[:, None]
        b = jnp.sum(oc * d[:, None, :], -1)                 # (N,S)
        cc = jnp.sum(oc * oc, -1) - r[None, :] ** 2
        disc = b * b - a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / a
        t1 = (-b + sq) / a
        t_near = jnp.where(t0 > mint[:, None], t0, t1)      # inside: far root
        ok = (disc > 0) & (t_near > mint[:, None]) & (t_near < maxt[:, None])
        t_near = jnp.where(ok, t_near, jnp.inf)
        s_best = jnp.argmin(t_near, axis=1)
        t_best = jnp.min(t_near, axis=1)
        return t_best, jnp.where(jnp.isfinite(t_best),
                                 s_best.astype(jnp.int32), -1)

    def _quad_closest_hit(self, o, d, mint, maxt):
        """Exact disk/cylinder hits (disk.cpp:146-166,
        cylinder.cpp:243-291): rays transform into each prim's canonical
        object frame; unrolled over the (small) quad table. Returns
        (t (N,), quad_index (N,) or -1)."""
        tab = np.asarray(self.quad_table)  # static host copy for unroll
        tabj = self.quad_table
        t_best = jnp.full(o.shape[0], jnp.inf, o.dtype)
        q_best = jnp.full(o.shape[0], -1, jnp.int32)
        for q in range(self.n_quads):
            A = tabj[q, 0:9].reshape(3, 3).astype(o.dtype)
            b = tabj[q, 9:12].astype(o.dtype)
            kind = float(tab[q, 21])
            o_l = o @ A.T + b
            d_l = d @ A.T
            if kind == 1.0:            # disk: plane z=0, x^2+y^2 <= 1
                dz = d_l[:, 2]
                t = -o_l[:, 2] / jnp.where(jnp.abs(dz) > 1e-12, dz,
                                           jnp.inf)
                x = o_l[:, 0] + t * d_l[:, 0]
                y = o_l[:, 1] + t * d_l[:, 1]
                ok = (x * x + y * y <= 1.0) & (t >= mint) & (t <= maxt)
                t = jnp.where(ok, t, jnp.inf)
            else:                      # cylinder: x^2+y^2 = r^2, z in [0,L]
                r = tabj[q, 22].astype(o.dtype)
                ln = tabj[q, 23].astype(o.dtype)
                a2 = d_l[:, 0] ** 2 + d_l[:, 1] ** 2
                b2 = 2.0 * (d_l[:, 0] * o_l[:, 0] + d_l[:, 1] * o_l[:, 1])
                c2 = o_l[:, 0] ** 2 + o_l[:, 1] ** 2 - r * r
                disc = b2 * b2 - 4.0 * a2 * c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                inv2a = 1.0 / jnp.where(jnp.abs(a2) > 1e-20, 2.0 * a2,
                                        jnp.inf)
                t_near = (-b2 - sq) * inv2a
                t_far = (-b2 + sq) * inv2a
                zn = o_l[:, 2] + d_l[:, 2] * t_near
                zf = o_l[:, 2] + d_l[:, 2] * t_far
                near_ok = (zn >= 0) & (zn <= ln) & (t_near >= mint) \
                    & (t_near <= maxt)
                far_ok = (zf >= 0) & (zf <= ln) & (t_far >= mint) \
                    & (t_far <= maxt)
                ok = (disc > 0) & (near_ok | far_ok)
                t = jnp.where(near_ok, t_near, t_far)
                t = jnp.where(ok, t, jnp.inf)
            closer = t < t_best
            t_best = jnp.where(closer, t, t_best)
            q_best = jnp.where(closer, q, q_best)
        return t_best, q_best

    def _instance_closest_hit(self, o, d, mint, maxt):
        """Shared-geometry instances: transform the ray into each
        instance's group frame and sweep the group's packed faces
        (instance.cpp ray path through the nested accel). Returns
        (t, local_prim (inst*G_max + face) or -1, prim_uv)."""
        n = o.shape[0]
        t_best = jnp.full(n, jnp.inf, o.dtype)
        p_best = jnp.full(n, -1, jnp.int32)
        uv_best = jnp.zeros((n, 2), o.dtype)
        for i in range(self.n_instances):
            A = self._inst_table[i, 0:9].reshape(3, 3).astype(o.dtype)
            b = self._inst_table[i, 9:12].astype(o.dtype)
            g = self._inst_groups[self._inst_group_of[i]]
            o_l = o @ A.T + b
            d_l = d @ A.T
            pi = isect_ops.ray_intersect_packets(
                g["v0"], g["e1"], g["e2"], o_l, d_l, mint, maxt)
            closer = pi.t < t_best
            t_best = jnp.where(closer, pi.t, t_best)
            p_best = jnp.where(closer & (pi.prim_idx >= 0),
                               i * self._inst_gmax + pi.prim_idx, p_best)
            uv_best = jnp.where(closer[..., None], pi.prim_uv, uv_best)
        return t_best, p_best, uv_best

    def ray_intersect_preliminary(self, ray, active=None):
        g = self.geom
        maxt = ray.maxt if active is None else jnp.where(active, ray.maxt,
                                                         -jnp.inf)
        if self._woop is not None \
                and not getattr(self, "_disable_pallas", False):
            t, uv, prim = self._woop(ray.o, ray.d, ray.mint, maxt)
            pi = PreliminaryIntersection(
                t=t, prim_uv=uv,
                shape_idx=jnp.full_like(prim, -1), prim_idx=prim)
        else:
            pi = isect_ops.ray_intersect_packets(
                g.v0, g.e1, g.e2, ray.o, ray.d, ray.mint, maxt,
                chunk_bounds=self._chunk_bounds)
        n_faces = int(g.v0.shape[0])
        if self.n_spheres:
            ts, s_idx = self._sphere_closest_hit(ray.o, ray.d, ray.mint,
                                                 maxt)
            closer = ts < pi.t
            pi = pi._replace(
                t=jnp.where(closer, ts, pi.t),
                prim_idx=jnp.where(closer & (s_idx >= 0),
                                   n_faces + s_idx, pi.prim_idx),
                prim_uv=jnp.where(closer[..., None],
                                  jnp.zeros_like(pi.prim_uv), pi.prim_uv))
        if self.n_quads:
            tq, q_idx = self._quad_closest_hit(ray.o, ray.d, ray.mint,
                                               maxt)
            closer = tq < pi.t
            pi = pi._replace(
                t=jnp.where(closer, tq, pi.t),
                prim_idx=jnp.where(closer & (q_idx >= 0),
                                   n_faces + self.n_spheres + q_idx,
                                   pi.prim_idx),
                prim_uv=jnp.where(closer[..., None],
                                  jnp.zeros_like(pi.prim_uv), pi.prim_uv))
        if self.n_instances:
            ti, ip, iuv = self._instance_closest_hit(ray.o, ray.d,
                                                     ray.mint, maxt)
            closer = ti < pi.t
            base = n_faces + self.n_spheres + self.n_quads
            pi = pi._replace(
                t=jnp.where(closer, ti, pi.t),
                prim_idx=jnp.where(closer & (ip >= 0), base + ip,
                                   pi.prim_idx),
                prim_uv=jnp.where(closer[..., None], iuv, pi.prim_uv))
        shape_idx = g.face_shape[jnp.clip(pi.prim_idx, 0, n_faces - 1)]
        if self.n_spheres:
            is_sph = (pi.prim_idx >= n_faces) \
                & (pi.prim_idx < n_faces + self.n_spheres)
            shape_idx = jnp.where(
                is_sph,
                self.sph_table[:, 4].astype(jnp.int32)[
                    jnp.clip(pi.prim_idx - n_faces, 0,
                             self.n_spheres - 1)],
                shape_idx)
        if self.n_quads:
            is_q = (pi.prim_idx >= n_faces + self.n_spheres) \
                & (pi.prim_idx < n_faces + self.n_spheres + self.n_quads)
            shape_idx = jnp.where(
                is_q,
                self.quad_table[:, 24].astype(jnp.int32)[
                    jnp.clip(pi.prim_idx - n_faces - self.n_spheres, 0,
                             self.n_quads - 1)],
                shape_idx)
        if self.n_instances:
            from ..ops.gather import gather_rows as _gr
            base_i = n_faces + self.n_spheres + self.n_quads
            rel = pi.prim_idx - base_i
            for i in range(self.n_instances):
                g = self._inst_groups[self._inst_group_of[i]]
                m_i = (rel >= i * self._inst_gmax) \
                    & (rel < i * self._inst_gmax + g["n_faces"])
                face_l = jnp.clip(rel - i * self._inst_gmax, 0,
                                  g["n_faces"] - 1)
                fs_i = _gr(g["attr"][:, 33:34], face_l)[:, 0] \
                    .astype(jnp.int32)
                shape_idx = jnp.where(m_i, fs_i, shape_idx)
        shape_idx = jnp.where(pi.prim_idx >= 0, shape_idx, -1)
        # detach: intersections are non-differentiable, like the reference's
        # HitComputeFlags::NonDifferentiable recompute (scene_optix.inl:432)
        return pi._replace(shape_idx=shape_idx,
                           t=jax.lax.stop_gradient(pi.t),
                           prim_uv=jax.lax.stop_gradient(pi.prim_uv))

    def compute_surface_interaction(self, ray, pi: PreliminaryIntersection,
                                    active=None) -> SurfaceInteraction:
        from ..ops.gather import gather_rows
        valid = pi.is_valid()
        n_faces = int(self.geom.v0.shape[0])
        f = jnp.clip(pi.prim_idx, 0, n_faces - 1)
        # one MXU pass fetches every per-face attribute (see attr_table)
        A = gather_rows(self.attr_table, f)
        v0, e1, e2 = A[:, 0:3], A[:, 3:6], A[:, 6:9]
        ng = A[:, 9:12]
        n0, n1, n2 = A[:, 12:15], A[:, 15:18], A[:, 18:21]
        uv0, uv1, uv2 = A[:, 21:23], A[:, 23:25], A[:, 25:27]
        dp_du, dp_dv = A[:, 27:30], A[:, 30:33]
        shape_idx = A[:, 33].astype(jnp.int32)
        bsdf_idx = A[:, 34].astype(jnp.int32)
        emitter_idx = A[:, 35].astype(jnp.int32)
        bu = pi.prim_uv[..., 0]
        bv = pi.prim_uv[..., 1]
        w0 = (1.0 - bu - bv)[..., None]
        wu = bu[..., None]
        wv = bv[..., None]
        p = v0 + e1 * wu + e2 * wv
        ns = m.normalize(n0 * w0 + n1 * wu + n2 * wv)
        uv = uv0 * w0 + uv1 * wu + uv2 * wv
        if self.n_spheres:
            # analytic sphere lanes overlay the mesh-derived fields
            # (sphere.cpp compute_surface_interaction: exact normal
            # p-c normalized, spherical uv, analytic tangents)
            is_sph = (pi.prim_idx >= n_faces) \
                & (pi.prim_idx < n_faces + self.n_spheres)
            s_i = jnp.clip(pi.prim_idx - n_faces, 0, self.n_spheres - 1)
            row = gather_rows(self.sph_table, s_i)
            c, r = row[:, 0:3], row[:, 3:4]
            flip = row[:, 9:10]
            p_s = ray.o + pi.t[..., None] * ray.d
            n_s = m.normalize(p_s - c) * flip
            p_s = c + n_s * flip * r            # re-project onto the sphere
            phi = jnp.arctan2(n_s[:, 1], n_s[:, 0])
            theta = jnp.arccos(jnp.clip(n_s[:, 2] * flip[:, 0], -1.0, 1.0))
            uv_s = jnp.stack([phi / (2 * jnp.pi) + 0.5, theta / jnp.pi], -1)
            dpdu_s = jnp.stack([-n_s[:, 1], n_s[:, 0],
                                jnp.zeros_like(phi)], -1) * (2 * jnp.pi * r)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - (n_s[:, 2] * flip[:, 0])**2,
                                         1e-12))
            dpdv_s = jnp.stack([
                n_s[:, 2] * jnp.cos(phi), n_s[:, 2] * jnp.sin(phi),
                -sin_t * flip[:, 0]], -1) * (jnp.pi * r)
            w = is_sph[..., None]
            p = jnp.where(w, p_s, p)
            ng = jnp.where(w, n_s, ng)
            ns = jnp.where(w, n_s, ns)
            uv = jnp.where(w, uv_s, uv)
            dp_du = jnp.where(w, dpdu_s, dp_du)
            dp_dv = jnp.where(w, dpdv_s, dp_dv)
            to_i32 = lambda col: row[:, col].astype(jnp.int32)
            shape_idx = jnp.where(is_sph, to_i32(4), shape_idx)
            bsdf_idx = jnp.where(is_sph, to_i32(5), bsdf_idx)
            emitter_idx = jnp.where(is_sph, to_i32(6), emitter_idx)
        if self.n_quads:
            # analytic disk/cylinder lanes (disk.cpp:182-225 uv/tangent
            # conventions, cylinder.cpp:336-390 incl. the roundoff
            # re-projection along the normal)
            is_q = (pi.prim_idx >= n_faces + self.n_spheres) \
                & (pi.prim_idx < n_faces + self.n_spheres + self.n_quads)
            q_i = jnp.clip(pi.prim_idx - n_faces - self.n_spheres, 0,
                           self.n_quads - 1)
            row = gather_rows(self.quad_table, q_i)
            A = row[:, 0:9].reshape(-1, 3, 3)
            b = row[:, 9:12]
            B = row[:, 12:21].reshape(-1, 3, 3)
            kind = row[:, 21]
            r_c = row[:, 22]
            len_c = row[:, 23]
            flip = row[:, 29:30]
            p_q = ray.o + pi.t[..., None] * ray.d
            local = jnp.einsum("nij,nj->ni", A, p_q) + b
            lx, ly, lz = local[:, 0], local[:, 1], local[:, 2]
            is_disk = kind < 1.5
            # --- disk: uv = (r, phi/2pi), tangents rotate with phi ---
            r_d = jnp.sqrt(jnp.maximum(lx * lx + ly * ly, 0.0))
            phi = jnp.arctan2(ly, lx)
            v_d = phi / (2 * jnp.pi)
            v_d = jnp.where(v_d < 0, v_d + 1.0, v_d)
            inv_r = m.safe_div(1.0, r_d, 0.0)
            cos_phi = jnp.where(r_d > 0, lx * inv_r, 1.0)
            sin_phi = jnp.where(r_d > 0, ly * inv_r, 0.0)
            uv_disk = jnp.stack([r_d, v_d], -1)
            dpdu_disk = jnp.einsum(
                "nij,nj->ni", B,
                jnp.stack([cos_phi, sin_phi, jnp.zeros_like(phi)], -1))
            dpdv_disk = jnp.einsum(
                "nij,nj->ni", B,
                jnp.stack([-sin_phi, cos_phi, jnp.zeros_like(phi)], -1))
            n_disk = m.normalize(A[:, 2, :]) * flip
            # --- cylinder: uv = (phi/2pi, z/len), n from tangent cross ---
            phi_c = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
            uv_cyl = jnp.stack([phi_c / (2 * jnp.pi),
                                m.safe_div(lz, len_c, 0.0)], -1)
            dpdu_cyl = jnp.einsum(
                "nij,nj->ni", B,
                jnp.stack([-ly, lx, jnp.zeros_like(lx)], -1)) \
                * (2 * jnp.pi)
            dpdv_cyl = jnp.einsum(
                "nij,nj->ni", B,
                jnp.stack([jnp.zeros_like(lx), jnp.zeros_like(lx),
                           len_c], -1))
            n_cyl = m.normalize(m.cross(dpdu_cyl, dpdv_cyl))
            # roundoff re-projection (cylinder.cpp:373-375), then flip
            p_cyl = p_q + n_cyl * (r_c - r_d)[..., None]
            n_cyl = n_cyl * flip
            wd = is_disk[..., None]
            uv_q = jnp.where(wd, uv_disk, uv_cyl)
            dpdu_q = jnp.where(wd, dpdu_disk, dpdu_cyl)
            dpdv_q = jnp.where(wd, dpdv_disk, dpdv_cyl)
            n_q = jnp.where(wd, n_disk, n_cyl)
            p_q = jnp.where(wd, p_q, p_cyl)
            w = is_q[..., None]
            p = jnp.where(w, p_q, p)
            ng = jnp.where(w, n_q, ng)
            ns = jnp.where(w, n_q, ns)
            uv = jnp.where(w, uv_q, uv)
            dp_du = jnp.where(w, dpdu_q, dp_du)
            dp_dv = jnp.where(w, dpdv_q, dp_dv)
            to_i32q = lambda col: row[:, col].astype(jnp.int32)
            shape_idx = jnp.where(is_q, to_i32q(24), shape_idx)
            bsdf_idx = jnp.where(is_q, to_i32q(25), bsdf_idx)
            emitter_idx = jnp.where(is_q, to_i32q(26), emitter_idx)
        if self.n_instances:
            # shared-geometry instance lanes: gather LOCAL-space rows
            # from the group's packed attr block and transform through
            # the instance's to_world (normals via A^T, tangents via B)
            base_i = n_faces + self.n_spheres + self.n_quads
            rel = pi.prim_idx - base_i
            is_any_i = pi.prim_idx >= base_i
            bu_i = pi.prim_uv[..., 0:1]
            bv_i = pi.prim_uv[..., 1:2]
            w0_i = 1.0 - bu_i - bv_i
            for i in range(self.n_instances):
                g = self._inst_groups[self._inst_group_of[i]]
                m_i = (rel >= i * self._inst_gmax) \
                    & (rel < i * self._inst_gmax + g["n_faces"])
                face_l = jnp.clip(rel - i * self._inst_gmax, 0,
                                  g["n_faces"] - 1)
                Arow = gather_rows(g["attr"], face_l)      # (N, 38)
                A_t = self._inst_table[i, 0:9].reshape(3, 3)
                B_t = self._inst_table[i, 12:21].reshape(3, 3)
                ng_l = Arow[:, 9:12]
                ns_l = (Arow[:, 12:15] * w0_i + Arow[:, 15:18] * bu_i
                        + Arow[:, 18:21] * bv_i)
                uv_l = (Arow[:, 21:23] * w0_i + Arow[:, 23:25] * bu_i
                        + Arow[:, 25:27] * bv_i)
                ng_w = m.normalize(ng_l @ A_t)             # A^T n
                ns_w = m.normalize(ns_l @ A_t)
                du_w = Arow[:, 27:30] @ B_t.T
                dv_w = Arow[:, 30:33] @ B_t.T
                p_w = ray.o + pi.t[..., None] * ray.d
                w = m_i[..., None]
                p = jnp.where(w, p_w, p)
                ng = jnp.where(w, ng_w, ng)
                ns = jnp.where(w, ns_w, ns)
                uv = jnp.where(w, uv_l, uv)
                dp_du = jnp.where(w, du_w, dp_du)
                dp_dv = jnp.where(w, dv_w, dp_dv)
                shape_idx = jnp.where(
                    m_i, Arow[:, 33].astype(jnp.int32), shape_idx)
                bsdf_idx = jnp.where(
                    m_i, Arow[:, 34].astype(jnp.int32), bsdf_idx)
                emitter_idx = jnp.where(m_i, -1, emitter_idx)
        # Gram-Schmidt dp_du against the shading normal (mesh.cpp:463)
        s_axis = m.normalize(dp_du - ns * m.dot(ns, dp_du, keepdims=True))
        # guard degenerate tangents
        deg = m.squared_norm(s_axis) < 0.5
        fallback_s, fallback_t = m.coordinate_system(ns)
        s_axis = jnp.where(deg[..., None], fallback_s, s_axis)
        t_axis = m.normalize(m.cross(ns, s_axis))
        frame = Frame(s_axis, t_axis, ns)
        wi = frame.to_local(-ray.d)
        si = SurfaceInteraction(
            t=jnp.where(valid, pi.t, jnp.inf),
            p=p, n=ng, sh_frame=frame, uv=uv, wi=wi,
            dp_du=dp_du, dp_dv=dp_dv,
            shape_idx=jnp.where(valid, shape_idx, -1),
            prim_idx=pi.prim_idx,
            wavelengths=ray.wavelengths, time=ray.time,
            bsdf_idx=jnp.where(valid, bsdf_idx, -1),
            emitter_idx=jnp.where(valid, emitter_idx, -1),
            prim_uv=pi.prim_uv)
        return si

    def normal_derivative(self, si, active=True):
        """(mesh.cpp:521-539 / sphere.cpp:399) derivative of the shading
        normal w.r.t. the local triangle parameterization -> (dn_du,
        dn_dv), each (N, 3). Flat-shaded faces yield zero."""
        from ..ops.gather import gather_rows
        n_faces = int(self.geom.v0.shape[0])
        f = jnp.clip(si.prim_idx, 0, n_faces - 1)
        A = gather_rows(self.attr_table[:, 12:21], f)
        n0, n1, n2 = A[:, 0:3], A[:, 3:6], A[:, 6:9]
        bu = si.prim_uv[..., 0:1]
        bv = si.prim_uv[..., 1:2]
        N = bu * n1 + bv * n2 + (1.0 - bu - bv) * n0
        il = 1.0 / jnp.maximum(m.norm(N), 1e-20)[..., None]
        N = N * il
        dn_du = (n1 - n0) * il
        dn_dv = (n2 - n0) * il
        dn_du = dn_du - N * m.dot(N, dn_du, keepdims=True)
        dn_dv = dn_dv - N * m.dot(N, dn_dv, keepdims=True)
        if self.n_spheres:
            is_sph = ((si.prim_idx >= n_faces)
                      & (si.prim_idx < n_faces + self.n_spheres))[..., None]
            s_i = jnp.clip(si.prim_idx - n_faces, 0, self.n_spheres - 1)
            r = gather_rows(self.sph_table[:, 3:4], s_i)
            inv_r = 1.0 / jnp.maximum(r, 1e-20)
            dn_du = jnp.where(is_sph, si.dp_du * inv_r, dn_du)
            dn_dv = jnp.where(is_sph, si.dp_dv * inv_r, dn_dv)
        if self.n_instances:
            is_i = (si.prim_idx >= n_faces + self.n_spheres
                    + self.n_quads)[..., None]
            dn_du = jnp.where(is_i, 0.0, dn_du)
            dn_dv = jnp.where(is_i, 0.0, dn_dv)
        if self.n_quads:
            # disk: dn == 0 (disk.cpp:222); cylinder: dn_du = dp_du /
            # (r * flip), dn_dv = 0 (cylinder.cpp:384-387)
            is_q = ((si.prim_idx >= n_faces + self.n_spheres)
                    & (si.prim_idx < n_faces + self.n_spheres
                       + self.n_quads))[..., None]
            q_i = jnp.clip(si.prim_idx - n_faces - self.n_spheres, 0,
                           self.n_quads - 1)
            rowq = gather_rows(self.quad_table, q_i)
            is_cyl = (rowq[:, 21:22] > 1.5)
            denom = rowq[:, 22:23] * rowq[:, 29:30]
            dn_du_c = si.dp_du * m.safe_div(1.0, denom, 0.0)
            dn_du = jnp.where(is_q, jnp.where(is_cyl, dn_du_c, 0.0),
                              dn_du)
            dn_dv = jnp.where(is_q, 0.0, dn_dv)
        ok = jnp.asarray(active)[..., None] & si.is_valid()[..., None]
        return jnp.where(ok, dn_du, 0.0), jnp.where(ok, dn_dv, 0.0)

    def ray_intersect(self, ray, active=None) -> SurfaceInteraction:
        """(scene.h:38) closest-hit query returning a full interaction."""
        pi = self.ray_intersect_preliminary(ray, active)
        return self.compute_surface_interaction(ray, pi, active)

    def ray_test(self, ray, active=None):
        """(scene.h ray_test) occlusion query."""
        g = self.geom
        maxt = ray.maxt if active is None else jnp.where(active, ray.maxt,
                                                         -jnp.inf)
        if self._woop is not None \
                and not getattr(self, "_disable_pallas", False):
            t, _, _ = self._woop(ray.o, ray.d, ray.mint, maxt)
            hit = jnp.isfinite(t)
        else:
            hit = isect_ops.ray_test_packets(
                g.v0, g.e1, g.e2, ray.o, ray.d, ray.mint, maxt,
                chunk_bounds=self._chunk_bounds)
        if self.n_spheres:
            ts, _ = self._sphere_closest_hit(ray.o, ray.d, ray.mint, maxt)
            hit = hit | jnp.isfinite(ts)
        if self.n_quads:
            tq, _ = self._quad_closest_hit(ray.o, ray.d, ray.mint, maxt)
            hit = hit | jnp.isfinite(tq)
        if self.n_instances:
            ti, _, _ = self._instance_closest_hit(ray.o, ray.d, ray.mint,
                                                  maxt)
            hit = hit | jnp.isfinite(ti)
        return hit

    # ------------------------------------------------------- emitter sampling
    def emitter_index_at(self, si):
        """Emitter id for surface hits / environment misses (role of
        si.emitter(scene), interaction.h)."""
        if si.emitter_idx is not None:
            surf = si.emitter_idx
        else:
            g = self.geom
            surf = jnp.where(si.shape_idx >= 0,
                             g.shape_emitter[jnp.maximum(si.shape_idx, 0)],
                             -1)
        if self.environment_emitter is not None:
            env_idx = self.environment_emitter._emitter_index
            return jnp.where(si.is_valid(), surf, env_idx)
        return jnp.where(si.is_valid(), surf, -1)

    def eval_emitter(self, si, ray_d, active):
        """Radiance of the emitter seen by si (or the environment for
        misses), zero otherwise."""
        nch = current_variant().n_channels
        n = si.t.shape[0]
        out = jnp.zeros((n, nch), si.t.dtype)
        em_idx = self.emitter_index_at(si)
        for i, e in enumerate(self.emitters):
            mask = jnp.asarray(active) & (em_idx == i)
            if e.is_environment():
                # miss lanes: build a pseudo-interaction carrying -ray_d
                frame = Frame.from_normal(-ray_d)
                si_env = si._replace(wi=frame.to_local(-ray_d),
                                     sh_frame=frame,
                                     uv=_env_uv(ray_d))
                val = e.eval(si_env, mask)
            else:
                val = e.eval(si, mask)
            out = jnp.where(mask[..., None], val, out)
        return out

    def sample_emitter_direction(self, si, sample, test_visibility, active):
        """(scene.cpp:165-214) uniform emitter pick + per-emitter
        sample_direction + optional shadow ray."""
        n = si.t.shape[0]
        nch = current_variant().n_channels
        n_em = len(self.emitters)
        from ..models.emitters import _zero_ds
        if n_em == 0:
            return _zero_ds(n, si.t.dtype), jnp.zeros((n, nch), si.t.dtype)
        if n_em == 1:
            ds, spec = self.emitters[0].sample_direction(si, sample, active)
        else:
            emitter_pdf = 1.0 / n_em
            index = jnp.minimum((sample[..., 0] * n_em).astype(jnp.int32),
                                n_em - 1)
            sample = sample.at[..., 0].set(
                sample[..., 0] * n_em - index.astype(sample.dtype))

            def masked_loop(si_t, sample_t, act_t, idx_t):
                nt = si_t.t.shape[0]
                ds_ = _zero_ds(nt, si_t.t.dtype)
                spec_ = jnp.zeros((nt, nch), si_t.t.dtype)
                for i, e in enumerate(self.emitters):
                    mask = act_t & (idx_t == i)
                    ds_i, spec_i = e.sample_direction(si_t, sample_t,
                                                      mask)
                    ds_ = _tree_where(mask, ds_i, ds_)
                    spec_ = jnp.where(mask[..., None], spec_i, spec_)
                return ds_, spec_

            if self._sorted_dispatch_ok(n, n_em):
                # many-light scenes: sorted tile queue, one emitter per
                # uniform tile (same machinery as the BSDF dispatch)
                from ..ops.sorted_dispatch import dispatch_sorted

                def make_branch(i, e):
                    def br(ops):
                        si_t, sample_t, act_t, idx_t = ops
                        mask = act_t & (idx_t == i)
                        nt = si_t.t.shape[0]
                        ds_i, spec_i = e.sample_direction(si_t, sample_t,
                                                          mask)
                        return (_tree_where(mask, ds_i,
                                            _zero_ds(nt, si_t.t.dtype)),
                                jnp.where(mask[..., None], spec_i, 0.0))

                    return br

                act_ = jnp.broadcast_to(jnp.asarray(active), (n,))
                ds, spec = dispatch_sorted(
                    jnp.where(act_, index, -1),
                    (si, sample, act_, index),
                    [make_branch(i, e)
                     for i, e in enumerate(self.emitters)],
                    lambda ops: masked_loop(*ops))
            else:
                ds, spec = masked_loop(si, sample, jnp.asarray(active),
                                       index)
            ds = ds._replace(pdf=ds.pdf * emitter_pdf)
            spec = spec * n_em
        active = jnp.asarray(active) & (ds.pdf != 0)
        if test_visibility:
            ray, _ = _shadow_ray(si, ds)
            occluded = self.ray_test(ray, active)
            spec = jnp.where((jnp.asarray(active) & ~occluded)[..., None],
                             spec, 0.0)
        else:
            spec = jnp.where(jnp.asarray(active)[..., None], spec, 0.0)
        return ds, spec

    # --------------------------------------------------------- medium dispatch
    # Role of the reference's medium vcalls (medium.h:122-124): masked
    # per-instance evaluation like BSDFs.
    def medium_sample_interaction(self, ray, u, channel, medium_idx, active):
        from ..models.media_impl import _zero_mi
        nch = current_variant().n_channels
        n = ray.o.shape[0]
        # match the ray's wavelength width (spectral variants carry
        # (n, 4); _zero_mi defaults to (n, 0) and _tree_where would fail)
        mi = _zero_mi(n, nch, ray.o.dtype)._replace(
            wavelengths=jnp.zeros_like(ray.wavelengths))
        for i, med in enumerate(self.media):
            mask = jnp.asarray(active) & (medium_idx == i)
            mi_i = med.sample_interaction(ray, u, channel, mask)
            mi = _tree_where(mask, mi_i, mi)
        return mi

    def medium_eval_tr_and_pdf(self, mi, si_t, medium_idx, active):
        nch = current_variant().n_channels
        n = mi.t.shape[0]
        tr = jnp.ones((n, nch), mi.t.dtype)
        pdf = jnp.ones((n, nch), mi.t.dtype)
        for i, med in enumerate(self.media):
            mask = jnp.asarray(active) & (medium_idx == i)
            tr_i, pdf_i = med.eval_tr_and_pdf(mi, si_t, mask)
            tr = jnp.where(mask[..., None], tr_i, tr)
            pdf = jnp.where(mask[..., None], pdf_i, pdf)
        return tr, pdf

    def medium_phase_sample(self, mi, medium_idx, u2, active):
        n = mi.t.shape[0]
        wo = jnp.zeros((n, 3), mi.t.dtype).at[..., 2].set(1.0)
        pdf = jnp.zeros((n,), mi.t.dtype)
        for i, med in enumerate(self.media):
            mask = jnp.asarray(active) & (medium_idx == i)
            wo_i, pdf_i = med.phase_function.sample(mi, u2, mask)
            wo = jnp.where(mask[..., None], wo_i, wo)
            pdf = jnp.where(mask, pdf_i, pdf)
        return wo, pdf

    def medium_phase_eval(self, mi, wo, medium_idx, active):
        n = mi.t.shape[0]
        out = jnp.zeros((n,), mi.t.dtype)
        for i, med in enumerate(self.media):
            mask = jnp.asarray(active) & (medium_idx == i)
            out = jnp.where(mask, med.phase_function.eval(mi, wo, mask), out)
        return out

    def medium_is_homogeneous(self, medium_idx):
        flags = jnp.asarray(np.asarray(
            [bool(med.is_homogeneous) for med in self.media]
            or [False]))
        return jnp.where(medium_idx >= 0,
                         flags[jnp.maximum(medium_idx, 0)], False)

    def medium_transition(self, si, d, medium_idx, active):
        """Update the per-lane medium when crossing a transition surface
        (interaction.h target_medium semantics): entering (d . n < 0) picks
        the interior medium, leaving picks the exterior."""
        from ..ops.gather import gather_rows
        n_faces = int(self.geom.v0.shape[0])
        f = jnp.clip(si.prim_idx, 0, n_faces - 1)
        med_cols = gather_rows(self.attr_table[:, 36:38], f)
        has_int = med_cols[:, 0].astype(jnp.int32)
        has_ext = med_cols[:, 1].astype(jnp.int32)
        if self.n_spheres:
            is_sph = si.prim_idx >= n_faces
            s_i = jnp.clip(si.prim_idx - n_faces, 0, self.n_spheres - 1)
            srow = gather_rows(self.sph_table[:, 7:9], s_i)
            has_int = jnp.where(is_sph, srow[:, 0].astype(jnp.int32),
                                has_int)
            has_ext = jnp.where(is_sph, srow[:, 1].astype(jnp.int32),
                                has_ext)
        is_transition = (si.shape_idx >= 0) & ((has_int >= 0) | (has_ext >= 0))
        entering = m.dot(d, si.n) < 0
        target = jnp.where(entering, has_int, has_ext)
        return jnp.where(jnp.asarray(active) & is_transition, target,
                         medium_idx)

    # ---------------------------------------------------------- bsdf dispatch
    # Role of Enoki's vectorized vcalls (bsdf.h:522-532): evaluate each BSDF
    # instance masked by its lanes and blend. Instances present is static.
    def bsdf_index_at(self, si):
        if si.bsdf_idx is not None:
            return si.bsdf_idx
        g = self.geom
        return jnp.where(si.shape_idx >= 0,
                         g.shape_bsdf[jnp.maximum(si.shape_idx, 0)], -1)

    def bsdf_flags_at(self, si):
        """Per-lane uint32 BSDFFlags of the lane's BSDF."""
        from ..ops.gather import gather_rows
        idx = self.bsdf_index_at(si)
        flags_f = jnp.asarray(np.asarray(
            [[float(int(b.flags()))] for b in self.bsdfs], np.float32))
        gathered = gather_rows(flags_f, jnp.maximum(idx, 0))[:, 0]
        return jnp.where(idx >= 0, gathered.astype(jnp.uint32),
                         jnp.uint32(0))

    def _bsdf_flags_at_slow(self, si):
        flags = jnp.asarray(
            np.asarray([int(b.flags()) for b in self.bsdfs], np.uint32))
        idx = self.bsdf_index_at(si)
        return jnp.where(idx >= 0, flags[jnp.maximum(idx, 0)], 0)

    def _sorted_dispatch_ok(self, n_lanes: int,
                            n_families: int | None = None) -> bool:
        """True when heterogeneous-family dispatch should ride the sorted
        tile queue (ops/sorted_dispatch.py) instead of masked sweeps."""
        import os
        mode = os.environ.get("MI_SORTED_DISPATCH", "auto")
        if mode == "off":
            return False
        if n_families is None:
            n_families = len(self.bsdfs)
        from ..ops.sorted_dispatch import worth_sorting
        if mode == "on":
            return n_families > 1 and n_lanes >= 8192
        return worth_sorting(n_lanes, n_families)

    def bsdf_eval(self, ctx, si, wo, active):
        nch = current_variant().n_channels
        out = jnp.zeros(si.t.shape + (nch,), si.t.dtype)
        idx = self.bsdf_index_at(si)
        for i, b in enumerate(self.bsdfs):
            mask = jnp.asarray(active) & (idx == i)
            out = jnp.where(mask[..., None], b.eval(ctx, si, wo, mask), out)
        return out

    def bsdf_pdf(self, ctx, si, wo, active):
        out = jnp.zeros(si.t.shape, si.t.dtype)
        idx = self.bsdf_index_at(si)
        for i, b in enumerate(self.bsdfs):
            mask = jnp.asarray(active) & (idx == i)
            out = jnp.where(mask, b.pdf(ctx, si, wo, mask), out)
        return out

    def bsdf_eval_pdf(self, ctx, si, wo, active):
        """eval + pdf fused in one dispatch (the NEE hot pair). On
        many-family scenes lanes are sorted by family so each uniform
        tile runs one family's code (bsdf.h:522-532 vcall partitioning;
        ops/sorted_dispatch.py)."""
        n = si.t.shape[0]
        nch = current_variant().n_channels
        idx = self.bsdf_index_at(si)
        active = jnp.asarray(active) & (idx >= 0)
        if not self._sorted_dispatch_ok(n):
            return (self.bsdf_eval(ctx, si, wo, active),
                    self.bsdf_pdf(ctx, si, wo, active))
        from ..ops.sorted_dispatch import dispatch_sorted

        def make_branch(i, b):
            def br(ops):
                si_t, wo_t, act_t, idx_t = ops
                mask = act_t & (idx_t == i)
                val = jnp.where(mask[..., None],
                                b.eval(ctx, si_t, wo_t, mask), 0.0)
                pdf = jnp.where(mask, b.pdf(ctx, si_t, wo_t, mask), 0.0)
                return val, pdf

            return br

        def fallback(ops):
            si_t, wo_t, act_t, idx_t = ops
            val = jnp.zeros(si_t.t.shape + (nch,), si_t.t.dtype)
            pdf = jnp.zeros(si_t.t.shape, si_t.t.dtype)
            for i, b in enumerate(self.bsdfs):
                mask = act_t & (idx_t == i)
                val = jnp.where(mask[..., None],
                                b.eval(ctx, si_t, wo_t, mask), val)
                pdf = jnp.where(mask, b.pdf(ctx, si_t, wo_t, mask), pdf)
            return val, pdf

        branches = [make_branch(i, b) for i, b in enumerate(self.bsdfs)]
        lane_idx = jnp.where(active, idx, -1)
        return dispatch_sorted(lane_idx, (si, wo, active, idx),
                               branches, fallback)

    def bsdf_sample(self, ctx, si, sample1, sample2, active):
        from ..render.bsdf import zero_bsdf_sample
        n = si.t.shape[0]
        nch = current_variant().n_channels
        idx = self.bsdf_index_at(si)
        if self._sorted_dispatch_ok(n):
            from ..ops.sorted_dispatch import dispatch_sorted
            active_ = jnp.asarray(active) & (idx >= 0)

            def make_branch(i, b):
                def br(ops):
                    si_t, s1_t, s2_t, act_t, idx_t = ops
                    mask = act_t & (idx_t == i)
                    bs_i, val_i = b.sample(ctx, si_t, s1_t, s2_t, mask)
                    nt = si_t.t.shape[0]
                    bs0 = zero_bsdf_sample(nt, si_t.t.dtype)
                    return (_tree_where(mask, bs_i, bs0),
                            jnp.where(mask[..., None], val_i, 0.0))

                return br

            def fallback(ops):
                si_t, s1_t, s2_t, act_t, idx_t = ops
                nt = si_t.t.shape[0]
                bs = zero_bsdf_sample(nt, si_t.t.dtype)
                value = jnp.zeros((nt, nch), si_t.t.dtype)
                for i, b in enumerate(self.bsdfs):
                    mask = act_t & (idx_t == i)
                    bs_i, val_i = b.sample(ctx, si_t, s1_t, s2_t, mask)
                    bs = _tree_where(mask, bs_i, bs)
                    value = jnp.where(mask[..., None], val_i, value)
                return bs, value

            branches = [make_branch(i, b)
                        for i, b in enumerate(self.bsdfs)]
            lane_idx = jnp.where(active_, idx, -1)
            return dispatch_sorted(
                lane_idx, (si, sample1, sample2, active_, idx),
                branches, fallback)
        bs = zero_bsdf_sample(n, si.t.dtype)
        value = jnp.zeros((n, nch), si.t.dtype)
        for i, b in enumerate(self.bsdfs):
            mask = jnp.asarray(active) & (idx == i)
            bs_i, val_i = b.sample(ctx, si, sample1, sample2, mask)
            bs = _tree_where(mask, bs_i, bs)
            value = jnp.where(mask[..., None], val_i, value)
        return bs, value

    def pdf_emitter_direction(self, si, ds, active):
        """(scene.cpp pdf_emitter_direction) solid-angle density of
        sample_emitter_direction for MIS."""
        n_em = len(self.emitters)
        if n_em == 0:
            return jnp.zeros(si.t.shape, si.t.dtype)

        def masked_loop(si_t, ds_t, act_t):
            pdf_ = jnp.zeros(si_t.t.shape, si_t.t.dtype)
            for i, e in enumerate(self.emitters):
                mask = act_t & (ds_t.emitter_idx == i)
                pdf_ = jnp.where(mask, e.pdf_direction(si_t, ds_t, mask),
                                 pdf_)
            return pdf_

        if self._sorted_dispatch_ok(si.t.shape[0], n_em):
            from ..ops.sorted_dispatch import dispatch_sorted

            def make_branch(i, e):
                def br(ops):
                    si_t, ds_t, act_t = ops
                    mask = act_t & (ds_t.emitter_idx == i)
                    return jnp.where(mask,
                                     e.pdf_direction(si_t, ds_t, mask),
                                     0.0)

                return br

            act_ = jnp.broadcast_to(jnp.asarray(active), si.t.shape)
            pdf = dispatch_sorted(
                jnp.where(act_, ds.emitter_idx, -1), (si, ds, act_),
                [make_branch(i, e) for i, e in enumerate(self.emitters)],
                lambda ops: masked_loop(*ops))
        else:
            pdf = masked_loop(si, ds, jnp.asarray(active))
        return pdf * (1.0 / n_em)

    def traverse(self, cb):
        for i, s in enumerate(self.shapes):
            cb.put_object(s.id or f"shape_{i}", s)
        for i, e in enumerate(self.emitters):
            if e.shape is None:
                cb.put_object(e.id or f"emitter_{i}", e)
        for i, s in enumerate(self.sensors):
            cb.put_object(s.id or f"sensor_{i}", s)


class _PerShapeTexture:
    """Texture gathering per-shape constants from the live source textures
    (material-merge support). Duck-typed subset of the Texture interface."""

    plugin_category = "texture"

    def __init__(self, textures, shape_slot):
        self.textures = textures
        self.shape_slot = jnp.asarray(shape_slot)

    def _table(self, wavelengths):
        var = current_variant()
        if var.is_rgb:
            return jnp.stack([t.data.rgb for t in self.textures])
        if var.is_monochromatic:
            return jnp.stack([t.data.mono for t in self.textures])
        return jnp.stack([t.data.coeff for t in self.textures])

    def _slot_at(self, si):
        from ..ops.gather import gather_rows
        slot_f = self.shape_slot.astype(jnp.float32)[:, None]
        return gather_rows(slot_f, jnp.maximum(si.shape_idx, 0))[:, 0] \
            .astype(jnp.int32)

    def eval(self, si, active=True):
        from ..ops.gather import gather_rows
        var = current_variant()
        table = self._table(si.wavelengths)
        vals = gather_rows(table.reshape(table.shape[0], -1),
                           self._slot_at(si)).reshape(
            (si.t.shape[0],) + table.shape[1:])
        if var.is_spectral:
            from .srgb import srgb_model_eval
            return srgb_model_eval(vals, si.wavelengths)
        return vals

    def eval_3(self, si, active=True):
        from ..ops.gather import gather_rows
        table = jnp.stack([t.data.rgb for t in self.textures])
        return gather_rows(table, self._slot_at(si))

    def eval_1(self, si, active=True):
        from ..core import spectrum as spec
        return spec.luminance(self.eval_3(si, active))

    def mean(self):
        return float(np.mean([t.mean() for t in self.textures]))

    def is_spatially_varying(self):
        return True

    def traverse(self, cb):
        for i, t in enumerate(self.textures):
            cb.put_object(f"source_{i}", t)


def _mesh_face_arrays(s):
    """Per-face SoA attribute arrays for one mesh (the packing math of
    Scene._compile, shared with the instanced-group tables):
    -> (v0, e1, e2, ng, ns (f,3,3), uvs (f,3,2), dp_du, dp_dv)."""
    p = s.vertices[s.faces]                      # (f,3,3)
    v0 = p[:, 0]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    fn = np.cross(e1, e2)
    ng = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True),
                         1e-20)
    if s.normals is not None and not s.face_normals_only:
        ns = s.normals[s.faces]                  # (f,3,3)
    else:
        ns = np.repeat(ng[:, None, :], 3, axis=1)
    if s.uvs is not None:
        uvs = s.uvs[s.faces]                     # (f,3,2)
    else:
        uvs = np.zeros((len(v0), 3, 2), np.float32)
        uvs[:, 1, 0] = 1.0
        uvs[:, 2, 1] = 1.0
    # uv-parameterization tangents: solve [e1;e2] = J * [duv1;duv2]
    duv1 = uvs[:, 1] - uvs[:, 0]
    duv2 = uvs[:, 2] - uvs[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok = np.abs(det) > 1e-9
    inv = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    dp_du = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv[:, None]
    dp_dv = (-duv2[:, 0:1] * e1 + duv1[:, 0:1] * e2) * inv[:, None]
    dp_du = np.where(ok[:, None], dp_du, e1)
    dp_dv = np.where(ok[:, None], dp_dv, e2)
    return v0, e1, e2, ng, ns, uvs, dp_du, dp_dv


def _tree_where(mask, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x, y),
        a, b)


def _shadow_ray(si, ds):
    """Shadow ray with Ray/ShadowEpsilon offsets (scene.cpp:204-206)."""
    from ..core.ray import Ray
    mint = m.RayEpsilon * (1.0 + jnp.max(jnp.abs(si.p), axis=-1))
    maxt = ds.dist * (1.0 - m.ShadowEpsilon)
    ray = Ray.make(si.p, ds.d, mint=mint, maxt=maxt, time=si.time,
                   wavelengths=si.wavelengths)
    return ray, ds.dist


def _env_uv(d):
    """Lat-long parameterization of a direction (envmap.cpp convention)."""
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * m.InvTwoPi + 0.5
    v = m.safe_acos(d[..., 1]) * m.InvPi
    return jnp.stack([u, v], axis=-1)
