"""Shape plugins (reference: src/shapes/ — obj, ply, serialized, rectangle,
disk, sphere, cylinder, cube is rectangle-composed in the reference's scene
assets; SURVEY.md §2.3).

Exact-intersection tier: rectangle/cube are flat meshes (exact);
sphere/disk/cylinder are ANALYTIC prims intersected through the scene's
packed quadric tables (sphere: sph_table; disk/cylinder: quad_table with a
canonical-frame to_object transform). Analytic prims tessellate only when
they carry an emitter (area sampling runs on mesh face tables).
"""

from __future__ import annotations

import numpy as np

from ..core.object import register_plugin
from ..core.properties import Properties
from ..core.transform import Transform
from ..render.shape import Mesh, Shape


def _get_to_world(props) -> Transform:
    if props is not None and props.has_property("to_world"):
        return props.transform("to_world")
    return Transform.identity()


@register_plugin("shape", "rectangle")
class RectangleShape(Mesh):
    """(rectangle.cpp) unit rectangle in the xy-plane spanning [-1,1]^2,
    normal +z. Exact as a 2-triangle mesh."""

    def __init__(self, props=None):
        v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        flip = props.bool_("flip_normals", False) if props else False
        super().__init__(props, vertices=v, faces=f, normals=n, uvs=uv,
                         name="rectangle")
        self.apply_transform(_get_to_world(props))
        if flip:
            self.faces = self.faces[:, ::-1].copy()
            self.normals = -self.normals


@register_plugin("shape", "cube")
class CubeShape(Mesh):
    """Axis-aligned [-1,1]^3 cube (the reference ships cube meshes via OBJ;
    a first-class plugin here)."""

    def __init__(self, props=None):
        vs, fs, ns, uvs = [], [], [], []
        idx = 0
        for axis in range(3):
            for sgn in (-1.0, 1.0):
                n = np.zeros(3, np.float32)
                n[axis] = sgn
                u = np.zeros(3, np.float32)
                u[(axis + 1) % 3] = 1.0
                v = np.cross(n, u)
                c = n  # face center
                quad = [c - u - v, c + u - v, c + u + v, c - u + v]
                vs.extend(quad)
                ns.extend([n] * 4)
                uvs.extend([[0, 0], [1, 0], [1, 1], [0, 1]])
                if sgn > 0:
                    fs.extend([[idx, idx + 1, idx + 2], [idx, idx + 2, idx + 3]])
                else:
                    fs.extend([[idx, idx + 2, idx + 1], [idx, idx + 3, idx + 2]])
                idx += 4
        ns = np.asarray(ns, np.float32)
        fs = np.asarray(fs, np.int32)
        # fix winding so geometric normals match stored normals
        super().__init__(props, vertices=np.asarray(vs, np.float32),
                         faces=fs, normals=None, uvs=np.asarray(uvs,
                                                                np.float32),
                         name="cube")
        p = self.vertices[self.faces]
        gn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        face_n = ns[self.faces[:, 0]]
        flip = (gn * face_n).sum(-1) < 0
        self.faces[flip] = self.faces[flip][:, ::-1]
        self.normals = ns
        self.face_normals_only = True  # flat shading
        self.apply_transform(_get_to_world(props))


def _sphere_mesh(radius=1.0, center=(0, 0, 0), n_theta=32, n_phi=64):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(T) * np.cos(P)
    y = np.sin(T) * np.sin(P)
    z = np.cos(T)
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    uv = np.stack([P / (2 * np.pi), 1.0 - T / np.pi], -1).reshape(-1, 2)
    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            if i > 0:
                faces.append([a, c, b])
            if i < n_theta - 1:
                faces.append([b, c, d])
    v = pts * radius + np.asarray(center, np.float32)
    return (v.astype(np.float32), np.asarray(faces, np.int32),
            pts.astype(np.float32), uv.astype(np.float32))


@register_plugin("shape", "sphere")
class SphereShape(Shape):
    """(sphere.cpp:1-463) analytic sphere: exact quadric intersection via
    the scene's packed sphere table (render/scene.py sph_table) — no
    tessellation error. Falls back to a tessellated mesh via expand() when
    the sphere carries an emitter (area sampling runs on the mesh face
    tables) or when to_world applies a non-uniform scale (ellipsoid)."""

    def __init__(self, props=None, center=(0, 0, 0), radius=1.0):
        p = props or Properties("sphere")
        super().__init__(p)
        radius = p.float_("radius", radius)
        center = np.asarray(p.get("center", center), np.float32).reshape(3)
        self._res = int(p.int_("resolution_hint", 64))
        self.flip_normals = p.bool_("flip_normals", False)
        tw = _get_to_world(props)
        M = np.asarray(tw.matrix)
        lin = M[:3, :3]
        scales = np.linalg.norm(lin, axis=0)
        self._uniform = bool(np.allclose(scales, scales[0], rtol=1e-4))
        self.center = (lin @ center + M[:3, 3]).astype(np.float32)
        self.radius = float(radius * scales[0])
        self._scales = scales
        self._to_world = tw
        self._orig = (center, radius)

    def is_analytic(self):
        return True

    def expand(self):
        if self.emitter is not None or self.sensor is not None \
                or not self._uniform:
            return [self._tessellate()]
        return [self]

    def _tessellate(self) -> Mesh:
        c0, r0 = self._orig
        v, f, n, uv = _sphere_mesh(r0, c0, self._res // 2, self._res)
        mesh = Mesh(None, vertices=v, faces=f, normals=n, uvs=uv,
                    name="sphere")
        mesh.apply_transform(self._to_world)
        if self.flip_normals:
            mesh.faces = mesh.faces[:, ::-1].copy()
            mesh.normals = -mesh.normals
        mesh.bsdf = self.bsdf
        mesh.emitter = self.emitter
        mesh.sensor = self.sensor
        mesh.interior_medium = self.interior_medium
        mesh.exterior_medium = self.exterior_medium
        if self.emitter is not None:
            self.emitter.set_shape(mesh)
        if self.sensor is not None and hasattr(self.sensor, "set_shape"):
            self.sensor.set_shape(mesh)
        return mesh

    def surface_area(self) -> float:
        return 4.0 * np.pi * self.radius ** 2

    def bbox(self):
        return self.center - self.radius, self.center + self.radius


class _AnalyticQuadric(Shape):
    """Base for exactly-intersected non-sphere quadric prims (disk,
    cylinder): world rays transform into a canonical object frame via a
    packed to_object matrix (scene.py quad_table) — the TPU-table form of
    the reference's `m_to_object.transform_affine(ray)` pattern
    (disk.cpp:146-166, cylinder.cpp:243-291)."""

    QUAD_KIND = 0.0

    def is_analytic(self):
        return True

    def is_quadric(self):
        return True

    def expand(self):
        # emitters/sensors need mesh area-sampling tables (SphereShape)
        if self.emitter is not None or self.sensor is not None:
            return [self._tessellate()]
        return [self]

    def _finish_tessellation(self, mesh):
        mesh.bsdf = self.bsdf
        mesh.emitter = self.emitter
        mesh.sensor = self.sensor
        mesh.interior_medium = self.interior_medium
        mesh.exterior_medium = self.exterior_medium
        if self.emitter is not None:
            self.emitter.set_shape(mesh)
        if self.sensor is not None and hasattr(self.sensor, "set_shape"):
            self.sensor.set_shape(mesh)
        return mesh

    def prim_row(self):
        """-> 24 floats [A rows 0:9 | b 9:12 | B rows 12:21 | kind 21 |
        radius 22 | length 23]; A = to_object linear, b = to_object
        translation, B = to_world linear."""
        A = self._A
        b = self._b
        B = self._B
        return np.concatenate([
            A.reshape(9), b.reshape(3), B.reshape(9),
            np.asarray([self.QUAD_KIND, getattr(self, "radius", 1.0),
                        getattr(self, "length", 1.0)], np.float32)]
        ).astype(np.float32)


@register_plugin("shape", "disk")
class DiskShape(_AnalyticQuadric):
    """(disk.cpp:85-225) unit disk z=0 in object space, EXACT analytic
    intersection under an arbitrary affine to_world (ellipses included) —
    replaces round 1's tessellation and its silhouette error."""

    QUAD_KIND = 1.0

    def __init__(self, props=None):
        p = props or Properties("disk")
        super().__init__(p)
        self._res = int(p.int_("resolution_hint", 64))
        self.flip_normals = p.bool_("flip_normals", False)
        tw = _get_to_world(props)
        M = np.asarray(tw.matrix, np.float64)
        self._B = M[:3, :3].astype(np.float32)
        A = np.linalg.inv(M[:3, :3])
        self._A = A.astype(np.float32)
        self._b = (-A @ M[:3, 3]).astype(np.float32)
        self._to_world = tw
        # du/dv lengths for surface_area (disk.cpp:85-110)
        dp_du = M[:3, 0]
        dp_dv = M[:3, 1]
        self._du = float(np.linalg.norm(dp_du))
        self._dv = float(np.linalg.norm(dp_dv))
        n = np.cross(dp_du, dp_dv)
        self._n_world = (n / max(np.linalg.norm(n), 1e-20)).astype(
            np.float32)

    def surface_area(self) -> float:
        # ellipse area pi * du * h (disk.cpp:107-110)
        dp_du = self._B[:, 0]
        dp_dv = self._B[:, 1]
        s_axis = dp_du / max(self._du, 1e-20)
        h = np.sqrt(max(self._dv ** 2 - float(np.dot(dp_dv, s_axis)) ** 2,
                        0.0))
        return float(np.pi * self._du * h)

    def bbox(self):
        M = np.asarray(self._to_world.matrix)
        pts = np.asarray([[x, y, 0.0, 1.0] for x in (-1, 1)
                          for y in (-1, 1)], np.float64) @ M.T
        return (pts[:, :3].min(0).astype(np.float32),
                pts[:, :3].max(0).astype(np.float32))

    def _tessellate(self):
        res = self._res
        ph = np.linspace(0, 2 * np.pi, res, endpoint=False)
        rim = np.stack([np.cos(ph), np.sin(ph), np.zeros_like(ph)], -1)
        v = np.concatenate([[[0, 0, 0]], rim]).astype(np.float32)
        f = np.asarray([[0, 1 + i, 1 + (i + 1) % res]
                        for i in range(res)], np.int32)
        n = np.tile(np.array([[0, 0, 1]], np.float32), (len(v), 1))
        uv = 0.5 * (v[:, :2] + 1.0)
        mesh = Mesh(None, vertices=v, faces=f, normals=n, uvs=uv,
                    name="disk")
        mesh.apply_transform(self._to_world)
        return self._finish_tessellation(mesh)


@register_plugin("shape", "cylinder")
class CylinderShape(_AnalyticQuadric):
    """(cylinder.cpp:83-390) open cylinder from p0 to p1, EXACT quadric
    intersection: to_world composes translate(p0) x frame(p1-p0) x
    scale(radius) like the reference, then radius/length are extracted
    and the residual rigid transform packs into the quad table."""

    QUAD_KIND = 2.0

    def __init__(self, props=None):
        p = props or Properties("cylinder")
        super().__init__(p)
        self._res = int(p.int_("resolution_hint", 64))
        self.flip_normals = p.bool_("flip_normals", False)
        radius = p.float_("radius", 1.0)
        p0 = np.asarray(p.vector3("p0", [0, 0, 0]), np.float64)
        p1 = np.asarray(p.vector3("p1", [0, 0, 1]), np.float64)
        tw = _get_to_world(props)
        M = np.asarray(tw.matrix, np.float64).copy()
        # compose: to_world * translate(p0) * to_frame(p1-p0) * scale(r,r,1)
        axis = p1 - p0
        ln = np.linalg.norm(axis)
        az = axis / max(ln, 1e-12)
        # branchless ONB (Duff et al.) — the reference's Frame3f /
        # coordinate_system convention, so uv phases line up
        sgn = 1.0 if az[2] >= 0 else -1.0
        a_ = -1.0 / (sgn + az[2])
        b_ = az[0] * az[1] * a_
        ax = np.asarray([1.0 + sgn * az[0] * az[0] * a_, sgn * b_,
                         -sgn * az[0]])
        ay = np.asarray([b_, sgn + az[1] * az[1] * a_, -az[1]])
        L = np.eye(4)
        L[:3, 0] = ax * radius
        L[:3, 1] = ay * radius
        L[:3, 2] = az * ln
        L[:3, 3] = p0
        M = M @ L
        # extract per-axis scale (cylinder.cpp update(): to_world must be
        # shear-free with uniform xy scale)
        sx = np.linalg.norm(M[:3, 0])
        sy = np.linalg.norm(M[:3, 1])
        sz = np.linalg.norm(M[:3, 2])
        self.radius = float(0.5 * (sx + sy))
        self.length = float(sz)
        R = np.stack([M[:3, 0] / max(sx, 1e-20), M[:3, 1] / max(sy, 1e-20),
                      M[:3, 2] / max(sz, 1e-20)], axis=1)
        self._B = R.astype(np.float32)             # rigid to_world linear
        A = R.T                                    # rigid inverse
        self._A = A.astype(np.float32)
        self._b = (-A @ M[:3, 3]).astype(np.float32)
        Mw = np.eye(4, dtype=np.float64)
        Mw[:3, :3] = R
        Mw[:3, 3] = M[:3, 3]
        self._to_world_rigid = Transform.from_matrix(Mw.astype(np.float32))

    def surface_area(self) -> float:
        return float(2.0 * np.pi * self.radius * self.length)

    def bbox(self):
        B = self._B.astype(np.float64)
        x1 = B[:, 0] * self.radius
        x2 = B[:, 1] * self.radius
        x = np.sqrt(x1 * x1 + x2 * x2)
        t = -self._A.T.astype(np.float64) @ self._b  # world origin
        q0 = t
        q1 = t + B[:, 2] * self.length
        return (np.minimum(q0 - x, q1 - x).astype(np.float32),
                np.maximum(q0 + x, q1 + x).astype(np.float32))

    def _tessellate(self):
        res = self._res
        ph = np.linspace(0, 2 * np.pi, res, endpoint=False)
        ring = np.stack([np.cos(ph), np.sin(ph), np.zeros_like(ph)],
                        -1) * self.radius
        bottom = ring
        top = ring + np.asarray([0, 0, self.length])
        v = np.concatenate([bottom, top]).astype(np.float32)
        n = np.concatenate([ring, ring]).astype(np.float32)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        uv = np.concatenate([
            np.stack([ph / (2 * np.pi), np.zeros_like(ph)], -1),
            np.stack([ph / (2 * np.pi), np.ones_like(ph)], -1)]
        ).astype(np.float32)
        faces = []
        for i in range(res):
            a, b = i, (i + 1) % res
            faces.append([a, b, res + a])
            faces.append([b, res + b, res + a])
        if self.flip_normals:
            faces = [f[::-1] for f in faces]
            n = -n
        mesh = Mesh(None, vertices=v,
                    faces=np.asarray(faces, np.int32), normals=n, uvs=uv,
                    name="cylinder")
        mesh.apply_transform(self._to_world_rigid)
        return self._finish_tessellation(mesh)


@register_plugin("shape", "obj")
class OBJShape(Mesh):
    """(obj.cpp:1-354) Wavefront OBJ loader."""

    def __init__(self, props=None):
        from ..utils.io_obj import load_obj
        p = props
        filename = p.string("filename")
        face_normals = p.bool_("face_normals", False)
        v, f, n, uv = load_obj(filename)
        if face_normals:
            n = None
        super().__init__(props, vertices=v, faces=f, normals=n, uvs=uv,
                         name=filename)
        self.apply_transform(_get_to_world(props))


@register_plugin("shape", "ply")
class PLYShape(Mesh):
    """(ply.cpp:1-786) Stanford PLY loader (ascii + binary)."""

    def __init__(self, props=None):
        from ..utils.io_ply import load_ply
        p = props
        filename = p.string("filename")
        face_normals = p.bool_("face_normals", False)
        v, f, n, uv, attrs = load_ply(filename)
        if face_normals:
            n = None
        super().__init__(props, vertices=v, faces=f, normals=n, uvs=uv,
                         name=filename)
        # custom vertex attributes -> mesh attribute buffers
        # (ply.cpp:180-267, mesh.h:68-76)
        for name, data in attrs.items():
            self.add_attribute(name, data.shape[1], data)
        self.apply_transform(_get_to_world(props))


@register_plugin("shape", "shapegroup")
class ShapeGroup(Mesh):
    """(shapegroup.cpp + shapegroup.h:15) a named collection of shapes meant
    to be instanced; never rendered directly (expand() -> [])."""

    def __init__(self, props=None):
        self.children = []
        if props is not None:
            for _, obj in props.objects():
                if getattr(obj, "plugin_category", "") == "shape":
                    if obj.is_analytic():
                        # instancing materializes transformed mesh copies;
                        # analytic prims tessellate when grouped
                        obj = obj._tessellate()
                    self.children.append(obj)
        # dummy empty mesh payload
        super().__init__(props, vertices=np.zeros((0, 3), np.float32),
                         faces=np.zeros((0, 3), np.int32), name="shapegroup")

    def expand(self):
        return []   # only instances materialize geometry


# below this many TOTAL duplicated faces an instance materializes
# transformed copies (cheap, keeps the megakernel fast path); above it the
# scene uses the shared-geometry path: ONE packed copy of the group plus a
# per-instance to_object transform — O(1) memory in the instance count
# (shapegroup.h:15 shared sub-accel role)
# groups at or below this face count materialize transformed copies by
# default: with the megakernel's HBM-BVH tier (1M-face budget) this keeps
# typical instanced scenes on the fast path; bigger groups take the
# O(1)-memory shared-geometry path (wavefront)
INSTANCE_MATERIALIZE_FACES = 65536


@register_plugin("shape", "instance")
class Instance(Mesh):
    """(instance.cpp) instantiates a shapegroup under a transform.

    Small groups materialize transformed copies (fast-path friendly);
    large ones share ONE packed geometry block through the scene's
    instance table (render/scene.py _instance_closest_hit), with rays
    transformed into the group frame like the reference's nested accel."""

    def __init__(self, props=None):
        group = None
        if props is not None:
            for _, obj in props.objects():
                if isinstance(obj, ShapeGroup):
                    group = obj
        if group is None:
            raise RuntimeError("instance requires a shapegroup reference")
        self.group = group
        self.to_world = _get_to_world(props)
        self.materialize = None
        if props is not None and props.has_property("materialize"):
            self.materialize = props.bool_("materialize")
        super().__init__(props, vertices=np.zeros((0, 3), np.float32),
                         faces=np.zeros((0, 3), np.int32), name="instance")
        # shared-path packed transforms
        M = np.asarray(self.to_world.matrix, np.float64)
        A = np.linalg.inv(M[:3, :3])
        self._A = A.astype(np.float32)                 # to_object linear
        self._b = (-A @ M[:3, 3]).astype(np.float32)
        self._B = M[:3, :3].astype(np.float32)         # to_world linear

    def is_instance(self):
        return True

    def group_face_count(self):
        return sum(len(c.faces) for c in self.group.children
                   if c.is_mesh())

    def _materialized(self):
        import copy
        out = []
        for child in self.group.children:
            if not child.is_mesh():
                continue
            dup = copy.copy(child)
            dup.vertices = child.vertices.copy()
            dup.faces = child.faces.copy()
            dup.normals = None if child.normals is None \
                else child.normals.copy()
            dup.apply_transform(self.to_world)
            out.append(dup)
        return out

    def expand(self):
        if self.materialize is True:
            return self._materialized()
        if self.materialize is False:
            return [self]
        if self.group_face_count() <= INSTANCE_MATERIALIZE_FACES:
            return self._materialized()
        return [self]


@register_plugin("shape", "serialized")
class SerializedShape(Mesh):
    """(serialized.cpp:1-374) Mitsuba 0.x .serialized mesh container."""

    def __init__(self, props=None):
        from ..utils.serialized import load_serialized
        from ..core.fresolver import file_resolver
        p = props
        filename = file_resolver().resolve(p.string("filename"))
        shape_index = p.int_("shape_index", 0)
        face_normals = p.bool_("face_normals", False)
        v, f, n, uv = load_serialized(filename, shape_index)
        if face_normals:
            n = None
        super().__init__(props, vertices=v, faces=f, normals=n, uvs=uv,
                         name=filename)
        self.apply_transform(_get_to_world(props))


# ---- Blender bridge ---------------------------------------------------------
# Blender 2.8x mesh struct layouts (blender.cpp:9-46); raw pointers to these
# arrive as integer properties from the exporter add-on.
_ML_LOOP = np.dtype([("v", "<u4"), ("e", "<u4")])
_ML_LOOPTRI = np.dtype([("tri", "<u4", 3), ("poly", "<u4")])
_M_POLY = np.dtype([("loopstart", "<i4"), ("totloop", "<i4"),
                    ("mat_nr", "<i2"), ("flag", "i1"), ("pad", "i1")])
_M_VERT = np.dtype([("co", "<f4", 3), ("no", "<i2", 3),
                    ("flag", "i1"), ("bweight", "i1")])
_ML_LOOPUV = np.dtype([("uv", "<f4", 2), ("flag", "<i4")])
_ML_LOOPCOL = np.dtype([("r", "u1"), ("g", "u1"), ("b", "u1"), ("a", "u1")])
_ME_SMOOTH = 1


def _read_ptr(ptr: int, count: int, dtype: np.dtype) -> np.ndarray:
    """Zero-copy view of foreign memory (then copied out) — the role of the
    reinterpret_casts in blender.cpp:105-118."""
    import ctypes
    if count == 0 or ptr == 0:
        return np.zeros(0, dtype)
    buf = (ctypes.c_char * (int(count) * dtype.itemsize)).from_address(
        int(ptr))
    return np.frombuffer(buf, dtype=dtype, count=int(count)).copy()


@register_plugin("shape", "blender")
class BlenderMesh(Mesh):
    """(blender.cpp:60-325) zero-copy import from Blender's in-memory mesh
    representation, used by the exporter add-on: raw MLoop/MLoopTri/MPoly/
    MVert pointers passed as integer properties, filtered to one material
    slot (``mat_nr``), with flat/smooth shading resolved per face and
    duplicate corner de-dup. The reference's per-vertex hash chain becomes
    one vectorized np.unique over (vertex, shading-key, uv) corner rows."""

    def __init__(self, props=None):
        from ..core.math import srgb_to_linear
        p = props
        name = p.string("name")
        mat_nr = p.int_("mat_nr")
        vert_count = p.int_("vert_count")
        tri_count = p.int_("loop_tri_count")
        loop_count = p.int_("loop_count", 0)
        loops = _read_ptr(p.long_("loops"),
                          loop_count or 3 * tri_count, _ML_LOOP)
        tris = _read_ptr(p.long_("loop_tris"), tri_count, _ML_LOOPTRI)
        n_polys = int(tris["poly"].max()) + 1 if tri_count else 0
        polys = _read_ptr(p.long_("polys"), n_polys, _M_POLY)
        verts = _read_ptr(p.long_("verts"), vert_count, _M_VERT)
        has_uvs = p.has_property("uvs")
        uvs = _read_ptr(p.long_("uvs"), len(loops), _ML_LOOPUV) \
            if has_uvs else None
        col_layers = [(k, _read_ptr(p.long_(k), len(loops), _ML_LOOPCOL))
                      for k in p.property_names() if k.startswith("vertex_")]
        to_world = _get_to_world(props)

        # material filter (blender.cpp:190) + degenerate-face cull
        face_poly = tris["poly"].astype(np.int64)
        keep = polys["mat_nr"][face_poly] == mat_nr
        tris = tris[keep]
        face_poly = face_poly[keep]
        corner_loop = tris["tri"].astype(np.int64)          # (f, 3)
        corner_vert = loops["v"][corner_loop].astype(np.int64)
        M = np.asarray(to_world.matrix)
        Mit = np.asarray(to_world.inverse_transpose)
        pos = verts["co"][corner_vert]                      # (f, 3, 3)
        pos = pos @ M[:3, :3].T + M[:3, 3]
        fn = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
        fn_len = np.linalg.norm(fn, axis=-1)
        smooth = (polys["flag"][face_poly] & _ME_SMOOTH) != 0
        good = smooth | (fn_len > 0)                        # blender.cpp:212
        tris, face_poly, corner_loop, corner_vert, pos, fn, fn_len, smooth \
            = (a[good] for a in (tris, face_poly, corner_loop, corner_vert,
                                 pos, fn, fn_len, smooth))
        f = len(tris)

        # per-corner normals: flat -> face normal, smooth -> vertex normal
        # (Blender packs vertex normals as int16 / 32767, blender.cpp:231)
        flat_n = fn / np.maximum(fn_len, 1e-20)[:, None]
        vn = verts["no"].astype(np.float32) / 32767.0
        vn = vn @ Mit[:3, :3].T
        vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-20)
        corner_n = np.where(smooth[:, None, None],
                            vn[corner_vert], flat_n[:, None, :])

        corner_uv = np.zeros((f, 3, 2), np.float32)
        if has_uvs:
            corner_uv = uvs["uv"][corner_loop].copy()
            corner_uv[..., 1] = 1.0 - corner_uv[..., 1]     # blender.cpp:243

        # corner de-dup (blender.cpp:153-176 Key): share a vertex iff same
        # blender vertex AND same shading key (smooth, or same flat poly)
        # AND same uv
        shade_key = np.where(smooth, -1, face_poly)
        key = np.zeros((f * 3, 5), np.float64)
        key[:, 0] = corner_vert.ravel()
        key[:, 1] = np.repeat(shade_key, 3)
        key[:, 2] = np.repeat(smooth.astype(np.int64), 3)
        key[:, 3:] = corner_uv.reshape(-1, 2)
        _, first, inverse = np.unique(key, axis=0, return_index=True,
                                      return_inverse=True)
        faces = inverse.reshape(f, 3).astype(np.int32)
        v_out = pos.reshape(-1, 3)[first].astype(np.float32)
        n_out = corner_n.reshape(-1, 3)[first].astype(np.float32)
        uv_out = corner_uv.reshape(-1, 2)[first] if has_uvs else None

        super().__init__(props, vertices=v_out, faces=faces, normals=n_out,
                         uvs=uv_out, name=name)
        # vertex colors are sRGB bytes in Blender (blender.cpp:277)
        for lname, cols in col_layers:
            c = np.stack([cols["r"], cols["g"], cols["b"]], -1)
            c = srgb_to_linear(c.astype(np.float32) / 255.0)
            self.add_attribute(lname, 3,
                               np.asarray(c)[corner_loop.ravel()][first])
