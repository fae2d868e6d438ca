"""Shapes.

Parity: include/mitsuba/render/shape.h:23 (sample_position / sample_direction
/ pdf_* / ray_intersect split) and mesh.h:16 (indexed triangle mesh with SoA
buffers, area-weighted sampling DiscreteDistribution, mesh.cpp:300-307).

TPU design: python Shape objects hold host-side numpy geometry; the Scene
compile step packs every mesh into global per-face SoA device tables
(pre-gathered corner attributes — one indirection level instead of two) that
the wavefront kernels consume. Analytic shapes (sphere/disk/...) join via a
typed shape table in models/shapes.py.
"""

from __future__ import annotations

import numpy as np

from ..core.object import Object
from ..core.properties import Properties


class Shape(Object):
    """Base shape; ``mesh()`` returns triangle geometry for packing, or None
    for analytic shapes handled by their own intersection path."""

    def __init__(self, props: Properties | None = None):
        super().__init__(props)
        self.bsdf = None
        self.emitter = None
        self.sensor = None
        self.interior_medium = None
        self.exterior_medium = None
        if props is not None:
            for key, obj in props.objects():
                kind = getattr(obj, "plugin_category", "")
                if kind == "bsdf":
                    self.bsdf = obj
                elif kind == "emitter":
                    self.emitter = obj
                    obj.set_shape(self)
                elif kind == "sensor":
                    # shape-attached sensors (irradiancemeter.cpp)
                    self.sensor = obj
                    if hasattr(obj, "set_shape"):
                        obj.set_shape(self)
                elif kind == "medium":
                    if key == "exterior":
                        self.exterior_medium = obj
                    else:  # 'interior' or unnamed
                        self.interior_medium = obj

    def is_emitter(self):
        return self.emitter is not None

    def is_mesh(self):
        return isinstance(self, Mesh)

    def is_analytic(self):
        """True for shapes intersected by the quadric table path
        (scene.py sph_table) instead of the triangle tables."""
        return False

    def surface_area(self) -> float:
        raise NotImplementedError

    def bbox(self):
        raise NotImplementedError

    def traverse(self, cb):
        if self.bsdf is not None:
            cb.put_object("bsdf", self.bsdf)
        if self.emitter is not None:
            cb.put_object("emitter", self.emitter)


class Mesh(Shape):
    """Triangle mesh with world-space baked vertices (the reference also
    applies to_world at load, mesh.cpp)."""

    def __init__(self, props=None, vertices=None, faces=None, normals=None,
                 uvs=None, name="mesh"):
        super().__init__(props)
        self.name = name
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces, np.int32)
        self.normals = None if normals is None else np.asarray(normals, np.float32)
        self.uvs = None if uvs is None else np.asarray(uvs, np.float32)
        self.face_normals_only = self.normals is None
        # named custom attributes (mesh.cpp add_attribute): key convention
        # "vertex_*" = per-vertex rows, "face_*" = per-face rows
        self.attributes: dict = {}

    def add_attribute(self, name: str, size: int, data):
        """(mesh.cpp:300 add_attribute) attach a named per-vertex or
        per-face attribute, consumed by `mesh_attribute` textures."""
        data = np.asarray(data, np.float32).reshape(-1, size)
        n = len(self.vertices) if name.startswith("vertex_") else \
            len(self.faces)
        if not (name.startswith("vertex_") or name.startswith("face_")):
            raise ValueError(
                f"attribute '{name}' must start with vertex_ or face_")
        if len(data) != n:
            raise ValueError(
                f"attribute '{name}': expected {n} rows, got {len(data)}")
        self.attributes[name] = (size, data)

    @property
    def vertex_count(self):
        return len(self.vertices)

    @property
    def face_count(self):
        return len(self.faces)

    def face_areas(self) -> np.ndarray:
        p = self.vertices[self.faces]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    def surface_area(self) -> float:
        return float(self.face_areas().sum())

    def bbox(self):
        return self.vertices.min(0), self.vertices.max(0)

    def recompute_vertex_normals(self):
        n = np.zeros_like(self.vertices)
        p = self.vertices[self.faces]
        fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        for k in range(3):
            np.add.at(n, self.faces[:, k], fn)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        self.normals = n / np.maximum(ln, 1e-20)
        self.face_normals_only = False

    def apply_transform(self, trafo):
        mat = np.asarray(trafo.matrix, np.float64)
        v = self.vertices @ mat[:3, :3].T + mat[:3, 3]
        self.vertices = v.astype(np.float32)
        if self.normals is not None:
            it = np.asarray(trafo.inverse_transpose, np.float64)[:3, :3]
            n = self.normals @ it.T
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            self.normals = n.astype(np.float32)
        if np.linalg.det(mat[:3, :3]) < 0:
            # flip winding to keep outward orientation
            self.faces = self.faces[:, ::-1].copy()

    def traverse(self, cb):
        super().traverse(cb)
        cb.put_parameter("vertex_positions", self.vertices)
        if self.normals is not None:
            cb.put_parameter("vertex_normals", self.normals)
