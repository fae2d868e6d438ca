"""Blender bridge shape (models/shapes.py BlenderMesh, parity:
src/shapes/blender.cpp) — fed synthesized in-memory Blender structs."""

import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform
from mitsuba2_tpu.models.shapes import (
    _ML_LOOP, _ML_LOOPTRI, _ML_LOOPUV, _ML_LOOPCOL, _M_POLY, _M_VERT)


def _make_blender_quad(smooth=False, mat_nr=0, with_uv=True,
                       with_col=False):
    """Two-triangle quad in Blender's memory layout: 4 verts, 2 polys
    (each a triangle: loopstart 0/3), 6 loops, 2 looptris."""
    verts = np.zeros(4, _M_VERT)
    verts["co"] = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    verts["no"] = [[0, 0, 32767]] * 4

    loops = np.zeros(6, _ML_LOOP)
    loops["v"] = [0, 1, 2, 0, 2, 3]

    tris = np.zeros(2, _ML_LOOPTRI)
    tris["tri"] = [[0, 1, 2], [3, 4, 5]]
    tris["poly"] = [0, 1]

    polys = np.zeros(2, _M_POLY)
    polys["loopstart"] = [0, 3]
    polys["totloop"] = [3, 3]
    polys["mat_nr"] = [mat_nr, mat_nr]
    polys["flag"] = 1 if smooth else 0

    uvs = np.zeros(6, _ML_LOOPUV)
    uvs["uv"] = [[0, 1], [1, 1], [1, 0], [0, 1], [1, 0], [0, 0]]

    cols = np.zeros(6, _ML_LOOPCOL)
    for k in "rgb":
        cols[k] = [255, 0, 0, 255, 0, 128]

    d = {
        "type": "blender",
        "name": "quad",
        "mat_nr": 0,
        "vert_count": 4,
        "loop_count": 6,
        "loop_tri_count": 2,
        "loops": loops.ctypes.data,
        "loop_tris": tris.ctypes.data,
        "polys": polys.ctypes.data,
        "verts": verts.ctypes.data,
    }
    if with_uv:
        d["uvs"] = uvs.ctypes.data
    if with_col:
        d["vertex_Col"] = cols.ctypes.data
    # keep the buffers alive while the plugin reads them
    keepalive = (verts, loops, tris, polys, uvs, cols)
    return d, keepalive


def test_smooth_quad_dedups_shared_verts():
    mi.set_variant("scalar_rgb")
    d, buf = _make_blender_quad(smooth=True)
    mesh = mi.load_dict(d)
    # smooth shading + matching uvs: the 2 shared corners merge -> 4 verts
    assert mesh.vertex_count == 4
    assert mesh.face_count == 2
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 4, atol=1e-6)
    # v coordinate flipped (blender.cpp:243)
    uv_of_origin = mesh.uvs[np.argmin(mesh.vertices[:, 0]
                                      + mesh.vertices[:, 1])]
    np.testing.assert_allclose(uv_of_origin, [0, 0], atol=1e-6)


def test_flat_quad_keeps_per_face_corners():
    mi.set_variant("scalar_rgb")
    d, buf = _make_blender_quad(smooth=False)
    mesh = mi.load_dict(d)
    # flat shading: corners are keyed by polygon -> 3+3 = 6 verts
    assert mesh.vertex_count == 6
    assert mesh.face_count == 2


def test_material_filter():
    mi.set_variant("scalar_rgb")
    d, buf = _make_blender_quad(mat_nr=1)  # all faces on slot 1
    mesh = mi.load_dict(d)                 # we ask for slot 0
    assert mesh.face_count == 0


def test_vertex_colors_srgb_to_linear():
    mi.set_variant("scalar_rgb")
    d, buf = _make_blender_quad(smooth=True, with_col=True)
    mesh = mi.load_dict(d)
    assert "vertex_Col" in mesh.attributes
    k, data = mesh.attributes["vertex_Col"]
    assert k == 3 and len(data) == mesh.vertex_count
    # 255 -> 1.0; 128 -> linearized ~0.216
    assert np.isclose(data.max(), 1.0, atol=1e-5)
    mid = data[np.isclose(data, 0.2158, atol=2e-2)]
    assert len(mid) > 0


def test_renders_through_pipeline():
    mi.set_variant("scalar_rgb")
    d, buf = _make_blender_quad(smooth=True)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "light": {"type": "constant"},
        "quad": {**d, "bsdf": {"type": "diffuse"}},
        "sensor": {
            "type": "perspective",
            "to_world": Transform.look_at(
                origin=[0.5, 0.5, 3], target=[0.5, 0.5, 0], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.isfinite(img).all() and img.max() > 0
