"""mesh_attribute textures (models/textures.py MeshAttributeTexture,
parity: src/textures/mesh_attribute.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.ray import Ray
from mitsuba2_tpu.render.scene import Scene


def _quad_scene(attr_name="vertex_color", k=3, variant="scalar_rgb"):
    """Unit quad in z=0 plane with a per-vertex attribute and a diffuse
    BSDF driven by it."""
    mi.set_variant(variant)
    bsdf = mi.load_dict({
        "type": "diffuse",
        "reflectance": {"type": "mesh_attribute", "name": attr_name},
    })
    rect = mi.load_dict({"type": "rectangle"})  # [-1,1]^2 quad, z=0
    meshes = rect.expand() if hasattr(rect, "expand") else [rect]
    mesh = meshes[0]
    if k == 3:
        # distinct color per vertex
        vals = np.eye(4, 3, dtype=np.float32) * 0.8 + 0.1
    else:
        vals = np.linspace(0.1, 0.9, mesh.vertex_count,
                           dtype=np.float32)[:, None]
    mesh.add_attribute(attr_name, k, vals[:mesh.vertex_count])
    mesh.bsdf = bsdf
    scene = Scene(shapes=[mesh])
    return scene, mesh, bsdf, vals[:mesh.vertex_count]


def _hit(scene, xy):
    n = len(xy)
    o = np.column_stack([np.asarray(xy, np.float32),
                         np.full(n, 3.0, np.float32)])
    d = np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d),
                   mint=jnp.zeros(n), maxt=jnp.full(n, np.inf),
                   time=jnp.zeros(n),
                   wavelengths=jnp.zeros((n, 0)))
    return scene.ray_intersect(ray)


def test_vertex_attribute_interpolates():
    scene, mesh, bsdf, vals = _quad_scene()
    tex = bsdf.reflectance
    assert tex._k == 3

    # at each vertex position the interpolated value equals that vertex's
    # attribute; at the center it's the mean of the covering triangle
    vp = mesh.vertices[:, :2] * 0.999  # nudge inside
    si = _hit(scene, vp)
    assert bool(si.is_valid().all())
    out = np.asarray(tex.eval(si))
    expect = vals  # same order as vertices
    np.testing.assert_allclose(out, expect, atol=5e-3)


def test_scene_eval_attribute_api():
    scene, mesh, _, vals = _quad_scene()
    si = _hit(scene, [[0.3, -0.4]])
    v = np.asarray(scene.eval_attribute("vertex_color", si))[0]
    # reconstruct the expectation from the hit's barycentrics, mapping the
    # (BVH-permuted) global prim index back to the mesh's face — this also
    # checks the corner table was permuted consistently
    prim = int(np.asarray(si.prim_idx)[0])
    orig = int(scene.bvh.order[prim]) if scene.bvh is not None else prim
    f = mesh.faces[orig]
    u, w = np.asarray(si.prim_uv)[0]
    expect = (1 - u - w) * vals[f[0]] + u * vals[f[1]] + w * vals[f[2]]
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_scalar_attribute():
    scene, mesh, bsdf, vals = _quad_scene(attr_name="vertex_mask", k=1)
    tex = bsdf.reflectance
    si = _hit(scene, mesh.vertices[:, :2] * 0.999)
    out = np.asarray(tex.eval_1(si))
    np.testing.assert_allclose(out, vals[:, 0], atol=5e-3)
    out3 = np.asarray(tex.eval(si))
    assert out3.shape[-1] == 3  # broadcast to rgb channels


def test_face_attribute():
    mi.set_variant("scalar_rgb")
    rect = mi.load_dict({"type": "rectangle"})
    mesh = (rect.expand() if hasattr(rect, "expand") else [rect])[0]
    fvals = np.array([[1.0], [2.0]], np.float32)[:mesh.face_count]
    mesh.add_attribute("face_id", 1, fvals)
    scene = Scene(shapes=[mesh])
    # these two points lie on opposite sides of EITHER possible quad
    # diagonal, so they always hit different triangles
    si = _hit(scene, [[0.9, -0.1], [-0.9, 0.1]])
    v = np.asarray(scene.eval_attribute("face_id", si))[:, 0]
    assert set(np.round(v).tolist()) <= {1.0, 2.0}
    assert v[0] != v[1]


def test_spectral_upsampled_eval():
    # in spectral mode a 3-channel attribute is upsampled per corner: the
    # evaluated reflectance spectrum must be in [0,1] and brighter where
    # the attribute is brighter
    try:
        scene, mesh, bsdf, vals = _quad_scene(variant="scalar_spectral")
        tex = bsdf.reflectance
        n = 2
        o = np.array([[-0.99, -0.99, 3.0], [0.0, 0.0, 3.0]], np.float32)
        d = np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32)
        wav = jnp.tile(jnp.asarray([450.0, 550.0, 600.0, 650.0]), (n, 1))
        ray = Ray.make(jnp.asarray(o), jnp.asarray(d),
                       mint=jnp.zeros(n), maxt=jnp.full(n, np.inf),
                       time=jnp.zeros(n), wavelengths=wav)
        si = scene.ray_intersect(ray)
        out = np.asarray(tex.eval(si))
        assert out.shape == (n, 4)
        assert (out >= -1e-3).all() and (out <= 1.05).all()
    finally:
        mi.set_variant("scalar_rgb")


def test_unknown_attribute_raises():
    mi.set_variant("scalar_rgb")
    rect = mi.load_dict({"type": "rectangle"})
    mesh = (rect.expand() if hasattr(rect, "expand") else [rect])[0]
    mesh.bsdf = mi.load_dict({
        "type": "diffuse",
        "reflectance": {"type": "mesh_attribute", "name": "vertex_nope"},
    })
    with pytest.raises(RuntimeError, match="vertex_nope"):
        Scene(shapes=[mesh])


def test_bad_attribute_shape_raises():
    mi.set_variant("scalar_rgb")
    rect = mi.load_dict({"type": "rectangle"})
    mesh = (rect.expand() if hasattr(rect, "expand") else [rect])[0]
    with pytest.raises(ValueError, match="rows"):
        mesh.add_attribute("vertex_color", 3, np.zeros((2, 3)))
    with pytest.raises(ValueError, match="vertex_ or face_"):
        mesh.add_attribute("color", 3, np.zeros((mesh.vertex_count, 3)))
