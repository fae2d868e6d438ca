"""Breadth parity battery: mesh loaders, integrator AOV/moment
behaviors, XML loader features, fresnel/microfacet identities — small
per-feature checks mirroring reference test intents not covered by the
focused suites."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


# --------------------------------------------------------- mesh loaders
def _write_obj(path):
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("vt 0 0\nvt 1 0\nvt 0 1\n")
        f.write("vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n")
        f.write("f 1/1/1 2/2/2 3/3/3\n")


def test_obj_loader_basic(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "tri.obj")
    _write_obj(p)
    m = mi.load_dict({"type": "obj", "filename": p})
    assert m.is_mesh()
    assert len(m.vertices) == 3 and len(m.faces) == 1
    assert m.uvs is not None and m.normals is not None


def test_obj_quad_triangulates(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f 1 2 3 4\n")
    m = mi.load_dict({"type": "obj", "filename": p})
    assert len(m.faces) == 2


def test_ply_ascii_roundtrip(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "tri.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0\n1 0 0\n0 1 0\n"
                "3 0 1 2\n")
    m = mi.load_dict({"type": "ply", "filename": p})
    assert len(m.vertices) == 3 and len(m.faces) == 1


def test_ply_custom_vertex_attributes(variant_scalar_rgb, tmp_path):
    """ply.cpp:50-58 attribute grouping: bare red/green/blue -> a
    normalized vertex_color; {prefix}_{x,y,z} -> vertex_{prefix};
    leftover scalars -> 1-wide attributes; all usable by mesh_attribute
    textures."""
    import struct
    p = str(tmp_path / "attr.ply")
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property uchar red\nproperty uchar green\n"
                b"property uchar blue\n"
                b"property float disp_x\nproperty float disp_y\n"
                b"property float disp_z\n"
                b"property float mask\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n")
        for i, (x, y, z) in enumerate([(0, 0, 0), (1, 0, 0), (0, 1, 0)]):
            f.write(struct.pack("<fff", x, y, z))
            f.write(struct.pack("<BBB", 255, 128, 0))
            f.write(struct.pack("<fff", i * 1.0, i * 2.0, i * 3.0))
            f.write(struct.pack("<f", 0.5 + i))
        f.write(struct.pack("<B", 3) + struct.pack("<iii", 0, 1, 2))
    m = mi.load_dict({"type": "ply", "filename": p})
    assert set(m.attributes) == {"vertex_color", "vertex_disp",
                                 "vertex_mask"}
    size, color = m.attributes["vertex_color"]
    assert size == 3
    assert np.allclose(color[0], [1.0, 128 / 255.0, 0.0], atol=1e-6)
    size, disp = m.attributes["vertex_disp"]
    assert size == 3 and np.allclose(disp[2], [2.0, 4.0, 6.0])
    size, mask = m.attributes["vertex_mask"]
    assert size == 1 and np.allclose(mask[:, 0], [0.5, 1.5, 2.5])


def test_obj_to_world_applies(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "tri2.obj")
    _write_obj(p)
    m = mi.load_dict({"type": "obj", "filename": p,
                      "to_world": T.translate([5, 0, 0])})
    assert np.allclose(m.vertices[:, 0].min(), 5.0, atol=1e-6)


# --------------------------------------------------- integrator behavior
def _simple_scene(integrator, spp=16):
    return mi.load_dict({
        "type": "scene", "integrator": integrator,
        "light": {"type": "rectangle",
                  "to_world": (T.translate([0, 2.5, 0]) @ T.scale(0.8)
                               @ T.rotate([1, 0, 0], 90)),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 8.0}}},
        "floor": {"type": "rectangle",
                  "to_world": (T.translate([0, -1, 0])
                               @ T.rotate([1, 0, 0], -90) @ T.scale(2)),
                  "bsdf": {"type": "diffuse"}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": T.look_at([0, 0.3, 3.5], [0, 0, 0],
                                         [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 10, "height": 10,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": spp}}})


def test_aov_depth_positive_on_hits(variant_scalar_rgb):
    s = _simple_scene({"type": "aov", "aovs": "dd:depth",
                       "sub": {"type": "path", "max_depth": 2}})
    img = np.asarray(s.integrator.render(s, seed=0, spp=16))
    assert img.shape[-1] >= 4
    depth = img[..., 3]
    assert (depth[np.isfinite(depth)] >= 0).all()
    assert depth.max() > 1.0          # the floor is a few units away


def test_aov_normals_unit(variant_scalar_rgb):
    s = _simple_scene({"type": "aov", "aovs": "nn:sh_normal",
                       "sub": {"type": "path", "max_depth": 2}})
    img = np.asarray(s.integrator.render(s, seed=0, spp=16))
    n = img[..., 3:6]
    lens = np.linalg.norm(n, axis=-1)
    # spp-averaged normals: unit where a pixel's samples agree, never
    # longer than unit anywhere
    assert (lens <= 1.0 + 1e-3).all()
    assert (np.abs(lens - 1.0) < 1e-2).mean() > 0.5


def test_moment_second_moment_bounds_variance(variant_scalar_rgb):
    s = _simple_scene({"type": "moment",
                       "sub": {"type": "path", "max_depth": 2}})
    img = np.asarray(s.integrator.render(s, seed=0, spp=64))
    k = (img.shape[-1]) // 2
    first = img[..., :3]
    second = img[..., k:k + 3]
    # E[X^2] >= (E[X])^2 pixelwise
    assert (second + 1e-5 >= first ** 2).all()


def test_rr_depth_changes_nothing_in_expectation(variant_scalar_rgb):
    a = _simple_scene({"type": "path", "max_depth": 6, "rr_depth": 2},
                      spp=256)
    b = _simple_scene({"type": "path", "max_depth": 6, "rr_depth": 100},
                      spp=256)
    ia = np.asarray(a.integrator.render(a, seed=0, spp=256)).mean()
    ib = np.asarray(b.integrator.render(b, seed=1, spp=256)).mean()
    assert abs(ia - ib) < 0.05 * max(ib, 1e-3)


def test_max_depth_monotone(variant_scalar_rgb):
    means = []
    for depth in (2, 3, 5):
        s = _simple_scene({"type": "path", "max_depth": depth}, spp=128)
        means.append(np.asarray(
            s.integrator.render(s, seed=0, spp=128)).mean())
    assert means[0] <= means[1] + 1e-3 <= means[2] + 2e-3


# ---------------------------------------------------------- XML features
def test_xml_default_substitution(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "s.xml")
    with open(p, "w") as f:
        f.write("""<scene version="2.0.0">
  <default name="albedo" value="0.25"/>
  <shape type="rectangle">
    <bsdf type="diffuse">
      <rgb name="reflectance" value="$albedo"/>
    </bsdf>
  </shape>
</scene>""")
    scene = mi.load_file(p)
    b = scene.shapes[0].bsdf
    assert np.allclose(np.asarray(b.reflectance.data.rgb), 0.25,
                       atol=1e-6)


def test_xml_param_override(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "s2.xml")
    with open(p, "w") as f:
        f.write("""<scene version="2.0.0">
  <default name="albedo" value="0.25"/>
  <shape type="rectangle">
    <bsdf type="diffuse">
      <rgb name="reflectance" value="$albedo"/>
    </bsdf>
  </shape>
</scene>""")
    scene = mi.load_file(p, params={"albedo": "0.75"})
    b = scene.shapes[0].bsdf
    assert np.allclose(np.asarray(b.reflectance.data.rgb), 0.75,
                       atol=1e-6)


def test_xml_named_reference(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "s3.xml")
    with open(p, "w") as f:
        f.write("""<scene version="2.0.0">
  <bsdf type="diffuse" id="mat">
    <rgb name="reflectance" value="0.1 0.6 0.3"/>
  </bsdf>
  <shape type="rectangle"><ref id="mat"/></shape>
  <shape type="rectangle"><ref id="mat"/>
    <transform name="to_world"><translate x="3"/></transform>
  </shape>
</scene>""")
    scene = mi.load_file(p)
    assert scene.shapes[0].bsdf is scene.shapes[1].bsdf


def test_xml_lookat_transform(variant_scalar_rgb, tmp_path):
    p = str(tmp_path / "s4.xml")
    with open(p, "w") as f:
        f.write("""<scene version="2.0.0">
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0, 0, 5" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="4"/>
      <integer name="height" value="4"/>
      <rfilter type="box"/>
    </film>
    <sampler type="independent"/>
  </sensor>
</scene>""")
    scene = mi.load_file(p)
    M = np.asarray(scene.sensors[0].world_transform.matrix)
    assert np.allclose(M[:3, 3], [0, 0, 5], atol=1e-5)


def test_dict_unused_property_raises(variant_scalar_rgb):
    with pytest.raises(RuntimeError, match="[Uu]nreferenced|[Uu]nused"):
        mi.load_dict({"type": "diffuse", "bogus_knob": 1.0})


# -------------------------------------------------- fresnel / microfacet
def test_fresnel_normal_incidence(variant_scalar_rgb):
    from mitsuba2_tpu.render.fresnel import fresnel
    F, _, _, _ = fresnel(jnp.asarray([1.0]), 1.5)
    # ((n-1)/(n+1))^2 = 0.04
    assert abs(float(F[0]) - 0.04) < 1e-4


def test_fresnel_tir(variant_scalar_rgb):
    from mitsuba2_tpu.render.fresnel import fresnel
    # from the dense side beyond the critical angle: total reflection
    cos_i = jnp.asarray([-0.2])         # inside glass, grazing
    F, _, _, _ = fresnel(cos_i, 1.5)
    assert abs(float(F[0]) - 1.0) < 1e-6


def test_fresnel_energy_range(variant_scalar_rgb):
    from mitsuba2_tpu.render.fresnel import fresnel
    c = jnp.linspace(-1, 1, 101)
    F, _, _, _ = fresnel(c, 1.33)
    Fn = np.asarray(F)
    assert (Fn >= 0).all() and (Fn <= 1.0 + 1e-6).all()


def test_conductor_fresnel_above_dielectric(variant_scalar_rgb):
    from mitsuba2_tpu.render.fresnel import fresnel, fresnel_conductor
    c = jnp.asarray([0.7])
    Fd, _, _, _ = fresnel(c, 1.5)
    Fc = fresnel_conductor(c, jnp.asarray([0.2]), jnp.asarray([3.0]))
    assert float(Fc[0]) > float(Fd[0])


def test_ggx_d_integrates_to_one(variant_scalar_rgb):
    """Integral of D(m) cos(m) over the hemisphere equals 1."""
    from mitsuba2_tpu.render.microfacet import MicrofacetDistribution
    d = MicrofacetDistribution("ggx", jnp.asarray(0.4), jnp.asarray(0.4),
                               True)
    rs = np.random.RandomState(0)
    n = 400_000
    z = rs.rand(n).astype(np.float32)
    phi = rs.rand(n).astype(np.float32) * 2 * np.pi
    r = np.sqrt(1 - z * z)
    m = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    D = np.asarray(d.eval(m))
    integral = (D * z).mean() * 2 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_beckmann_matches_ggx_at_tiny_alpha(variant_scalar_rgb):
    """Both distributions collapse to the normal direction as alpha->0."""
    from mitsuba2_tpu.render.microfacet import MicrofacetDistribution
    for dist in ("ggx", "beckmann"):
        d = MicrofacetDistribution(dist, jnp.asarray(0.01),
                                   jnp.asarray(0.01), True)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (256, 3))
        rs = np.random.RandomState(1)
        u = jnp.asarray(rs.rand(256, 2).astype(np.float32))
        m, _ = d.sample(wi, u)
        assert np.asarray(m)[:, 2].min() > 0.99


def test_smith_g1_bounds(variant_scalar_rgb):
    from mitsuba2_tpu.render.microfacet import MicrofacetDistribution
    d = MicrofacetDistribution("ggx", jnp.asarray(0.5), jnp.asarray(0.5),
                               True)
    rs = np.random.RandomState(2)
    v = rs.randn(512, 3).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    m = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (512, 3))
    g = np.asarray(d.smith_g1(jnp.asarray(v), m))
    assert (g >= 0).all() and (g <= 1.0 + 1e-5).all()
