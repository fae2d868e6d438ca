"""Fixture scenes (parity: src/python/python/test/scenes.py —
make_empty_scene / make_teapot_scene style helpers; here dict-based)."""

from __future__ import annotations

from ...core.transform import Transform


def cornell_box_dict(width=256, height=256, spp=64, max_depth=6,
                     rfilter="box", light_scale=1.0):
    """The classic Cornell box as a scene dict: 5 diffuse walls, 2 boxes
    omitted in the minimal version, one area light."""
    T = Transform

    def rect(name, to_world, albedo):
        return {
            "type": "rectangle",
            "id": name,
            "to_world": to_world,
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": albedo}},
        }

    white = [0.725, 0.71, 0.68]
    red = [0.570068, 0.0430135, 0.0443706]
    green = [0.105421, 0.37798, 0.076425]

    scene = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "sensor": {
            "type": "perspective",
            "fov": 39.3077,
            "near_clip": 0.01,
            "far_clip": 100.0,
            "to_world": T.look_at([0, 0, 3.9], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": rfilter}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "floor": rect("floor", T.translate([0, -1, 0])
                      @ T.rotate([1, 0, 0], -90), white),
        "ceiling": rect("ceiling", T.translate([0, 1, 0])
                        @ T.rotate([1, 0, 0], 90), white),
        "back": rect("back", T.translate([0, 0, -1]), white),
        "left": rect("left", T.translate([-1, 0, 0])
                     @ T.rotate([0, 1, 0], 90), red),
        "right": rect("right", T.translate([1, 0, 0])
                      @ T.rotate([0, 1, 0], -90), green),
        "light": {
            "type": "rectangle",
            "id": "light",
            "to_world": (T.translate([0, 0.99, 0]) @ T.rotate([1, 0, 0], 90)
                         @ T.scale(0.23)),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0, 0, 0]}},
            "emitter": {
                "type": "area",
                "radiance": {"type": "rgb",
                             "value": [x * light_scale for x in
                                       [18.387, 13.9873, 6.75357]]},
            },
        },
        "tallbox": {
            "type": "cube",
            "to_world": (T.translate([-0.35, -0.4, -0.35])
                         @ T.rotate([0, 1, 0], 20)
                         @ T.scale([0.25, 0.6, 0.25])),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": white}},
        },
        "shortbox": {
            "type": "cube",
            "to_world": (T.translate([0.4, -0.7, 0.2])
                         @ T.rotate([0, 1, 0], -18)
                         @ T.scale([0.25, 0.3, 0.25])),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": white}},
        },
    }
    return scene


def furnace_dict(albedo=0.6, env_radiance=1.0, width=32, height=32, spp=64,
                 max_depth=-1):
    """A diffuse plane under a uniform environment: every camera ray that
    hits the plane must return exactly albedo * env_radiance (+ env for
    misses) — an analytic white-furnace check."""
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "sensor": {
            "type": "perspective",
            "fov": 45.0,
            "to_world": Transform.look_at([0, 2, 0.01], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "plane": {
            "type": "rectangle",
            "to_world": (Transform.rotate([1, 0, 0], -90)
                         @ Transform.scale(100.0)),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb",
                                     "value": [albedo] * 3}},
        },
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [env_radiance] * 3}},
    }


def _sky_exr_path():
    """Synthesized lat-long sky HDR (cached): gradient dome + sun blob —
    stands in for the matpreview envmap asset."""
    import os
    import tempfile
    import numpy as np
    path = os.path.join(tempfile.gettempdir(), "mitsuba2_tpu_sky_v1.exr")
    if not os.path.exists(path):
        h, w = 64, 128
        th = np.linspace(0, np.pi, h)[:, None]
        ph = np.linspace(0, 2 * np.pi, w)[None, :]
        sky = np.stack([
            0.25 + 0.35 * np.cos(th / 2) ** 2 + 0 * ph,
            0.35 + 0.40 * np.cos(th / 2) ** 2 + 0 * ph,
            0.55 + 0.45 * np.cos(th / 2) ** 2 + 0 * ph], -1)
        # sun: bright blob at theta=60deg, phi=45deg
        ang = (np.sin(th) * np.sin(np.pi / 3)
               * np.cos(ph - np.pi / 4)
               + np.cos(th) * np.cos(np.pi / 3))
        sun = np.clip(ang, 0, 1) ** 400
        sky = sky + sun[..., None] * np.asarray([900.0, 800.0, 600.0])
        from mitsuba2_tpu.utils.io_exr import write_exr
        write_exr(path, sky.astype(np.float32))
    return path


def matpreview_dict(width=256, height=256, spp=64, max_depth=6,
                    alpha=0.1, material="Au"):
    """Matpreview-class benchmark config (BASELINE.json configs[1]):
    rough-conductor hero object under an importance-sampled envmap with
    MIS, a rough-plastic stand, and a checkerboard floor."""
    T = Transform
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "envmap": {"type": "envmap", "filename": _sky_exr_path()},
        "hero": {"type": "sphere", "radius": 1.0, "center": [0, 0, 1.35],
                 "bsdf": {"type": "roughconductor", "alpha": alpha,
                          "distribution": "ggx", "material": material}},
        "stand": {"type": "cube",
                  "to_world": (T.translate([0, 0, 0.175])
                               @ T.scale([0.6, 0.6, 0.175])),
                  "bsdf": {"type": "roughconductor", "alpha": 0.3,
                           "distribution": "ggx", "material": "Al"}},
        "floor": {"type": "rectangle", "to_world": T.scale([8, 8, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {
                               "type": "checkerboard",
                               "color0": {"type": "rgb", "value": 0.4},
                               "color1": {"type": "rgb", "value": 0.2},
                               "to_uv": T.scale([8, 8, 1])}}},
        "sensor": {
            "type": "perspective", "fov": 34.0,
            "to_world": T.look_at(origin=[3.2, -3.8, 2.4],
                                  target=[0, 0, 1.0], up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp}},
    }


def _bumpy_sphere_obj_path(nu=64, nv=48, bump=0.15, version=1):
    """Synthesized dense OBJ mesh (cached): displaced UV sphere with
    2*(nu)*(nv-1) triangles — stands in for the ply teapot asset when
    exercising the large-mesh (streamed BVH-chunk) intersection path."""
    import os
    import tempfile
    import numpy as np
    path = os.path.join(tempfile.gettempdir(),
                        f"mitsuba2_tpu_bumpy_{nu}x{nv}_v{version}.obj")
    if os.path.exists(path):
        return path
    th = np.linspace(0, np.pi, nv)
    ph = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")        # (nv, nu)
    r = 1.0 + bump * np.sin(6 * T) * np.cos(5 * P)
    x = r * np.sin(T) * np.cos(P)
    y = r * np.cos(T)
    z = r * np.sin(T) * np.sin(P)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)   # (nv*nu, 3)
    faces = []
    for i in range(nv - 1):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            d = (i + 1) * nu + (j + 1) % nu
            faces.append((a, b, d))
            faces.append((a, d, c))
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")
    return path


def bumpy_sphere_dict(width=128, height=128, spp=32, max_depth=4,
                      nu=64, nv=48):
    """Large-mesh benchmark scene: a ~6k-35k-face displaced sphere over a
    diffuse floor under an area light (the VERDICT r1 #3 'production-size
    mesh must ride the fast path' config)."""
    T = Transform
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "hero": {"type": "obj", "filename": _bumpy_sphere_obj_path(nu, nv),
                 "to_world": T.translate([0, 0.2, 0]),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.55, 0.35, 0.25]}}},
        "floor": {"type": "rectangle",
                  "to_world": (T.translate([0, -1.3, 0])
                               @ T.rotate([1, 0, 0], -90) @ T.scale(6)),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.5}}},
        "light": {"type": "rectangle",
                  "to_world": (T.translate([0, 3.5, 1.0]) @ T.scale(1.2)
                               @ T.rotate([1, 0, 0], 90)),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 10.0}}},
        "sensor": {
            "type": "perspective", "fov": 45.0,
            "to_world": T.look_at([0, 0.6, 4.2], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp}},
    }


def _hero_serialized_path(nu=512, nv=200, bump=0.12, version=1):
    """Synthesized ~200k-face smooth-shaded hero mesh in the Mitsuba 0.x
    .serialized container (cached): exercises utils/serialized.py
    (serialized.cpp:1-374) end-to-end and stands in for the reference
    matpreview hero asset, which the reference repo does not ship."""
    import os
    import tempfile
    import numpy as np
    path = os.path.join(tempfile.gettempdir(),
                        f"mitsuba2_tpu_hero_{nu}x{nv}_v{version}.serialized")
    if os.path.exists(path):
        return path
    th = np.linspace(0, np.pi, nv)
    ph = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")        # (nv, nu)
    r = 1.0 + bump * (np.sin(6 * T) * np.cos(5 * P)
                      + 0.4 * np.sin(13 * T + 2.0) * np.sin(11 * P))
    x = r * np.sin(T) * np.cos(P)
    y = r * np.cos(T)
    z = r * np.sin(T) * np.sin(P)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    uv = np.stack([P / (2 * np.pi), T / np.pi],
                  -1).reshape(-1, 2).astype(np.float32)
    idx = np.arange(nv * nu).reshape(nv, nu)
    a = idx[:-1, :]
    b = np.roll(idx[:-1, :], -1, axis=1)
    c = idx[1:, :]
    d = np.roll(idx[1:, :], -1, axis=1)
    faces = np.concatenate([
        np.stack([a, b, d], -1).reshape(-1, 3),
        np.stack([a, d, c], -1).reshape(-1, 3)]).astype(np.int32)
    # smooth vertex normals: area-weighted accumulation of face normals
    fv = verts[faces]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    normals = np.zeros_like(verts)
    for k in range(3):
        np.add.at(normals, faces[:, k], fn)
    nl = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = (normals / np.maximum(nl, 1e-20)).astype(np.float32)
    from mitsuba2_tpu.utils.serialized import write_serialized
    write_serialized(path, [(verts, faces, normals, uv)])
    return path


def hero_serialized_dict(width=256, height=256, spp=32, max_depth=5):
    """Production-shaped benchmark (VERDICT r4 task #5): a ~203k-face
    smooth-shaded .serialized hero with a GGX gold finish under the
    importance-sampled envmap, on a checkerboard floor — big geometry x
    GGX x envmap x MIS in ONE config (composes the HBM BVH tier with
    the env NEE arm)."""
    T = Transform
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "envmap": {"type": "envmap", "filename": _sky_exr_path()},
        "hero": {"type": "serialized",
                 "filename": _hero_serialized_path(),
                 "to_world": T.translate([0, 0, 1.1]),
                 "bsdf": {"type": "roughconductor", "alpha": 0.12,
                          "distribution": "ggx", "material": "Au"}},
        "floor": {"type": "rectangle",
                  "to_world": (T.translate([0, 0, -0.15])
                               @ T.scale([8, 8, 1])),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {
                               "type": "checkerboard",
                               "color0": {"type": "rgb", "value": 0.45},
                               "color1": {"type": "rgb", "value": 0.2},
                               "to_uv": T.scale([8, 8, 1])}}},
        "sensor": {
            "type": "perspective", "fov": 36.0,
            "to_world": T.look_at(origin=[3.1, -3.7, 2.6],
                                  target=[0, 0, 0.9], up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp}},
    }
