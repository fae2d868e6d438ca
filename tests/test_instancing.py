"""Shared-geometry instancing (shapegroup.h:15 / instance.cpp): large
groups pack ONE geometry block with per-instance transforms — memory
O(1) in the instance count — and render identically to materialized
copies."""

import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


def _scene_dict(n_inst, materialize=None, nu=40, nv=20):
    from mitsuba2_tpu.python.test.scenes import _bumpy_sphere_obj_path
    group = {"type": "shapegroup", "id": "grp",
             "m": {"type": "obj",
                   "filename": _bumpy_sphere_obj_path(nu, nv),
                   "to_world": T.scale(0.45),
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb",
                                            "value": [0.6, 0.4, 0.3]}}}}
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 3},
         "grp": group,
         "light": {"type": "rectangle",
                   "to_world": (T.translate([0, 3, 1]) @ T.scale(1.5)
                                @ T.rotate([1, 0, 0], 90)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 10.0}}},
         "floor": {"type": "rectangle",
                   "to_world": (T.translate([0, -1, 0])
                                @ T.rotate([1, 0, 0], -90) @ T.scale(4)),
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb", "value": 0.5}}},
         "sensor": {"type": "perspective", "fov": 50,
                    "to_world": T.look_at([0, 0.8, 4.5], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 24, "height": 24,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 32}}}
    for i in range(n_inst):
        x = -1.4 + 2.8 * i / max(n_inst - 1, 1)
        inst = {"type": "instance",
                "shapegroup": {"type": "ref", "id": "grp"},
                "to_world": T.translate([x, 0, 0])}
        if materialize is not None:
            inst["materialize"] = materialize
        d[f"i{i}"] = inst
    return d


def test_shared_path_engages(variant_scalar_rgb):
    scene = mi.load_dict(_scene_dict(3, materialize=False))
    assert scene.n_instances == 3
    # ONE group geometry block regardless of instance count
    assert len(scene._inst_groups) == 1
    # the main face tables hold only the light + floor (+ dummy pad)
    assert scene.geom.v0.shape[0] <= 8


def test_shared_matches_materialized(variant_scalar_rgb):
    d_shared = _scene_dict(3, materialize=False)
    d_mat = _scene_dict(3, materialize=True)
    s1 = mi.load_dict(d_shared)
    s2 = mi.load_dict(d_mat)
    assert s1.n_instances == 3 and s2.n_instances == 0
    a = np.asarray(s1.integrator.render(s1, seed=2, spp=32))
    b = np.asarray(s2.integrator.render(s2, seed=2, spp=32))
    assert np.isfinite(a).all()
    # same geometry, same estimator -> near-identical images (fp noise
    # from the transform round-trip only)
    assert abs(a.mean() - b.mean()) <= 0.02 * max(b.mean(), 1e-3)
    assert np.abs(a - b).mean() <= 0.05 * max(b.mean(), 1e-3)


def test_memory_o1_in_instances(variant_scalar_rgb):
    s3 = mi.load_dict(_scene_dict(2, materialize=False))
    s8 = mi.load_dict(_scene_dict(8, materialize=False))
    g3 = sum(int(g["v0"].shape[0]) for g in s3._inst_groups)
    g8 = sum(int(g["v0"].shape[0]) for g in s8._inst_groups)
    assert g3 == g8                       # geometry doesn't grow
    assert s8._inst_table.shape[0] == 8   # only the transform rows do
    assert s8.geom.v0.shape[0] == s3.geom.v0.shape[0]


def test_auto_threshold(variant_scalar_rgb):
    # small group (default threshold) -> materialized copies
    scene = mi.load_dict(_scene_dict(2, materialize=None, nu=16, nv=8))
    assert scene.n_instances == 0
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=16))
    assert np.isfinite(img).all()


def test_shadows_from_instances(variant_scalar_rgb):
    """Instanced geometry occludes NEE shadow rays (ray_test path)."""
    scene = mi.load_dict(_scene_dict(3, materialize=False))
    img = np.asarray(scene.integrator.render(scene, seed=1, spp=32))
    h, w, _ = img.shape
    # the floor under the spheres is darker than the open floor edges
    mid = img[int(h * 0.75), w // 2, :3].mean()
    edge = img[int(h * 0.75), 1, :3].mean()
    assert np.isfinite(img).all()
    assert mid < edge * 1.2  # shadowed or at most comparable


def test_emitter_in_group_rejected(variant_scalar_rgb):
    from mitsuba2_tpu.python.test.scenes import _bumpy_sphere_obj_path
    group = {"type": "shapegroup", "id": "grp2",
             "m": {"type": "obj",
                   "filename": _bumpy_sphere_obj_path(40, 20),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 1.0}}}}
    d = {"type": "scene", "grp": group,
         "i0": {"type": "instance",
                "shapegroup": {"type": "ref", "id": "grp2"},
                "materialize": False}}
    with pytest.raises(NotImplementedError, match="emitters"):
        mi.load_dict(d)


def test_default_instances_ride_megakernel(variant_scalar_rgb):
    """Default-policy instanced scenes (groups <= 64k faces materialize,
    models/shapes.py) are megakernel-eligible — the reference-default
    instancing workflow no longer costs the 16x wavefront fallback
    (VERDICT r2 #4c). Huge groups keep the O(1)-memory shared path."""
    from mitsuba2_tpu.ops.megakernel import megakernel_ineligibility
    scene = mi.load_dict(_scene_dict(4, materialize=None))
    assert scene.n_instances == 0          # materialized by policy
    assert megakernel_ineligibility(scene) is None
    # forced-shared stays on the wavefront (documented fallback)
    shared = mi.load_dict(_scene_dict(2, materialize=False))
    assert megakernel_ineligibility(shared) is not None
