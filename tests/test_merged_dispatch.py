"""Trace-time BSDF merging (models/merged.py) — the vcall-partition
replacement (reference bsdf.h:522-532, SURVEY §2.4 material-sorted
queues): K same-family instances must collapse into ONE dispatch entry
and render identically to the unmerged masked sweep."""

import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.transform import Transform as T


def _scene_dict(n_slabs, family):
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 3},
         "light": {"type": "rectangle",
                   "to_world": (T.translate([0, 3.2, 1.0]) @ T.scale(1.2)
                                @ T.rotate([1, 0, 0], 90)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 10.0}}},
         "sensor": {"type": "perspective", "fov": 55,
                    "to_world": T.look_at([0, 0.5, 4.5], [0, 0, 0],
                                          [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 24, "height": 24,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": 32}}}
    for i in range(n_slabs):
        x = -1.5 + 3.0 * i / max(n_slabs - 1, 1)
        if family == "roughconductor":
            bsdf = {"type": "roughconductor", "distribution": "ggx",
                    "alpha": 0.05 + 0.06 * i, "material": "Au"}
        elif family == "plastic":
            bsdf = {"type": "plastic",
                    "diffuse_reflectance": {"type": "rgb",
                                            "value": [0.2 + 0.07 * i,
                                                      0.5, 0.3]}}
        elif family == "roughplastic":
            bsdf = {"type": "roughplastic", "distribution": "ggx",
                    "alpha": 0.1 + 0.05 * i,
                    "diffuse_reflectance": {"type": "rgb",
                                            "value": [0.3, 0.2 + 0.07 * i,
                                                      0.4]}}
        elif family == "dielectric":
            bsdf = {"type": "dielectric", "int_ior": 1.3 + 0.1 * i}
        else:
            bsdf = {"type": "diffuse",
                    "reflectance": {"type": "rgb",
                                    "value": [0.2 + 0.07 * i, 0.4, 0.5]}}
        d[f"slab{i}"] = {"type": "rectangle",
                         "to_world": (T.translate([x, 0, 0])
                                      @ T.scale([0.4, 1.0, 1.0])),
                         "bsdf": bsdf}
    return d


@pytest.mark.parametrize("family", ["roughconductor", "plastic",
                                    "roughplastic", "diffuse"])
def test_family_merges_to_one_dispatch(variant_scalar_rgb, family):
    scene = mi.load_dict(_scene_dict(4, family))
    merged = [b for b in scene.bsdfs
              if getattr(b, "merged_instances", None) is not None]
    assert len(merged) == 1, [type(b).__name__ for b in scene.bsdfs]
    if family == "diffuse":
        # the light's default diffuse joins the same group: 5 -> 1
        assert len(merged[0].merged_instances) == 5
        assert len(scene.bsdfs) == 1
    else:
        # dispatch shrank to [light's diffuse, merged family] (5 -> 2)
        assert len(merged[0].merged_instances) == 4
        assert len(scene.bsdfs) == 2


def _render_merged_vs_masked(family, spp=64, tol=1e-5):
    """Same scene, merged dispatch vs per-instance masked sweeps (merge
    disabled by making one signature differ via monkeypatch)."""
    import mitsuba2_tpu.models.merged as mg
    scene_m = mi.load_dict(_scene_dict(3, family))
    integ = scene_m.integrator
    integ._disable_megakernel = True
    img_m = np.asarray(integ.render(scene_m, seed=5, spp=spp))

    orig = mg.merge_signature
    mg.merge_signature = lambda b: None       # disable merging
    try:
        scene_u = mi.load_dict(_scene_dict(3, family))
    finally:
        mg.merge_signature = orig
    assert not any(getattr(b, "merged_instances", None)
                   for b in scene_u.bsdfs)
    integ_u = scene_u.integrator
    integ_u._disable_megakernel = True
    img_u = np.asarray(integ_u.render(scene_u, seed=5, spp=spp))
    # same sampler decisions, same math -> numerically identical images
    np.testing.assert_allclose(img_m, img_u, atol=tol, rtol=1e-4)


@pytest.mark.parametrize("family", ["roughconductor", "plastic",
                                    "roughplastic", "dielectric"])
def test_merged_matches_masked_sweep(variant_scalar_rgb, family):
    _render_merged_vs_masked(family)


def test_mixed_families_group_correctly(variant_scalar_rgb):
    d = _scene_dict(2, "roughconductor")
    d["extra1"] = {"type": "rectangle",
                   "to_world": T.translate([0, -1.2, 0]) @ T.scale(0.5),
                   "bsdf": {"type": "plastic"}}
    d["extra2"] = {"type": "rectangle",
                   "to_world": T.translate([0, 1.2, 0]) @ T.scale(0.5),
                   "bsdf": {"type": "plastic", "nonlinear": True}}
    scene = mi.load_dict(d)
    # 2 conductors merge; the two plastics differ in `nonlinear` so they
    # stay separate
    kinds = sorted(type(b).__name__ for b in scene.bsdfs)
    assert "MergedRoughConductor" in kinds
    assert kinds.count("SmoothPlastic") == 2


def test_merged_autodiff_reaches_originals(variant_scalar_rgb):
    """traverse() still addresses per-shape plugins and gradients flow
    through the merged gather."""
    import jax.numpy as jnp
    from mitsuba2_tpu.python.util import traverse
    from mitsuba2_tpu.python.autodiff import render_loss
    scene = mi.load_dict(_scene_dict(3, "diffuse"))
    assert any(getattr(b, "merged_instances", None) for b in scene.bsdfs)
    params = traverse(scene)
    keys = [k for k in params.keys() if "reflectance.value" in k]
    assert len(keys) >= 3         # 3 slabs (+ the light's default diffuse)
    # a slab key, not the light's rectangle (shape_0)
    key = [k for k in keys if not k.startswith("shape_0")][0]
    params.keep([key])
    _, grads, img = render_loss(scene, params,
                                lambda im: jnp.mean(im), spp=8, seed=0)
    g = np.asarray(grads[key])
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0
