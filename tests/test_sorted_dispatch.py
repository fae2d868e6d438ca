"""Material-sorted tile dispatch (ops/sorted_dispatch.py): unit semantics
plus identical-image parity against the masked-sweep path (VERDICT r2 #9;
reference vcall lane partitioning, bsdf.h:522-532)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def test_dispatch_sorted_unit():
    from mitsuba2_tpu.ops.sorted_dispatch import dispatch_sorted
    rs = np.random.RandomState(7)
    N, F, TILE = 1000, 3, 128
    idx = jnp.asarray(rs.randint(-1, F, size=N), jnp.int32)
    x = jnp.asarray(rs.rand(N, 2), jnp.float32)

    def make_branch(i):
        def br(ops):
            xv, ix = ops
            mask = ix == i
            return jnp.where(mask[:, None], xv * (i + 1.0), 0.0)
        return br

    def fallback(ops):
        xv, ix = ops
        out = jnp.zeros_like(xv)
        for i in range(F):
            out = jnp.where((ix == i)[:, None], xv * (i + 1.0), out)
        return out

    out = np.asarray(dispatch_sorted(
        idx, (x, idx), [make_branch(i) for i in range(F)], fallback,
        tile=TILE))
    expect = np.array(fallback((x, idx)))
    expect[np.asarray(idx) < 0] = 0.0
    assert np.array_equal(out, expect)


def test_dispatch_sorted_no_padding_needed():
    """N an exact multiple of tile (no pad lanes)."""
    from mitsuba2_tpu.ops.sorted_dispatch import dispatch_sorted
    N, TILE = 512, 128
    idx = jnp.asarray(np.arange(N) % 2, jnp.int32)
    x = jnp.arange(N, dtype=jnp.float32)
    out = dispatch_sorted(
        idx, (x, idx),
        [lambda o: jnp.where(o[1] == 0, o[0] + 1.0, 0.0),
         lambda o: jnp.where(o[1] == 1, o[0] * 2.0, 0.0)],
        lambda o: jnp.where(o[1] == 0, o[0] + 1.0, o[0] * 2.0),
        tile=TILE)
    expect = np.where(np.arange(N) % 2 == 0, np.arange(N) + 1.0,
                      np.arange(N) * 2.0)
    assert np.allclose(np.asarray(out), expect)


def test_worth_sorting_gate():
    from mitsuba2_tpu.ops.sorted_dispatch import worth_sorting
    assert not worth_sorting(1 << 20, 2)          # too few families
    assert not worth_sorting(8192 * 8, 7)         # too few tiles
    # min_families retuned 4 -> 7 from the hardware A/B
    # (benchmarks/logs/sorted_dispatch_r5.log: 5 families are a wash)
    assert not worth_sorting(1 << 20, 4)
    assert worth_sorting(1 << 20, 7)


def _hetero_scene_dict(width, spp):
    from mitsuba2_tpu.core.transform import Transform as T
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        # several emitters: the sorted emitter dispatch
        # (sample/pdf_emitter_direction) partitions lanes by pick
        "light": {"type": "rectangle",
                  "to_world": (T.translate([0, 0, 4]) @ T.scale(1.5)
                               @ T.rotate([1, 0, 0], 180)),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 12.0}}},
        "light2": {"type": "rectangle",
                   "to_world": (T.translate([-3, -2, 3]) @ T.scale(0.7)
                                @ T.rotate([1, 0, 0], 180)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb",
                                            "value": [9.0, 3.0, 1.0]}}},
        "light3": {"type": "rectangle",
                   "to_world": (T.translate([3, -2, 3]) @ T.scale(0.7)
                                @ T.rotate([1, 0, 0], 180)),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb",
                                            "value": [1.0, 3.0, 9.0]}}},
        "light4": {"type": "point", "position": [0, -4, 2],
                   "intensity": {"type": "rgb", "value": 6.0}},
        "floor": {"type": "rectangle", "to_world": T.scale([8, 8, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.5}}},
        "sensor": {
            "type": "perspective", "fov": 45.0,
            "to_world": T.look_at(origin=[0, -6, 3], target=[0, 0, 0.6],
                                  up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": width, "height": width,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp}},
    }
    mats = [
        {"type": "diffuse", "reflectance": {"type": "rgb",
                                            "value": [0.7, 0.3, 0.2]}},
        {"type": "conductor", "material": "Au"},
        {"type": "dielectric"},
        {"type": "plastic",
         "diffuse_reflectance": {"type": "rgb", "value": [0.2, 0.5, 0.7]}},
        {"type": "roughconductor", "alpha": 0.3, "material": "Al"},
    ]
    for k, mat in enumerate(mats):
        x = -2.0 + k * 1.0
        d[f"ball{k}"] = {"type": "sphere", "radius": 0.45,
                         "center": [x, 0, 0.5], "bsdf": mat}
    return d


@pytest.mark.slow
def test_sorted_dispatch_render_identical(variant_scalar_rgb):
    """MI_SORTED_DISPATCH=on must reproduce the masked-sweep image on a
    6-family scene (per-lane math is order-independent)."""
    import mitsuba2_tpu as mi
    W, SPP = 32, 32                       # 32768 lanes = 4 tiles of 8192
    old = os.environ.get("MI_SORTED_DISPATCH")
    try:
        os.environ["MI_SORTED_DISPATCH"] = "off"
        scene_a = mi.load_dict(_hetero_scene_dict(W, SPP))
        img_a = np.asarray(scene_a.integrator.render(scene_a, seed=3,
                                                     spp=SPP))
        os.environ["MI_SORTED_DISPATCH"] = "on"
        scene_b = mi.load_dict(_hetero_scene_dict(W, SPP))
        img_b = np.asarray(scene_b.integrator.render(scene_b, seed=3,
                                                     spp=SPP))
    finally:
        if old is None:
            os.environ.pop("MI_SORTED_DISPATCH", None)
        else:
            os.environ["MI_SORTED_DISPATCH"] = old
    assert np.isfinite(img_b).all()
    assert np.allclose(img_a, img_b, rtol=1e-5, atol=1e-6), \
        float(np.abs(img_a - img_b).max())
