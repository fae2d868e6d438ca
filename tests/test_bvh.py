"""Native C++ BVH builder (ops/bvh.py + native/bvh.cpp)."""

import numpy as np
import pytest

from mitsuba2_tpu.ops.bvh import (
    BVH, build_bvh, native_available, validate_bvh)


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return v0, e1, e2


def test_native_builder_loads():
    assert native_available(), "C++ builder failed to compile/load"


@pytest.mark.parametrize("force_numpy", [False, True])
@pytest.mark.parametrize("n", [1, 7, 100, 2000])
def test_build_valid(force_numpy, n):
    v0, e1, e2 = _random_tris(n)
    bvh = build_bvh(v0, e1, e2, leaf_size=16, force_numpy=force_numpy)
    validate_bvh(bvh, v0, e1, e2)


def test_native_partitions_space():
    # clearly separable clusters must land in distinct subtrees: the root
    # must be interior and its children's AABBs must not overlap in x
    v0a, e1a, e2a = _random_tris(200, seed=1)
    v0b = v0a + np.array([100.0, 0, 0], np.float32)
    v0 = np.concatenate([v0a, v0b])
    e1 = np.concatenate([e1a, e1a])
    e2 = np.concatenate([e2a, e2a])
    bvh = build_bvh(v0, e1, e2, leaf_size=16)
    ints = bvh.nodes.view(np.int32)
    assert ints[0, 7] == 0  # root is interior
    left, right = ints[0, 3], ints[0, 8]
    lo = sorted([bvh.nodes[left], bvh.nodes[right]],
                key=lambda nd: nd[0])
    assert lo[0][4] < lo[1][0]  # hi.x of left cluster < lo.x of right


def test_clusters_cover_everything():
    v0, e1, e2 = _random_tris(333)
    bvh = build_bvh(v0, e1, e2, leaf_size=32)
    lo, hi, idx = bvh.clusters(32)
    faces = idx[idx >= 0]
    assert sorted(faces.tolist()) == list(range(333))
    assert (lo <= hi).all()
    assert idx.shape[1] == 32


def test_sah_beats_median_on_area():
    # the SAH builder should produce a total leaf surface area no worse
    # than the median-split fallback on clustered geometry
    v0, e1, e2 = _random_tris(1000, seed=3)
    v0[:500] *= 0.05  # dense cluster + sparse halo
    def leaf_area(b):
        return sum(
            float(np.prod(np.maximum(h - l, 0)) ** (2 / 3))
            for _, _, l, h in b.leaves())
    sah = leaf_area(build_bvh(v0, e1, e2, leaf_size=16))
    med = leaf_area(build_bvh(v0, e1, e2, leaf_size=16, force_numpy=True))
    assert sah <= med * 1.10


def test_scene_render_unchanged_by_reordering():
    # the BVH permutation must not change radiometry: render the cornell
    # box and compare against a no-BVH packing of the same scene
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    import mitsuba2_tpu.ops.bvh as bvh_mod

    d = cornell_box_dict(width=32, height=32, spp=4)
    scene = mi.load_dict(d)
    assert scene.bvh is not None
    img_bvh = np.asarray(scene.integrator.render(scene, seed=5))

    orig = bvh_mod.build_bvh
    try:
        # identity "BVH": single leaf, original order
        def identity_build(v0, e1, e2, leaf_size=64, force_numpy=False):
            n = len(v0)
            nodes = np.zeros((1, 12), np.float32)
            ints = nodes.view(np.int32)
            ints[0, 3], ints[0, 7], ints[0, 8] = 0, n, -1
            return BVH(nodes, np.arange(n, dtype=np.int32))
        bvh_mod.build_bvh = identity_build
        scene2 = mi.load_dict(cornell_box_dict(width=32, height=32,
                                               spp=4))
    finally:
        bvh_mod.build_bvh = orig
    img_id = np.asarray(scene2.integrator.render(scene2, seed=5))
    np.testing.assert_allclose(img_bvh, img_id, rtol=2e-4, atol=2e-5)


def test_chunk_culling_exact(variant_scalar_rgb=None):
    """Slab-culled chunked intersection returns bit-identical hits to the
    unculled path on a multi-chunk scene (two separated dense spheres)."""
    import jax.numpy as jnp
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.ops import intersect as isect
    from mitsuba2_tpu.ops.bvh import build_bvh, chunk_bounds
    from mitsuba2_tpu.models.shapes import _sphere_mesh

    v1, f1, _, _ = _sphere_mesh(1.0, (-3, 0, 0), 24, 48)
    v2, f2, _, _ = _sphere_mesh(1.0, (3, 0, 0), 24, 48)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    p = verts[faces]
    v0 = p[:, 0]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    bvh = build_bvh(v0, e1, e2)
    v0, e1, e2 = v0[bvh.order], e1[bvh.order], e2[bvh.order]
    cb = jnp.asarray(chunk_bounds(v0, e1, e2, isect.FACE_CHUNK))
    assert cb.shape[0] > 4  # genuinely multi-chunk

    rng = np.random.default_rng(3)
    n = 512
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 2] = 8.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(o), jnp.asarray(d),
            jnp.full(n, 1e-4), jnp.full(n, np.inf))

    pi_ref = isect.ray_intersect_packets(*args)
    pi_cull = isect.ray_intersect_packets(*args, chunk_bounds=cb)
    np.testing.assert_array_equal(np.asarray(pi_ref.prim_idx),
                                  np.asarray(pi_cull.prim_idx))
    np.testing.assert_allclose(np.asarray(pi_ref.t),
                               np.asarray(pi_cull.t), rtol=1e-6)

    hit_ref = isect.ray_test_packets(*args)
    hit_cull = isect.ray_test_packets(*args, chunk_bounds=cb)
    np.testing.assert_array_equal(np.asarray(hit_ref),
                                  np.asarray(hit_cull))

    # Pallas interpret path with its in-kernel AABB culling agrees too
    from mitsuba2_tpu.ops.intersect_pallas import WoopIntersector
    wi = WoopIntersector(v0, e1, e2, interpret=True)
    t_w, _, prim_w = wi(*args[3:])
    assert (np.isfinite(np.asarray(t_w))
            == np.isfinite(np.asarray(pi_ref.t))).all()
    valid = np.isfinite(np.asarray(pi_ref.t))
    np.testing.assert_allclose(np.asarray(t_w)[valid],
                               np.asarray(pi_ref.t)[valid], rtol=1e-4)
