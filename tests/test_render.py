"""End-to-end render tests: analytic furnace checks + statistical comparison
against the independent numpy reference tracer (role of test_renders.py's
z-tests, reference §4.4)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_furnace_plane(variant_scalar_rgb):
    """A diffuse plane under a uniform environment returns exactly
    albedo * L_env for hit pixels (all bounces converge analytically)."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import furnace_dict
    scene = load_dict(furnace_dict(albedo=0.6, env_radiance=2.0,
                                   width=16, height=16, spp=256,
                                   max_depth=50))
    img = np.asarray(scene.integrator.render(scene, seed=3))
    # camera looks nearly straight down: every pixel hits the plane
    expected = 0.6 * 2.0
    assert img.shape == (16, 16, 3)
    err = np.abs(img - expected)
    assert err.mean() < 0.02, (img.mean(), expected)


def test_env_only(variant_scalar_rgb):
    """No geometry: every ray returns the environment radiance exactly."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core.transform import Transform
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {
            "type": "perspective", "fov": 45.0,
            "to_world": Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 8, "height": 8,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [0.3, 0.6, 0.9]}},
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.allclose(img, [0.3, 0.6, 0.9], atol=1e-5)


def test_direct_light_visibility(variant_scalar_rgb):
    """Camera directly looking at an area light sees its radiance exactly."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core.transform import Transform
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 20.0,
            "to_world": Transform.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 8, "height": 8,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
        "light": {
            "type": "rectangle",
            "to_world": Transform.scale(2.0),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [2.0, 1.0, 0.5]}},
        },
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.allclose(img, [2.0, 1.0, 0.5], atol=1e-4), img.mean(axis=(0, 1))


def test_cornell_vs_numpy_reference(variant_scalar_rgb):
    """Cornell box against the independent numpy tracer: per-pixel z-test
    style bound on the mean images."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    from .reference_pt import render_reference

    w = h = 32
    spp = 400
    d = cornell_box_dict(width=w, height=h, spp=spp, max_depth=4)
    scene = load_dict(d)
    img = np.asarray(scene.integrator.render(scene, seed=0, spp=spp))

    cam = d["sensor"]["to_world"]
    ref = render_reference(scene, w, h, spp=spp, max_depth=4,
                           fov_deg=39.3077, cam_to_world=cam, seed=7)

    # normalized error on downsampled images (noise ~ 1/sqrt(spp))
    # at 400 spp the pure-MC per-pixel |diff| is ~0.031 of the mean
    diff = np.abs(img - ref)
    rel = diff.mean() / max(ref.mean(), 1e-6)
    assert rel < 0.045, f"relative error {rel:.4f}"
    ratio = img.mean() / ref.mean()
    assert abs(ratio - 1.0) < 0.02, f"bias: mean ratio {ratio:.4f}"


def test_depth_integrator(variant_scalar_rgb):
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core.transform import Transform
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "depth"},
        "sensor": {
            "type": "perspective", "fov": 10.0,
            "to_world": Transform.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 4, "height": 4,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "wall": {"type": "rectangle", "to_world": Transform.scale(5.0)},
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.allclose(img, 5.0, atol=0.05)


def test_direct_matches_path_single_bounce(variant_scalar_rgb):
    """direct integrator == path with max_depth=2 on a diffuse scene."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    d = cornell_box_dict(width=16, height=16, spp=256, max_depth=2)
    scene = load_dict(d)
    img_path = np.asarray(scene.integrator.render(scene, seed=0, spp=256))
    d2 = cornell_box_dict(width=16, height=16, spp=256, max_depth=2)
    d2["integrator"] = {"type": "direct"}
    scene2 = load_dict(d2)
    img_direct = np.asarray(scene2.integrator.render(scene2, seed=0, spp=256))
    # same seed => same sample stream: the two estimators coincide closely
    rel = np.abs(img_path - img_direct).mean() / max(img_path.mean(), 1e-6)
    assert rel < 0.02, rel
    ratio = img_direct.mean() / img_path.mean()
    assert abs(ratio - 1.0) < 0.005, ratio


def test_render_deterministic(variant_scalar_rgb):
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    d = cornell_box_dict(width=8, height=8, spp=8, max_depth=3)
    scene = load_dict(d)
    a = np.asarray(scene.integrator.render(scene, seed=5))
    b = np.asarray(scene.integrator.render(scene, seed=5))
    assert np.array_equal(a, b)
    c = np.asarray(scene.integrator.render(scene, seed=6))
    assert not np.array_equal(a, c)


def test_nonsquare_camera_centering(variant_scalar_rgb):
    """A sphere at the camera target must project to the image center for
    non-square films (regression: y sample-scale was -0.5/aspect)."""
    from mitsuba2_tpu import load_dict
    from mitsuba2_tpu.core.transform import Transform
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "depth"},
        "sensor": {"type": "perspective", "fov": 36.0,
                   "to_world": Transform.look_at([0, 1.4, 4.5], [0, 0.4, 0],
                                                 [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 48, "height": 36,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "ball": {"type": "sphere", "radius": 0.7, "center": [0, 0.4, 0],
                 "resolution_hint": 32},
    })
    img = np.asarray(scene.integrator.render(scene, seed=0))[..., 0]
    hit = img > 0
    ys, xs = np.where(hit)
    cy, cx = ys.mean(), xs.mean()
    assert abs(cy - 17.5) < 1.0, cy
    assert abs(cx - 23.5) < 1.0, cx
