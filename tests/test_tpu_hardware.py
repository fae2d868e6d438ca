"""TPU-hardware engine-parity regression tests.

Round-1 lesson: every radiometric test ran on the CPU backend, so a bf16
matmul-precision bug on real TPU hardware (default MXU precision truncates
f32 dot inputs to bf16 — ~1% geometry error) went unnoticed while it
darkened renders by 18-45% and turned grazing faces black via bounce-ray
self-intersection. These tests compare all three engines ON the TPU and
skip everywhere else. Run with a real TPU attached:
    python -m pytest tests/test_tpu_hardware.py -q
"""

import numpy as np
import pytest


def _tpu_available():
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(),
                                reason="needs a real TPU backend")


@pytest.fixture(scope="module")
def cornell():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    return mi.load_dict(cornell_box_dict(width=128, height=128, spp=32,
                                         max_depth=6))


def _render(scene, *, megakernel=True, pallas=True, seeds=(11, 12)):
    integ = scene.integrator
    integ._disable_megakernel = not megakernel
    integ._pass_cache = {}
    scene._disable_pallas = not pallas
    acc = 0.0
    for s in seeds:
        acc = acc + np.asarray(
            integ.render(scene, seed=s, spp=32))[..., :3]
    return acc / len(seeds)


def test_woop_intersector_matches_scan(cornell):
    """The pallas Woop intersector must match the XLA scan path to f32
    accuracy on hardware (same integrator, same seeds -> same paths)."""
    a = _render(cornell, megakernel=False, pallas=True)
    b = _render(cornell, megakernel=False, pallas=False)
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    assert rmse < 2e-3, f"woop-vs-scan RMSE {rmse:.5f}"


def test_megakernel_matches_wavefront(cornell):
    """Megakernel vs scan wavefront: independent sample streams, so the
    comparison is statistical — mean agreement well inside MC noise."""
    a = _render(cornell, megakernel=True, seeds=(11, 12, 13, 14))
    b = _render(cornell, megakernel=False, pallas=False,
                seeds=(31, 32, 33, 34))
    ra, rb = a.mean(), b.mean()
    assert abs(ra - rb) / rb < 0.01, (ra, rb)
    # regional agreement (catches single-surface bugs that hide in the
    # global mean, e.g. the round-1 black grazing faces)
    for i in range(4):
        for j in range(4):
            sa = a[i * 32:(i + 1) * 32, j * 32:(j + 1) * 32].mean()
            sb = b[i * 32:(i + 1) * 32, j * 32:(j + 1) * 32].mean()
            assert abs(sa - sb) / max(sb, 1e-3) < 0.12, (i, j, sa, sb)


def test_no_grazing_black_faces(cornell):
    """Bounce rays must not self-intersect their own surface (bf16 regression
    canary): the short box's camera-facing sides receive indirect light."""
    a = _render(cornell, megakernel=False, pallas=False)
    region = a[92:118, 62:88].mean(-1)
    assert (region < 1e-4).sum() == 0, "black pixels on the short box"


def test_megakernel_throughput_counts():
    """The bench path must ride the megakernel and report the engine."""
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import cornell_box_dict
    scene = mi.load_dict(cornell_box_dict(width=64, height=64, spp=16,
                                          max_depth=4))
    integ = scene.integrator
    np.asarray(integ.render(scene, seed=0, spp=16))
    assert integ.last_engine == "megakernel", integ.engine_reason
