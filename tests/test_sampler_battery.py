"""Sampler statistical battery (parity role: the reference's
src/samplers/tests — uniformity, stratification, determinism and
decorrelation properties per sampler plugin)."""

import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba2_tpu as mi

SAMPLERS = ["independent", "stratified", "multijitter", "orthogonal",
            "ldsampler"]


def _draws(name, n_pixels=64, spp=64, dims=2):
    """-> (n_pixels*spp, dims) array of next_1d draws per lane."""
    mi.set_variant("scalar_rgb")
    s = mi.load_dict({"type": name, "sample_count": spp})
    n = n_pixels * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = lane // jnp.uint32(spp)
    sample = lane % jnp.uint32(spp)
    state = s.seed(jnp.uint32(0), pixel, sample)
    out = []
    for _ in range(dims):
        v, state = s.next_1d(state)
        out.append(np.asarray(v))
    return np.stack(out, -1), spp, n_pixels


@pytest.mark.parametrize("name", SAMPLERS)
def test_uniform_marginals(variant_scalar_rgb, name):
    """Each dimension is U[0,1): chi^2 on a 16-bin histogram."""
    x, spp, npix = _draws(name)
    for d in range(x.shape[-1]):
        h, _ = np.histogram(x[:, d], bins=16, range=(0, 1))
        expect = len(x) / 16
        chi2 = ((h - expect) ** 2 / expect).sum()
        # 15 dof; 99.9% quantile ~ 37.7. Stratified samplers are MORE
        # uniform than random so only an upper bound applies.
        assert chi2 < 60.0, (d, chi2, h)
        assert (x[:, d] >= 0).all() and (x[:, d] < 1).all()


@pytest.mark.parametrize("name", SAMPLERS)
def test_mean_and_range(variant_scalar_rgb, name):
    x, spp, npix = _draws(name)
    assert abs(x.mean() - 0.5) < 0.01


@pytest.mark.parametrize("name", SAMPLERS)
def test_deterministic_per_pixel_sample(variant_scalar_rgb, name):
    """The counter-based design: same (seed, pixel, sample) -> identical
    draws (the reproducibility property SURVEY.md §2.3 calls out)."""
    a, _, _ = _draws(name)
    b, _, _ = _draws(name)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("name", SAMPLERS)
def test_seed_decorrelates(variant_scalar_rgb, name):
    """Changing the seed changes the draws. Structured samplers keep
    their stratum layout across seeds (only the scramble/jitter moves),
    so full decorrelation is only demanded of `independent`."""
    mi.set_variant("scalar_rgb")
    s = mi.load_dict({"type": name, "sample_count": 16})
    n = 1024
    lane = jnp.arange(n, dtype=jnp.uint32)
    pix = lane // jnp.uint32(16)
    samp = lane % jnp.uint32(16)
    v0, _ = s.next_1d(s.seed(jnp.uint32(0), pix, samp))
    v1, _ = s.next_1d(s.seed(jnp.uint32(7), pix, samp))
    v0, v1 = np.asarray(v0), np.asarray(v1)
    assert not np.allclose(v0, v1)
    if name == "independent":
        c = np.corrcoef(v0, v1)[0, 1]
        assert abs(c) < 0.1, c
    else:
        # the jitter/scramble must actually move most draws
        assert (np.abs(v0 - v1) > 1e-6).mean() > 0.5


@pytest.mark.parametrize("name", ["stratified", "multijitter",
                                  "ldsampler", "orthogonal"])
def test_stratification_beats_random(variant_scalar_rgb, name):
    """Within one pixel, spp stratified samples cover [0,1) more evenly
    than independent sampling: the max-gap statistic must be below the
    random-sampling expectation (~log(n)/n scaling)."""
    mi.set_variant("scalar_rgb")
    spp = 64
    s = mi.load_dict({"type": name, "sample_count": spp})
    lane = jnp.arange(spp, dtype=jnp.uint32)
    state = s.seed(jnp.uint32(0), jnp.zeros(spp, jnp.uint32), lane)
    v, _ = s.next_1d(state)
    v = np.sort(np.asarray(v))
    gaps = np.diff(np.concatenate([[0.0], v, [1.0]]))
    # perfectly stratified: max gap ~ 2/spp; random: ~ log(spp)/spp ~ 6.5/spp
    assert gaps.max() < 4.5 / spp, gaps.max()


@pytest.mark.parametrize("name", SAMPLERS)
def test_2d_no_axis_alignment(variant_scalar_rgb, name):
    """next_2d pairs fill the square (no degenerate diagonal): 4x4 cell
    occupancy is complete for 256 samples of one pixel."""
    mi.set_variant("scalar_rgb")
    s = mi.load_dict({"type": name, "sample_count": 256})
    # orthogonal rounds sample_count up to p^2; use the full sequence
    spp = s.sample_count
    lane = jnp.arange(spp, dtype=jnp.uint32)
    state = s.seed(jnp.uint32(1), jnp.zeros(spp, jnp.uint32), lane)
    uv, _ = s.next_2d(state)
    uv = np.asarray(uv)
    cells = (np.floor(uv[:, 0] * 4).astype(int) * 4
             + np.floor(uv[:, 1] * 4).astype(int))
    occupied = np.unique(np.clip(cells, 0, 15))
    assert len(occupied) == 16, occupied
