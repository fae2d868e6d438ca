"""Phase function battery (reference src/phase/tests role)."""

import numpy as np
import jax.numpy as jnp

import mitsuba2_tpu as mi


def _mi_for(n):
    """A minimal MediumInteraction-like frame for phase evaluation."""
    from mitsuba2_tpu.models.media_impl import _zero_mi
    mi_ = _zero_mi(n, 3)
    return mi_


def test_isotropic_pdf_constant(variant_scalar_rgb):
    p = mi.load_dict({"type": "isotropic"})
    m = _mi_for(128)
    rs = np.random.RandomState(0)
    wo = rs.randn(128, 3).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(p.eval(m, jnp.asarray(wo), True))
    assert np.allclose(val, 1.0 / (4 * np.pi), atol=1e-6)


def test_isotropic_sample_uniform(variant_scalar_rgb):
    p = mi.load_dict({"type": "isotropic"})
    m = _mi_for(20000)
    rs = np.random.RandomState(1)
    u = jnp.asarray(rs.rand(20000, 2).astype(np.float32))
    wo, pdf = p.sample(m, u, True)
    wo = np.asarray(wo)
    # all octants populated evenly
    oct_ = ((wo[:, 0] > 0).astype(int) + 2 * (wo[:, 1] > 0)
            + 4 * (wo[:, 2] > 0))
    counts = np.bincount(oct_, minlength=8)
    assert counts.min() > 0.8 * counts.max()
    assert np.allclose(np.asarray(pdf), 1.0 / (4 * np.pi), atol=1e-6)


def test_hg_mean_cosine(variant_scalar_rgb):
    """<cos theta> of Henyey-Greenstein equals g (hg.cpp invariant)."""
    for g in (0.3, -0.5):
        p = mi.load_dict({"type": "hg", "g": g})
        n = 100_000
        m = _mi_for(n)
        rs = np.random.RandomState(2)
        u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
        wo, pdf = p.sample(m, u, True)
        wo = np.asarray(wo)
        wi = np.asarray(m.wi)
        # mean cosine against the INCOMING direction's continuation -wi
        mean_cos = (wo @ np.asarray([0, 0, 1.0]) * np.sign(-wi[0, 2])
                    if abs(wi[0, 2]) > 0 else wo[:, 2])
        mc = float(np.mean(wo[:, 2]) * np.sign(-wi[0, 2])) \
            if abs(wi[0, 2]) > 0 else float(np.mean(wo[:, 2]))
        assert abs(abs(mc) - abs(g)) < 0.02, (g, mc)


def test_hg_pdf_matches_sample(variant_scalar_rgb):
    p = mi.load_dict({"type": "hg", "g": 0.4})
    n = 4096
    m = _mi_for(n)
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    wo, pdf_claimed = p.sample(m, u, True)
    pdf2 = np.asarray(p.eval(m, wo, True))
    pc = np.asarray(pdf_claimed)
    # normalized phase: eval == pdf
    assert np.allclose(pdf2, pc, rtol=2e-3, atol=1e-6)


def test_hg_g0_equals_isotropic(variant_scalar_rgb):
    p = mi.load_dict({"type": "hg", "g": 0.0})
    m = _mi_for(64)
    rs = np.random.RandomState(4)
    wo = rs.randn(64, 3).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(p.eval(m, jnp.asarray(wo), True))
    assert np.allclose(val, 1.0 / (4 * np.pi), atol=1e-5)
