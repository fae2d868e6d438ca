"""Distribution tests (parity: src/libcore/tests/test_distr_1d.py /
test_distr_2d.py)."""

import numpy as np

import jax.numpy as jnp

from mitsuba2_tpu.core.distr_1d import (DiscreteDistribution,
                                        ContinuousDistribution,
                                        IrregularContinuousDistribution)
from mitsuba2_tpu.core.distr_2d import (DiscreteDistribution2D,
                                        Hierarchical2D, Marginal2D)


def test_discrete_basic():
    d = DiscreteDistribution.create(jnp.asarray([1.0, 3.0, 0.0, 4.0]))
    assert np.isclose(float(d.sum), 8.0)
    u = jnp.asarray([0.0, 0.124, 0.126, 0.49, 0.51, 0.999])
    idx = np.asarray(d.sample(u))
    assert list(idx) == [0, 0, 1, 1, 3, 3]
    assert np.isclose(float(d.eval_pmf_normalized(1)), 3.0 / 8.0)


def test_discrete_sample_reuse():
    d = DiscreteDistribution.create(jnp.asarray([1.0, 1.0]))
    idx, u2 = d.sample_reuse(jnp.asarray([0.25, 0.75]))
    assert list(np.asarray(idx)) == [0, 1]
    assert np.allclose(np.asarray(u2), [0.5, 0.5], atol=1e-6)


def test_discrete_statistics():
    rs = np.random.RandomState(0)
    pmf = rs.rand(32).astype(np.float32)
    d = DiscreteDistribution.create(jnp.asarray(pmf))
    u = rs.rand(200000).astype(np.float32)
    idx = np.asarray(d.sample(jnp.asarray(u)))
    hist = np.bincount(idx, minlength=32) / len(u)
    assert np.abs(hist - pmf / pmf.sum()).max() < 5e-3


def test_continuous_uniform_nodes():
    d = ContinuousDistribution.create([2.0, 3.0], jnp.asarray([1.0, 3.0]))
    # integral = (1+3)/2 = 2
    assert np.isclose(float(d.integral), 2.0)
    assert np.isclose(float(d.eval_pdf(jnp.asarray(2.5))), 2.0)
    assert np.isclose(float(d.eval_pdf_normalized(jnp.asarray(2.5))), 1.0)
    # statistical check
    rs = np.random.RandomState(1)
    u = rs.rand(200000).astype(np.float32)
    x = np.asarray(d.sample(jnp.asarray(u)))
    assert x.min() >= 2.0 and x.max() <= 3.0
    # mean of pdf ~ (x-2) linear: E[x] = 2 + int x'(1+2x')dx'/2 = 2 + (1/2+2/3)/2
    assert np.isclose(x.mean(), 2.0 + (0.5 + 2.0 / 3.0) / 2.0, atol=3e-3)


def test_irregular_continuous():
    d = IrregularContinuousDistribution.create(
        jnp.asarray([1.0, 1.5, 1.8, 5.0]), jnp.asarray([1.0, 3.0, 0.0, 1.0]))
    ref_integral = 0.5 * (1 + 3) * 0.5 + 0.5 * 3 * 0.3 + 0.5 * 1 * 3.2
    assert np.isclose(float(d.integral), ref_integral, rtol=1e-5)
    # sample/pdf consistency via histogram
    rs = np.random.RandomState(2)
    u = rs.rand(400000).astype(np.float32)
    x = np.asarray(d.sample(jnp.asarray(u)))
    h, edges = np.histogram(x, bins=64, range=(1.0, 5.0), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    pdf = np.asarray(d.eval_pdf_normalized(jnp.asarray(centers, jnp.float32)))
    assert np.abs(h - pdf).mean() < 0.02


def _check_2d_warp(warp_obj, n=400000, res=16, tol=3.5e-2):
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    pos, pdf = warp_obj.sample(u)
    pos = np.asarray(pos)
    assert pos.min() >= 0 and pos.max() <= 1
    h, _, _ = np.histogram2d(pos[:, 1], pos[:, 0], bins=res,
                             range=[[0, 1], [0, 1]])
    h = h / n * res * res  # empirical density
    centers = (np.arange(res) + 0.5) / res
    gx, gy = np.meshgrid(centers, centers)
    q = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    ref = np.asarray(warp_obj.eval(q)).reshape(res, res)
    assert np.abs(h - ref).mean() < tol * max(1.0, ref.mean())
    # pdf returned by sample() agrees with eval()
    pdf2 = np.asarray(warp_obj.eval(jnp.asarray(pos)))
    assert np.allclose(np.asarray(pdf), pdf2, rtol=2e-3, atol=2e-3)


def test_hierarchical2d():
    rs = np.random.RandomState(4)
    data = (rs.rand(8, 12) + 0.1).astype(np.float32)
    _check_2d_warp(Hierarchical2D.create(jnp.asarray(data)))


def test_marginal2d():
    rs = np.random.RandomState(5)
    data = (rs.rand(7, 9) + 0.05).astype(np.float32)
    _check_2d_warp(Marginal2D.create(jnp.asarray(data)))


def test_discrete_2d():
    rs = np.random.RandomState(6)
    pmf = (rs.rand(5, 7) + 0.01).astype(np.float32)
    d = DiscreteDistribution2D.create(jnp.asarray(pmf))
    u = jnp.asarray(rs.rand(300000, 2).astype(np.float32))
    xy, p, u_r = d.sample(u)
    xy = np.asarray(xy)
    counts = np.zeros((5, 7))
    np.add.at(counts, (xy[:, 1], xy[:, 0]), 1)
    counts /= counts.sum()
    ref = pmf / pmf.sum()
    assert np.abs(counts - ref).max() < 5e-3
    u_r = np.asarray(u_r)
    assert u_r.min() >= 0 and u_r.max() < 1.0
