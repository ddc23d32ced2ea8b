"""Emission-weighted packet allocation (EMWEI + Russian roulette)."""

import numpy as np

from soc_tpu.pipeline.driver import emweight_allocation


def test_allocation_unbiased():
    """E[count * weight] == 1 per cell: the estimator is unbiased."""
    rng = np.random.default_rng(3)
    emit = rng.random(500) ** 3          # strong dynamic range
    emit[::17] = 0.0
    clpac = 2000
    acc = np.zeros(500)
    trials = 400
    for t in range(trials):
        cell_of_id, weight, total = emweight_allocation(
            emit, clpac, rng=np.random.default_rng(t))
        counts = np.bincount(cell_of_id, minlength=500)
        acc += counts * weight
    acc /= trials
    wei = clpac * emit / emit.sum()
    # non-roulette cells (wei >= 1) have deterministic counts: exact
    m = wei >= 1.0
    np.testing.assert_allclose(acc[m], 1.0, rtol=1e-6)
    assert np.all(acc[emit == 0] == 0.0)
    # roulette cells: verify aggregate unbiasedness (total emitted energy)
    rel = np.sum(acc * emit) / emit.sum()
    assert abs(rel - 1.0) < 0.02, rel


def test_allocation_proportional():
    emit = np.asarray([1.0, 10.0, 100.0, 1000.0])
    cell_of_id, weight, total = emweight_allocation(emit, 1111)
    counts = np.bincount(cell_of_id, minlength=4)
    # bright cells get ~proportional counts
    assert counts[3] > 800
    assert counts[2] > 50 and counts[2] < 200
    # weights invert the counts
    np.testing.assert_allclose(counts[2:] * weight[2:], 1.0, rtol=1e-6)

def test_allocation_mode2_deterministic_quotas():
    """USE_EMWEIGHT==2 (ASOC.py:1773-1789): packets per cell are
    deterministic multiples of EMWEI2_STEP of the unclipped share,
    weight = 1/EMPAC; no roulette randomness."""
    from soc_tpu.pipeline.driver import EMWEI2_STEP
    emit = np.asarray([1.0, 10.0, 100.0, 1000.0])
    clpac = 10000
    a1 = emweight_allocation(emit, clpac, rng=np.random.default_rng(1),
                             mode=2)
    a2 = emweight_allocation(emit, clpac, rng=np.random.default_rng(99),
                             mode=2)
    counts = np.bincount(a1[0], minlength=4)
    # identical across rng draws (deterministic)
    np.testing.assert_array_equal(counts, np.bincount(a2[0], minlength=4))
    share = clpac * emit / emit.sum()
    expect = (EMWEI2_STEP * np.round(share / EMWEI2_STEP)).astype(int)
    np.testing.assert_array_equal(counts, expect)
    m = counts > 0
    np.testing.assert_allclose(counts[m] * a1[1][m], 1.0, rtol=1e-6)
    # unbiased where counts > 0: count*weight == 1 exactly
    assert counts[0] == 0 and a1[1][0] == 0.0   # sub-quantum cell dropped


def test_allocation_ignore_threshold():
    """EMWEIGHT_LIM[2] > 0 (ASOC.py:1770-1772): cells whose post-roulette
    EMWEI falls below the threshold are dropped entirely."""
    emit = np.asarray([1.0, 10.0, 100.0, 1000.0])
    clpac = 1111
    base = emweight_allocation(emit, clpac, rng=np.random.default_rng(5))
    cut = emweight_allocation(emit, clpac, lims=(0.0, 1e10, 50.0),
                              rng=np.random.default_rng(5))
    cb = np.bincount(base[0], minlength=4)
    cc = np.bincount(cut[0], minlength=4)
    share = clpac * emit / emit.sum()
    np.testing.assert_array_equal(cc[share < 50.0], 0)
    np.testing.assert_array_equal(cc[share >= 50.0], cb[share >= 50.0])
