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
