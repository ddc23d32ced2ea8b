"""Library (binned-lookup) emission acceleration."""

import numpy as np
import pytest

from soc_tpu.pipeline import mabu
from soc_tpu.solve import library


@pytest.fixture(scope="module")
def data():
    freq = np.logspace(11.5, 15, 24)
    kabs = 1e-21 * (freq / 1e12) ** 1.7
    rng = np.random.default_rng(4)
    strength = 10.0 ** rng.uniform(1, 5, 4000)
    hard = 10.0 ** rng.uniform(-0.3, 0.3, 4000)   # spectral-shape variation
    base = (freq / freq.max()) ** -1
    absorbed = (strength[:, None]
                * base[None, :] ** hard[:, None]).astype(np.float32)
    emitted, _ = mabu.solve_equilibrium_eqdust(kabs, freq, absorbed)
    return freq, absorbed, emitted


def test_library_lookup_accuracy(data):
    freq, absorbed, emitted = data
    refs = library.choose_reference_frequencies(freq)
    lib = library.build_library(absorbed[:3000], emitted[:3000], refs,
                                nbins=48)
    assert 0.0 < lib["occupancy"] <= 1.0
    pred = library.solve_with_library(lib, absorbed[3000:])
    truth = emitted[3000:]
    m = truth > truth.max() * 1e-8
    rel = np.abs(pred[m] / truth[m] - 1.0)
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.percentile(rel, 90) < 0.3


def test_library_roundtrip(tmp_path, data):
    freq, absorbed, emitted = data
    refs = library.choose_reference_frequencies(freq)
    lib = library.build_library(absorbed[:500], emitted[:500], refs,
                                nbins=16)
    path = tmp_path / "d.lib"
    library.save_library(path, lib)
    lib2 = library.load_library(path)
    a = library.solve_with_library(lib, absorbed[:50])
    b = library.solve_with_library(lib2, absorbed[:50])
    np.testing.assert_array_equal(a, b)


def test_empty_bins_filled(data):
    freq, absorbed, emitted = data
    refs = library.choose_reference_frequencies(freq)
    lib = library.build_library(absorbed[:200], emitted[:200], refs,
                                nbins=32)
    # sparse training: most bins are holes, but every query must resolve
    assert lib["occupancy"] < 0.5
    pred = library.solve_with_library(lib, absorbed)
    assert np.all(np.isfinite(pred))
    assert np.all(pred.sum(axis=1) > 0)
