"""NN emission surrogate: learns the equilibrium emission map accurately."""

import numpy as np
import pytest

from soc_tpu.pipeline import mabu
from soc_tpu.solve import nn


@pytest.fixture(scope="module")
def trained():
    freq = np.logspace(11.5, 15, 24)
    kabs = 1e-21 * (freq / 1e12) ** 1.7
    rng = np.random.default_rng(2)
    # cells with varying radiation-field strength => varying T and spectra
    strength = 10.0 ** rng.uniform(1, 5, 3000)
    base = (freq / freq.max()) ** -1
    absorbed = (strength[:, None] * base[None, :]).astype(np.float32)
    emitted, t = mabu.solve_equilibrium_eqdust(kabs, freq, absorbed)
    # reference wavelengths for the NN input (a few channels like nnabs)
    iabs = [4, 10, 16, 22]
    model = nn.nn_fit(absorbed[:2500, iabs], emitted[:2500], epochs=400,
                      batch=256, seed=1)
    return model, absorbed, emitted, iabs


def test_nn_accuracy_heldout(trained):
    model, absorbed, emitted, iabs = trained
    pred = nn.nn_solve(model, absorbed[2500:, iabs])
    truth = emitted[2500:]
    m = truth > truth.max() * 1e-8
    rel = np.abs(np.log10(pred[m]) - np.log10(truth[m]))
    # median dex error well under 2%
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.percentile(rel, 95) < 0.1


def test_nn_roundtrip(tmp_path, trained):
    model, absorbed, emitted, iabs = trained
    path = tmp_path / "dust.nn"
    nn.nn_save(path, model)
    model2 = nn.nn_load(path)
    a = nn.nn_solve(model, absorbed[:64, iabs])
    b = nn.nn_solve(model2, absorbed[:64, iabs])
    np.testing.assert_allclose(a, b, rtol=1e-6)
