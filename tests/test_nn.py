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


def _torch_reference_net(nnnet, n_in, n_out, seed):
    """The reference MyNet (ASOC_aux_NN.py:210-271), built with real torch."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn
    torch.manual_seed(seed)
    layers = []
    widths = [n_in] + list(nnnet)
    for a, b in zip(widths[:-1], widths[1:]):
        layers += [tnn.Linear(a, b), tnn.LeakyReLU()]
    layers.append(tnn.Linear(widths[-1], n_out))
    return torch, tnn.Sequential(*layers)


def test_import_reference_torch_nn(tmp_path, monkeypatch):
    """A .nn file written by torch.save(state_dict) -- the exact on-disk
    artifact of ASOC_aux_NN.NN_fit (ASOC_aux_NN.py:159) -- loads through
    the torch-free unpickler and predicts identically to the torch
    forward pass under the reference's A_/E_.norm scaling."""
    torch, net = _torch_reference_net([13, 17, 13], n_in=4, n_out=9, seed=0)
    # the reference wraps the Sequential in a 'layers' attribute
    state = {("layers." + k): v for k, v in net.state_dict().items()}
    monkeypatch.chdir(tmp_path)
    torch.save(state, "run_adust.nn")
    rng = np.random.default_rng(5)
    ma = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    me = rng.uniform(0.5, 2.0, 9).astype(np.float32)
    ma.tofile("A_adust.norm")
    me.tofile("E_adust.norm")

    model = nn.nn_load("run_adust.nn")
    assert model["norm"] == "ref-linear"
    assert model["hidden"] == (13, 17, 13)
    absorbed = rng.uniform(0.1, 10.0, (50, 4)).astype(np.float32)
    got = nn.nn_solve(model, absorbed)

    with torch.no_grad():
        x = torch.tensor(absorbed / ma[None, :])
        want = net(x).numpy() * me[None, :]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_import_torch_nn_strided_and_norm_mismatch(tmp_path):
    """Non-contiguous saved tensors round-trip exactly; wrong-length norm
    files are refused loudly rather than mis-scaling."""
    torch = pytest.importorskip("torch")
    w = torch.arange(12.0).reshape(4, 3).t()      # stride (1, 3): transposed
    torch.save({"layers.0.weight": w,
                "layers.0.bias": torch.zeros(3)}, tmp_path / "x_d.nn")
    from soc_tpu.utils.torch_pickle import load_state_dict
    state = load_state_dict(tmp_path / "x_d.nn")
    np.testing.assert_array_equal(state["layers.0.weight"],
                                  np.arange(12.0).reshape(4, 3).T)

    np.ones(7, np.float32).tofile(tmp_path / "A_d.norm")
    np.ones(3, np.float32).tofile(tmp_path / "E_d.norm")
    with pytest.raises(ValueError, match="norm-file lengths"):
        nn.import_torch_nn(tmp_path / "x_d.nn",
                           a_norm=tmp_path / "A_d.norm",
                           e_norm=tmp_path / "E_d.norm")


def test_unpickler_refuses_foreign_globals(tmp_path):
    """The restricted unpickler must not execute arbitrary pickled code."""
    import io
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"k": Evil()}))
    (tmp_path / "evil.nn").write_bytes(buf.getvalue())
    from soc_tpu.utils.torch_pickle import load_state_dict
    with pytest.raises(pickle.UnpicklingError):
        load_state_dict(tmp_path / "evil.nn")
