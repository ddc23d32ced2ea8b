"""Self-heating iterations: CLPAC re-emission, WITH_REFERENCE, EMWEI paths."""

import os
import shutil

import numpy as np
import pytest

from soc_tpu.io.cloud import write_hierarchy
from soc_tpu.pipeline import driver

SOCEX = "/tmp/socex"

INI = """
gridlength      0.01
cloud           tmp.cloud
mapping         8 8 1.0
density         3.0e4
seed            1.0
directions      0.0 0.0
optical         tmp.dust
dsc             tmp.dsc 2500
bgpackets       {bgpac}
cellpackets     {clpac}
background      bg_intensity.bin
iterations      {iters}
noabsorbed
temperature     tmp.T
emitted         emitted.data
nomap
{extra}
"""


def make_run(tmp_path, name, clpac, iters, extra=""):
    if not os.path.exists(os.path.join(SOCEX, "tmp.dust")):
        pytest.skip("soc_example not extracted")
    wd = tmp_path / name
    wd.mkdir()
    for f in ("tmp.dust", "tmp.dsc", "bg_intensity.bin"):
        shutil.copy(os.path.join(SOCEX, f), wd)
    n = 8
    write_hierarchy(wd / "tmp.cloud", n, n, n, [n**3],
                    [np.ones(n**3, np.float32)])
    area = 6 * n * n
    (wd / "my.ini").write_text(INI.format(
        bgpac=8 * area * 2, clpac=clpac, iters=iters, extra=extra))
    return driver.run(str(wd / "my.ini"), lanes=1 << 13)


def test_self_heating_iterations(tmp_path):
    res = make_run(tmp_path, "plain", clpac=2 * 8**3, iters=3)
    assert np.all(np.isfinite(res.temperature))
    assert np.all(res.temperature > 3.0)
    assert np.all(np.isfinite(res.emitted))
    assert res.emitted.max() > 0


def test_with_reference_matches_plain(tmp_path):
    """The reference-field control variate must converge to the same
    temperatures as the plain iteration."""
    res_a = make_run(tmp_path, "a", clpac=2 * 8**3, iters=3)
    res_b = make_run(tmp_path, "b", clpac=2 * 8**3, iters=3,
                     extra="reference 1")
    np.testing.assert_allclose(res_b.temperature, res_a.temperature,
                               rtol=0.02)


def test_emweight_iteration(tmp_path):
    res = make_run(tmp_path, "w", clpac=2 * 8**3, iters=2,
                   extra="emweight 1")
    assert np.all(np.isfinite(res.temperature))
    assert np.all(res.temperature > 3.0)


def test_ali_iteration(tmp_path):
    res = make_run(tmp_path, "ali", clpac=2 * 8**3, iters=2,
                   extra="ali 1")
    assert np.all(np.isfinite(res.temperature))
    assert np.all(res.temperature > 3.0)
