"""DustEM dust compiler on synthetic DustEM-format files."""

import numpy as np
import pytest

from soc_tpu.constants import AMU, PARSEC, um2f
from soc_tpu.solve import dust_compiler as dc


@pytest.fixture
def dustem_files(tmp_path):
    um = np.logspace(-1, 3, 30)[::-1]        # decreasing um in file? no:
    um = np.sort(um)                         # DustEM: increasing wavelength
    nlam = len(um)
    lam = tmp_path / "LAMBDA.DAT"
    lam.write_text("# lambda\n#\n#\n#\n"
                   + "\n".join("%.6e" % u for u in um) + "\n")
    qsize_um = np.asarray([1e-3, 1e-2, 0.1, 1.0])
    # geometric-optics-flavoured Qabs: Q = x/(1+x) with x = 2 pi a/lambda
    qabs = np.zeros((nlam, 4))
    for j, su in enumerate(qsize_um):
        x = 2 * np.pi * su / um
        qabs[:, j] = x / (1.0 + x)
    qsca = 0.5 * qabs
    qtxt = ["# synthetic Q", "#", "4",
            " ".join("%.4e" % s for s in qsize_um), "# Qabs then Qsca"]
    for row in qabs:
        qtxt.append(" ".join("%.6e" % v for v in row))
    for row in qsca:
        qtxt.append(" ".join("%.6e" % v for v in row))
    qf = tmp_path / "Q_TST.DAT"
    qf.write_text("\n".join(qtxt) + "\n")
    g = np.full((nlam, 4), 0.4)
    gtxt = ["#"] * 9 + [" ".join("%.4f" % v for v in row) for row in g]
    gf = tmp_path / "G_TST.DAT"
    gf.write_text("\n".join(gtxt) + "\n")
    # heat capacities: Debye-ish C ~ T^3 per cm3
    ct = np.logspace(0, 3.3, 40)
    lgc = np.log10(1e4 * ct**3)
    ctxt = ["# synthetic C", "4",
            " ".join("%.4e" % s for s in qsize_um), "40"]
    for i, t in enumerate(ct):
        ctxt.append("%.6e " % np.log10(t)
                    + " ".join("%.6e" % lgc[i] for _ in range(4)))
    cf = tmp_path / "C_TST.DAT"
    cf.write_text("\n".join(ctxt) + "\n")
    grain = "TST 24 plaw-ed 0.0065 3.3 1.0e-7 5.0e-5 -3.5 1.0e-5 5e-6 3.0"
    return grain, lam, qf, gf, cf


def test_compile_and_mass_normalization(dustem_files):
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    # dust mass per H = rmass * m_H
    mass = np.sum(dust.sfrac * (4 * np.pi / 3) * dust.size_a**3 * dust.rho)
    np.testing.assert_allclose(mass, 0.0065 * 1.0079 * AMU, rtol=1e-6)
    assert dust.nsize == 24
    assert np.all(np.diff(dust.qfreq) > 0)


def test_effective_optics_sane(dustem_files):
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf)
    freq = np.logspace(11.5, 15, 20)
    opt = dc.effective_optics(dust, freq, gl_pc=0.01)
    assert np.all(opt.abs_gl > 0)
    assert np.all(np.diff(opt.abs_gl) > 0)     # extinction rises with freq
    np.testing.assert_allclose(opt.sca_gl / opt.abs_gl, 0.5, rtol=1e-3)
    np.testing.assert_allclose(opt.g, 0.4, atol=1e-3)
    # sanity of magnitude: tau(V)/N_H for MRN-like dust ~ 1e-21..1e-20 cm2/H
    kabs_v = np.interp(um2f(0.55), freq, opt.abs_gl) / (0.01 * PARSEC)
    assert 1e-23 < kabs_v < 1e-19


def test_gset_conversion_runs_solver_chain(dustem_files):
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    gset = dc.to_gset(dust)
    # E(T) monotone increasing, scales ~ a^3
    e1 = gset.t2e(0, 50.0)
    e2 = gset.t2e(gset.nsize - 1, 50.0)
    assert e2 > e1 * 10
    assert gset.t2e(0, 100.0) > gset.t2e(0, 10.0)
    # the full A2E_pre chain accepts the compiled grain model
    from soc_tpu.solve import solver_prep
    freq = np.logspace(11.5, 15, 16)
    sol = solver_prep.build_solver(gset, freq, ne=32)
    assert sol.nsize == dust.nsize
    assert np.all(sol.sizes[0].tdown[1:] > 0)


def test_tabulated_scattering_function(dustem_files):
    """Size-weighted HG mixture: normalized pdf, monotone inverse CDF, and
    broader wings than the single effective-g HG."""
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    freq = np.logspace(12, 15, 6)
    bins = 512
    dsc, csc = dc.tabulated_scattering_function(dust, freq, bins)
    mu = np.linspace(-1 + 1 / bins, 1 - 1 / bins, bins)
    dmu = 2.0 / bins
    # pdf over solid angle: integral over 4pi = 2 pi * sum(pdf dmu) = 1
    norm = 2 * np.pi * dsc.sum(axis=1) * dmu
    np.testing.assert_allclose(norm, 1.0, rtol=1e-2)
    assert np.all(np.diff(csc, axis=1) >= -1e-6)      # inverse CDF monotone
    assert np.all((csc >= -1) & (csc <= 1))
    # combined over two species runs and stays normalized
    dsc2, csc2 = dc.combined_scattering_function([dust, dust], freq, bins)
    np.testing.assert_allclose(dsc2, dsc, rtol=1e-5)


def test_scattering_file_roundtrip(dustem_files, tmp_path):
    from soc_tpu.io.dust import read_scattering_function
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    freq = np.logspace(12, 15, 5)
    dsc, csc = dc.tabulated_scattering_function(dust, freq, 256)
    dc.write_scattering_file(tmp_path / "t.dsc", dsc, csc)
    d2, c2 = read_scattering_function(str(tmp_path / "t.dsc"), 5, 256)
    np.testing.assert_array_equal(d2, dsc)
    np.testing.assert_array_equal(c2, csc)


def test_size_and_mix_variants(dustem_files, tmp_path):
    grain, lam, qf, gf, cf = dustem_files
    # tabulated dn/da ~ a^-3.5 equivalent
    a = np.logspace(-7, np.log10(5e-5), 30)
    np.savetxt(tmp_path / "SIZE_TST.DAT",
               np.c_[a * 1e4, a ** -3.5])
    grain_size = "TST 24 size 0.0065 3.3 1.0e-7 5.0e-5"
    name, rho, aa, sf1 = dc.parse_grain_line(
        grain_size, size_path=str(tmp_path / "SIZE_TST.DAT"))
    name, rho, aa, sf0 = dc.parse_grain_line(
        "TST 24 plaw 0.0065 3.3 1.0e-7 5.0e-5 -3.5")
    np.testing.assert_allclose(sf1, sf0, rtol=1e-6)   # same distribution
    # mix: double the abundance of every size
    np.savetxt(tmp_path / "MIX_TST.DAT", np.full(24, 2.0))
    name, rho, aa, sfm = dc.parse_grain_line(
        "TST 24 plaw-mix 0.0065 3.3 1.0e-7 5.0e-5 -3.5",
        mix_path=str(tmp_path / "MIX_TST.DAT"))
    np.testing.assert_allclose(sfm, 2.0 * sf0, rtol=1e-6)


def test_polarized_aux_files(dustem_files, tmp_path, monkeypatch):
    grain, lam, qf, gf, cf = dustem_files
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    freq = np.logspace(12, 15, 8)
    monkeypatch.chdir(tmp_path)
    rpol = dc.write_polarized_dust_aux(dust, freq, prefix="pol")
    assert (tmp_path / "pol.size").exists()
    assert (tmp_path / "pol.qabs").exists()
    assert (tmp_path / "pol.rpol").exists()
    body = rpol[1:, 1:]
    # a >= a_min includes everything -> fraction 1; decreasing with a
    np.testing.assert_allclose(body[0], 1.0, rtol=1e-6)
    assert np.all(np.diff(body, axis=0) <= 1e-6)
    assert np.all((body >= 0) & (body <= 1 + 1e-6))


def test_gset_file_roundtrip(dustem_files, tmp_path):
    """write_gset_dust output is read back identically (and is in the
    reference's native-CRT text format)."""
    grain, lam, qf, gf, cf = dustem_files
    from soc_tpu.solve.grain_model import read_gset_dust, write_gset_dust
    dust = dc.compile_dust(grain, lam, qf, gf, cf)
    gset = dc.to_gset(dust)
    write_gset_dust(str(tmp_path / "gs_TST.dust"), gset)
    back = read_gset_dust(str(tmp_path / "gs_TST.dust"))
    np.testing.assert_allclose(back.size_a, gset.size_a, rtol=1e-4)
    np.testing.assert_allclose(back.s_frac, gset.s_frac, rtol=1e-4)
    np.testing.assert_allclose(back.qfreq, gset.qfreq, rtol=1e-4)
    np.testing.assert_allclose(back.qabs, gset.qabs, rtol=1e-4)
    for isz in (0, gset.nsize - 1):
        np.testing.assert_allclose(back.t2e(isz, 50.0),
                                   gset.t2e(isz, 50.0), rtol=1e-3)


def test_compile_dustem_model_and_cli(dustem_files, tmp_path, monkeypatch):
    """GRAIN.DAT whole-model compilation + the `dust` CLI (DE_to_GSET)."""
    grain, lam, qf, gf, cf = dustem_files
    (tmp_path / "GRAIN.DAT").write_text("# DustEM model\n1.0\n" + grain
                                        + "\n")
    dusts = dc.compile_dustem_model(str(tmp_path / "GRAIN.DAT"))
    assert len(dusts) == 1 and dusts[0].name == "TST"
    assert dusts[0].c_cap is not None

    freqs = np.logspace(11.5, 15, 10)
    np.savetxt(tmp_path / "freq.dat", freqs)
    monkeypatch.chdir(tmp_path)
    from soc_tpu.cli import main
    assert main(["dust", "GRAIN.DAT", "freq.dat", "32", "0.01"]) == 0
    for f in ("TST_simple.dust", "TST.dsc", "gs_TST.dust", "gs_TST.opt",
              "gs_TST.ent", "gs_TST.size", "TST.solver", "tmp.dust",
              "tmp.dsc"):
        assert (tmp_path / f).exists(), f
    # single species: the combined simple dust equals the species' own
    from soc_tpu.io.dust import read_simple_dust
    a = read_simple_dust(str(tmp_path / "TST_simple.dust"), 0.01)
    b = read_simple_dust(str(tmp_path / "tmp.dust"), 0.01)
    np.testing.assert_allclose(b.abs_gl, a.abs_gl, rtol=1e-4)
    np.testing.assert_allclose(b.g, a.g, atol=1e-4)
    # the solver file respects the CLI NE argument
    from soc_tpu.solve.solver_file import read_solver
    assert read_solver(str(tmp_path / "TST.solver")).ne == 32


def test_logn_distribution_width():
    """DustEM 'logn': dn/da ~ exp(-0.5 (ln(a/a0)/sigma)^2)/a -- the 0.5 is
    in the DustEM implementation though not its documentation
    (DustLib.py:1108); regression for a sqrt(2)-too-narrow distribution."""
    from soc_tpu.solve.dust_compiler import size_distribution
    a0, sigma = 1e-7, 0.5
    a = np.logspace(-8, -6, 401)
    dnda = size_distribution("logn", 1e-8, 1e-6, [a0, sigma], 401)
    # ln-space second moment of a*dnda (the lognormal in ln a) == sigma^2
    w = dnda * a                                    # density in ln a
    x = np.log(a / a0)
    var = np.sum(w * x * x) / np.sum(w) - (np.sum(w * x) / np.sum(w)) ** 2
    np.testing.assert_allclose(np.sqrt(var), sigma, rtol=0.02)
