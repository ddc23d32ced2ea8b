"""Dependency-free FITS writer round-trip."""

import numpy as np

from soc_tpu.io.fits import write_fits_image, read_fits_image


def test_fits_roundtrip_2d(tmp_path):
    img = np.random.default_rng(0).random((16, 24)).astype(np.float32)
    path = tmp_path / "m.fits"
    write_fits_image(path, img, ra_deg=83.5, de_deg=-5.2, pix_deg=1e-3)
    data, hdr = read_fits_image(path)
    np.testing.assert_array_equal(data, img)
    assert hdr["CTYPE1"] == "RA---TAN"
    assert abs(float(hdr["CRVAL1"]) - 83.5) < 1e-9
    # standard block sizing
    assert (path.stat().st_size % 2880) == 0


def test_fits_roundtrip_cube(tmp_path):
    cube = np.random.default_rng(1).random((5, 8, 12)).astype(np.float32)
    path = tmp_path / "c.fits"
    write_fits_image(path, cube)
    data, hdr = read_fits_image(path)
    np.testing.assert_array_equal(data, cube)
    assert int(hdr["NAXIS3"]) == 5
