"""HEALPix RING pixelization: round-trip + area uniformity."""

import numpy as np
import jax.numpy as jnp

from soc_tpu.render import healpix


def test_roundtrip_all_pixels():
    for nside in (1, 2, 4, 16, 64):
        n = healpix.npix(nside)
        ipix = jnp.arange(n)
        theta, phi = healpix.pix2ang_ring(nside, ipix)
        back = healpix.ang2pix_ring(nside, theta, phi)
        np.testing.assert_array_equal(np.asarray(back), np.arange(n))


def test_uniform_coverage():
    """Random directions distribute uniformly over pixels (equal areas)."""
    rng = np.random.default_rng(0)
    nside = 8
    n = 200000
    z = rng.uniform(-1, 1, n)
    theta = np.arccos(z)
    phi = rng.uniform(0, 2 * np.pi, n)
    pix = np.asarray(healpix.ang2pix_ring(nside, jnp.asarray(theta),
                                          jnp.asarray(phi)))
    counts = np.bincount(pix, minlength=healpix.npix(nside))
    expect = n / healpix.npix(nside)
    assert counts.min() > 0
    # 5 sigma Poisson bounds
    assert np.all(np.abs(counts - expect) < 5 * np.sqrt(expect))


def test_pixel_centres_in_range():
    nside = 4
    theta, phi = healpix.pix2ang_ring(nside, jnp.arange(healpix.npix(nside)))
    th = np.asarray(theta)
    ph = np.asarray(phi)
    assert th.min() > 0 and th.max() < np.pi
    assert ph.min() >= 0 and ph.max() < 2 * np.pi
