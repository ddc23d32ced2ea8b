"""Minimal HEALPix RING-order pixelization (jittable).

Standard HEALPix algebra (same math as the reference's device functions
Angles2PixelRing / Pixel2AnglesRing, kernel_ASOC_aux.c:945-1030, which follow
the original HEALPix paper; no healpy dependency). Used for the all-sky
background source, all-sky map rendering, and ROI photon bookkeeping.

All functions are vectorized jnp implementations; angles follow the
reference's convention theta = colatitude [0, pi], phi = longitude [0, 2 pi).
"""

import numpy as np
import jax.numpy as jnp


def npix(nside):
    return 12 * nside * nside


def ang2pix_ring(nside, theta, phi):
    """(theta, phi) -> RING pixel index. Vectorized."""
    z = jnp.cos(theta)
    za = jnp.abs(z)
    phi = jnp.mod(phi, 2.0 * np.pi)
    tt = phi / (0.5 * np.pi)                    # in [0, 4)
    nl2 = 2 * nside
    nl4 = 4 * nside
    ncap = nl2 * (nside - 1)
    total = npix(nside)

    # equatorial region
    jp_e = jnp.floor(nside * (0.5 + tt - z * 0.75)).astype(jnp.int32)
    jm_e = jnp.floor(nside * (0.5 + tt + z * 0.75)).astype(jnp.int32)
    ir_e = nside + 1 + jp_e - jm_e              # in {1, 2n+1}
    kshift = jnp.where(ir_e % 2 == 0, 1, 0)
    ip_e = (jp_e + jm_e - nside + kshift + 1) // 2 + 1
    ip_e = jnp.where(ip_e > nl4, ip_e - nl4, ip_e)
    pix_e = ncap + nl4 * (ir_e - 1) + ip_e

    # polar caps
    tp = tt - jnp.floor(tt)
    tmp = jnp.sqrt(3.0 * (1.0 - za))
    jp_p = jnp.floor(nside * tp * tmp).astype(jnp.int32)
    jm_p = jnp.floor(nside * (1.0 - tp) * tmp).astype(jnp.int32)
    ir_p = jp_p + jm_p + 1
    ip_p = jnp.floor(tt * ir_p).astype(jnp.int32) + 1
    ip_p = jnp.where(ip_p > 4 * ir_p, ip_p - 4 * ir_p, ip_p)
    pix_n = 2 * ir_p * (ir_p - 1) + ip_p
    pix_s = total - 2 * ir_p * (ir_p + 1) + ip_p
    pix_p = jnp.where(z > 0, pix_n, pix_s)

    pix = jnp.where(za <= 2.0 / 3.0, pix_e, pix_p)
    return (pix - 1).astype(jnp.int32)


def pix2ang_ring(nside, ipix):
    """RING pixel index -> (theta, phi). Vectorized."""
    total = npix(nside)
    nl2 = 2 * nside
    nl4 = 4 * nside
    ncap = nl2 * (nside - 1)
    ip1 = ipix + 1
    fact1 = 1.5 * nside
    fact2 = 3.0 * nside * nside

    # north polar cap
    hip = ip1 / 2.0
    fihip = jnp.floor(hip)
    iring_n = jnp.floor(jnp.sqrt(hip - jnp.sqrt(fihip))).astype(jnp.int32) + 1
    iphi_n = ip1 - 2 * iring_n * (iring_n - 1)
    z_n = 1.0 - (iring_n * iring_n) / fact2
    phi_n = (iphi_n - 0.5) * np.pi / (2.0 * iring_n)

    # equatorial belt
    ipe = ip1 - ncap - 1
    iring_e = (ipe // nl4) + nside
    iphi_e = ipe % nl4 + 1
    fodd = 0.5 * (1 + ((iring_e + nside) % 2))
    z_e = (nl2 - iring_e) / fact1
    phi_e = (iphi_e - fodd) * np.pi / nl2

    # south polar cap
    ip_s = total - ip1 + 1
    hip_s = ip_s / 2.0
    fihip_s = jnp.floor(hip_s)
    iring_s = jnp.floor(jnp.sqrt(hip_s - jnp.sqrt(fihip_s))
                        ).astype(jnp.int32) + 1
    iphi_s = 4 * iring_s + 1 - (ip_s - 2 * iring_s * (iring_s - 1))
    z_s = -1.0 + (iring_s * iring_s) / fact2
    phi_s = (iphi_s - 0.5) * np.pi / (2.0 * iring_s)

    north = ip1 <= ncap
    south = ip1 > (total - ncap)
    z = jnp.where(north, z_n, jnp.where(south, z_s, z_e))
    phi = jnp.where(north, phi_n, jnp.where(south, phi_s, phi_e))
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    return theta, phi
