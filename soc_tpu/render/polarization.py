"""Polarized emission maps: Stokes I, Q, U (+ column density).

Reimplements the reference PolMapping kernel (kernel_ASOC_map.c:974-1160,
Planck XX formalism): per LOS step, from the cell's magnetic field B,

    Psi = pi/2 + atan2(B . (-RA), B . DE)      polarisation angle (IAU)
    cos^2(gamma) = 1 - (B_hat . DIR)^2         inclination to plane of sky
    I += S * (1 - p (cos^2 gamma - 2/3))
    Q += p * S * cos(2 Psi) cos^2 gamma
    U += p * S * sin(2 Psi) cos^2 gamma

with S the usual attenuated emission contribution, p the polarisation
reduction factor (constant p0, or encoded in |B| when polred > 0).

Frequency-fused like render_ortho: the B geometry is computed once per step
and broadcast over the [PIXELS, NFREQ] emission vectors.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import traverse
from .mapping import _front_surface


@partial(jax.jit, static_argnames=("npix", "polred", "rho_weight",
                                   "max_steps", "use_shear"))
def render_pol(grid, emit_map, ext_gl, bfield, p0, odir, ra, de, centre,
               map_dx, npix, polred=False, rho_weight=False,
               max_steps=100000, use_shear=False, y_shear=0.0,
               maxlos=1e10, minlos=-1.0):
    """Stokes maps for one observer direction.

    emit_map : [CELLS, NF] emission pre-scaled by KK*freq
    ext_gl   : [NF] extinction / unit density / GL
    bfield   : [CELLS, 3] magnetic field vectors
    Returns (I, Q, U) each [NF, NY, NX] plus colden [NY, NX] (in GL units).
    """
    nxp, nyp = npix
    nf = emit_map.shape[1]
    i = jnp.arange(nxp, dtype=jnp.float32)
    j = jnp.arange(nyp, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    centre = jnp.asarray(centre, jnp.float32)
    pos = (centre[None, :]
           + ((ii - 0.5 * (nxp - 1)) * map_dx)[:, None] * ra[None, :]
           + ((jj - 0.5 * (nyp - 1)) * map_dx)[:, None] * de[None, :])
    pos = pos + (grid.nx + grid.ny + grid.nz) * odir[None, :]
    pos = _front_surface(pos, odir, grid.nx, grid.ny, grid.nz)
    step_dir = -odir
    step_dir = jnp.where(jnp.abs(step_dir) < 1e-5, 1e-5, step_dir)
    step_dir = jnp.broadcast_to(step_dir, pos.shape)

    pos, level, ind, anc = traverse.index_global_stack(grid, pos)
    npixels = pos.shape[0]
    tau = jnp.zeros((npixels, nf), jnp.float32)
    s_i = jnp.zeros((npixels, nf), jnp.float32)
    s_q = jnp.zeros((npixels, nf), jnp.float32)
    s_u = jnp.zeros((npixels, nf), jnp.float32)
    colden = jnp.zeros(npixels, jnp.float32)
    los = jnp.zeros(npixels, jnp.float32)

    def cond(state):
        it = state[0]
        ind = state[3]
        return (it < max_steps) & jnp.any(ind >= 0)

    def body(state):
        it, pos, level, ind, anc, tau, s_i, s_q, s_u, colden, los = state
        active = ind >= 0
        gidx = jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                        + jnp.maximum(ind, 0), 0, grid.cells - 1)
        dens = grid.dens[gidx]
        b = bfield[gidx]                                # [P, 3]
        ds, npos, nlevel, nind, anc = traverse.get_step_stack(
            grid, pos, step_dir, level, ind, anc, active)
        failed = active & (nlevel == level) & (nind == ind)
        npos = traverse.failed_step_nudge(npos, step_dir, failed)

        # polarisation geometry
        bnorm = jnp.linalg.norm(b, axis=-1)
        if polred:
            p = bnorm
        else:
            p = jnp.full_like(bnorm, p0)
        bn = b / jnp.maximum(bnorm, 1e-30)[:, None]
        psi = (0.5 * np.pi
               + jnp.arctan2(jnp.sum(bn * (-ra)[None, :], axis=-1),
                             jnp.sum(bn * de[None, :], axis=-1)))
        bdotdir = jnp.sum(bn * odir[None, :], axis=-1)
        cc = 0.99999 - 0.99998 * bdotdir * bdotdir     # cos^2(gamma)

        w = jnp.where(active, ds, 0.0)
        # ext_gl [NF] (constant abundances) or [CELLS, NF] (WITH_ABU OPT)
        ext_row = ext_gl[gidx, :] if ext_gl.ndim == 2 else ext_gl[None, :]
        dtau = (w * dens)[:, None] * ext_row
        if rho_weight:
            sz = jnp.broadcast_to((w * dens)[:, None], dtau.shape)
        else:
            emit = emit_map[gidx, :]
            attw = jnp.where(dtau < 1.0e-3, 1.0 - 0.5 * dtau,
                             (1.0 - jnp.exp(-dtau))
                             / jnp.maximum(dtau, 1e-30))
            sz = jnp.exp(-tau) * attw * (w * dens)[:, None] * emit
        # `polmap .. minlos maxlos`: nothing registers before the LOS
        # reaches minlos (kernel_ASOC_map_H.c:776 "do not register yet")
        # or after it passes maxlos (rays terminate below, :743).
        # NOTE the reference's `continue` also skips the TAU accumulation
        # before minlos -- optical depth deliberately counts from minlos,
        # not from the observer (foreground material inside the excluded
        # interval does not extinguish the windowed emission); we
        # reproduce that by gating tau on the same mask.
        reg = ((los >= minlos) & (los < maxlos))[:, None]
        s_i = s_i + jnp.where(
            reg, sz * (1.0 - p[:, None] * (cc - 2.0 / 3.0)[:, None]), 0.0)
        s_q = s_q + jnp.where(
            reg, (p * jnp.cos(2.0 * psi) * cc)[:, None] * sz, 0.0)
        s_u = s_u + jnp.where(
            reg, (p * jnp.sin(2.0 * psi) * cc)[:, None] * sz, 0.0)
        tau = tau + jnp.where(reg, dtau, 0.0)
        colden = colden + jnp.where(los >= minlos, w * dens, 0.0)
        los = los + w
        if use_shear:
            # POLSTAT==2 / shearing-box replication: rays exiting through
            # the X/Y faces wrap periodically (y shifted by -/+ y_shear at
            # the X faces) until los >= maxlos (kernel_ASOC_map_H.c:991+)
            nx_, ny_, nz_ = (jnp.float32(grid.nx), jnp.float32(grid.ny),
                             jnp.float32(grid.nz))
            exited = active & (nind < 0)
            zin = (npos[:, 2] > 0.0) & (npos[:, 2] < nz_)
            contw = exited & zin & (los < maxlos)
            xlo = npos[:, 0] <= 0.0
            xhi = npos[:, 0] >= nx_
            newx = jnp.where(xlo, nx_ - 1e-3,
                             jnp.where(xhi, 1e-3, npos[:, 0]))
            yshift = jnp.where(xlo, -jnp.float32(y_shear),
                               jnp.where(xhi, jnp.float32(y_shear), 0.0))
            newy = jnp.clip(jnp.mod(npos[:, 1] + ny_ + yshift, ny_),
                            1e-3, ny_ - 1e-3)
            wpos = jnp.stack([newx, newy, npos[:, 2]], axis=1)
            wp, wl, wi, wa = traverse.index_global_stack(grid, wpos)
            npos = jnp.where(contw[:, None], wp, npos)
            nlevel = jnp.where(contw, wl, nlevel)
            nind = jnp.where(contw, wi, nind)
            anc = jnp.where(contw[:, None], wa, anc)
        # rays stop once the LOS passes maxlos (kernel_ASOC_map_H.c:743,
        # kernel_ASOC_map.c:1517)
        nind = jnp.where(los >= maxlos, jnp.int32(-1), nind)
        return (it + 1, npos, nlevel, nind, anc, tau, s_i, s_q, s_u,
                colden, los)

    state = (jnp.int32(0), pos, level, ind, anc, tau, s_i, s_q, s_u,
             colden, los)
    _, _, _, _, _, tau, s_i, s_q, s_u, colden, _ = lax.while_loop(
        cond, body, state)
    shape = (nf, nyp, nxp)
    return (s_i.T.reshape(shape), s_q.T.reshape(shape),
            s_u.T.reshape(shape), colden.reshape(nyp, nxp))


@partial(jax.jit, static_argnames=("nside", "max_steps",
                                   "interpolate", "polred"))
def render_pol_healpix(grid, emit_map, ext_gl, bfield, p0, intobs, nside,
                       polred=False, max_steps=100000,
                       maxlos=1e10, minlos=-1.0, interpolate=0):
    """All-sky Stokes I/Q/U(,N) maps around an internal observer
    (PolHealpixMapping, kernel_ASOC_map_H.c:576-867): one ray per RING
    pixel stepping away from INTOBS; per-step polarization geometry as in
    render_pol with (RA, DE) the local tangent basis of each pixel.
    `interpolate` applies the `interpolation` keyword's LOS density
    smoothing (kernel_ASOC_map_H.c:654-733).

    Returns (I, Q, U) each [NF, NPIX] + colden [NPIX] (GL units).
    """
    from . import healpix as hp
    npix = 12 * nside * nside
    nf = emit_map.shape[1]
    theta, phi = hp.pix2ang_ring(nside, jnp.arange(npix))
    # LOS away from the observer; (lon, lat) = (0, 0) looks along -X
    step_dir = jnp.stack([-jnp.sin(theta) * jnp.cos(phi),
                          -jnp.sin(theta) * jnp.sin(phi),
                          jnp.cos(theta)], -1)
    step_dir = jnp.where(jnp.abs(step_dir) < 1e-5, 1e-5, step_dir)
    # per-pixel ORTHONORMAL tangent basis for THIS line of sight:
    # DE = north, RA = east of the (x,y-negated) step_dir above, so
    # DE.step_dir = RA.step_dir = 0 and the position angle psi lives in
    # the plane of the sky. Deviation from the reference documented:
    # kernel_ASOC_map_H.c:53-59 takes HRA/HDE from the un-negated
    # spherical direction while marching along a z-negated one, leaving
    # HDE.HDIR = -sin(2 theta) -- its mid-latitude psi mixes in the
    # line-of-sight B component (equator/poles agree in both codes).
    ra = jnp.stack([jnp.sin(phi), -jnp.cos(phi),
                    jnp.zeros_like(phi)], -1)
    de = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                    jnp.cos(theta) * jnp.sin(phi),
                    jnp.sin(theta)], -1)
    odir = -step_dir
    pos = jnp.broadcast_to(jnp.asarray(intobs, jnp.float32),
                           (npix, 3)) + 2.0e-5
    pos, level, ind, anc = traverse.index_global_stack(grid, pos)
    tau = jnp.zeros((npix, nf), jnp.float32)
    s_i = jnp.zeros((npix, nf), jnp.float32)
    s_q = jnp.zeros((npix, nf), jnp.float32)
    s_u = jnp.zeros((npix, nf), jnp.float32)
    colden = jnp.zeros(npix, jnp.float32)
    los = jnp.zeros(npix, jnp.float32)

    def cond(state):
        it = state[0]
        return (it < max_steps) & jnp.any(state[3] >= 0)

    def body(state):
        it, pos, level, ind, anc, tau, s_i, s_q, s_u, colden, los = state
        active = ind >= 0
        gidx = jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                        + jnp.maximum(ind, 0), 0, grid.cells - 1)
        dens = grid.dens[gidx]
        b = bfield[gidx]
        if interpolate:
            gpos = traverse.root_pos(grid, pos, level, ind)
        ds, npos, nlevel, nind, anc = traverse.get_step_stack(
            grid, pos, step_dir, level, ind, anc, active)
        failed = active & (nlevel == level) & (nind == ind)
        npos = traverse.failed_step_nudge(npos, step_dir, failed)
        if interpolate:
            from .mapping import _interp_density
            dens = _interp_density(grid, gpos + (0.5 * ds)[:, None]
                                   * step_dir, dens, level, interpolate)
        bnorm = jnp.linalg.norm(b, axis=-1)
        p = bnorm if polred else jnp.full_like(bnorm, p0)
        bn = b / jnp.maximum(bnorm, 1e-30)[:, None]
        psi = (0.5 * np.pi
               + jnp.arctan2(jnp.sum(bn * (-ra), axis=-1),
                             jnp.sum(bn * de, axis=-1)))
        bdotdir = jnp.sum(bn * odir, axis=-1)
        cc = 0.99999 - 0.99998 * bdotdir * bdotdir
        w = jnp.where(active, ds, 0.0)
        ext_row = ext_gl[gidx, :] if ext_gl.ndim == 2 else ext_gl[None, :]
        dtau = (w * dens)[:, None] * ext_row
        emit = emit_map[gidx, :]
        attw = jnp.where(dtau < 1.0e-3, 1.0 - 0.5 * dtau,
                         (1.0 - jnp.exp(-dtau)) / jnp.maximum(dtau, 1e-30))
        sz = jnp.exp(-tau) * attw * (w * dens)[:, None] * emit
        # `polmap .. minlos maxlos` distance window from the observer
        # (kernel_ASOC_map_H.c:776,743 in PolHealpixMapping)
        reg = ((los >= minlos) & (los < maxlos))[:, None]
        s_i = s_i + jnp.where(
            reg, sz * (1.0 - p[:, None] * (cc - 2.0 / 3.0)[:, None]), 0.0)
        s_q = s_q + jnp.where(
            reg, (p * jnp.cos(2.0 * psi) * cc)[:, None] * sz, 0.0)
        s_u = s_u + jnp.where(
            reg, (p * jnp.sin(2.0 * psi) * cc)[:, None] * sz, 0.0)
        tau = tau + jnp.where(reg, dtau, 0.0)
        colden = colden + jnp.where(los >= minlos, w * dens, 0.0)
        los = los + w
        nind = jnp.where(los >= maxlos, jnp.int32(-1), nind)
        return (it + 1, npos, nlevel, nind, anc, tau, s_i, s_q, s_u,
                colden, los)

    state = (jnp.int32(0), pos, level, ind, anc, tau, s_i, s_q, s_u,
             colden, los)
    _, _, _, _, _, tau, s_i, s_q, s_u, colden, _ = lax.while_loop(
        cond, body, state)
    return s_i.T, s_q.T, s_u.T, colden


def _polstat_acc1(acc, pr, psi, cc, wrho, sz):
    """Pass-1 POLSTAT accumulator update shared by the orthographic and
    healpix variants: density- (sR*) and emission-weighted (sJ*) sums of
    cos^2 gamma and the Q/U components that define <Psi>
    (kernel_ASOC_map.c:1164-1384 / kernel_ASOC_map_H.c:867-1143)."""
    wr = wrho * pr
    wj = sz * pr[:, None]
    acc = dict(acc)
    acc["sR"] = acc["sR"] + wr
    acc["sRG"] = acc["sRG"] + wr * cc
    acc["RQ"] = acc["RQ"] + wr * jnp.cos(2.0 * psi) * cc
    acc["RU"] = acc["RU"] + wr * jnp.sin(2.0 * psi) * cc
    acc["sJ"] = acc["sJ"] + wj
    acc["sJG"] = acc["sJG"] + wj * cc[:, None]
    acc["JQ"] = acc["JQ"] + wj * (jnp.cos(2.0 * psi) * cc)[:, None]
    acc["JU"] = acc["JU"] + wj * (jnp.sin(2.0 * psi) * cc)[:, None]
    return acc


def _polstat_acc2(acc, pr, psi, rpsi, jpsi, wrho, sz):
    """Pass-2 POLSTAT accumulator update (shared): folded (Psi - <Psi>)^2
    sums for the rT/jT dispersion planes."""
    d = _wrap_psi_dev(rpsi, psi)
    dj = _wrap_psi_dev(jpsi, psi[:, None])
    acc = dict(acc)
    acc["sRP"] = acc["sRP"] + wrho * pr * d * d
    acc["sJP"] = acc["sJP"] + sz * pr[:, None] * dj * dj
    return acc


def _wrap_psi_dev(mean_psi, psi):
    """Angle difference folded to [0, pi/2] as the reference does
    (kernel_ASOC_map.c:1330-1340): d = fmod(|2 pi + <Psi> - Psi|, pi),
    then d -> pi - d when d > pi/2 (Psi is a 2 pi angle but the
    polarisation pseudo-vector has period pi)."""
    d = jnp.mod(jnp.abs(2.0 * np.pi + mean_psi - psi), np.pi)
    return jnp.where(d > 0.5 * np.pi, np.pi - d, d)


@partial(jax.jit, static_argnames=("npix", "polred", "max_steps"))
def render_polstat(grid, emit_map, ext_gl, bfield, odir, ra, de, centre,
                   map_dx, npix, polred=False, max_steps=100000,
                   cell_w=None):
    """Polarization-statistics maps (POLSTAT modes 1 & 3): the reference's
    two-pass PolMapping (kernel_ASOC_map.c:1164-1384) writing all four
    planes of one run -- BOTH weighting families together
    (ASOC.py:3659-3661):

      rT = sqrt(sum(w (Psi-<Psi>)^2) / sum(w))   angle dispersion
      rI = arccos(sqrt(sum(w cos^2 gamma)/sum(w)))  mean inclination
           with w = rho ds (density weighting), and jT/jI the same with
           w = the attenuated emission contribution (per frequency).
      <Psi> comes from the Q/U sums (0.5 atan2(sum w sin 2Psi cc,
      sum w cos 2Psi cc)), evaluated in a first pass; the second pass
      accumulates the folded (Psi - <Psi>)^2 sums (Chen et al. 2016
      Eqs. 11-14). polred encodes the polarisation-reduction factor in
      |B| exactly like render_pol.

    Also returns the density-weighted field statistics <|B|>, <|B_LOS|>,
    <|B_POS|> (POLSTAT 3, kernel_ASOC_map.c:1594-1693) plus the
    first-frequency tau and colden from the same march.

    Returns dict: rT, rI, B, B_LOS, B_POS, tau, colden [NY, NX];
    jT, jI [NF, NY, NX].
    """
    nxp, nyp = npix
    nf = emit_map.shape[1]
    i = jnp.arange(nxp, dtype=jnp.float32)
    j = jnp.arange(nyp, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    centre = jnp.asarray(centre, jnp.float32)
    pos = (centre[None, :]
           + ((ii - 0.5 * (nxp - 1)) * map_dx)[:, None] * ra[None, :]
           + ((jj - 0.5 * (nyp - 1)) * map_dx)[:, None] * de[None, :])
    pos = pos + (grid.nx + grid.ny + grid.nz) * odir[None, :]
    pos = _front_surface(pos, odir, grid.nx, grid.ny, grid.nz)
    step_dir = -odir
    step_dir = jnp.where(jnp.abs(step_dir) < 1e-5, 1e-5, step_dir)
    step_dir = jnp.broadcast_to(step_dir, pos.shape)
    pos0, level0, ind0, anc0 = traverse.index_global_stack(grid, pos)
    npixels = pos0.shape[0]

    def geom(gidx):
        """Per-cell polarisation geometry shared by both passes."""
        b = bfield[gidx]
        bnorm = jnp.linalg.norm(b, axis=-1)
        pr = bnorm if polred else jnp.ones_like(bnorm)
        bn = b / jnp.maximum(bnorm, 1e-30)[:, None]
        psi = (0.5 * np.pi
               + jnp.arctan2(jnp.sum(bn * (-ra)[None, :], axis=-1),
                             jnp.sum(bn * de[None, :], axis=-1)))
        cc = (0.99999
              - 0.99998 * (jnp.sum(bn * odir[None, :], axis=-1)) ** 2)
        return b, bnorm, pr, psi, cc

    def march(body_extra, acc):
        """while_loop skeleton: step rays, hand (cell, weights) to
        body_extra which updates the accumulator dict."""
        def cond(state):
            it = state[0]
            return (it < max_steps) & jnp.any(state[3] >= 0)

        def body(state):
            it, pos, level, ind, anc, acc = state
            active = ind >= 0
            gidx = jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                            + jnp.maximum(ind, 0), 0, grid.cells - 1)
            dens = grid.dens[gidx]
            ds, npos, nlevel, nind, anc = traverse.get_step_stack(
                grid, pos, step_dir, level, ind, anc, active)
            failed = active & (nlevel == level) & (nind == ind)
            npos = traverse.failed_step_nudge(npos, step_dir, failed)
            sx = jnp.where(active, ds, 0.0)
            ext_row = (ext_gl[gidx, :] if ext_gl.ndim == 2
                       else ext_gl[None, :])
            dtau = (sx * dens)[:, None] * ext_row           # [P, NF]
            emit = emit_map[gidx, :]
            attw = jnp.where(dtau < 1.0e-3, 1.0 - 0.5 * dtau,
                             (1.0 - jnp.exp(-dtau))
                             / jnp.maximum(dtau, 1e-30))
            sz = (jnp.exp(-acc["tau"]) * attw
                  * (sx * dens)[:, None] * emit)            # [P, NF]
            acc = body_extra(acc, gidx, sx * dens, sz)
            acc = dict(acc)
            acc["tau"] = acc["tau"] + dtau
            return it + 1, npos, nlevel, nind, anc, acc

        acc = dict(acc)
        acc["tau"] = jnp.zeros((npixels, nf), jnp.float32)
        state = (jnp.int32(0), pos0, level0, ind0, anc0, acc)
        return lax.while_loop(cond, body, state)[5]

    def rho_w(gidx, wrho):
        # LEVEL_THRESHOLD zeroes the density weight too, not only the
        # emission (kernel_ASOC_map.c:1262-1266) -- cell_w carries the
        # per-cell 0/1 mask when `threshold` is set
        return wrho if cell_w is None else wrho * cell_w[gidx]

    # ---- pass 1: weighted cos^2 gamma and Q/U sums -> <Psi>, *I planes
    def pass1(acc, gidx, wrho, sz):
        raw_w = wrho                       # colden stays unmasked
        wrho = rho_w(gidx, wrho)
        b, bnorm, pr, psi, cc = geom(gidx)
        acc = _polstat_acc1(acc, pr, psi, cc, wrho, sz)
        # density-weighted field statistics (POLSTAT 3 -- no polred there)
        acc["b"] = acc["b"] + wrho * bnorm
        blos = jnp.abs(jnp.sum(b * odir[None, :], axis=-1))
        acc["blos"] = acc["blos"] + wrho * blos
        acc["bpos"] = acc["bpos"] + wrho * jnp.sqrt(
            jnp.maximum(bnorm**2 - blos**2, 0.0))
        acc["wB"] = acc["wB"] + wrho
        acc["colden"] = acc["colden"] + raw_w
        return acc

    zp = jnp.zeros(npixels, jnp.float32)
    zf = jnp.zeros((npixels, nf), jnp.float32)
    a1 = march(pass1, dict(sR=zp, sRG=zp, RQ=zp, RU=zp, b=zp, blos=zp,
                           bpos=zp, wB=zp, colden=zp, sJ=zf, sJG=zf,
                           JQ=zf, JU=zf))
    s_r = jnp.maximum(a1["sR"], 1e-30)
    s_j = jnp.maximum(a1["sJ"], 1e-30)
    rpsi = 0.5 * jnp.arctan2(a1["RU"], a1["RQ"])
    jpsi = 0.5 * jnp.arctan2(a1["JU"], a1["JQ"])

    # ---- pass 2: folded (Psi - <Psi>)^2 sums -> *T planes
    def pass2(acc, gidx, wrho, sz):
        wrho = rho_w(gidx, wrho)
        _, _, pr, psi, _ = geom(gidx)
        return _polstat_acc2(acc, pr, psi, rpsi, jpsi, wrho, sz)

    a2 = march(pass2, dict(sRP=zp, sJP=zf))

    def shp(v):
        return (v.T.reshape(nf, nyp, nxp) if v.ndim == 2
                else v.reshape(nyp, nxp))

    return {
        "rT": shp(jnp.sqrt(a2["sRP"] / s_r)),
        "rI": shp(jnp.arccos(jnp.sqrt(jnp.clip(a1["sRG"] / s_r,
                                               0.0, 1.0)))),
        "jT": shp(jnp.sqrt(a2["sJP"] / s_j)),
        "jI": shp(jnp.arccos(jnp.sqrt(jnp.clip(a1["sJG"] / s_j,
                                               0.0, 1.0)))),
        "B": shp(a1["b"] / jnp.maximum(a1["wB"], 1e-30)),
        "B_LOS": shp(a1["blos"] / jnp.maximum(a1["wB"], 1e-30)),
        "B_POS": shp(a1["bpos"] / jnp.maximum(a1["wB"], 1e-30)),
        "tau": shp(a1["tau"][:, 0]),
        "colden": shp(a1["colden"]),
    }


@partial(jax.jit, static_argnames=("nside", "polred", "max_steps",
                                   "use_shear"))
def render_polstat_healpix(grid, emit_map, ext_gl, bfield, intobs, nside,
                           polred=False, max_steps=100000, maxlos=1e10,
                           use_shear=False, y_shear=0.0):
    """All-sky polarization-statistics maps around an internal observer:
    the reference's healpix POLSTAT PolHealpixMapping
    (kernel_ASOC_map_H.c:867-1143, reached via polmap + polstat>0 +
    NPIX.y<0, ASOC.py:3807-3894). Same two-pass rT/rI/jT/jI algorithm as
    render_polstat but along one ray per RING pixel from INTOBS, with the
    per-pixel tangent basis and Psi = atan2(B.RA, B.DE) (the healpix
    kernel's convention, :949 -- the constant offset vs the ortho variant
    cancels in the dispersion). Rays stop at maxlos; use_shear wraps
    X/Y-face exits with the shearing-box shift like render_pol.

    Returns dict: rT, rI [NPIX]; jT, jI [NF, NPIX] (reference plane
    order rhoTheta, rhoGamma, jTheta, jGamma).
    """
    from . import healpix as hp
    npix = 12 * nside * nside
    nf = emit_map.shape[1]
    theta, phi = hp.pix2ang_ring(nside, jnp.arange(npix))
    step_dir = jnp.stack([-jnp.sin(theta) * jnp.cos(phi),
                          -jnp.sin(theta) * jnp.sin(phi),
                          jnp.cos(theta)], -1)
    step_dir = jnp.where(jnp.abs(step_dir) < 1e-5, 1e-5, step_dir)
    # orthonormal tangent basis of each LOS (render_pol_healpix docstring
    # records the deviation from the reference's non-orthogonal HRA/HDE)
    ra = jnp.stack([jnp.sin(phi), -jnp.cos(phi),
                    jnp.zeros_like(phi)], -1)
    de = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                    jnp.cos(theta) * jnp.sin(phi),
                    jnp.sin(theta)], -1)
    odir = -step_dir
    pos = jnp.broadcast_to(jnp.asarray(intobs, jnp.float32),
                           (npix, 3)) + 2.0e-5
    pos0, level0, ind0, anc0 = traverse.index_global_stack(grid, pos)

    def geom(gidx):
        b = bfield[gidx]
        bnorm = jnp.linalg.norm(b, axis=-1)
        pr = bnorm if polred else jnp.ones_like(bnorm)
        bn = b / jnp.maximum(bnorm, 1e-30)[:, None]
        psi = jnp.arctan2(jnp.sum(bn * ra, axis=-1),
                          jnp.sum(bn * de, axis=-1))
        cc = 0.99999 - 0.99998 * jnp.sum(bn * odir, axis=-1) ** 2
        return pr, psi, cc

    def march(body_extra, acc):
        def cond(state):
            it = state[0]
            return (it < max_steps) & jnp.any(state[3] >= 0)

        def body(state):
            it, pos, level, ind, anc, los, acc = state
            active = ind >= 0
            gidx = jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                            + jnp.maximum(ind, 0), 0, grid.cells - 1)
            dens = grid.dens[gidx]
            ds, npos, nlevel, nind, anc = traverse.get_step_stack(
                grid, pos, step_dir, level, ind, anc, active)
            failed = active & (nlevel == level) & (nind == ind)
            npos = traverse.failed_step_nudge(npos, step_dir, failed)
            # truncate the final step at maxlos (kernel_ASOC_map_H.c:925)
            sx = jnp.where(active, ds, 0.0)
            sx = jnp.minimum(sx, jnp.maximum(maxlos - los, 0.0))
            ext_row = (ext_gl[gidx, :] if ext_gl.ndim == 2
                       else ext_gl[None, :])
            dtau = (sx * dens)[:, None] * ext_row
            emit = emit_map[gidx, :]
            attw = jnp.where(dtau < 1.0e-3, 1.0 - 0.5 * dtau,
                             (1.0 - jnp.exp(-dtau))
                             / jnp.maximum(dtau, 1e-30))
            sz = (jnp.exp(-acc["tau"]) * attw
                  * (sx * dens)[:, None] * emit)
            acc = body_extra(acc, gidx, sx * dens, sz)
            acc = dict(acc)
            acc["tau"] = acc["tau"] + dtau
            los = los + jnp.where(active, ds, 0.0)
            if use_shear:
                nx_, ny_, nz_ = (jnp.float32(grid.nx),
                                 jnp.float32(grid.ny),
                                 jnp.float32(grid.nz))
                exited = active & (nind < 0)
                zin = (npos[:, 2] > 0.0) & (npos[:, 2] < nz_)
                cont = exited & zin & (los < maxlos)
                xlo = npos[:, 0] <= 0.0
                xhi = npos[:, 0] >= nx_
                newx = jnp.where(xlo, nx_ - 1e-3,
                                 jnp.where(xhi, 1e-3, npos[:, 0]))
                yshift = jnp.where(
                    xlo, -jnp.float32(y_shear),
                    jnp.where(xhi, jnp.float32(y_shear), 0.0))
                newy = jnp.clip(jnp.mod(npos[:, 1] + ny_ + yshift, ny_),
                                1e-3, ny_ - 1e-3)
                wpos = jnp.stack([newx, newy, npos[:, 2]], axis=1)
                wp, wl, wi, wa = traverse.index_global_stack(grid, wpos)
                npos = jnp.where(cont[:, None], wp, npos)
                nlevel = jnp.where(cont, wl, nlevel)
                nind = jnp.where(cont, wi, nind)
                anc = jnp.where(cont[:, None], wa, anc)
            nind = jnp.where(los >= maxlos, jnp.int32(-1), nind)
            return it + 1, npos, nlevel, nind, anc, los, acc

        acc = dict(acc)
        acc["tau"] = jnp.zeros((npix, nf), jnp.float32)
        los = jnp.zeros(npix, jnp.float32)
        state = (jnp.int32(0), pos0, level0, ind0, anc0, los, acc)
        return lax.while_loop(cond, body, state)[6]

    def pass1(acc, gidx, wrho, sz):
        pr, psi, cc = geom(gidx)
        return _polstat_acc1(acc, pr, psi, cc, wrho, sz)

    zp = jnp.zeros(npix, jnp.float32)
    zf = jnp.zeros((npix, nf), jnp.float32)
    a1 = march(pass1, dict(sR=zp, sRG=zp, RQ=zp, RU=zp,
                           sJ=zf, sJG=zf, JQ=zf, JU=zf))
    s_r = jnp.maximum(a1["sR"], 1e-30)
    s_j = jnp.maximum(a1["sJ"], 1e-30)
    rpsi = 0.5 * jnp.arctan2(a1["RU"], a1["RQ"])
    jpsi = 0.5 * jnp.arctan2(a1["JU"], a1["JQ"])

    def pass2(acc, gidx, wrho, sz):
        pr, psi, _ = geom(gidx)
        return _polstat_acc2(acc, pr, psi, rpsi, jpsi, wrho, sz)

    a2 = march(pass2, dict(sRP=zp, sJP=zf))
    return {
        "rT": jnp.sqrt(a2["sRP"] / s_r),
        "rI": jnp.arccos(jnp.sqrt(jnp.clip(a1["sRG"] / s_r, 0.0, 1.0))),
        "jT": jnp.sqrt(a2["sJP"] / s_j).T,
        "jI": jnp.arccos(jnp.sqrt(jnp.clip(a1["sJG"] / s_j,
                                           0.0, 1.0))).T,
    }
