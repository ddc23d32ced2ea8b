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
        npos = jnp.where(failed[:, None], npos + 1e-4 * step_dir, npos)

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
        npos = jnp.where(failed[:, None], npos + 1e-4 * step_dir, npos)
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


@partial(jax.jit, static_argnames=("npix", "rho_weight", "max_steps"))
def render_polstat(grid, emit_map, ext_gl, bfield, odir, ra, de, centre,
                   map_dx, npix, rho_weight=True, max_steps=100000):
    """Polarization-statistics maps (POLSTAT modes 1 & 3,
    kernel_ASOC_map.c:1164+): along each LOS, weighted by density (or by
    attenuated emission at the first frequency when rho_weight=False),
    accumulate

      rT = sqrt(<(Psi - <Psi>)^2>)   dispersion of the polarisation angle
      rI = arccos(sqrt(<cos^2 gamma>))  mean inclination (Chen+ 2016)
      <|B|>, <|B_LOS|>, <|B_POS|>    field-strength statistics (POLSTAT 3)

    Returns dict of [NY, NX] maps + colden.
    """
    nxp, nyp = npix
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

    acc = {k: jnp.zeros(npixels, jnp.float32)
           for k in ("w", "psi", "psi2", "cc", "b", "blos", "bpos", "tau",
                     "colden")}

    def cond(state):
        it = state[0]
        ind = state[3]
        return (it < max_steps) & jnp.any(ind >= 0)

    def body(state):
        it, pos, level, ind, anc, acc = state
        active = ind >= 0
        gidx = jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                        + jnp.maximum(ind, 0), 0, grid.cells - 1)
        dens = grid.dens[gidx]
        b = bfield[gidx]
        ds, npos, nlevel, nind, anc = traverse.get_step_stack(
            grid, pos, step_dir, level, ind, anc, active)
        failed = active & (nlevel == level) & (nind == ind)
        npos = jnp.where(failed[:, None], npos + 1e-4 * step_dir, npos)
        sx = jnp.where(active, ds, 0.0)
        dtau = sx * dens * ext_gl[0]
        bnorm = jnp.linalg.norm(b, axis=-1)
        bn = b / jnp.maximum(bnorm, 1e-30)[:, None]
        psi = (0.5 * np.pi
               + jnp.arctan2(jnp.sum(bn * (-ra)[None, :], axis=-1),
                             jnp.sum(bn * de[None, :], axis=-1)))
        blos = jnp.abs(jnp.sum(b * odir[None, :], axis=-1))
        bpos = jnp.sqrt(jnp.maximum(bnorm**2 - blos**2, 0.0))
        cc = 0.99999 - 0.99998 * (jnp.sum(bn * odir[None, :], axis=-1)) ** 2
        if rho_weight:
            w = sx * dens
        else:
            emit = emit_map[gidx, 0]
            w = jnp.exp(-acc["tau"]) * sx * emit * dens
        acc2 = dict(acc)
        acc2["w"] = acc["w"] + w
        acc2["psi"] = acc["psi"] + w * psi
        acc2["psi2"] = acc["psi2"] + w * psi * psi
        acc2["cc"] = acc["cc"] + w * cc
        acc2["b"] = acc["b"] + w * bnorm
        acc2["blos"] = acc["blos"] + w * blos
        acc2["bpos"] = acc["bpos"] + w * bpos
        acc2["tau"] = acc["tau"] + dtau
        acc2["colden"] = acc["colden"] + sx * dens
        return it + 1, npos, nlevel, nind, anc, acc2

    state = (jnp.int32(0), pos, level, ind, anc, acc)
    _, _, _, _, _, acc = lax.while_loop(cond, body, state)
    w = jnp.maximum(acc["w"], 1e-30)
    mean_psi = acc["psi"] / w
    var_psi = jnp.maximum(acc["psi2"] / w - mean_psi**2, 0.0)
    out = {
        "rT": jnp.sqrt(var_psi),
        "rI": jnp.arccos(jnp.sqrt(jnp.clip(acc["cc"] / w, 0.0, 1.0))),
        "B": acc["b"] / w,
        "B_LOS": acc["blos"] / w,
        "B_POS": acc["bpos"] / w,
        "tau": acc["tau"],
        "colden": acc["colden"],
    }
    return {k: v.reshape(nyp, nxp) for k, v in out.items()}
