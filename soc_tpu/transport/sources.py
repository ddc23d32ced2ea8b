"""Packet source generation.

Generators are pure functions ``gen(grid, ids_local, seed, params) ->
PacketBatch`` mapping *local* packet ids (0..total-1 within the current
transport run) to initial packet states. Every packet owns the 64-bit RNG
stream identity ``(hi, k)`` where ``k`` is the packet's index *within its
frequency channel* (uint32) and ``hi = hi_base + ifreq`` encodes
(phase, iteration, frequency) -- see :func:`packet_identity`. Streams are
therefore globally unique across phases/frequencies/iterations, support
>2^31 total packets, and are identical regardless of lane chunking or
device sharding.

Source weights follow the reference normalizations:
  * isotropic background (SimRAM_PB SOURCE==1, kernel_ASOC.c:109-130,440-466):
    packets are stratified over the 2(NX NY + NX NZ + NY NZ) boundary
    elements (element = id % AREA), enter with cosine-law directions, and
    carry photons = I_bg(f) * pi / (PLANCK * f * packets_per_element)
    (ASOC.py:1060-1063 WBG).
  * point source (SOURCE==0): isotropic from PSPOS, photons =
    L(f) / (PLANCK * f * PSPAC * (GL*PARSEC)^2) (ASOC.py:1041 WPS).
  * cell emission (SimRAM_CL, kernel_ASOC.c:1363-1390): uniform position
    inside each emitting cell, isotropic direction, photons =
    EMIT[cell] / packets_per_cell.

RNG counter layout per packet: threefry counter 0 (words 0,1) and counter 1
(words 0,1) are burned by source generation; counter 2 word 0 is the birth
free path (drawn in transport_run); propagation consumes counters 3,4,...
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import DEPS, PEPS
from ..ops import traverse
from .propagate import PacketBatch
from .. import rng as socrng

BIRTH_COUNTER = 3   # first counter slot used by the propagation loop

# stream-id high-word phase tags: hi = (phase << 24) | (iteration << 16)
# + ifreq.  Supports 256 phases, 256 iterations, 65536 frequencies.
PHASES = {"bg": 1, "hpbg": 2, "ps": 3, "cell": 4, "roi": 5, "diffuse": 6,
          "split": 7, "sca_bg": 9, "sca_ps": 10, "sca_cell": 11,
          "sca_hpbg": 12}


def stream_hi_base(phase, iteration=0):
    """Host-side hi_base for a simulation phase (np.uint32)."""
    return np.uint32((PHASES[phase] << 24) | ((iteration & 0xFF) << 16))


def packet_identity(ids_local, params):
    """Map local packet ids to (k, ifreq, hi).

    params:
      'ifreq'    : int32 scalar -> uniform-frequency mode; else None
      'per_freq' : int32 packets per frequency (mixed-mode k/ifreq split)
      'ifreq0'   : int32 frequency of local id 0 (mixed mode; default 0)
      'k0'       : uint32 within-frequency index of local id 0 (default 0)
      'hi_base'  : uint32 phase/iteration tag (default 0); hi = hi_base+ifreq

    All arithmetic is 32-bit: the host splits arbitrarily large flat packet
    budgets into (ifreq0, k0) chunk origins with Python integers, so no
    64-bit device math is ever needed.
    """
    k0 = jnp.asarray(params.get("k0", 0), jnp.uint32)
    if params.get("ifreq", None) is not None:
        k = k0 + ids_local.astype(jnp.uint32)
        ifreq = jnp.full(ids_local.shape, params["ifreq"], jnp.int32)
    else:
        pf = jnp.asarray(params["per_freq"], jnp.uint32)
        t = k0 + ids_local.astype(jnp.uint32)
        d = t // pf
        k = t - d * pf
        ifreq = (jnp.asarray(params.get("ifreq0", 0), jnp.int32)
                 + d.astype(jnp.int32))
    hi = jnp.asarray(params.get("hi_base", 0), jnp.uint32) \
        + ifreq.astype(jnp.uint32)
    return k, ifreq, hi


def _uniforms(seed, stream, hi):
    u1, u2, u3, u4 = socrng.uniform4(seed, stream, jnp.zeros_like(stream),
                                     hi)
    u5, u6 = socrng.uniform2(seed, stream, jnp.ones_like(stream), hi)
    return u1, u2, u3, u4, u5, u6


def _isotropic_dir(u1, u2):
    cos_theta = 2.0 * u1 - 1.0
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    phi = 2.0 * jnp.pi * u2
    d = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                   cos_theta], -1)
    # the reference's DEPS clamp (kernel_ASOC.c): u = 0.5 or u -> 1 are
    # exactly representable, and an exact-zero component divides to
    # ds = -inf in boundary_step, scatter-adding -inf into the tallies
    d = jnp.where(jnp.abs(d) < DEPS, DEPS, d)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _photons_of(ifreq, params):
    ph = params["photons"]
    if jnp.ndim(ph) == 0:
        return jnp.full(ifreq.shape, ph, jnp.float32)
    return ph[ifreq]


def _finish(grid, pos_global, dir, photons, ifreq, stream, hi):
    # the leaf walk records the ancestor stack as it descends -- handing
    # it to the refill step removes the per-refill stack_from_par PAR
    # gathers from transport_run's hot loop
    pos, level, ind, anc = traverse.index_global_stack(grid, pos_global)
    return PacketBatch(
        pos=pos, dir=dir.astype(jnp.float32), level=level, ind=ind,
        photons=photons.astype(jnp.float32), ifreq=ifreq.astype(jnp.int32),
        stream=stream, hi=hi.astype(jnp.uint32),
        counter=jnp.full_like(stream, BIRTH_COUNTER),
        scatterings=jnp.zeros_like(ind),
        e_cell=jnp.full_like(ind, -1),
        anc=anc,
    )


def gen_background(grid, ids_local, seed, params):
    """Isotropic-background packets; params: photons (scalar or [NFREQ]),
    plus the packet_identity keys.

    Pure select-chain arithmetic (no table gathers): this generator runs
    inside the refill step of the transport loop, so it must be cheap.
    """
    stream, ifreq, hi = packet_identity(ids_local, params)
    pos, dir = background_entry(grid.nx, grid.ny, grid.nz, stream, hi, seed)
    return _finish(grid, pos, dir, _photons_of(ifreq, params), ifreq,
                   stream, hi)


def background_entry(nx, ny, nz, stream, hi, seed):
    """Entry (position, direction) of isotropic-background packet
    (stream, hi) on the nx*ny*nz surface -- pure geometry, shared by the
    single-grid generator and the domain-decomposed transport (which
    evaluates it against the GLOBAL grid dimensions)."""
    area = 2 * (ny * nz + nx * nz + nx * ny)
    elem = (stream % jnp.uint32(area)).astype(jnp.int32)
    return background_entry_at(nx, ny, nz, elem, stream, hi, seed)


def background_entry_at(nx, ny, nz, elem, stream, hi, seed):
    """Entry (position, direction) on a GIVEN surface element."""
    a_yz, a_xz, a_xy = ny * nz, nx * nz, nx * ny

    u1, u2, u3, u4 = socrng.uniform4(jnp.uint32(seed), stream,
                                     jnp.zeros_like(stream), hi)

    # element id -> (axis, upper, tangential coords), kernel enumeration
    # order: [-X, +X, -Y, +Y, -Z, +Z] with YZ/ XZ / XY tangential planes
    in_x = elem < 2 * a_yz
    in_y = ~in_x & (elem < 2 * (a_yz + a_xz))
    base = jnp.where(in_x, 0,
                     jnp.where(in_y, 2 * a_yz, 2 * (a_yz + a_xz)))
    block = jnp.where(in_x, a_yz, jnp.where(in_y, a_xz, a_xy))
    rel = elem - base
    upper = rel >= block
    r = rel - jnp.where(upper, block, 0)
    nmod = jnp.where(in_x, ny, nx)
    t0 = (r % nmod).astype(jnp.float32)
    t1 = (r // nmod).astype(jnp.float32)
    tang1 = t0 + u1
    tang2 = t1 + u2

    ax0 = in_x
    ax1 = in_y
    ax2 = ~in_x & ~in_y
    size_n = jnp.where(ax0, nx, jnp.where(ax1, ny, nz)).astype(jnp.float32)
    nrm = jnp.where(upper, size_n - PEPS, PEPS)
    px = jnp.where(ax0, nrm, tang1)
    py = jnp.where(ax1, nrm, jnp.where(ax0, tang1, tang2))
    pz = jnp.where(ax2, nrm, tang2)
    pos = jnp.stack([jnp.clip(px, PEPS, nx - PEPS),
                     jnp.clip(py, PEPS, ny - PEPS),
                     jnp.clip(pz, PEPS, nz - PEPS)], -1)

    # cosine-law direction about the inward normal
    cos_theta = jnp.sqrt(u3)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - u3))
    phi = 2.0 * jnp.pi * u4
    v1 = sin_theta * jnp.cos(phi)
    v2 = sin_theta * jnp.sin(phi)
    s = jnp.where(upper, -cos_theta, cos_theta)
    dx = jnp.where(ax0, s, v1)
    dy = jnp.where(ax1, s, jnp.where(ax0, v1, v2))
    dz = jnp.where(ax2, s, v2)
    dir = jnp.stack([dx, dy, dz], -1)
    dir = jnp.where(jnp.abs(dir) < 1e-5, 1e-5, dir)
    dir = dir / jnp.linalg.norm(dir, axis=-1, keepdims=True)
    return pos, dir


def _surface_step(grid, pos, dir):
    """Step an outside position to the nearest model boundary along dir
    (Surface(), kernel_ASOC_aux.c:912-945); misses stay outside."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    bounds = jnp.asarray([nx, ny, nz], jnp.float32)
    lo_hit = (dir > 0.0) & (pos < 0.0)
    hi_hit = (dir < 0.0) & (pos > bounds)
    dx = jnp.where(lo_hit, (PEPS - pos) / dir,
                   jnp.where(hi_hit, (bounds - PEPS - pos) / dir, -1e10))
    step = jnp.max(dx, axis=-1)
    return pos + step[:, None] * dir


def gen_point_source(grid, ids_local, seed, params):
    """Point-source packets; params: ps_pos [S,3], photons (scalar/[S]/[S,NF]),
    plus the packet_identity keys. Packets cycle sources: src = id % S.

    External sources (outside the model volume) are handled by PS_METHOD
    (kernel_ASOC.c:215-433):
      method 0 (default)      : isotropic + Surface() step; misses die
      method 1 ('halfspace')  : direction folded into the cloud-facing
                                half-space, photons *= 0.5
      method 2 ('xps_side'...): aim at a random point on a randomly chosen
                                visible face; photons *= cos(theta) *
                                S_side / (4 pi r^2) / area_weight
      method 3 ('ps3_pix'...) : healpix-weighted directions -- a pixel is
                                drawn from the precomputed visibility bins,
                                the direction jittered within the pixel,
                                photons corrected by (1/NPIX)/p(pixel)
      method 4/5 ('cone_*')   : packets restricted to the illumination cone
                                that covers the cloud, photons *=
                                (1 - cos_cone)/2 (kernel_ASOC.c:378-433)
    """
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    stream, ifreq, hi = packet_identity(ids_local, params)
    ps_pos = params["ps_pos"]
    no_ps = ps_pos.shape[0]
    isrc = (stream % jnp.uint32(no_ps)).astype(jnp.int32)
    u1, u2, u3, u4, u5, _ = _uniforms(jnp.uint32(seed), stream, hi)
    dir = _isotropic_dir(u1, u2)
    pos = ps_pos[isrc]
    ph = params["photons"]
    if jnp.ndim(ph) == 2:
        photons = ph[isrc, ifreq]
    elif jnp.ndim(ph) == 1:
        photons = ph[isrc]
    else:
        photons = jnp.full(ifreq.shape, ph, jnp.float32)

    bounds = jnp.asarray([nx, ny, nz], jnp.float32)
    external = jnp.any((pos < 0.0) | (pos > bounds), axis=-1)

    if "xps_side" in params:
        # PS_METHOD 2: target a visible face directly
        xps_side = params["xps_side"]        # [S, 3] int32 face ids 0..5
        xps_area = params["xps_area"]        # [S, 3] area weights (1/nside)
        xps_nside = params["xps_nside"]      # [S] int32
        k = jnp.clip((u3 * xps_nside[isrc].astype(jnp.float32) * 0.999999
                      ).astype(jnp.int32), 0, 2)
        # face-weight division applies to EXTERNAL sources only (the
        # reference's PHOTONS /= XPS_AREA sits inside the external branch,
        # kernel_ASOC.c PS_METHOD==2); internal sources have area == 0
        photons = jnp.where(
            external, photons / jnp.maximum(xps_area[isrc, k], 1e-10),
            photons)
        side = xps_side[isrc, k]             # 0..5: +X,-X,+Y,-Y,+Z,-Z
        axis = side // 2
        plus_face = (side % 2) == 0          # even ids are the + faces
        nrm = jnp.where(plus_face, bounds[axis] - PEPS, PEPS)
        # tangential coordinates on the face
        t1 = u4 * jnp.where(axis == 0, ny, nx)
        t2 = u5 * jnp.where(axis == 2, ny, nz)
        fx = jnp.where(axis == 0, nrm, t1)
        fy = jnp.where(axis == 1, nrm, jnp.where(axis == 0, t1, t2))
        fz = jnp.where(axis == 2, nrm, t2)
        face_pos = jnp.stack([fx, fy, fz], -1)
        vec = face_pos - pos
        r = jnp.linalg.norm(vec, axis=-1)
        new_dir = vec / jnp.maximum(r, 1e-10)[:, None]
        cos_t = jnp.abs(jnp.take_along_axis(new_dir, axis[:, None],
                                            axis=1))[:, 0]
        s_side = jnp.where(axis == 0, ny * nz,
                           jnp.where(axis == 1, nx * nz, nx * ny)
                           ).astype(jnp.float32)
        w = cos_t * s_side / (4.0 * jnp.pi * r * r)
        photons = jnp.where(external, photons * w, photons)
        dir = jnp.where(external[:, None], new_dir, dir)
        pos = jnp.where(external[:, None], face_pos, pos)
    elif "cone_cos" in params:
        # PS_METHOD 4/5: uniform directions inside the illumination cone
        # around the cloud-facing axis; photons *= (1-cos)/2
        cone_cos = params["cone_cos"][isrc]           # [S]
        side = params["cone_side"][isrc]              # 0..5: +X,-X,+Y,-Y,..
        ct = 1.0 - u3 * (1.0 - cone_cos)
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
        phi = 2.0 * jnp.pi * u4
        v1 = st * jnp.cos(phi)
        v2 = st * jnp.sin(phi)
        axis = side // 2
        sgn = jnp.where(side % 2 == 0, -1.0, 1.0)     # +face => -axis dir
        cx = jnp.where(axis == 0, sgn * ct, v1)
        cy = jnp.where(axis == 1, sgn * ct, jnp.where(axis == 0, v1, v2))
        cz = jnp.where(axis == 2, sgn * ct, v2)
        cdir = jnp.stack([cx, cy, cz], -1)
        cdir = jnp.where(jnp.abs(cdir) < 1e-5, 1e-5, cdir)
        cdir = cdir / jnp.linalg.norm(cdir, axis=-1, keepdims=True)
        dir = jnp.where(external[:, None], cdir, dir)
        photons = jnp.where(external,
                            photons * 0.5 * (1.0 - cone_cos), photons)
        surfaced = _surface_step(grid, pos, dir)
        pos = jnp.where(external[:, None], surfaced, pos)
    elif "ps3_pix" in params:
        # PS_METHOD 3: healpix-weighted direction selection
        from ..render import healpix as hp
        ps3_pix = params["ps3_pix"]                   # [S, NB] int32
        ps3_p = params["ps3_p"]                       # [S, NPIX] pixel prob
        nb = ps3_pix.shape[1]
        npix_hp = ps3_p.shape[1]
        nside_hp = int(np.sqrt(npix_hp // 12))
        bin_i = jnp.clip((u3 * nb).astype(jnp.int32), 0, nb - 1)
        pix = ps3_pix[isrc, bin_i]
        photons = jnp.where(
            external,
            photons * (1.0 / npix_hp) / jnp.maximum(ps3_p[isrc, pix],
                                                    1e-20),
            photons)
        theta, phi = hp.pix2ang_ring(nside_hp, pix)
        pdir = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                          jnp.sin(theta) * jnp.sin(phi),
                          jnp.cos(theta)], -1)
        # jitter within the pixel solid angle (~2/NPIX in cos theta)
        jig_ct = 1.0 - u4 * (2.0 / npix_hp)
        from .propagate import _deflect
        pdir = _deflect(pdir, jig_ct, 2.0 * jnp.pi * u5)
        dir = jnp.where(external[:, None], pdir, dir)
        surfaced = _surface_step(grid, pos, dir)
        pos = jnp.where(external[:, None], surfaced, pos)
    else:
        if params.get("halfspace", None) is not None:
            # PS_METHOD 1: fold the direction toward the cloud across
            # exactly ONE axis, priority z, x, y (kernel_ASOC.c:231-255)
            # -- the 0.5 half-space weight is exact only for a single
            # fold; folding every outside axis would confine corner
            # sources to a quarter/octant-space at 2x/4x the true flux
            below = pos < 0.0
            above = pos > bounds
            out_ax = below | above
            pick_z = out_ax[:, 2]
            pick_x = ~pick_z & out_ax[:, 0]
            pick_y = ~pick_z & ~pick_x & out_ax[:, 1]
            pick = jnp.stack([pick_x, pick_y, pick_z], -1)
            flip = pick & ((below & (dir < 0.0)) | (above & (dir > 0.0)))
            dir = jnp.where(external[:, None] & flip, -dir, dir)
            photons = jnp.where(external, photons * 0.5, photons)
        # PS_METHOD 0/1: step to the cloud surface; misses die at IndexG
        surfaced = _surface_step(grid, pos, dir)
        pos = jnp.where(external[:, None], surfaced, pos)

    return _finish(grid, pos, dir, photons, ifreq, stream, hi)


def analyse_external_point_sources(grid, ps_pos):
    """Host-side XPS arrays for PS_METHOD 2 (ASOC_aux.py:1538-1605)."""
    ps_pos = np.asarray(ps_pos, np.float64)
    no_ps = len(ps_pos)
    nside = np.zeros(no_ps, np.int32)
    side = np.zeros((no_ps, 3), np.int32)
    area = np.zeros((no_ps, 3), np.float32)
    bounds = [grid.nx, grid.ny, grid.nz]
    for i, p in enumerate(ps_pos):
        if np.all((p >= 0) & (p <= bounds)):
            continue
        faces = []
        for axis in range(3):
            if p[axis] > bounds[axis]:
                faces.append(2 * axis)          # + face
            if p[axis] < 0.0:
                faces.append(2 * axis + 1)      # - face
        nside[i] = len(faces)
        for k, f in enumerate(faces[:3]):
            side[i, k] = f
            area[i, k] = 1.0 / len(faces)
    return nside, side, area


def illumination_cones(grid, ps_pos):
    """Host-side PS_METHOD 4/5 cones (kernel_ASOC.c:378-433): for every
    external source, the cloud-facing face id (0..5 = +X,-X,+Y,-Y,+Z,-Z)
    and the cone cosine that covers all 8 box corners as seen from the
    source (any containing cone is unbiased since the photon weight uses
    the same cosine)."""
    ps_pos = np.asarray(ps_pos, np.float64)
    bounds = np.asarray([grid.nx, grid.ny, grid.nz], np.float64)
    no_ps = len(ps_pos)
    side = np.zeros(no_ps, np.int32)
    cone = np.zeros(no_ps, np.float32)
    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                   indexing="ij"), -1).reshape(-1, 3) * bounds
    for i, p in enumerate(ps_pos):
        over = np.where(p > bounds, p - bounds, 0.0) \
            + np.where(p < 0.0, p, 0.0)
        if not np.any(over != 0.0):
            continue                        # internal source: no cone
        axis = int(np.argmax(np.abs(over)))
        side[i] = 2 * axis + (0 if over[axis] > 0 else 1)
        adir = np.zeros(3)
        adir[axis] = -np.sign(over[axis])   # toward the cloud
        vec = corners - p
        vec /= np.linalg.norm(vec, axis=1, keepdims=True)
        cone[i] = float(np.min(vec @ adir))
    return side, np.clip(cone, -1.0, 0.999999)


def healpix_visibility(grid, ps_pos, nside=16, nbins=4096):
    """Host-side PS_METHOD 3 tables: per source, a healpix visibility map
    (does the ray from the source toward the pixel centre hit the cloud
    box?) turned into selection probabilities and equidistant cumulative
    bins (the reference's XPS_SIDE/XPS_AREA healpix variant,
    ASOC_aux.py:1640+)."""
    from ..render import healpix as hp
    import jax.numpy as jnp_
    ps_pos = np.asarray(ps_pos, np.float64)
    bounds = np.asarray([grid.nx, grid.ny, grid.nz], np.float64)
    npix = 12 * nside * nside
    theta, phi = hp.pix2ang_ring(nside, jnp_.arange(npix))
    theta = np.asarray(theta)
    phi = np.asarray(phi)
    dirs = np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi), np.cos(theta)], -1)
    no_ps = len(ps_pos)
    prob = np.zeros((no_ps, npix), np.float32)
    bins = np.zeros((no_ps, nbins), np.int32)
    for i, p in enumerate(ps_pos):
        # slab-method ray/AABB intersection for every pixel direction
        with np.errstate(divide="ignore"):
            t0 = (0.0 - p)[None, :] / dirs
            t1 = (bounds - p)[None, :] / dirs
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax > np.maximum(tmin, 0.0))
        w = hit.astype(np.float64) + 1e-12
        p_pix = w / w.sum()
        cdf = np.cumsum(p_pix)
        u = (np.arange(nbins) + 0.5) / nbins
        bins[i] = np.searchsorted(cdf, u).clip(0, npix - 1)
        # the ACTUAL selection probability is the realized bin histogram
        # (quantized cdf), which keeps the weight correction exact
        prob[i] = np.bincount(bins[i], minlength=npix) / float(nbins)
    return bins, prob


def gen_cell(grid, ids_local, seed, params):
    """Re-emission packets; params: emit [CELLS] (photon weight per packet
    from that cell), and either per_cell (uniform packets/cell) or
    cell_of_id [per_freq] (emission-weighted allocation), plus the
    packet_identity keys."""
    stream, ifreq, hi = packet_identity(ids_local, params)
    within = stream.astype(jnp.int32)     # k < per_freq by construction
    if "cell_of_id" in params:
        # emission-weighted packet allocation (USE_EMWEIGHT): the host maps
        # packet ids to cells with importance-dependent multiplicity
        cell_gidx = params["cell_of_id"][within]
    else:
        cell_gidx = (within // params["per_cell"]).astype(jnp.int32)
    cell_gidx = jnp.clip(cell_gidx, 0, grid.cells - 1)
    u1, u2, u3, u4, u5, _ = _uniforms(jnp.uint32(seed), stream, hi)

    # locate (level, local index) of each global cell id
    lev = jnp.zeros_like(cell_gidx)
    for l in range(1, grid.levels):
        lev = jnp.where(cell_gidx >= grid.off[l], l, lev)
    loc = cell_gidx - grid.off[lev]

    if grid.levels == 1:
        x0 = (loc % grid.nx).astype(jnp.float32)
        y0 = ((loc // grid.nx) % grid.ny).astype(jnp.float32)
        z0 = (loc // (grid.nx * grid.ny)).astype(jnp.float32)
    else:
        sid = loc % 8
        rx = (loc % grid.nx).astype(jnp.float32)
        ry = ((loc // grid.nx) % grid.ny).astype(jnp.float32)
        rz = (loc // (grid.nx * grid.ny)).astype(jnp.float32)
        x0 = jnp.where(lev == 0, rx, (sid % 2).astype(jnp.float32))
        y0 = jnp.where(lev == 0, ry, ((sid // 2) % 2).astype(jnp.float32))
        z0 = jnp.where(lev == 0, rz, (sid // 4).astype(jnp.float32))
    pos = jnp.stack([x0 + u1, y0 + u2, z0 + u3], -1)
    dir = _isotropic_dir(u4, u5)
    emit = params["emit"]
    if emit.ndim == 2:
        # mixed-frequency pool: one [CELLS, NFREQ] weight table, gathered
        # once per packet at birth
        photons = emit[cell_gidx, ifreq]
    else:
        photons = emit[cell_gidx]

    # emitting cells sit anywhere in the hierarchy: PAR walk builds the
    # birth ancestor stack (cell source only -- surface sources get it
    # free from the leaf descent in _finish)
    anc = traverse.stack_from_par(grid, lev.astype(jnp.int32),
                                  loc.astype(jnp.int32))
    return PacketBatch(
        pos=pos, dir=dir.astype(jnp.float32),
        level=lev.astype(jnp.int32), ind=loc.astype(jnp.int32),
        photons=photons.astype(jnp.float32), ifreq=ifreq,
        stream=stream, hi=hi.astype(jnp.uint32),
        counter=jnp.full_like(stream, BIRTH_COUNTER),
        scatterings=jnp.zeros_like(loc.astype(jnp.int32)),
        e_cell=cell_gidx.astype(jnp.int32),
        anc=anc,
    )


def gen_hpbg(grid, ids_local, seed, params):
    """Healpix all-sky background packets (SimRAM_HP, kernel_ASOC.c:831-1010).

    params: hpbg [49152] photons per packet per pixel (host includes WBG/freq
    and any pixel weighting), optional 'cdf' [49152] cumulative pixel
    probability for weighted pixel selection, plus the packet_identity keys.
    Pixel -> parallel-beam direction (+sin t cos p, +sin t sin p, -cos t);
    the entry face is chosen with probability ~ projected area.
    """
    from ..render import healpix as hp
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    stream, ifreq, hi = packet_identity(ids_local, params)
    u1, u2, u3, u4 = socrng.uniform4(jnp.uint32(seed), stream,
                                     jnp.zeros_like(stream), hi)
    npix = params["hpbg"].shape[0]
    nside = int(np.sqrt(npix // 12))
    if params.get("cdf", None) is not None:
        pix = jnp.clip(jnp.searchsorted(params["cdf"], u1), 0, npix - 1)
    else:
        pix = jnp.clip((u1 * npix).astype(jnp.int32), 0, npix - 1)
    photons = params["hpbg"][pix]
    theta, phi = hp.pix2ang_ring(nside, pix)
    dir = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                     jnp.sin(theta) * jnp.sin(phi),
                     -jnp.cos(theta)], -1)
    dir = jnp.where(jnp.abs(dir) < 1e-5, 1e-5, dir)
    dir = dir / jnp.linalg.norm(dir, axis=-1, keepdims=True)

    # face selection ~ |DIR_F| * face area = the face's share of the
    # beam's projected footprint. Deviation from the reference documented:
    # kernel_ASOC.c:929-944 splits by fabs(DIR) alone, which on non-cubic
    # grids concentrates packets on the small faces (wrong surface flux
    # density even though the per-channel total is normalized); on cubic
    # grids the two rules are identical, thresholds and all.
    ax = jnp.abs(dir[:, 0]) * (ny * nz)
    ay = jnp.abs(dir[:, 1]) * (nx * nz)
    az = jnp.abs(dir[:, 2]) * (nx * ny)
    tot = ax + ay + az
    ax, ay = ax / tot, ay / tot
    hit_x = u2 < ax
    hit_y = ~hit_x & (u2 < ax + ay)
    hit_z = ~hit_x & ~hit_y
    px = jnp.where(hit_x,
                   jnp.where(dir[:, 0] > 0, PEPS, nx - PEPS), u3 * nx)
    py = jnp.where(hit_y,
                   jnp.where(dir[:, 1] > 0, PEPS, ny - PEPS),
                   jnp.where(hit_x, u3 * ny, u4 * ny))
    pz = jnp.where(hit_z,
                   jnp.where(dir[:, 2] > 0, PEPS, nz - PEPS), u4 * nz)
    pos = jnp.stack([jnp.clip(px, PEPS, nx - PEPS),
                     jnp.clip(py, PEPS, ny - PEPS),
                     jnp.clip(pz, PEPS, nz - PEPS)], -1)
    return _finish(grid, pos, dir, photons, ifreq, stream, hi)


def gen_roi(grid, ids_local, seed, params):
    """ROI-load boundary source (SOURCE==3, kernel_ASOC.c:469-505).

    Re-injects photons recorded by a previous run's ROI save into the
    sub-model (which spans the ROI box). params:
      roi_load [NELEM, NPIX] photons per (surface element, sky direction)
      roi_dim  (rnx, rny, rnz) of the saved discretisation
      nside    healpix NSIDE of the directions (array scalar)
      reps     packets per (elem, pix) pair; photon weight = load/reps
    id -> (elem, pix, repetition); position jittered over the element patch,
    direction jittered ~0.05 rad around the pixel centre.
    """
    from ..render import healpix as hp
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    stream, ifreq, hi = packet_identity(ids_local, params)
    roi_load = params["roi_load"]
    nelem, npix = roi_load.shape
    nside = int(np.sqrt(npix // 12))
    rnx, rny, rnz = params["roi_dim"]
    u1, u2, u3, u4, _, _ = _uniforms(jnp.uint32(seed), stream, hi)

    elem = (stream % jnp.uint32(nelem)).astype(jnp.int32)
    pix = ((stream // jnp.uint32(nelem))
           % jnp.uint32(npix)).astype(jnp.int32)
    photons = roi_load[elem, pix] / params["reps"].astype(jnp.float32)

    theta, phi = hp.pix2ang_ring(nside, pix)
    theta = theta + (u3 - 0.5) * 0.05
    phi = phi + (u4 - 0.5) * 0.05
    dir = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                     jnp.sin(theta) * jnp.sin(phi),
                     jnp.cos(theta)], -1)
    dir = jnp.where(jnp.abs(dir) < 1e-5, 1e-5, dir)
    dir = dir / jnp.linalg.norm(dir, axis=-1, keepdims=True)

    # element -> (side, patch coordinates); patch size = model size / dims
    in_x = elem < rny * rnz
    in_y = ~in_x & (elem < rny * rnz + rnx * rnz)
    r = jnp.where(in_x, elem,
                  jnp.where(in_y, elem - rny * rnz,
                            elem - rny * rnz - rnx * rnz))
    n1 = jnp.where(in_x, rny, rnx)
    t1 = (r % n1).astype(jnp.float32)
    t2 = (r // n1).astype(jnp.float32)
    rd1 = jnp.where(in_x, ny / rny, nx / rnx).astype(jnp.float32)
    rd2 = jnp.where(in_x, nz / rnz,
                    jnp.where(in_y, nz / rnz, ny / rny)).astype(jnp.float32)
    c1 = (t1 + 0.5) * rd1 + (u1 - 0.5) * 0.98 * rd1
    c2 = (t2 + 0.5) * rd2 + (u2 - 0.5) * 0.98 * rd2
    # entry face fixed by the direction sign on the normal axis
    px = jnp.where(in_x,
                   jnp.where(dir[:, 0] > 0, PEPS, nx - PEPS), c1)
    py = jnp.where(in_x, c1,
                   jnp.where(in_y,
                             jnp.where(dir[:, 1] > 0, PEPS, ny - PEPS), c2))
    pz = jnp.where(in_x | in_y, c2,
                   jnp.where(dir[:, 2] > 0, PEPS, nz - PEPS))
    pos = jnp.stack([jnp.clip(px, PEPS, nx - PEPS),
                     jnp.clip(py, PEPS, ny - PEPS),
                     jnp.clip(pz, PEPS, nz - PEPS)], -1)
    return _finish(grid, pos, dir, photons, ifreq, stream, hi)


GENERATORS = {
    "bg": gen_background,
    "ps": gen_point_source,
    "cell": gen_cell,
    "hpbg": gen_hpbg,
    "roi": gen_roi,
}
