"""MWC64X random-stream emulation (validation harness ONLY).

The reference's per-work-item RNG is David Thomas's MWC64X
(mwc64x_rng.cl:12-51) with mod-M skip-ahead stream seeding (skip_mwc.cl):
work item ``id`` gets the state 2^38 * id samples into one global MWC
sequence, seeded from ``fmod(SEED*7*pi, 1) * 2^32`` (kernel_ASOC.c:71-77).
The production framework uses counter-based streams (soc_tpu.rng); this
exact emulation exists solely for the RNG-parity harness
(tests/test_rng_parity.py) that closes BASELINE.md's "allclose vs the
reference under a fixed RNG stream" bullet: it reproduces, bit for bit,
the uint32 sequence every reference work item would consume.

Vectorized over streams with NumPy uint32/uint64 arithmetic; the
skip-ahead seeding uses Python big-int pow-mod per stream (host-side,
once).
"""

import numpy as np

MWC64X_A = 4294883355
MWC64X_M = MWC64X_A * (1 << 32) - 1          # 18446383549859758079
_BASEID = 4077358422479273989
_SAMPLES_PER_STREAM = 1 << 38                # kernel_ASOC.c:74


def seed_states(seed, n_streams, base_offset=None):
    """Per-work-item (x, c) states, exactly MWC64X_SeedStreams.

    seed : the reference's USER.SEED in [0, 1); the kernel derives
    base_offset = fmod(seed*7*pi, 1) * 2^32 in float32 (kernel_ASOC.c:77).
    """
    if base_offset is None:
        base_offset = int(
            np.float32(np.fmod(np.float32(seed) * np.float32(7.0)
                               * np.float32(np.pi), np.float32(1.0)))
            * 4294967296.0)
    x = np.zeros(n_streams, np.uint32)
    c = np.zeros(n_streams, np.uint32)
    for i in range(n_streams):
        dist = base_offset + i * _SAMPLES_PER_STREAM
        m = pow(MWC64X_A, dist, MWC64X_M)
        v = (_BASEID * m) % MWC64X_M
        x[i] = v // MWC64X_A
        c[i] = v % MWC64X_A
    return x, c


class MWC64X:
    """Vectorized multi-stream MWC64X with masked draws.

    ``rand(mask)`` returns the next float32 uniform of EVERY stream but
    advances only the streams where mask is True -- the exact device
    behavior where each work item consumes draws at its own pace.
    """

    def __init__(self, seed, n_streams, base_offset=None):
        self.x, self.c = seed_states(seed, n_streams, base_offset)

    def next_uint(self, mask=None):
        res = self.x ^ self.c
        # MWC64X_Step in uint32/uint64 (mad_hi = high word of A*X)
        prod = np.uint64(MWC64X_A) * self.x.astype(np.uint64)
        xn = (prod + self.c).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        xn = xn.astype(np.uint32)
        carry = (xn < self.c).astype(np.uint32)
        cn = (prod >> np.uint64(32)).astype(np.uint32) + carry
        if mask is None:
            self.x, self.c = xn, cn
        else:
            self.x = np.where(mask, xn, self.x)
            self.c = np.where(mask, cn, self.c)
            res = res          # every lane sees its next value
        return res

    def rand(self, mask=None):
        """Rand(x) macro: NextUint / 4294967295.0f in float32
        (kernel_ASOC_aux.c:127)."""
        u = self.next_uint(mask)
        return (u.astype(np.float64)
                / np.float64(np.float32(4294967295.0))).astype(np.float32)


def reference_deflect(dirv, cos_theta, phi, dtype=np.float64):
    """The reference's Deflect rotation (kernel_ASOC_aux.c:499-535),
    vectorized: rotate DIR by theta (given cos) with azimuth phi, using
    the exact theta0/phi0 back-rotation construction. Used by BOTH sides
    of the parity harness so the per-packet random sequences stay aligned
    (the production _deflect is distributionally equivalent but picks a
    different azimuth reference frame)."""
    deps = dtype(6.0e-5)
    cx, cy, cz = (dirv[:, 0].astype(dtype), dirv[:, 1].astype(dtype),
                  dirv[:, 2].astype(dtype))
    cos_theta = cos_theta.astype(dtype)
    phi = phi.astype(dtype)
    sin_theta = np.sqrt(np.maximum(0.0, 1.0 - cos_theta * cos_theta))
    ox = sin_theta * np.cos(phi)
    oy = sin_theta * np.sin(phi)
    oz = cos_theta
    theta0 = np.arccos(np.clip(
        cz / np.sqrt(cx * cx + cy * cy + cz * cz + deps), -1.0, 1.0))
    phi0 = np.arccos(np.clip(
        cx / np.sqrt(cx * cx + cy * cy + deps), -1.0, 1.0))
    phi0 = np.where(cy < 0.0, 2.0 * np.pi - phi0, phi0)
    theta0 = -theta0
    phi0 = -phi0
    st, ct = np.sin(theta0), np.cos(theta0)
    sp, cp = np.sin(phi0), np.cos(phi0)
    nx = ox * ct * cp + oy * sp - oz * st * cp
    ny = -ox * ct * sp + oy * cp + oz * st * sp
    nz = ox * st + oz * ct
    out = np.stack([nx, ny, nz], axis=1)
    out = np.where(np.abs(out) < deps, deps, out)
    return (out / np.linalg.norm(out, axis=1, keepdims=True)).astype(dtype)
