"""Device-resident optical properties of the medium.

The reference re-stages per-frequency cross sections and scattering tables to
the device on every frequency iteration (ASOC.py:1146-1243, a measured 17% of
runtime). Here the full frequency axis is resident: packets carry an ``ifreq``
tag and gather their own cross sections, which removes the host staging loop
entirely and lets one batch mix packets of all frequencies.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Medium:
    """Single effective dust population (possibly summed over species).

    abs_gl, sca_gl : [NFREQ] optical depth / unit density / GL
    csc            : [NFREQ, BINS] inverse-CDF cos-theta lookup
    dsc            : [NFREQ, BINS] discrete phase function (peel-off weights)
    tw             : [NFREQ] trapezoid weight FREQ*0.5*dF for on-the-fly
                     integration of absorbed energy over frequency
                     (ASOC.py:1232-1237)
    opt            : [CELLS, 2] per-cell (abs, sca) at the *current* frequency
                     when abundances vary, else shape (0, 2) placeholder
    """

    abs_gl: jax.Array
    sca_gl: jax.Array
    csc: jax.Array
    dsc: jax.Array
    tw: jax.Array
    nfreq: int = field(metadata=dict(static=True))
    bins: int = field(metadata=dict(static=True))


def trapezoid_weights(freq):
    """FREQ * half-interval trapezoid weights over the frequency grid."""
    freq = np.asarray(freq, np.float64)
    n = len(freq)
    tw = np.zeros(n)
    if n == 1:
        tw[0] = freq[0]
        return tw.astype(np.float32)
    tw[0] = freq[0] * 0.5 * (freq[1] - freq[0])
    tw[-1] = freq[-1] * 0.5 * (freq[-1] - freq[-2])
    tw[1:-1] = freq[1:-1] * 0.5 * (freq[2:] - freq[:-2])
    return tw.astype(np.float32)


def medium_from_optics(optics_list, dsc, csc, freq=None):
    """Build a Medium by summing cross sections over dust populations
    (constant-abundance case, reference ABS[0] += AFABS[idust])."""
    freq = np.asarray(optics_list[0].freq if freq is None else freq)
    abs_gl = np.zeros(len(freq), np.float32)
    sca_gl = np.zeros(len(freq), np.float32)
    for opt in optics_list:
        abs_gl += opt.abs_gl
        sca_gl += opt.sca_gl
    dsc = np.asarray(dsc, np.float32)
    csc = np.asarray(csc, np.float32)
    if dsc.ndim == 3:      # [ndust, nfreq, bins] -> single effective function
        dsc = dsc[0]
        csc = csc[0]
    return Medium(
        abs_gl=jnp.asarray(abs_gl),
        sca_gl=jnp.asarray(sca_gl),
        csc=jnp.asarray(csc),
        dsc=jnp.asarray(dsc),
        tw=jnp.asarray(trapezoid_weights(freq)),
        nfreq=int(len(freq)),
        bins=int(csc.shape[-1]),
    )
