"""Counter-based RNG: distribution and stream-independence properties."""

import numpy as np
import jax.numpy as jnp

from soc_tpu import rng as socrng


def test_uniformity_and_range():
    n = 1 << 16
    stream = jnp.arange(n, dtype=jnp.uint32)
    ctr = jnp.zeros(n, jnp.uint32)
    u0, u1 = socrng.uniform2(jnp.uint32(7), stream, ctr)
    for u in (np.asarray(u0), np.asarray(u1)):
        assert u.min() > 0.0 and u.max() <= 1.0
        assert abs(u.mean() - 0.5) < 0.005
        assert abs(u.std() - np.sqrt(1 / 12.0)) < 0.005
        # each of 16 bins within 5 sigma of the expected count
        hist, _ = np.histogram(u, bins=16, range=(0, 1))
        expect = n / 16
        assert np.all(np.abs(hist - expect) < 5.0 * np.sqrt(expect))


def test_streams_decorrelated():
    n = 1 << 14
    stream = jnp.arange(n, dtype=jnp.uint32)
    ctr = jnp.zeros(n, jnp.uint32)
    a, _ = socrng.uniform2(jnp.uint32(1), stream, ctr)
    b, _ = socrng.uniform2(jnp.uint32(1), stream, ctr + jnp.uint32(1))
    c, _ = socrng.uniform2(jnp.uint32(2), stream, ctr)
    corr_ab = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    corr_ac = np.corrcoef(np.asarray(a), np.asarray(c))[0, 1]
    assert abs(corr_ab) < 0.03
    assert abs(corr_ac) < 0.03


def test_chunking_invariance():
    """The same (seed, stream, counter) triple gives the same value no matter
    how lanes are batched -- the device-count-invariance property."""
    full = socrng.uniform2(jnp.uint32(3), jnp.arange(64, dtype=jnp.uint32),
                           jnp.full(64, 5, jnp.uint32))[0]
    parts = [socrng.uniform2(jnp.uint32(3),
                             jnp.arange(i, i + 16, dtype=jnp.uint32),
                             jnp.full(16, 5, jnp.uint32))[0]
             for i in range(0, 64, 16)]
    np.testing.assert_array_equal(np.asarray(full),
                                  np.concatenate([np.asarray(p) for p in parts]))
