"""Statistical checks for the counter-hash RNG (sampling/rng.py)."""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu.sampling.rng import counter_uniform, mix32


def _draws(seed, counters, n_streams, lanes):
    out = []
    for c in counters:
        out.append(np.asarray(counter_uniform(seed, c, n_streams, lanes)))
    return np.stack(out)  # (C, S, L)


def test_uniform_moments():
    u = _draws(123, range(64), 4, 4096).ravel()
    assert abs(u.mean() - 0.5) < 0.002
    assert abs(u.var() - 1 / 12) < 0.001
    assert u.min() >= 0.0 and u.max() < 1.0
    # uniformity: chi-square over 64 bins
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 63 dof: 99.9th percentile ~ 103
    assert chi2 < 110, chi2


def test_no_lane_or_step_correlation():
    u = _draws(7, range(256), 1, 1024)[:, 0, :]  # (C, L)
    c = u - 0.5
    # adjacent-step correlation per lane
    corr_step = (c[:-1] * c[1:]).mean() / c.var()
    # adjacent-lane correlation per step
    corr_lane = (c[:, :-1] * c[:, 1:]).mean() / c.var()
    assert abs(corr_step) < 0.01, corr_step
    assert abs(corr_lane) < 0.01, corr_lane


def test_streams_independent():
    u = _draws(99, range(128), 4, 512)  # (C, 4, L)
    c = u - 0.5
    for a in range(4):
        for b in range(a + 1, 4):
            corr = (c[:, a] * c[:, b]).mean() / c.var()
            assert abs(corr) < 0.02, (a, b, corr)


def test_seed_sensitivity():
    a = np.asarray(counter_uniform(1, 0, 1, 1024))
    b = np.asarray(counter_uniform(2, 0, 1, 1024))
    assert not np.allclose(a, b)
    # single-bit avalanche in mix32
    x = mix32(jnp.uint32(0x1))
    y = mix32(jnp.uint32(0x3))
    bits = bin(int(np.asarray(x)) ^ int(np.asarray(y))).count("1")
    assert 8 <= bits <= 28, bits
