"""HPSS / softmask parity vs scipy median_filter based realization."""

import numpy as np
from scipy.ndimage import median_filter

from pyaudiorestoration_tpu.ops import decompose


def test_median_filter_matches_scipy(rng):
    x = rng.standard_normal((70, 90)).astype(np.float32)
    for size, axis in [(31, 1), (31, 0), (5, 1)]:
        scipy_size = (1, size) if axis == 1 else (size, 1)
        ref = median_filter(x, size=scipy_size, mode="reflect")
        got = np.asarray(decompose.median_filter_1d(x, size, axis=axis, block=32))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_softmask_matches_formula(rng):
    X = np.abs(rng.standard_normal((20, 30))).astype(np.float32)
    R = np.abs(rng.standard_normal((20, 30))).astype(np.float32)
    got = np.asarray(decompose.softmask(X, R, power=2))
    ref = X ** 2 / (X ** 2 + R ** 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    hard = np.asarray(decompose.softmask(X, R, power=np.inf))
    np.testing.assert_array_equal(hard, (X > R).astype(np.float32))


def test_hpss_partition(rng):
    """With margin 1, H + P should approximately reconstruct S."""
    freq, t = 65, 120
    S = np.abs(rng.standard_normal((freq, t))).astype(np.float32)
    # add a horizontal (harmonic) line and a vertical (percussive) event
    S[20, :] += 10.0
    S[:, 60] += 10.0
    H, P = decompose.hpss(S, kernel_size=11)
    H, P = np.asarray(H), np.asarray(P)
    np.testing.assert_allclose(H + P, S, atol=1e-3)
    # the harmonic line should be mostly in H, the event in P
    assert H[20, 30] > P[20, 30]
    assert P[40, 60] > H[40, 60]


def test_hpss_complex_phase_preserved(rng):
    S = (rng.standard_normal((33, 40)) + 1j * rng.standard_normal((33, 40))).astype(np.complex64)
    H, P = decompose.hpss(S, kernel_size=7)
    np.testing.assert_allclose(np.asarray(H + P), S, atol=1e-3)
