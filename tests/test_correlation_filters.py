"""Parity tests: xcorr/find_delay vs scipy, sosfiltfilt vs scipy."""

import numpy as np
import pytest
import scipy.signal

from pyaudiorestoration_tpu.ops import correlation, filters


def test_xcorr_same_matches_scipy(rng):
    a = rng.standard_normal(513).astype(np.float32)
    b = rng.standard_normal(513).astype(np.float32)
    ref = scipy.signal.correlate(a / np.linalg.norm(a), b / np.linalg.norm(b), mode="same")
    got = np.asarray(correlation.xcorr(a, b, mode="same"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_xcorr_full_matches_scipy(rng):
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(80).astype(np.float32)
    ref = scipy.signal.correlate(a / np.linalg.norm(a), b / np.linalg.norm(b), mode="full")
    got = np.asarray(correlation.xcorr(a, b, mode="full"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("n,delay", [(521, 3), (522, 3), (1000, -7)])
def test_find_delay_shifted_sine(n, delay):
    t = np.arange(n)
    a = np.sin(t * 0.1).astype(np.float32)
    b = np.sin((t + delay) * 0.1).astype(np.float32)
    d, corr = correlation.find_delay(a, b, window_name="hann")
    assert abs(float(d) - delay) < 0.1, (float(d), delay)
    assert float(corr) > 0.8


def test_find_delay_batch_matches_single(rng):
    a = rng.standard_normal((4, 256)).astype(np.float32)
    b = np.roll(a, 5, axis=-1).astype(np.float32)
    dd, cc = correlation.find_delay_batch(a, b)
    for i in range(4):
        d1, c1 = correlation.find_delay(a[i], b[i])
        np.testing.assert_allclose(float(dd[i]), float(d1), atol=1e-5)


def test_parabolic_refines_peak():
    # a known parabola: peak at 5.3
    x = np.arange(10.0)
    f = -(x - 5.3) ** 2
    xv, yv = correlation.parabolic(f, 5)
    assert abs(float(xv) - 5.3) < 1e-5
    assert abs(float(yv)) < 1e-5


@pytest.mark.parametrize("low,high,order", [(500, 3000, 3), (0, 20, 3), (100, 1e9, 5)])
def test_butter_filter_parity_vs_scipy(rng, low, high, order):
    fs = 44100 if high > 100 else 344.5
    x = rng.standard_normal(8000).astype(np.float32)
    ref = filters.butter_bandpass_filter(x, low, high, fs, order=order, backend="host")
    got = np.asarray(filters.butter_bandpass_filter(x, low, high, fs, order=order))
    # defect-refined f32 scan vs float64 scipy: parity grade
    scale = np.abs(ref).max() + 1e-9
    err = np.abs(got - ref).max() / scale
    assert err < 5e-5, err


def test_butter_out_of_range_passthrough():
    x = np.ones(100, np.float32)
    out = filters.butter_bandpass_filter(x, 0, 1e9, 44100, order=3)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_moving_average_matches_reference():
    a = np.arange(20.0)
    ref = np.cumsum(a)
    ref[3:] = ref[3:] - ref[:-3]
    ref = ref[2:] / 3
    got = filters.moving_average(a, 3)
    np.testing.assert_allclose(got, ref)


def test_sosfilt_matches_scipy(rng):
    sos = scipy.signal.butter(3, 0.2, output="sos")
    x = rng.standard_normal(2000).astype(np.float32)
    ref = scipy.signal.sosfilt(sos, x)
    got = np.asarray(filters.sosfilt(sos, x))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_sosfiltfilt_refined_parity_100db(rng):
    """Parity-grade device IIR (VERDICT r03 #5): the defect-refined scan
    matches scipy's float64 sosfiltfilt to >100 dB SNR across the dropout
    band cascade, including brutal narrowband low bands; the plain f32 scan
    (compensated=False) demonstrably cannot."""
    from scipy import signal as dsp

    sr = 44100
    n = 1 << 16
    x = (0.3 * rng.standard_normal(n)).astype(np.float32)

    def snr(ref, got):
        e = np.asarray(got, np.float64) - ref
        return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(e ** 2), 1e-300))

    # the dropouts-batch default cascade edges (100..1000 Hz log-spaced)
    # plus a sub-bass band whose poles sit ~1e-3 from the unit circle
    worst_fast = np.inf
    for lo, hi in [(100, 147), (681, 1000), (40, 80)]:
        sos = dsp.butter(3, [lo / (sr / 2), hi / (sr / 2)], btype="band",
                         output="sos")
        ref = dsp.sosfiltfilt(sos, x.astype(np.float64))
        got = filters.sosfiltfilt(sos, x)
        s = snr(ref, got)
        assert s > 100.0, (lo, hi, s)
        worst_fast = min(worst_fast,
                         snr(ref, filters.sosfiltfilt(sos, x, compensated=False)))
    assert worst_fast < 60.0  # the refinement is load-bearing
