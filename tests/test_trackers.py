"""Tracker tests on synthetic vibrato tones with known flutter."""

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import trackers
from pyaudiorestoration_tpu.ops import fourier


SR = 44100
F0 = 2000.0
WOW_HZ = 0.55
WOW_DEPTH = 0.02  # +-2% speed


def make_vibrato(duration=3.0, sr=SR):
    """A tone whose instantaneous frequency wobbles like turntable wow."""
    n = int(duration * sr)
    t = np.arange(n) / sr
    speed = 1.0 + WOW_DEPTH * np.sin(2 * np.pi * WOW_HZ * t)
    phase = 2 * np.pi * F0 * np.cumsum(speed) / sr
    return (np.sin(phase) * 0.5).astype(np.float32), speed


@pytest.fixture(scope="module")
def vibrato_spec():
    sig, speed = make_vibrato()
    fft_size, hop = 4096, 512
    mag = np.asarray(fourier.get_mag(sig, fft_size, hop, zeropad=2))
    return sig, speed, mag, fft_size * 2, hop  # zeropad doubles the bin count


def check_tracked_freqs(times, freqs, speed, tol=0.004):
    """Tracked freqs / F0 should follow the speed curve within tol."""
    idx = (times * SR).astype(int)
    ok = (idx > SR // 4) & (idx < len(speed) - SR // 4)
    rel = freqs[ok] / F0
    target = speed[idx[ok]]
    err = np.abs(rel - target)
    assert np.median(err) < tol, np.median(err)


@pytest.mark.parametrize("mode", ["Peak", "Peak Track", "Center of Gravity", "Zero-Crossing"])
def test_tracker_follows_vibrato(vibrato_spec, mode):
    sig, speed, mag, fft_size, hop = vibrato_spec
    trail = [(0.2, F0), (2.8, F0)]
    times, freqs = trackers.trace(mode, mag, sig[:, None], trail, fft_size, hop, SR,
                                  tolerance_st=1.0)
    assert len(times) == len(freqs)
    assert np.all(np.isfinite(freqs))
    check_tracked_freqs(times, freqs, speed)


def test_correlation_tracker_speed_shape(vibrato_spec):
    sig, speed, mag, fft_size, hop = vibrato_spec
    trail = [(0.2, F0), (2.8, F0)]
    times, freqs = trackers.trace("Correlation", mag, sig[:, None], trail,
                                  fft_size, hop, SR, tolerance_st=1.0)
    # the correlation tracker recovers the *shape* of the wobble: correlation
    # of its speed curve with the true one should be strong
    idx = (times * SR).astype(int)
    ok = (idx > SR // 4) & (idx < len(speed) - SR // 4)
    a = np.log2(freqs[ok]) - np.mean(np.log2(freqs[ok]))
    b = np.log2(speed[idx[ok]])
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


def test_freehand_returns_trail(vibrato_spec):
    sig, speed, mag, fft_size, hop = vibrato_spec
    trail = [(0.5, 1900.0), (1.5, 2100.0)]
    times, freqs = trackers.trace("Freehand Draw", mag, sig[:, None], trail,
                                  fft_size, hop, SR)
    assert freqs[0] == pytest.approx(1900, rel=0.01)
    assert freqs[-1] == pytest.approx(2100, rel=0.01)


def test_fit_sin_recovers_parameters():
    t = np.linspace(0, 10, 2000)
    y = 0.03 * np.sin(2 * np.pi * 0.55 * t + 1.0) + 0.5
    res = trackers.fit_sin(t, y)
    assert res["freq"] == pytest.approx(0.55, abs=1e-3)
    assert abs(res["amp"]) == pytest.approx(0.03, rel=1e-2)
    assert res["offset"] == pytest.approx(0.5, abs=1e-3)


def test_trace_sine_reg():
    times = np.linspace(0, 10, 2000)
    speeds = 0.02 * np.sin(2 * np.pi * (33.333 / 60) * times + 0.3)
    curve = np.stack([times, speeds], axis=-1)
    amp, omega, phase, offset = trackers.trace_sine_reg(curve, 1.0, 9.0, rpm=33.333)
    assert abs(amp) == pytest.approx(0.02, rel=0.02)
    assert omega / (2 * np.pi) == pytest.approx(33.333 / 60, rel=0.01)


def test_interp_nans():
    y = np.array([1.0, np.nan, 3.0, np.nan, np.nan, 6.0])
    trackers.interp_nans(y)
    np.testing.assert_allclose(y, [1, 2, 3, 4, 5, 6])
