"""adapt_band wired into the Peak tracker (VERDICT round 1, Weak #2) and the
first-party Levenberg-Marquardt sine fit (Weak #5).

Parity model: a straight sequential numpy transcription of the adaptive
loop (adapt_band per frame + emphasized peak pick) is compared against the
lax.scan implementation, mirroring how round 1 anchored the peak tracker.
"""

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import trackers

SR = 44100
FFT = 2048
HOP = 512


def _wobble_spectrum(f_start=1000.0, wobble=0.04, n_frames=120, rate=0.9):
    """Synthetic magnitude spectrogram with one wandering tone."""
    num_bins = FFT // 2 + 1
    t = np.arange(n_frames) * HOP / SR
    freq = f_start * 2 ** (wobble * np.sin(2 * np.pi * rate * t))
    bins = freq * FFT / SR
    grid = np.arange(num_bins)[:, None]
    mag = np.exp(-0.5 * ((grid - bins[None, :]) / 1.2) ** 2).astype(np.float32)
    return mag + 1e-6, freq


def _sequential_transcription(spec, seed_freq, tolerance_st, mode):
    """Literal per-frame loop over trackers.adapt_band (the reference's
    sequential decision ladder, wow_detection.py:142-187)."""
    num_bins, T = spec.shape
    freq_2_bin = FFT / SR
    freqs = [float(seed_freq)]
    out = np.empty(T, dtype=np.float32)
    for t in range(T):
        i = len(freqs) - 1
        NL, NU, window, _ = trackers.adapt_band(
            freqs, num_bins, freq_2_bin, tolerance_st, mode, i)
        frame = spec[:, t]
        scores = frame[NL:NU] * window
        peak = int(np.argmax(scores)) + NL
        p = min(max(peak, 1), num_bins - 2)
        fm1, f0, fp1 = frame[p - 1], frame[p], frame[p + 1]
        denom = (fm1 - 2 * f0 + fp1) or 1e-12
        refined = p + 0.5 * (fm1 - fp1) / denom
        is_peak = (fm1 < f0) and (f0 > fp1) and (peak == p)
        out[t] = (refined if is_peak else float(peak)) / FFT * SR
        freqs.append(float(out[t]))
    return out


@pytest.mark.parametrize("mode", ["Constant", "Linear", "Average"])
def test_adaptive_scan_matches_sequential_transcription(mode):
    spec, _ = _wobble_spectrum()
    duration = spec.shape[1] * HOP / SR
    trail = [(0.0, 1000.0), (duration, 1000.0)]
    times, got = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                     FFT, HOP, SR, tolerance_st=2.0,
                                     adaptation_mode=mode)
    want = _sequential_transcription(spec, 1000.0, 2.0, mode)
    np.testing.assert_allclose(got, want[:len(got)], rtol=2e-4)


def test_adaptation_mode_changes_output():
    spec, _ = _wobble_spectrum(wobble=0.08)
    duration = spec.shape[1] * HOP / SR
    # trail deliberately drawn off-pitch: the static band misses the tone's
    # excursions while the adaptive band follows them
    trail = [(0.0, 1000.0), (duration, 1000.0)]
    _, static = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                    FFT, HOP, SR, tolerance_st=0.5,
                                    adaptation_mode="None")
    _, adaptive = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                      FFT, HOP, SR, tolerance_st=0.5,
                                      adaptation_mode="Average")
    assert not np.allclose(static, adaptive)


def test_adaptive_tracks_wide_wobble_better_than_static():
    spec, freq_true = _wobble_spectrum(wobble=0.10)
    duration = spec.shape[1] * HOP / SR
    trail = [(0.0, 1000.0), (duration, 1000.0)]
    _, static = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                    FFT, HOP, SR, tolerance_st=0.5,
                                    adaptation_mode="None")
    _, adaptive = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                      FFT, HOP, SR, tolerance_st=0.5,
                                      adaptation_mode="Constant")
    n = min(len(static), len(freq_true))
    err_static = np.abs(np.log2(static[:n] / freq_true[:n])).mean()
    err_adapt = np.abs(np.log2(adaptive[:n] / freq_true[:n])).mean()
    assert err_adapt < err_static


# ---- first-party Levenberg-Marquardt sine fit --------------------------------

def test_fit_sin_matches_scipy_curve_fit():
    import scipy.optimize

    rng = np.random.default_rng(7)
    tt = np.linspace(0, 3.0, 400)
    yy = 0.02 * np.sin(2 * np.pi * 4.2 * tt + 0.7) + 1.0
    yy += 1e-4 * rng.standard_normal(len(tt))
    res = trackers.fit_sin(tt, yy)

    def sinfunc(t, A, w, p, c):
        return A * np.sin(w * t + p) + c

    guess = res["rawres"][0]
    popt, _ = scipy.optimize.curve_fit(sinfunc, tt, yy, p0=guess)
    # compare the fitted curves (phase wraps / amp-sign conventions differ)
    np.testing.assert_allclose(res["fitfunc"](tt), sinfunc(tt, *popt), atol=1e-6)
    assert abs(abs(res["amp"]) - abs(popt[0])) < 1e-6
    assert abs(res["omega"] - popt[1]) < 1e-6
    assert abs(res["offset"] - popt[3]) < 1e-6


def test_fit_sin_assumed_freq_and_no_scipy_optimize_import():
    import pyaudiorestoration_tpu.models.trackers as trk
    import inspect

    src = inspect.getsource(trk)
    assert "scipy.optimize" not in src
    tt = np.linspace(0, 2.0, 300)
    yy = 0.5 * np.sin(2 * np.pi * 3.0 * tt + 0.3) - 0.1
    res = trackers.fit_sin(tt, yy, assumed_freq=3.0)
    assert abs(res["freq"] - 3.0) < 1e-3
    assert abs(abs(res["amp"]) - 0.5) < 1e-3


def test_trace_sine_reg_end_to_end():
    times = np.arange(0, 4.0, 0.01)
    speeds = 1.0 + 0.01 * np.sin(2 * np.pi * 0.55 * times + 1.1)
    curve = np.stack([times, speeds], axis=1)
    amp, omega, phase, offset = trackers.trace_sine_reg(curve, 0.0, 4.0, rpm=33.0)
    assert abs(abs(amp) - 0.01) < 1e-4
    assert abs(omega - 2 * np.pi * 0.55) < 1e-2


def test_adaptive_scan_holds_on_collapsed_band():
    """A band prediction that collapses to NU <= NL must hold the previous
    frequency instead of emitting 0 Hz and poisoning the history."""
    num_bins = FFT // 2 + 1
    spec, _ = _wobble_spectrum()
    # force the history toward a frequency whose band rounds to [1, 1):
    # seed at ~5 Hz (bin 0.23) -> NL = NU = 1 for every frame
    duration = spec.shape[1] * HOP / SR
    trail = [(0.0, 5.0), (duration, 5.0)]
    times, out = trackers.trace_peak(spec, np.zeros((1000, 1)), trail,
                                     FFT, HOP, SR, tolerance_st=0.1,
                                     adaptation_mode="Linear")
    assert np.all(np.isfinite(out))
    assert np.all(out > 0.0)
    # held: the trace never runs away to 0 Hz nor explodes
    assert np.all(out < SR / 2)
