"""Strict parity tests against sequential transcriptions of the reference's
per-frame algorithms (wow_detection.py), on random spectrograms."""

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import trackers
from pyaudiorestoration_tpu.utils import project


def seq_peak_tracker(spectrum, trail_freqs, fft_size, sr, tolerance_st):
    """Direct transcription of Track band logic + PeakTracker.trace
    (wow_detection.py:97-139, 294-304)."""
    num_bins = spectrum.shape[0]
    tolerance = tolerance_st / 12
    min_bins = 4

    def freq_2_bin(f):
        return max(1, min(num_bins - 1, int(round(f * fft_size / sr))))

    def bin_2_freq(b):
        return b / fft_size * sr

    out = np.empty(len(trail_freqs))
    for i, raw_freq in enumerate(trail_freqs):
        logf = np.log2(raw_freq)
        fL = max(1.0, 2 ** (logf - tolerance))
        fU = min(sr / 2, 2 ** (logf + tolerance))
        NL, NU = freq_2_bin(fL), freq_2_bin(fU)
        while NU - NL < min_bins:
            NL -= 1
            NU += 1
        frame = spectrum[:, i]
        peak = NL + int(np.argmax(frame[NL:NU]))
        if frame[peak - 1] < frame[peak] > frame[peak + 1]:
            denom = frame[peak - 1] - 2 * frame[peak] + frame[peak + 1]
            xv = 0.5 * (frame[peak - 1] - frame[peak + 1]) / denom + peak
            out[i] = bin_2_freq(xv)
        else:
            out[i] = bin_2_freq(peak)
    return out


@pytest.mark.parametrize("tolerance_st", [0.3, 1.0, 4.0])
def test_peak_tracker_matches_sequential_transcription(rng, tolerance_st):
    fft_size, sr = 4096, 44100
    num_bins = fft_size // 2 + 1
    T = 64
    spectrum = np.abs(rng.standard_normal((num_bins, T))).astype(np.float32)
    hop = 512
    # drawn trail wandering around 2 kHz
    trail_t = np.array([0.0, T * hop / sr])
    trail_f = np.array([2000.0, 2400.0])
    trail = list(zip(trail_t, trail_f))
    times, freqs = trackers.trace("Peak", spectrum, np.zeros((T * hop, 1)), trail,
                                  fft_size, hop, sr, tolerance_st)
    trail_freqs = np.interp(times, trail_t, trail_f)
    ref = seq_peak_tracker(spectrum[:, :len(times)], trail_freqs, fft_size, sr,
                           tolerance_st)
    np.testing.assert_allclose(freqs, ref, rtol=1e-5)


def test_tapesync_legacy_markers_key(samples_dir):
    """rhythm.tapesync uses the pre-rename 'markers' key for lags."""
    proj = project.Project.load(str(samples_dir / "rhythm.tapesync"))
    lags = proj.marker_list("lags")
    assert len(lags) == 2
    assert lags[0].d == pytest.approx(0.0238717, abs=1e-5)
    assert proj.settings["resampling_mode"] == "Sinc"
    assert proj.fft_size == 128


def test_drop_project_settings(samples_dir):
    proj = project.Project.load(str(samples_dir / "dropouts_sample.drop"))
    assert "before_after" in proj.settings
    drops = proj.marker_list("dropouts")
    widths = [d.width for d in drops]
    assert all(w > 0 for w in widths)
