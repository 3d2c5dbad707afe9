"""Pan matching (reference tool: pypan_gui.py).

Mark time-frequency boxes, measure the L/R energy ratio inside each
(pypan_gui.py:79-104), interpolate a pan factor curve, and rescale channel 1
(pypan_gui.py:53-58).
"""

from __future__ import annotations

import numpy as np

from ..models import markers as mk
from ..ops import fourier
from ..utils import audio_io

__all__ = ["measure_pan", "apply_pan", "pan_file"]


def measure_pan(signal, sr, a, b, fft_size=1024, fft_overlap=4, spectra=None):
    """L/R magnitude ratio inside box (a, b) -> PanSample (pypan_gui.py:79-104)."""
    hop = fft_size // fft_overlap
    if spectra is None:
        L = np.abs(np.asarray(fourier.stft(signal[:, 0], fft_size, hop))) + 1e-7
        R = np.abs(np.asarray(fourier.stft(signal[:, 1], fft_size, hop))) + 1e-7
    else:
        L, R = spectra
    num_bins, last_fft_i = L.shape
    t0, t1 = sorted((a[0], b[0]))
    freqs = sorted((a[1], b[1]))
    fL = max(freqs[0], 1)
    fU = min(freqs[1], sr // 2 - 1)
    first_fft_i = max(0, int(t0 * sr / hop)) if t0 else 0
    last_fft_i = min(last_fft_i, int(t1 * sr / hop)) if t1 else last_fft_i

    def freq2bin(f):
        return max(1, min(num_bins - 3, int(round(f * fft_size / sr))))

    bL, bU = freq2bin(fL), freq2bin(fU)
    fac = float(np.nanmean(L[bL:bU, first_fft_i:last_fft_i] / R[bL:bU, first_fft_i:last_fft_i]))
    return mk.PanSample(a, b, fac)


def apply_pan(signal, sr, pan_samples, hop=256):
    """Interpolate the pan curve and rescale channel 1 (pypan_gui.py:53-58).

    Returns the mono output ``signal[:, 1] * pan_factor``.
    """
    duration = len(signal) / sr
    line = mk.PanLine(sr, hop, duration)
    data = line.update(list(pan_samples))
    af = np.interp(np.arange(len(signal[:, 0])), data[:, 0] * sr, data[:, 1])
    return signal[:, 1] * af


def pan_file(file_path, pan_samples, hop=256):
    signal, sr, num_channels = audio_io.read_file(file_path)
    out = apply_pan(signal, sr, pan_samples, hop)
    return audio_io.write_file(file_path, out, sr, 1)
