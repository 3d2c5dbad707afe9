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


def pan_file(file_path, pan_samples, hop=256, stream="auto",
             stream_threshold_bytes: int = 1 << 30):
    """``stream``: blockwise pan application for big files (the gain curve is
    frame-rate host data; channel 1 rescales sample-block by sample-block)."""
    import os

    from ..utils import streaming

    if streaming.should_stream(file_path, stream, stream_threshold_bytes):
        with audio_io.StreamReader(file_path) as r:
            sr = r.sample_rate
            n = int(r.frames)
            line = mk.PanLine(sr, hop, n / sr)
            data = line.update(list(pan_samples))
            base, _ = os.path.splitext(file_path)
            out_path = f"{base}_out.{audio_io.out_ext()}"
            blk = 1 << 22
            with audio_io.open_writer(out_path, sr, 1) as w:
                for s0 in range(0, n, blk):
                    s1 = min(n, s0 + blk)
                    buf = r.read(s0, s1 - s0)
                    af = np.interp(np.arange(s0, s1, dtype=np.float64),
                                   data[:, 0] * sr, data[:, 1])
                    w.write((buf[:, 1] * af).astype(np.float32)[:, None])
        return out_path
    signal, sr, num_channels = audio_io.read_file(file_path)
    out = apply_pan(signal, sr, pan_samples, hop)
    return audio_io.write_file(file_path, out, sr, 1)
