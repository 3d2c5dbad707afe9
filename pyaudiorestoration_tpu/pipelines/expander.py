"""Spectral expander / decompressor (reference tool: expander_gui.py).

Band-mean dB envelope -> clip range -> per-sample gain factor, with an
optional high/low split so only the highs are boosted
(expander_gui.py:116-142, 178-210).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter1d

from ..models.spectrum_flat import spectra_from_audio
from ..ops import filters, units
from ..utils import audio_io

__all__ = ["envelope_curves", "expand", "expand_file"]


def envelope_curves(file_src, channel_mode="L+R", fft_size=512, fft_hop=None,
                    band_lower=13000, band_upper=17000, smoothing_s=0.11):
    """Per-channel smoothed band-mean dB envelopes (expander_gui.py:116-142).

    Returns (t, vol_curves, sr): times per FFT frame + dB curve per channel.
    """
    fft_hop = fft_hop or fft_size // 8
    spectra, sr = spectra_from_audio(file_src, fft_size, fft_hop, channel_mode,
                                     temporal_mean=False)
    num_bins = spectra[0].shape[0]
    smoothing = filters.make_odd(int(smoothing_s * sr / fft_hop))

    def freq2bin(f):
        return max(1, min(num_bins - 3, int(round(f * fft_size / sr))))

    bL, bU = freq2bin(band_lower), freq2bin(band_upper)
    vol_curves = []
    for spectrum in spectra:
        dBs = np.nanmean(spectrum[bL:bU, :], axis=0)
        dBs = uniform_filter1d(dBs, size=smoothing, mode="nearest")
        vol_curves.append(dBs)
    t = np.arange(0, fft_hop * len(spectra[0][0]), fft_hop) / sr
    return t, vol_curves, sr


def expand(signal, sr, t, vol_curves, clip_lower=-120, clip_upper=-85,
           transition=0, order=1):
    """Apply the expansion gain to every channel (expander_gui.py:178-210).

    Returns the peak-normalized expanded signal.
    """
    signal = np.array(signal, dtype=np.float32)
    num_channels = signal.shape[1]
    for channel_i in range(num_channels):
        dBs = vol_curves[channel_i] if channel_i < len(vol_curves) else vol_curves[-1]
        clipped = np.clip(dBs, clip_lower, clip_upper)
        fac = units.to_fac(clip_upper - clipped)
        final_fac = np.interp(np.arange(len(signal)), t * sr, fac)
        boosted = signal[:, channel_i] * final_fac
        if transition:
            lp = np.asarray(filters.butter_bandpass_filter(
                signal[:, channel_i], 0, transition, sr, order=order))
            hp = np.asarray(filters.butter_bandpass_filter(
                boosted, transition, sr // 2, sr, order=order))
            signal[:, channel_i] = lp + hp
        else:
            signal[:, channel_i] = boosted
    return np.asarray(units.normalize(signal))


def expand_file(file_src, channel_mode="L+R", fft_size=512, band_lower=13000,
                band_upper=17000, clip_lower=-120, clip_upper=-85,
                smoothing_s=0.11, transition=0, order=1, suffix="_decompressed"):
    """One-call spectral decompression of a file (the tool's export path)."""
    t, vol_curves, sr = envelope_curves(file_src, channel_mode, fft_size,
                                        band_lower=band_lower, band_upper=band_upper,
                                        smoothing_s=smoothing_s)
    signal, sr, num_channels = audio_io.read_file(file_src)
    out = expand(signal, sr, t, vol_curves, clip_lower, clip_upper, transition, order)
    return audio_io.write_file(file_src, out, sr, num_channels, suffix)
