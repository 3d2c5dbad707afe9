"""Averaged spectra of audio files (reference: util/spectrum_flat.py)."""

from __future__ import annotations

import logging

import numpy as np

from ..ops import fourier, units
from ..utils import audio_io

channel_map = {"L": (0,), "R": (1,), "L+R": (0, 1), "Mean": (0, 1)}


def spectra_from_audio(filename, fft_size=4096, hop=256, channel_mode="L", temporal_mean=True):
    """Per-channel averaged dB spectra (spectrum_flat.py:10-28)."""
    signal, sr, num_channels = audio_io.read_file(filename)
    spectra = []
    for channel in channel_map[channel_mode]:
        if channel == num_channels:
            logging.warning("not enough channels for L/R comparison - fallback to mono")
            break
        imdata = units.to_dB(fourier.get_mag(signal[:, channel], fft_size, hop, "hann"))
        spec = np.array(imdata)
        if temporal_mean:
            spec = np.mean(spec, axis=1)
        spectra.append(spec)
    if channel_mode == "Mean":
        spectra = [np.mean(spectra, axis=0)]
    return spectra, sr


def spectrum_from_audio(filename, fft_size=4096, hop=256, channel_mode="L", temporal_mean=True):
    spectra, sr = spectra_from_audio(filename, fft_size, hop, channel_mode, temporal_mean)
    if len(spectra) > 1:
        return np.mean(spectra, axis=0), sr
    return spectra[0], sr


def spectrum_from_audio_stereo(filename, fft_size=4096, hop=256, channel_mode="L", temporal_mean=True):
    spectra, sr = spectra_from_audio(filename, fft_size, hop, channel_mode, temporal_mean)
    if len(spectra) < 2:
        spectra.append(spectra[0])
    return spectra, sr
