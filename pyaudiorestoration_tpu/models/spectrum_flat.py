"""Averaged spectra of audio files (reference: util/spectrum_flat.py)."""

from __future__ import annotations

import logging

import numpy as np

from ..ops import fourier, units
from ..utils import audio_io

channel_map = {"L": (0,), "R": (1,), "L+R": (0, 1), "Mean": (0, 1)}


def spectra_from_audio(filename, fft_size=4096, hop=256, channel_mode="L",
                       temporal_mean=True, stream="auto",
                       stream_threshold_bytes: int = 1 << 30):
    """Per-channel averaged dB spectra (spectrum_flat.py:10-28).

    For temporal means of big files the spectrum accumulates blockwise
    (frame-exact global grid, float64 partial sums) so difeq-style analyses
    never decode the whole recording (``stream`` True/False/"auto")."""
    from ..utils import streaming

    if temporal_mean and streaming.should_stream(filename, stream,
                                                 stream_threshold_bytes):
        return _spectra_from_audio_streamed(filename, fft_size, hop,
                                            channel_mode)
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


def _spectra_from_audio_streamed(filename, fft_size, hop, channel_mode,
                                 block_frames: int = 4096):
    """Blockwise temporal-mean dB spectra on the exact global frame grid."""
    import jax.numpy as jnp

    from ..utils import streaming

    pad = fft_size // 2
    with audio_io.StreamReader(filename) as r:
        sr = r.sample_rate
        n = int(r.frames)
        num_channels = r.channels
        chans = []
        for channel in channel_map[channel_mode]:
            if channel == num_channels:
                logging.warning(
                    "not enough channels for L/R comparison - fallback to mono")
                break
            chans.append(channel)
        T = (n + 2 * pad - fft_size) // hop + 1
        acc = np.zeros((len(chans), fft_size // 2 + 1), np.float64)
        for t0 in range(0, T, block_frames):
            t1 = min(T, t0 + block_frames)
            a = t0 * hop - pad
            b = (t1 - 1) * hop - pad + fft_size
            span = streaming.virtual_read(r, a, b, 0, chans)
            db = units.to_dB(np.asarray(fourier.get_mag(
                jnp.asarray(span.T), fft_size, hop, "hann", center=False)))
            acc += db.sum(axis=-1)
        spectra = [row / T for row in acc]
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
