"""Harmonic / percussive / residual separation batch tool
(reference: experiments/hpss_gui.py:109-149).

Writes ``_H``, ``_P`` and (for margin > 1) ``_R`` component files.
"""

from __future__ import annotations

import numpy as np

from ..ops import decompose, fourier
from ..utils import audio_io

__all__ = ["separate", "separate_file"]


def separate(signal, sr, fft_size=2048, fft_overlap=4, kernel_size=31, power=2.0,
             margin=1.0, channels=None):
    """HPSS of every channel; returns (harmonic, percussive, residual) arrays
    shaped like the selected-channel signal (residual is zeros at margin 1)."""
    hop = fft_size // fft_overlap
    channels = list(channels) if channels else list(range(signal.shape[1]))
    n = len(signal)
    padded = np.asarray(fourier.fix_length(signal, n + fft_size // 2, axis=0))
    outs = [np.empty((n, len(channels)), np.float32) for _ in range(3)]
    for out_c, channel in enumerate(channels):
        spec = fourier.stft(padded[:, channel], n_fft=fft_size, step=hop)
        H, P = decompose.hpss(spec, kernel_size=kernel_size, power=power, margin=margin)
        R = spec - H - P
        for arr, comp in zip(outs, (H, P, R)):
            arr[:, out_c] = np.asarray(fourier.istft(comp, length=n, hop_length=hop))
    return outs


def separate_file(file_path, fft_size=2048, fft_overlap=4, kernel_size=31,
                  power=2.0, margin=1.0, channels=None, suffix="",
                  stream="auto", stream_threshold_bytes: int = 1 << 30):
    """Write the separated components next to the input. Returns paths.

    ``stream``: True forces the blockwise larger-than-memory path (one pass,
    all components written together); "auto" streams when the decoded size
    exceeds ``stream_threshold_bytes``."""
    from ..utils import streaming

    if streaming.should_stream(file_path, stream, stream_threshold_bytes):
        return _separate_file_streamed(file_path, fft_size, fft_overlap,
                                       kernel_size, power, margin, channels,
                                       suffix)
    signal, sr, num_channels = audio_io.read_file(file_path)
    H, P, R = separate(signal, sr, fft_size, fft_overlap, kernel_size, power,
                       margin, channels)
    paths = [audio_io.write_file(file_path, H, sr, H.shape[1], "_H" + suffix),
             audio_io.write_file(file_path, P, sr, P.shape[1], "_P" + suffix)]
    if margin > 1.0:
        paths.append(audio_io.write_file(file_path, R, sr, R.shape[1],
                                         "_R" + suffix))
    return paths


def _separate_file_streamed(file_path, fft_size, fft_overlap, kernel_size,
                            power, margin, channels, suffix=""):
    """Streamed HPSS: the harmonic median filter runs along time, so each
    block carries a ``kernel_size//2``-frame mask halo
    (utils/streaming.stream_masked_stft's ``mask_halo_frames``); H/P(/R)
    components stream to their files in ONE pass over the input."""
    import os

    import jax
    import jax.numpy as jnp

    from ..utils import streaming

    hop = fft_size // fft_overlap
    with audio_io.StreamReader(file_path) as r:
        chans = list(channels) if channels else list(range(r.channels))

    def make_fac(spec, t_lo):
        mh, mp = jax.vmap(lambda s: decompose.hpss(
            s, kernel_size=kernel_size, power=power, margin=margin,
            mask=True))(jnp.abs(spec))
        facs = [mh, mp]
        if margin > 1.0:
            facs.append(1.0 - mh - mp)
        return facs

    base, _ = os.path.splitext(file_path)
    ext = audio_io.out_ext()
    out_paths = [f"{base}_H{suffix}.{ext}", f"{base}_P{suffix}.{ext}"]
    if margin > 1.0:
        out_paths.append(f"{base}_R{suffix}.{ext}")
    return streaming.stream_masked_stft(
        file_path, out_paths, make_fac, fft_size, hop, chans,
        mask_halo_frames=kernel_size // 2 + 1)
