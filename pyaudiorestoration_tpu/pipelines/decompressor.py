"""Dynamics matching / decompression against a reference master
(reference: experiments/decompressor_cmd.py).

Windowed-RMS envelopes of source and reference (band-passed), log-domain
level matching, optional per-window xcorr re-sync, gain factors clipped to
[0, 2], interpolated to sample rate and applied.

TPU-first: the windowed RMS is one framed reduction on device; the optional
sync pass is a batched xcorr.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import uniform_filter1d

from ..ops import correlation, filters
from ..utils import audio_io

__all__ = ["windowed_rms", "match_dynamics", "decompress_file"]


@functools.partial(jax.jit, static_argnames=("hop", "sz"))
def _windowed_rms_device(x, hop: int, sz: int):
    from ..ops.fourier import frame_signal

    n_win = -(-x.shape[0] // hop)  # ceil, matching the reference's range()
    pad = (n_win - 1) * hop + sz - x.shape[0]
    xp = jnp.pad(x, (0, max(0, pad)))
    frames = frame_signal(xp, sz, hop, center=False)[:n_win]
    i0 = jax.lax.broadcasted_iota(jnp.int32, (n_win, sz), 0) * hop
    i1 = jax.lax.broadcasted_iota(jnp.int32, (n_win, sz), 1)
    mask = (i0 + i1) < x.shape[0]
    # the reference's trailing windows are shorter: mean over valid samples
    count = mask.sum(axis=1)
    return jnp.sqrt(jnp.sum(frames * frames * mask, axis=1) / count)


def windowed_rms(signal, hop=32, sz=512):
    """RMS per hop window (decompressor_cmd.py:16-23)."""
    return np.asarray(_windowed_rms_device(jnp.asarray(signal, jnp.float32), hop, sz))


def match_dynamics(signal_src, signal_ref, sr, hop=32, sz=512, corr_sz=4096,
                   smoothing_sec=0.08, lower=80.0, upper=9000.0, do_sync=False):
    """Per-channel gain curve transferring the reference's dynamics onto the
    source (decompressor_cmd.py:26-190). Returns the processed source."""
    n = min(len(signal_src), len(signal_ref))
    signal_src = np.asarray(signal_src[:n], np.float32)
    signal_ref = np.asarray(signal_ref[:n], np.float32)
    if signal_src.ndim == 1:
        signal_src = signal_src[:, None]
    if signal_ref.ndim == 1:
        signal_ref = signal_ref[:, None]
    num_channels = signal_src.shape[1]
    corr_hop = corr_sz // 2
    smooth_n = max(1, int(sr * smoothing_sec / hop))
    hann = np.hanning(corr_sz)
    fac_interp = np.empty(signal_src.shape)
    for channel in range(num_channels):
        src_c = np.asarray(filters.butter_bandpass_filter(
            signal_src[:, channel], lower, upper, sr, order=3, backend="host"))
        ref_c = np.asarray(filters.butter_bandpass_filter(
            signal_ref[:, channel], lower, upper, sr, order=3, backend="host"))
        rms_src = np.log10(np.clip(windowed_rms(src_c, hop, sz), 0.0005, None))
        rms_ref = np.log10(np.clip(windowed_rms(ref_c, hop, sz), 0.0005, None))
        rms_ref = rms_ref - np.mean(rms_ref) + np.mean(rms_src)
        rms_src = uniform_filter1d(rms_src, size=smooth_n)
        rms_ref = uniform_filter1d(rms_ref, size=smooth_n)
        if do_sync:
            # windowed re-alignment of the source envelope (batched xcorr)
            src_p = np.pad(rms_src, (corr_hop, corr_hop * 2), "edge")
            ref_p = np.pad(rms_ref, (corr_hop, corr_hop * 2), "edge")
            xs = np.arange(corr_hop, len(rms_src), corr_hop)
            ref_wins = np.stack([ref_p[x - corr_hop:x + corr_hop] * hann for x in xs])
            src_wins = np.stack([src_p[x - corr_hop:x + corr_hop] * hann for x in xs])
            aligned = np.zeros(src_p.shape)
            delays, corrs = correlation.find_delay_batch(ref_wins, src_wins)
            last = 0
            for x, win, d, c in zip(xs, src_wins, np.asarray(delays), np.asarray(corrs)):
                offset = int(round(float(d))) if float(c) > 0.1 else last
                last = offset
                aligned[x - corr_hop:x + corr_hop] += np.roll(win, offset)
            rms_src_aligned = aligned[corr_hop:-corr_hop * 2]
        else:
            rms_src_aligned = rms_src
        fac = np.power(10, rms_ref) / np.power(10, rms_src_aligned)
        np.clip(fac, 0, 2, fac)
        np.nan_to_num(fac, copy=False)
        fac_interp[:, channel] = np.interp(
            np.arange(n), np.arange(0, n, hop)[:len(fac)], fac[: len(range(0, n, hop))])
    fac_interp = np.mean(fac_interp, axis=-1, keepdims=True)
    return (signal_src * fac_interp).astype(np.float32)


def decompress_file(src_path, ref_path, **kwargs):
    """Write ``<src>decompressed.wav`` with the reference's dynamics."""
    src, sr, _ = audio_io.read_file(src_path)
    ref, sr2, _ = audio_io.read_file(ref_path)
    if sr != sr2:
        raise ValueError("Both files must have the same sample rate")
    out = match_dynamics(src, ref, sr, **kwargs)
    return audio_io.write_file(src_path, out, sr, out.shape[1], suffix="_decompressed")
