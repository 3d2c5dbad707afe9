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
                smoothing_s=0.11, transition=0, order=1, suffix="_decompressed",
                stream="auto", stream_threshold_bytes: int = 1 << 30):
    """One-call spectral decompression of a file (the tool's export path).

    ``stream``: True forces the blockwise larger-than-memory path; "auto"
    streams when the decoded size exceeds ``stream_threshold_bytes``."""
    from ..utils import streaming

    if streaming.should_stream(file_src, stream, stream_threshold_bytes):
        return _expand_file_streamed(file_src, channel_mode, fft_size,
                                     band_lower, band_upper, clip_lower,
                                     clip_upper, smoothing_s, transition,
                                     order, suffix)
    t, vol_curves, sr = envelope_curves(file_src, channel_mode, fft_size,
                                        band_lower=band_lower, band_upper=band_upper,
                                        smoothing_s=smoothing_s)
    signal, sr, num_channels = audio_io.read_file(file_src)
    out = expand(signal, sr, t, vol_curves, clip_lower, clip_upper, transition, order)
    return audio_io.write_file(file_src, out, sr, num_channels, suffix)


def _expand_file_streamed(file_src, channel_mode, fft_size, band_lower,
                          band_upper, clip_lower, clip_upper, smoothing_s,
                          transition, order, suffix,
                          block_frames: int = 16384, halo_seconds: float = 0.5):
    """Larger-than-memory expansion in three streamed passes: frame-exact
    band envelopes (the only whole-recording state, ~8 bytes/frame/channel),
    blockwise gain + optional HP/LP split with an IIR halo, then the global
    peak normalization applied while copying the temp output into place."""
    import os

    import jax.numpy as jnp

    from ..models.spectrum_flat import channel_map
    from ..ops import fourier
    from ..utils import streaming

    fft_hop = fft_size // 8
    pad = fft_size // 2
    with audio_io.StreamReader(file_src) as r:
        sr = r.sample_rate
        n = int(r.frames)
        num_channels = r.channels
        chans = [c for c in channel_map[channel_mode] if c < num_channels] or [0]
        T = (n + 2 * pad - fft_size) // fft_hop + 1
        num_bins = fft_size // 2 + 1

        def freq2bin(f):
            return max(1, min(num_bins - 3, int(round(f * fft_size / sr))))

        bL, bU = freq2bin(band_lower), freq2bin(band_upper)
        vols = np.empty((len(chans), T), np.float64)
        # ---- pass 1: frame-exact band envelopes, blockwise
        for t0 in range(0, T, block_frames):
            t1 = min(T, t0 + block_frames)
            a = t0 * fft_hop - pad
            b = (t1 - 1) * fft_hop - pad + fft_size
            span = streaming.virtual_read(r, a, b, 0, chans)
            db = units.to_dB(np.asarray(fourier.get_mag(
                jnp.asarray(span.T), fft_size, fft_hop, "hann", center=False)))
            vols[:, t0:t1] = np.nanmean(db[:, bL:bU, :], axis=1)
        smoothing = filters.make_odd(int(smoothing_s * sr / fft_hop))
        vol_curves = [uniform_filter1d(v, size=smoothing, mode="nearest")
                      for v in vols]
        if channel_mode == "Mean":
            vol_curves = [np.mean(vol_curves, axis=0)]
        t_frames = np.arange(T, dtype=np.float64) * fft_hop

        # ---- pass 2: blockwise gain (+ split filters), peak tracked
        base, _ = os.path.splitext(file_src)
        out_path = f"{base}{suffix}.{audio_io.out_ext()}"
        # the unnormalized intermediate stays float32 WAV (it is re-read and
        # scaled in pass 3; quantizing it would double the rounding)
        tmp_path = out_path + ".unnorm.tmp"
        halo = int(halo_seconds * sr)
        blk = block_frames * fft_hop
        peak = 0.0
        facs = []
        for channel_i in range(num_channels):
            dBs = vol_curves[channel_i] if channel_i < len(vol_curves) else vol_curves[-1]
            facs.append(np.asarray(units.to_fac(
                clip_upper - np.clip(dBs, clip_lower, clip_upper))))
        with audio_io.StreamWriter(tmp_path, sr, num_channels) as w:
            for s0 in range(0, n, blk):
                s1 = min(n, s0 + blk)
                lo = max(0, s0 - halo)
                hi = min(n, s1 + halo)
                sig = r.read(lo, hi - lo).astype(np.float64)  # (len, C)
                idx = np.arange(lo, hi, dtype=np.float64)
                for channel_i in range(num_channels):
                    fac = np.interp(idx, t_frames, facs[channel_i])
                    boosted = sig[:, channel_i] * fac
                    if transition:
                        # host on purpose: this streamed block loop is
                        # host-resident either side of the filter (mmap read
                        # -> f64 gain math -> StreamWriter); keeping the
                        # split filters on scipy avoids per-block device
                        # transfers and bit-matches the in-memory f64 path
                        lp = np.asarray(filters.butter_bandpass_filter(
                            sig[:, channel_i], 0, transition, sr, order=order,
                            backend="host"))
                        hp = np.asarray(filters.butter_bandpass_filter(
                            boosted, transition, sr // 2, sr, order=order,
                            backend="host"))
                        sig[:, channel_i] = lp + hp
                    else:
                        sig[:, channel_i] = boosted
                out = sig[s0 - lo:(s0 - lo) + (s1 - s0)].astype(np.float32)
                peak = max(peak, float(np.abs(out).max()) if out.size else 0.0)
                w.write(out)
        # ---- pass 3: normalize while copying into place
        scale = 1.0 / peak if peak > 0 else 1.0
        with audio_io.StreamReader(tmp_path) as rt, \
                audio_io.open_writer(out_path, sr, num_channels) as w:
            nt_ = int(rt.frames)
            for s0 in range(0, nt_, blk):
                s1 = min(nt_, s0 + blk)
                w.write(rt.read(s0, s1 - s0) * np.float32(scale))
        os.remove(tmp_path)
    import logging

    logging.info(f"Wrote {out_path}")
    return out_path
