"""Dropout detection and healing.

Reference tools: dropout_healer_gui.py (interactive marking + auto-detect +
spectral-gain inpainting) and dropouts_gui.py (batch heuristic repair and
max/min mono folds).

The heal path builds a dB gain mask per dropout box (linear interpolation
between the mean spectra before/after the box, dropout_healer_gui.py:136-160)
on the host (markers are few), then applies it and inverts on the device.
"""

from __future__ import annotations

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..models import markers as mk
from ..ops import filters, fourier, units
from ..utils import audio_io

__all__ = ["detect_dropouts", "heal", "heal_file", "process_heuristic", "process_max_mono"]


def _time_2_frame(t, sr, hop):
    return int(t * sr / hop)


def _frame_2_time(f, sr, hop):
    return f / sr * hop


def _freq_2_bin(f, fft_size, sr):
    return max(1, min(fft_size // 2, int(round(f * fft_size / sr))))


def detect_dropouts(spectrum_db, sr, hop, fft_size, t0, t1, f_lower, f_upper,
                    width_ms=20.0, sensitivity=5.0, surrounding=0.5):
    """Auto-detect dropouts inside a time-frequency region
    (dropout_healer_gui.py:184-242).

    ``spectrum_db``: (bins, frames) dB magnitude.  Returns DropoutSample list.
    """
    frame_b = _time_2_frame(t0, sr, hop)
    frame_a = _time_2_frame(t1, sr, hop)
    bin_l = _freq_2_bin(f_lower, fft_size, sr)
    bin_u = _freq_2_bin(f_upper, fft_size, sr)
    vol = np.mean(spectrum_db[bin_l:bin_u, frame_b:frame_a], axis=0)
    base_half_width = width_ms / 1000 / 2
    frames_half_width = _time_2_frame(base_half_width, sr, hop)
    savgol_win = min(max(frames_half_width * 12, 7), max(len(vol) - 1, 2))
    vol_lt = scipy.signal.savgol_filter(vol, savgol_win, min(5, savgol_win - 1))
    st_win = min(max(frames_half_width, 7), max(len(vol) - 1, 2))
    vol_st = scipy.signal.savgol_filter(vol, st_win, min(5, st_win - 1))
    peaks, _ = scipy.signal.find_peaks(-vol, prominence=10.0 - sensitivity, rel_height=0.5)
    out = []
    for f_peak in peaks:
        half_width = base_half_width
        t_center = _frame_2_time(frame_b + f_peak, sr, hop)
        try:
            # refine width: parabola through the dropout vs the long-term curve
            f_qw = _time_2_frame(half_width / 4, sr, hop)
            xp = np.arange(f_peak - f_qw, f_peak + f_qw)
            coeff = np.polyfit(xp, vol_st[f_peak - f_qw:f_peak + f_qw], 2)
            parabola = np.poly1d(coeff)
            f_hw = _time_2_frame(half_width, sr, hop)
            xp = np.arange(f_peak - f_hw, f_peak + f_hw)
            fp = parabola(xp)
            f_int = scipy.signal.argrelmin(np.abs(fp - vol_lt[f_peak - f_hw:f_peak + f_hw]))[0]
            assert len(f_int) == 2
            half_width = _frame_2_time(f_int[1] - f_int[0], sr, hop)
        except Exception:
            logging.debug(f"Could not refine width at peak {f_peak}")
        out.append(mk.DropoutSample((t_center - half_width, f_lower),
                                    (t_center + half_width, f_upper), surrounding))
    return out


def heal(signal, sr, dropouts, fft_size=512, fft_overlap=16, channels=None):
    """Spectral-gain inpainting of dropout boxes (dropout_healer_gui.py:111-166).

    Returns the healed signal, same shape as input for the selected channels.
    """
    hop = fft_size // fft_overlap
    channels = list(channels) if channels else list(range(signal.shape[1]))
    n = len(signal)
    y_pad = np.asarray(fourier.fix_length(signal, n + fft_size // 2, axis=0))
    output = np.empty((n, len(channels)), dtype=signal.dtype)
    for out_c, channel in enumerate(channels):
        # keep the complex spectrogram on device; only the real magnitude
        # crosses to the host for the marker-driven gain-mask assembly
        spec = fourier.stft(y_pad[:, channel], n_fft=fft_size, step=hop)
        spec_db = units.to_dB(np.asarray(jnp.abs(spec) + 1e-7))
        gain_db_whole = np.zeros(spec.shape, dtype=float)
        for drop in dropouts:
            frame_b = _time_2_frame(drop.t - drop.width / 2, sr, hop)
            frame_a = _time_2_frame(drop.t + drop.width / 2, sr, hop)
            frame_surrounding = max(1, _time_2_frame(drop.width * drop.surrounding, sr, hop))
            bin_l = _freq_2_bin(drop.f - drop.height / 2, fft_size, sr)
            bin_u = _freq_2_bin(drop.f + drop.height / 2, fft_size, sr)
            if frame_a <= frame_b or bin_u <= bin_l:
                continue
            mag_before = np.mean(spec_db[bin_l:bin_u, max(0, frame_b - frame_surrounding):frame_b], axis=1)
            mag_after = np.mean(spec_db[bin_l:bin_u, frame_a:frame_a + frame_surrounding], axis=1)
            # linear interpolation between the two mean spectra across frames
            w = np.linspace(0.0, 1.0, num=frame_a - frame_b)[None, :]
            fp_db = mag_before[:, None] * (1 - w) + mag_after[:, None] * w
            gain_db = fp_db - spec_db[bin_l:bin_u, frame_b:frame_a]
            gain_db = np.clip(gain_db, gain_db_whole[bin_l:bin_u, frame_b:frame_a], 255)
            gain_db_whole[bin_l:bin_u, frame_b:frame_a] = gain_db
        spec = spec * jnp.asarray(units.to_fac(gain_db_whole).astype(np.float32))
        output[:, out_c] = np.asarray(fourier.istft(spec, length=n, hop_length=hop))
    return output


def heal_file(file_path, dropouts, fft_size=512, fft_overlap=16, channels=None,
              suffix=""):
    """Heal a file and write ``<name>_drops<suffix>.wav``."""
    signal, sr, num_channels = audio_io.read_file(file_path)
    channels = list(channels) if channels else list(range(num_channels))
    output = heal(signal, sr, dropouts, fft_size, fft_overlap, channels)
    return audio_io.write_file(file_path, output, sr, len(channels),
                               suffix=f"_drops{suffix}")


def _pairwise(iterable):
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


def process_heuristic(file_path, fft_size=1024, fft_overlap=4, max_width=0.02,
                      max_slope=0.5, num_bands=12, bottom_freedom=2.0,
                      f_lower=3000.0, f_upper=12000.0, suffix="",
                      filter_backend="device"):
    """Batch heuristic dropout repair over log-spaced bands
    (dropouts_gui.py:241-323): per band, find volume valleys, gate on slope,
    patch the band-passed gain difference back in.

    ``filter_backend="host"`` runs the band-pass cascade through scipy in
    float64 for bit parity with the reference (the device scan IIR matches
    to ~55 dB SNR per pass, which compounds over the band cascade).
    """
    hop = fft_size // fft_overlap
    signal, sr, num_channels = audio_io.read_file(file_path)
    # python ints, NOT the reference's uint16 dtype (dropouts_gui.py:253):
    # under NumPy 2's NEP-50 promotion `uint16_band * fft_size` wraps mod
    # 65536 and corrupts every bin edge
    bands = [int(b) for b in np.logspace(np.log2(f_lower), np.log2(f_upper),
                                         num=num_bands, endpoint=True, base=2)]
    band_pairs = list(reversed(list(_pairwise(bands))))
    d = int(max_width / 1.5 * sr / hop)
    n = len(signal)

    # spectrograms for ALL channels in one device call; dB download once
    imdata_all = units.to_dB(np.asarray(
        fourier.get_mag(signal.T, fft_size, hop, "hann")))  # (C, bins, T)
    T = imdata_all.shape[-1]

    # host control plane (frame-rate sized): valley peaks + slope gate +
    # the sequential bottom_freedom clip chain per channel
    fac_all = np.empty((num_channels, len(band_pairs), T))
    for channel in range(num_channels):
        imdata = imdata_all[channel]
        correction_fac = np.ones(T) * 1000
        for b, (f_lower_band, f_upper_band) in enumerate(band_pairs):
            bin_lower = int(f_lower_band * fft_size / sr)
            bin_upper = int(f_upper_band * fft_size / sr)
            gain_curve = np.zeros(T)
            # a band narrower than one bin at this fft_size/sr has no data;
            # the reference lets np.mean of the empty slice return NaN and
            # poisons the whole file (dropouts_gui.py:283) — skip it instead
            if bin_upper > bin_lower:
                vol = np.mean(imdata[bin_lower:bin_upper], axis=0)
                peaks, _ = scipy.signal.find_peaks(-vol, prominence=5,
                                                   rel_height=0.5)
                for peak_i in peaks:
                    if 2 * d < peak_i < T - 2 * d - 1:
                        left = np.mean(vol[peak_i - 2 * d:peak_i - d])
                        right = np.mean(vol[peak_i + d:peak_i + 2 * d])
                        m = (left - right) / (2 * d)
                        if abs(m) < max_slope:
                            gain_curve[peak_i - d:peak_i + d + 1] = np.interp(
                                range(2 * d + 1), (0, 2 * d), (left, right)
                            ) - vol[peak_i - d:peak_i + d + 1]
            correction_fac = np.clip(units.to_fac(gain_curve), 1,
                                     correction_fac * bottom_freedom)
            fac_all[channel, b] = correction_fac

    if filter_backend == "host":
        # float64 numpy cascade, bit-parity with the reference (the gain
        # ramps are steep enough that float32 interp placement alone moves
        # the patch by ~3e-3)
        sig_host = signal.T.copy()  # (C, n)
        x_new = np.linspace(0.0, 1.0, n)
        x_old = np.linspace(0.0, 1.0, T)
        for b, (f_lower_band, f_upper_band) in enumerate(band_pairs):
            w = np.stack([np.interp(x_new, x_old, fac_all[c, b] - 1.0)
                          for c in range(num_channels)])
            sig_host = sig_host + np.asarray(filters.butter_bandpass_filter(
                sig_host * w, f_lower_band, f_upper_band, sr, order=3,
                backend="host"))
        signal = sig_host.T.astype(np.float32)
    else:
        # device cascade: every band's envelope multiply + zero-phase
        # band-pass + accumulate stays on device for all channels; ONE host
        # sync at the end (round 1 synced per band per channel,
        # dropouts_gui.py:241-323's shape)
        sig_dev = jnp.asarray(signal.T)  # (C, n)
        fac_dev = jnp.asarray((fac_all - 1.0).astype(np.float32))
        x_new = jnp.linspace(0.0, 1.0, n)
        x_old = jnp.linspace(0.0, 1.0, T)
        for b, (f_lower_band, f_upper_band) in enumerate(band_pairs):
            w = jax.vmap(lambda row: jnp.interp(x_new, x_old, row))(fac_dev[:, b])
            vol_corr = sig_dev * w
            sig_dev = sig_dev + filters.butter_bandpass_filter(
                vol_corr, f_lower_band, f_upper_band, sr, order=3)
        signal = np.asarray(sig_dev).T
    return audio_io.write_file(file_path, signal, sr, num_channels, suffix=suffix or "_out")


def process_max_mono(file_path, fft_size=1024, fft_overlap=4):
    """Stereo -> mono folds keeping the per-bin max (and min) channel
    (dropouts_gui.py:137-163). Returns the two output paths."""
    hop = fft_size // fft_overlap
    signal, sr, num_channels = audio_io.read_file(file_path)
    if num_channels != 2:
        raise ValueError("expects stereo input")
    n = len(signal)
    y_pad = np.asarray(fourier.fix_length(signal, n + fft_size // 2, axis=0))
    # complex spectrograms stay on device (complex transfers are slow or
    # unsupported on some backends); the fold is elementwise anyway
    D_L = fourier.stft(y_pad[:, 0], n_fft=fft_size, step=hop)
    D_R = fourier.stft(y_pad[:, 1], n_fft=fft_size, step=hop)
    paths = []
    for op_type, mask in (("max", jnp.abs(D_L) > jnp.abs(D_R)),
                          ("min", jnp.abs(D_L) < jnp.abs(D_R))):
        D_out = jnp.where(mask, D_L, D_R)
        y_out = np.asarray(fourier.istft(D_out, length=n, hop_length=hop))
        paths.append(audio_io.write_file(file_path, y_out, sr, 1, suffix=op_type))
    return paths
