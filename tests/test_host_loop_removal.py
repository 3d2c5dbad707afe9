"""Batched replacements for round-1 host loops (VERDICT Weak #3).

Each test pins the new single-call formulation against a literal
transcription of the old per-iteration loop (or a known ground truth).
"""

import numpy as np
import pytest

from pyaudiorestoration_tpu.ops import filters, fourier, units
from pyaudiorestoration_tpu.pipelines import dropouts, renoiser, tapesynch
from pyaudiorestoration_tpu.utils import audio_io


def _click_train(sr=8000, seconds=2.0, period=256, phase=37):
    """Impulses at a fixed hop phase — the signal sniff_offset exists for."""
    n = int(sr * seconds)
    sig = 0.01 * np.random.default_rng(3).standard_normal(n).astype(np.float32)
    sig[phase::period] += 1.0
    return sig


def _sniff_offset_loop(sig, sr, fft_size, fft_overlap, f_lo, f_hi):
    """Transcription of the round-1 hop-phase loop (renoiser_gui.py:347-380)."""
    hop = fft_size // fft_overlap
    l = int(round(f_lo * fft_size / sr))
    u = int(round(f_hi * fft_size / sr))
    stds = np.empty(hop)
    for i in range(hop):
        padded = np.pad(sig, (i, 0))
        padded = np.asarray(fourier.fix_length(padded, len(sig) + i + fft_size // 2))
        fft_signal = np.asarray(fourier.stft(padded, n_fft=fft_size, step=hop))
        time_gain = np.average(np.abs(fft_signal[l:u, :]), axis=0)
        stds[i] = time_gain.std()
    return int(np.argmax(stds))


def test_sniff_offset_matches_loop_argmax():
    sr, fft_size, overlap = 8000, 512, 4
    sig = _click_train(sr, 2.0, period=fft_size // overlap * 2, phase=37)
    got = renoiser.sniff_offset(sig, sr, fft_size, overlap, f_lo=1000, f_hi=3500)
    want = _sniff_offset_loop(sig, sr, fft_size, overlap, 1000, 3500)
    hop = fft_size // overlap
    # identical phase choice modulo the hop (edge frames differ by design)
    assert got % hop == want % hop


def test_auto_align_recovers_known_shift():
    sr = 8000
    n = sr * 6
    rng = np.random.default_rng(11)
    base = np.cumsum(rng.standard_normal(n + sr)).astype(np.float32)
    base -= base.mean()
    base /= np.abs(base).max()
    shift = 480  # 60 ms
    ref = base[:n][:, None]
    src = base[shift:shift + n][:, None]
    samples, curve = tapesynch.auto_align(ref, src, sr, num_windows=6,
                                          window_s=0.5, lower=50.0,
                                          match_speed=False)
    assert len(samples) == 6
    # src = base[shift:] -> source content for ref time t sits at t - shift/sr,
    # i.e. lag d = +shift/sr in the reference's lag_to_pos convention
    lags = np.array([s.d for s in samples])
    np.testing.assert_allclose(lags, shift / sr, atol=2e-4)
    assert all(s.corr > 0.8 for s in samples)


def _process_heuristic_loop(signal, sr, fft_size, fft_overlap, max_width,
                            max_slope, num_bands, bottom_freedom,
                            f_lower, f_upper):
    """Transcription of round 1's per-band host loop (one device sync per
    band per channel), kept as the parity anchor."""
    import itertools
    import scipy.signal

    def pairwise(it):
        a, b = itertools.tee(it)
        next(b, None)
        return zip(a, b)

    hop = fft_size // fft_overlap
    signal = signal.copy()
    num_channels = signal.shape[1]
    # python ints (matches production: the reference's uint16 dtype wraps
    # band*fft_size under NumPy 2's NEP-50 promotion)
    bands = [int(b) for b in np.logspace(np.log2(f_lower), np.log2(f_upper),
                                         num=num_bands, endpoint=True, base=2)]
    d = int(max_width / 1.5 * sr / hop)
    for channel in range(num_channels):
        imdata = np.asarray(fourier.get_mag(signal[:, channel], fft_size, hop, "hann"))
        imdata = units.to_dB(imdata)
        correction_fac = np.ones(imdata.shape[1]) * 1000
        for f_lo_b, f_hi_b in reversed(list(pairwise(bands))):
            bin_lower = int(f_lo_b * fft_size / sr)
            bin_upper = int(f_hi_b * fft_size / sr)
            vol = np.mean(imdata[bin_lower:bin_upper], axis=0)
            peaks, _ = scipy.signal.find_peaks(-vol, prominence=5, rel_height=0.5)
            gain_curve = np.zeros(imdata.shape[1])
            for peak_i in peaks:
                if 2 * d < peak_i < imdata.shape[1] - 2 * d - 1:
                    left = np.mean(vol[peak_i - 2 * d:peak_i - d])
                    right = np.mean(vol[peak_i + d:peak_i + 2 * d])
                    m = (left - right) / (2 * d)
                    if abs(m) < max_slope:
                        gain_curve[peak_i - d:peak_i + d + 1] = np.interp(
                            range(2 * d + 1), (0, 2 * d), (left, right)
                        ) - vol[peak_i - d:peak_i + d + 1]
            correction_fac = np.clip(units.to_fac(gain_curve), 1,
                                     correction_fac * bottom_freedom)
            vol_corr = signal[:, channel] * np.interp(
                np.linspace(0, 1, len(signal[:, channel])),
                np.linspace(0, 1, len(correction_fac)), correction_fac - 1)
            signal[:, channel] = signal[:, channel] + np.asarray(
                filters.butter_bandpass_filter(vol_corr, f_lo_b, f_hi_b, sr, order=3))
    return signal


def test_process_heuristic_matches_band_loop(tmp_path):
    sr = 8000
    n = sr * 2
    rng = np.random.default_rng(5)
    import scipy.signal as dsp

    # band-limited "music" with SMOOTH dips (hann-shaped, so the envelope
    # itself adds no click transients that would invert the valley baseline)
    sos = dsp.butter(4, [1500 / (sr / 2), 3500 / (sr / 2)], btype="band",
                     output="sos")
    music = dsp.sosfilt(sos, rng.standard_normal(n)).astype(np.float32)
    music *= 0.3 / np.abs(music).max()
    env = np.ones(n, np.float32)
    for c in (int(0.7 * sr), int(1.3 * sr)):
        w = int(0.03 * sr)
        env[c - w:c + w] *= 1.0 - 0.95 * np.hanning(2 * w).astype(np.float32)
    sig = (music * env)[:, None] * np.array([[1.0, 0.8]], np.float32)
    sig += (0.005 * rng.standard_normal((n, 2))).astype(np.float32)
    path = str(tmp_path / "dr.wav")
    audio_io.write_wav(path, sig, sr)

    kw = dict(fft_size=512, fft_overlap=8, max_width=0.06, max_slope=0.5,
              num_bands=6, bottom_freedom=2.0, f_lower=1000.0, f_upper=3800.0)
    out_path = dropouts.process_heuristic(path, suffix="_new", **kw)
    got, _, _ = audio_io.read_file(out_path)

    orig, _, _ = audio_io.read_file(path)
    want = _process_heuristic_loop(orig, sr, **kw)
    np.testing.assert_allclose(got, want, atol=5e-4)
    # and the heuristic actually repaired the carved dips: the 2-3 kHz band
    # energy inside each dropout must be lifted (this also guards the uint16
    # band-edge overflow fix — wrapped bin edges patch the wrong band)
    for c in (int(0.7 * sr), int(1.3 * sr)):
        w = int(0.02 * sr)

        def band_energy(x):
            spec = np.abs(np.fft.rfft(x))
            lo = int(2000 * 2 * w / sr)
            hi = int(3000 * 2 * w / sr)
            return spec[lo:hi].sum()

        assert band_energy(got[c - w:c + w, 0]) > 1.5 * band_energy(orig[c - w:c + w, 0])
