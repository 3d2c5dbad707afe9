"""Resampler tests: position-curve parity with the reference algorithm,
sinc interpolation correctness against a direct numpy evaluation, and SNR."""

import numpy as np
import pytest

from pyaudiorestoration_tpu.ops import resampling


def ref_speed_to_pos(sampletimes, speeds, num_input_samples):
    """Direct sequential transcription of the reference's dithering algorithm
    (resampling.py:93-137) for parity testing."""
    sampletimes = np.asarray(sampletimes, float)
    speeds = np.asarray(speeds, float)
    periods = np.diff(sampletimes)
    err = 0.0
    offset = sampletimes[0]
    chunks = []
    for i in range(len(speeds) - 1):
        n_f = periods[i] * np.mean(speeds[i:i + 2])
        inerr = n_f + err
        n = int(round(inerr))
        err = inerr - n
        block_speeds = np.arange(n) / (n - 1) * (speeds[i + 1] - speeds[i]) + speeds[i]
        sample_at = np.cumsum(1 / block_speeds) + offset
        offset = sample_at[-1]
        chunks.append(sample_at)
        if sample_at[0] <= num_input_samples <= sample_at[-1]:
            out = np.concatenate(chunks)
            end = np.argmin(np.abs(out - num_input_samples))
            return out[:end]
    return np.concatenate(chunks)


def ref_sinc_interior(sample_at, signal, NT):
    """Direct evaluation of the reference's sinc MAC for interior samples
    (resampling.py:51-90 semantics: 2*NT taps, hann(2*NT+1)[:2*NT])."""
    N = np.arange(-NT, NT + 1, dtype="float32")
    win = np.hanning(2 * NT + 1).astype("float32")
    out = np.empty(len(sample_at), "float32")
    for i, p in enumerate(sample_at):
        ind = int(round(p))
        lower, upper = ind - NT, min(ind + NT, len(signal))
        if i + 1 != len(sample_at):
            period_to = max(1e-12, sample_at[i + 1] - p)
            fc = min(1 / period_to, 1)
        shift = p - ind
        si = np.sinc((N - shift) * fc) * fc
        bit = signal[lower:upper]
        out[i] = np.sum(bit * si[:len(bit)] * win[:len(bit)])
    return out


def test_speed_to_pos_parity():
    sr = 44100
    t = np.arange(0, 3 * sr, 512, dtype=float)
    speeds = 1.0 + 0.05 * np.sin(2 * np.pi * 0.55 * t / sr)
    ref = ref_speed_to_pos(t, speeds, 3 * sr)
    got = resampling.speed_to_pos(t, speeds, 3 * sr)
    assert abs(len(ref) - len(got)) <= 1
    m = min(len(ref), len(got))
    np.testing.assert_allclose(got[:m], ref[:m], rtol=0, atol=1e-6)


def test_speed_to_pos_ramp_parity():
    sampletimes = (0, 88200)
    speeds = (0.5, 2.0)
    ref = ref_speed_to_pos(np.asarray(sampletimes, float), np.asarray(speeds, float), 88200)
    got = resampling.speed_to_pos(sampletimes, speeds, 88200)
    m = min(len(ref), len(got))
    assert abs(len(ref) - len(got)) <= 1
    np.testing.assert_allclose(got[:m], ref[:m], atol=1e-6)


def test_sinc_matches_reference_interior(rng):
    sr = 8000
    signal = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.5).astype(np.float32)
    sample_at = resampling.speed_to_pos((0, len(signal)), (0.8, 1.3), len(signal))
    got = resampling.sinc_resample(signal, sample_at, quality=50, tile=1024)
    ref = ref_sinc_interior(sample_at, signal, 50)
    # compare away from the edges where our masking differs from the
    # reference's slice-misalignment quirk
    sl = slice(100, len(sample_at) - 100)
    np.testing.assert_allclose(got[sl], ref[sl], atol=5e-5)


def test_sinc_identity_speed():
    """Speed 1.0 everywhere: output ~= input (delayed by fractional phase)."""
    sr = 44100
    n = sr // 2
    x = (np.sin(2 * np.pi * 997 * np.arange(n) / sr) * 0.7).astype(np.float32)
    sample_at = resampling.speed_to_pos((0, n), (1.0, 1.0), n)
    y = resampling.sinc_resample(x, sample_at, quality=50)
    m = min(len(y), n) - 200
    # positions start at cumsum(1/1)=1, so y[i] ~ x[i+1]
    err = y[100:m] - x[101:m + 1]
    snr = 10 * np.log10(np.mean(x[101:m + 1] ** 2) / np.mean(err ** 2))
    assert snr > 55, snr


def test_sinc_antialiasing():
    """Speeding up 2x must suppress content above the new nyquist."""
    sr = 44100
    n = sr
    # 21 kHz tone, near nyquist
    x = np.sin(2 * np.pi * 21000 * np.arange(n) / sr).astype(np.float32)
    # speed 0.5: positions advance 2 input samples per output sample, so the
    # adaptive cutoff fc=0.5 must low-pass everything above half nyquist
    sample_at = resampling.speed_to_pos((0, n), (0.5, 0.5), n)
    y = resampling.sinc_resample(x, sample_at, quality=50)
    # 21kHz maps to 42kHz > nyquist; the anti-aliasing cutoff should kill it
    rms_in = np.sqrt((x ** 2).mean())
    rms_out = np.sqrt((y[200:-200] ** 2).mean())
    assert rms_out < rms_in * 0.02, rms_out / rms_in


def test_linear_matches_np_interp(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    pos = np.sort(rng.uniform(-5, 1005, size=500))
    ref = np.interp(pos, np.arange(len(x)), x, left=0.0, right=0.0)
    got = resampling.linear_resample(x, pos)
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=1e-5)


def test_run_writes_output(tmp_path, rng):
    from pyaudiorestoration_tpu.utils import audio_io
    sr = 8000
    x = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    src = tmp_path / "in.wav"
    audio_io.write_wav(src, x, sr)
    curve = np.stack([np.linspace(0, 1, 20), np.full(20, 1.01)], axis=-1)
    paths = resampling.run([str(src)], speed_curve=curve, resampling_mode="Sinc", sinc_quality=20)
    out, osr, ch = audio_io.read_file(paths[0])
    assert osr == sr
    assert abs(len(out) - sr * 1.01) < 50


def test_resample_ratio_tone():
    sr = 44100
    n = sr // 2
    x = np.sin(2 * np.pi * 1000 * np.arange(n) / sr).astype(np.float32)
    y = resampling.resample_ratio(x, sr, sr // 2, quality=16)
    assert abs(len(y) - n // 2) < 4
    # 1 kHz tone remains 1 kHz at the new rate
    spec = np.abs(np.fft.rfft(y[100:-100] * np.hanning(len(y) - 200)))
    peak_bin = spec.argmax()
    freq = peak_bin / (len(y) - 200) * (sr // 2)
    assert abs(freq - 1000) < 15
