"""Pipeline tests over the reference sample fixtures (BASELINE configs 2-5)."""

import shutil

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import markers as mk
from pyaudiorestoration_tpu.ops import fourier, units
from pyaudiorestoration_tpu.pipelines import (
    difeq, dropouts, expander, hpss_tool, humspeed, pan, renoiser, tapesynch,
)
from pyaudiorestoration_tpu.utils import audio_io, project


# ---------------------------------------------------------------------------
# tapesynch (BASELINE config 4)
# ---------------------------------------------------------------------------

def test_tapesynch_speed_ratio_estimate(samples_dir):
    ref, sr, _ = audio_io.read_file(samples_dir / "rhythm.flac")
    src, _, _ = audio_io.read_file(samples_dir / "rhythm+5percent.flac")
    ratio = tapesynch.estimate_speed_ratio(ref, src, sr)
    assert ratio == pytest.approx(1.05, abs=0.01), ratio


def test_tapesynch_align_files(samples_dir, tmp_path):
    """Align rhythm+5percent to rhythm: output must track the reference."""
    ref_p = tmp_path / "rhythm.flac"
    src_p = tmp_path / "rhythm5.flac"
    shutil.copy(samples_dir / "rhythm.flac", ref_p)
    shutil.copy(samples_dir / "rhythm+5percent.flac", src_p)
    paths, samples, lag_curve = tapesynch.align_files(
        str(ref_p), str(src_p), num_windows=10, window_s=0.5, sinc_quality=20)
    out, osr, _ = audio_io.read_file(paths[0])
    ref, sr, _ = audio_io.read_file(ref_p)
    n = min(len(out), len(ref))
    assert n > len(ref) * 0.9  # roughly the reference duration
    # windowed correlation between output and reference must be high & at ~0 lag
    from pyaudiorestoration_tpu.ops import correlation
    mid = n // 2
    w = sr // 2
    d, corr = correlation.find_delay(ref[mid - w:mid + w, 0], out[mid - w:mid + w, 0],
                                     window_name="hann")
    assert float(corr) > 0.5, float(corr)
    assert abs(float(d)) < sr * 0.005, float(d)  # within 5 ms


def test_correlate_sources_known_shift(rng):
    sr = 8000
    sig = rng.standard_normal(4 * sr).astype(np.float32) * 0.3
    shift = 0.01  # source content arrives 10 ms later than in the reference
    src = np.roll(sig, int(shift * sr))
    delay, corr = tapesynch.correlate_sources(sig, src, sr, 1.0, 3.0, 0.0, 100, 3000)
    assert corr > 0.8
    # reference lag convention: d = t_ref - t_src, so a delayed source gives -shift
    assert delay == pytest.approx(-shift, abs=2e-4)


def test_azimuth_sweep_batched(rng):
    sr = 8000
    sig = rng.standard_normal(4 * sr).astype(np.float32) * 0.3
    src = np.roll(sig, int(0.005 * sr))
    lag_data = np.stack([np.linspace(0, 4, 100), np.zeros(100)], axis=-1)
    line = tapesynch.azimuth_sweep(sig, src, sr, 0.5, 3.5, 100, 3000, lag_data,
                                   dur=0.25, overlap=2, reject=0.2)
    assert line is not None
    # delayed source -> negative lag (d = t_ref - t_src)
    assert np.median(np.abs(line.lags + 0.005)) < 5e-4


# ---------------------------------------------------------------------------
# dropout healing (BASELINE config 2)
# ---------------------------------------------------------------------------

def test_dropout_heal_project(samples_dir, tmp_path):
    """Heal dropouts_sample.flac with its curated .drop project; dropout
    regions must gain energy while the rest stays put."""
    src = tmp_path / "dropouts_sample.flac"
    shutil.copy(samples_dir / "dropouts_sample.flac", src)
    proj = project.Project.load(str(samples_dir / "dropouts_sample.drop"))
    drops = proj.marker_list("dropouts")
    assert len(drops) > 10
    fft_size, overlap = proj.fft_size, proj.fft_overlap
    out_path = dropouts.heal_file(str(src), drops, fft_size, overlap)
    out, osr, _ = audio_io.read_file(out_path)
    sig, sr, _ = audio_io.read_file(src)
    n = min(len(out), len(sig))
    # energy inside dropout boxes should increase
    gains = []
    for d in drops[:10]:
        s0, s1 = int((d.t - d.width / 2) * sr), int((d.t + d.width / 2) * sr)
        before = np.sqrt(np.mean(sig[s0:s1, 0] ** 2))
        after = np.sqrt(np.mean(out[s0:s1, 0] ** 2))
        gains.append(after / (before + 1e-9))
    assert np.median(gains) > 1.02, np.median(gains)
    assert np.all(np.asarray(gains) >= 1.0)  # healing never attenuates
    # untouched audio stays identical-ish
    quiet = slice(0, int(0.3 * sr))
    assert np.abs(out[quiet, 0] - sig[quiet, 0]).max() < 0.05


def test_dropout_detect_synthetic():
    """A tone with two abrupt holes must be detected near the hole centers."""
    sr = 44100
    n = 2 * sr
    sig = (np.sin(2 * np.pi * np.arange(n) * 5000 / sr) * 0.5).astype(np.float32)
    for center in (0.7, 1.3):
        c = int(center * sr)
        w = int(0.010 * sr)
        sig[c - w:c + w] *= 0.05
    fft_size, overlap = 512, 16
    hop = fft_size // overlap
    mag = np.asarray(fourier.get_mag(sig, fft_size, hop))
    db = units.to_dB(mag)
    found = dropouts.detect_dropouts(db, sr, hop, fft_size, 0.2, 1.8, 1000, 10000,
                                     width_ms=20, sensitivity=5)
    centers = sorted(d.t for d in found)
    assert len(centers) >= 2
    assert min(abs(c - 0.7) for c in centers) < 0.02
    assert min(abs(c - 1.3) for c in centers) < 0.02


def test_max_mono(samples_dir, tmp_path, rng):
    sr = 8000
    L = rng.standard_normal(sr).astype(np.float32) * 0.1
    R = L + rng.standard_normal(sr).astype(np.float32) * 0.01
    src = tmp_path / "st.wav"
    audio_io.write_wav(src, np.stack([L, R], -1), sr)
    paths = dropouts.process_max_mono(str(src), fft_size=512, fft_overlap=4)
    assert len(paths) == 2
    for p in paths:
        out, osr, ch = audio_io.read_file(p)
        assert ch == 1 and len(out) == sr


# ---------------------------------------------------------------------------
# difeq (BASELINE config 3)
# ---------------------------------------------------------------------------

def test_difeq_files(samples_dir, tmp_path):
    freqs_av, av, paths = difeq.difeq_files(
        str(samples_dir / "nr_signal.wav"), str(samples_dir / "nr_noise.wav"),
        str(tmp_path / "eq"))
    assert av.shape[0] == 2
    assert len(paths) == 3
    text = open(paths[0]).read()
    assert text.startswith("FilterCurve:")
    assert 'f0="' in text and 'v0="' in text
    assert np.all(np.isfinite(av))


def test_difeq_detects_known_filter(tmp_path, rng):
    """src = lowpassed ref: the EQ curve must boost highs (ref-src > 0)."""
    from pyaudiorestoration_tpu.ops import filters
    sr = 44100
    ref = rng.standard_normal(3 * sr).astype(np.float32) * 0.2
    src = np.asarray(filters.butter_bandpass_filter(ref, 0, 4000, sr, order=3,
                                                    backend="host"))
    pref, psrc = tmp_path / "ref.wav", tmp_path / "src.wav"
    audio_io.write_wav(pref, ref, sr)
    audio_io.write_wav(psrc, src, sr)
    freqs, eq = difeq.get_eq(str(psrc), str(pref), "L+R")
    hi = (freqs > 8000) & (freqs < 18000)
    lo = (freqs > 100) & (freqs < 2000)
    assert np.mean(eq[0][hi]) > np.mean(eq[0][lo]) + 20


# ---------------------------------------------------------------------------
# expander (BASELINE config 5a)
# ---------------------------------------------------------------------------

def test_expander_gain_law(tmp_path):
    """The expander boosts sections whose hiss-band level is LOW by
    ``to_fac(clip_upper - level)`` (anti-compression: a compressor leaves the
    hiss floor inversely tracking the original level, expander_gui.py:178-210).
    Verify the per-section gain law on a 6 dB modulated hiss band."""
    sr = 44100
    n = 2 * sr
    t = np.arange(n) / sr
    env = 10 ** ((-6 + 3 * np.sign(np.sin(2 * np.pi * 1.0 * t))) / 20)
    sig = (np.sin(2 * np.pi * 15000 * t) * env * 0.5).astype(np.float32)
    src = tmp_path / "comp.wav"
    audio_io.write_wav(src, sig, sr)
    tt, curves, _ = expander.envelope_curves(str(src), channel_mode="L",
                                             band_lower=14000, band_upper=16000)
    lo = float(np.percentile(curves[0], 15))
    hi = float(np.percentile(curves[0], 85))
    signal, _, _ = audio_io.read_file(src)
    out = expander.expand(signal, sr, tt, curves, clip_lower=lo, clip_upper=hi)

    def section_rms(x, center):
        s = slice(int((center - 0.1) * sr), int((center + 0.1) * sr))
        v = x[s, 0] if x.ndim == 2 else x[s]
        return np.sqrt(np.mean(v ** 2))

    # quiet section at t~0.75 (env low), loud at t~0.25 (env high); the quiet
    # one is boosted ~6 dB relative to the loud one (modulo peak normalize)
    gain_quiet = section_rms(out, 0.75) / section_rms(sig, 0.75)
    gain_loud = section_rms(out, 0.25) / section_rms(sig, 0.25)
    ratio_db = 20 * np.log10(gain_quiet / gain_loud)
    assert ratio_db == pytest.approx(6.0, abs=1.0), ratio_db


# ---------------------------------------------------------------------------
# humspeed
# ---------------------------------------------------------------------------

def test_humspeed_detects_offspeed_hum(tmp_path, rng):
    """50 Hz hum recorded 2% fast shows up at 51 Hz -> percent ~= -1.96."""
    sr = 44100
    n = 30 * sr
    t = np.arange(n) / sr
    sig = (0.05 * np.sin(2 * np.pi * 51.0 * t)
           + 0.05 * np.sin(2 * np.pi * 102.0 * t)
           + 0.01 * rng.standard_normal(n)).astype(np.float32)
    src = tmp_path / "hum.wav"
    audio_io.write_wav(src, sig, sr)
    matches = humspeed.analyze_hum(str(src), base_hum=50, num_harmonies=1,
                                   tolerance=8, fft_size=2 ** 17)
    assert matches, "no hum found"
    assert matches[0]["percent"] == pytest.approx((50 / 51 - 1) * 100, abs=0.3)


# ---------------------------------------------------------------------------
# pan
# ---------------------------------------------------------------------------

def test_pan_measure_and_apply(tmp_path, rng):
    sr = 8000
    n = 2 * sr
    base = rng.standard_normal(n).astype(np.float32) * 0.2
    L = base * 2.0
    R = base.copy()
    sig = np.stack([L, R], axis=-1)
    s = pan.measure_pan(sig, sr, (0.2, 100.0), (1.8, 3500.0), fft_size=512)
    assert s.pan == pytest.approx(2.0, rel=0.1)
    out = pan.apply_pan(sig, sr, [s])
    # channel 1 scaled by ~2 -> matches L
    mid = slice(sr // 2, 3 * sr // 2)
    assert np.corrcoef(out[mid], L[mid])[0, 1] > 0.99
    assert np.sqrt(np.mean(out[mid] ** 2)) == pytest.approx(
        np.sqrt(np.mean(L[mid] ** 2)), rel=0.1)


# ---------------------------------------------------------------------------
# renoiser (BASELINE config 5b)
# ---------------------------------------------------------------------------

def test_renoiser_denoises(samples_dir, tmp_path):
    """Denoise nr_signal.wav using nr_noise.wav as the floor profile: the
    noise-only stretches must drop in level far more than the signal."""
    src = tmp_path / "nr_signal.wav"
    shutil.copy(samples_dir / "nr_signal.wav", src)
    out_path = renoiser.process_file(str(src), noise_path=str(samples_dir / "nr_noise.wav"),
                                     gain=-40.0, overhead=6.0, suffix="_dn")
    out, osr, _ = audio_io.read_file(out_path)
    sig, sr, _ = audio_io.read_file(src)
    n = min(len(out), len(sig))
    rms_in = np.sqrt(np.mean(sig[:n, 0] ** 2))
    rms_out = np.sqrt(np.mean(out[:n, 0] ** 2))
    assert 0.3 * rms_in < rms_out <= rms_in * 1.01  # attenuated, not destroyed


def test_renoiser_mask_direction(rng):
    spec = np.abs(rng.standard_normal((10, 20))).astype(np.float32) + 0.5
    profile = units.to_dB(np.full(10, 10.0))  # way above everything
    fac = np.asarray(renoiser.get_mask_fac(spec, profile, -20.0))
    np.testing.assert_allclose(fac, 10 ** (-20 / 20), rtol=1e-5)
    profile = units.to_dB(np.full(10, 1e-6))  # below everything
    fac = np.asarray(renoiser.get_mask_fac(spec, profile, -20.0))
    np.testing.assert_allclose(fac, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# hpss tool
# ---------------------------------------------------------------------------

def test_hpss_separates_tone_from_clicks(tmp_path, rng):
    sr = 22050
    n = 2 * sr
    tone = np.sin(2 * np.pi * 880 * np.arange(n) / sr) * 0.3
    clicks = np.zeros(n)
    clicks[::sr // 4] = 0.8
    sig = (tone + clicks).astype(np.float32)
    src = tmp_path / "mix.wav"
    audio_io.write_wav(src, sig, sr)
    paths = hpss_tool.separate_file(str(src), fft_size=1024, fft_overlap=4,
                                    kernel_size=31)
    H, _, _ = audio_io.read_file(paths[0])
    P, _, _ = audio_io.read_file(paths[1])
    # the tone should live in H, the clicks in P
    tone_h = np.corrcoef(H[: n, 0], tone)[0, 1]
    assert tone_h > 0.8, tone_h
    click_idx = np.arange(sr // 4, n - 1, sr // 4)
    assert np.abs(P[click_idx, 0]).mean() > np.abs(H[click_idx, 0]).mean()
