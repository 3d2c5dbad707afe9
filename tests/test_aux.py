"""Tests for auxiliary subsystems: undo, cache, streaming, config, viz,
decompressor, group delay, cyclic wow, partials, adapt_band."""

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import markers as mk
from pyaudiorestoration_tpu.models import trackers
from pyaudiorestoration_tpu.ops import fourier
from pyaudiorestoration_tpu.pipelines import cyclic_wow, decompressor, group_delay
from pyaudiorestoration_tpu.utils import cache, streaming, undo


# ---------------------------------------------------------------------------
# undo stack
# ---------------------------------------------------------------------------

def _line(t0=0.0):
    t = np.linspace(t0, t0 + 1, 10)
    return mk.TraceLine(t, np.full(10, 440.0))


def test_undo_add_delete():
    stack = undo.UndoStack()
    l1 = _line()
    stack.push(undo.AddAction([l1]))
    assert stack.markers == [l1]
    stack.undo()
    assert stack.markers == []
    stack.redo()
    assert stack.markers == [l1]
    stack.push(undo.DeleteAction([l1]))
    assert stack.markers == []
    stack.undo()
    assert stack.markers == [l1]


def test_undo_move_changes_offset():
    stack = undo.UndoStack()
    l1 = _line()
    stack.push(undo.AddAction([l1]))
    before = l1.offset
    stack.push(undo.MoveAction([l1], 0.0, 0.25))
    assert l1.offset == pytest.approx(before + 0.25)
    stack.undo()
    assert l1.offset == pytest.approx(before)


def test_undo_merge():
    stack = undo.UndoStack()
    l1, l2, merged = _line(), _line(0.5), _line(0.2)
    stack.push(undo.AddAction([l1, l2]))
    stack.push(undo.MergeAction([merged], [l1, l2]))
    assert stack.markers == [merged]
    stack.undo()
    assert set(stack.markers) == {l1, l2}


# ---------------------------------------------------------------------------
# spectrum cache
# ---------------------------------------------------------------------------

def test_cache_stride_reuse(rng):
    c = cache.SpectrumCache()
    spec_dense = rng.standard_normal((65, 100)).astype(np.float32)
    c.store(128, 0, 16, 1, spec_dense)
    # denser hop entry serves a sparser request by stride decimation
    got = c.lookup(128, 0, 32, 1)
    np.testing.assert_array_equal(got, spec_dense[:, ::2])
    assert c.lookup(128, 0, 40, 1) is None  # 40 % 16 != 0 -> not serveable
    assert c.lookup(256, 0, 16, 1) is None  # different fft size


def test_cache_get_or_compute(rng, tmp_path):
    from pyaudiorestoration_tpu.utils import audio_io
    sig = rng.standard_normal(4000).astype(np.float32)
    c = cache.SpectrumCache()
    calls = []

    def compute(s):
        calls.append(1)
        return np.asarray(fourier.get_mag(s, 256, 64))

    a = c.get_or_compute(sig, 256, 0, 64, 1, compute)
    b = c.get_or_compute(sig, 256, 0, 64, 1, compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c.clear()
    assert c.lookup(256, 0, 64, 1) is None


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def test_stream_process_equals_dense(rng):
    sig = rng.standard_normal(50000).astype(np.float32)
    out = streaming.stream_process(sig, lambda b: b * 2.0, hop=64,
                                   blocksize=128, overlap=8)
    np.testing.assert_allclose(out, sig * 2.0)
    assert len(out) == len(sig)


def test_iter_blocks_cover():
    spans = list(streaming.iter_blocks(10000, 64, blocksize=32, overlap=4))
    covered = []
    for lo, hi, start, stop, tl, th in spans:
        assert lo <= start < stop <= hi
        covered.append((start, stop))
    assert covered[0][0] == 0 and covered[-1][1] == 10000
    for (a, b), (c, d) in zip(covered, covered[1:]):
        assert b == c


# ---------------------------------------------------------------------------
# decompressor
# ---------------------------------------------------------------------------

def test_windowed_rms_matches_loop(rng):
    sig = rng.standard_normal(5000).astype(np.float32)
    got = decompressor.windowed_rms(sig, hop=32, sz=512)
    ref = []
    for i in range(0, len(sig), 32):
        win = sig[i:i + 512]
        ref.append(np.sqrt(np.mean(np.square(win))))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_match_dynamics_transfers_envelope(rng):
    sr = 8000
    n = 4 * sr
    t = np.arange(n) / sr
    base = rng.standard_normal(n).astype(np.float32) * 0.2
    env_ref = 1.0 + 0.8 * np.sign(np.sin(2 * np.pi * 0.5 * t))
    ref = base * env_ref          # dynamic reference
    src = base.copy()             # compressed (flat) source
    out = decompressor.match_dynamics(src, ref, sr, smoothing_sec=0.05)

    def rms_at(x, center):
        s = slice(int((center - 0.2) * sr), int((center + 0.2) * sr))
        v = x[s, 0] if x.ndim == 2 else x[s]
        return np.sqrt(np.mean(v ** 2))

    # loud ref section ~1.8 amp, quiet ~0.2: out should follow
    ratio = rms_at(out, 0.5) / rms_at(out, 1.5)
    ref_ratio = rms_at(ref, 0.5) / rms_at(ref, 1.5)
    assert ratio == pytest.approx(ref_ratio, rel=0.35)


# ---------------------------------------------------------------------------
# group delay
# ---------------------------------------------------------------------------

def test_band_delays_detects_constant_shift(rng):
    sr = 8000
    n = 4 * sr
    sig = rng.standard_normal(n).astype(np.float32)
    src = np.roll(sig, 25)
    out = group_delay.band_delays(sig, src, sr, f_lower=50, f_upper=2000,
                                  bandwidth=100, min_corr=0.5)
    assert len(out) >= 5
    lags = [b["lag_samples"] for b in out]
    assert np.median(np.abs(np.asarray(lags) + 25)) < 2  # b lags -> -25


# ---------------------------------------------------------------------------
# cyclic wow
# ---------------------------------------------------------------------------

def test_cyclic_wow_finds_rotation():
    sr = 22050
    rpm_true = 44.0  # slightly off 45
    dur = 8.0
    n = int(dur * sr)
    t = np.arange(n) / sr
    wow_hz = rpm_true / 60
    speed = 1.0 + 0.01 * np.sin(2 * np.pi * wow_hz * t)
    phase = 2 * np.pi * 700 * np.cumsum(speed) / sr
    sig = np.sin(phase).astype(np.float32)
    res = cyclic_wow.analyze(sig, sr, rpm=45.0, f0=700.0, fft_size=8192)
    assert res["actual_rpm"] == pytest.approx(rpm_true, rel=0.02)
    assert res["wow_depth_semitones"] > 0.1


# ---------------------------------------------------------------------------
# partials + adapt_band
# ---------------------------------------------------------------------------

def test_trace_partials_finds_two_tones():
    sr = 22050
    n = 2 * sr
    t = np.arange(n) / sr
    sig = (np.sin(2 * np.pi * 1000 * t) + 0.5 * np.sin(2 * np.pi * 1500 * t)).astype(np.float32)
    mag = np.asarray(fourier.get_mag(sig, 4096, 1024, "hann"))
    times, pitches, mags = trackers.trace_partials(
        mag, sig[:, None], [(0.1, 900.0), (1.9, 1600.0)], 4096, 1024, sr,
        tolerance_st=12.0)
    mid = len(times) // 2
    found = pitches[mid][pitches[mid] > 0]
    assert any(abs(f - 1000) < 20 for f in found)
    assert any(abs(f - 1500) < 20 for f in found)


def test_adapt_band_linear_prediction():
    freqs = np.array([1000.0, 1010.0, 1020.0, 1030.0])
    NL, NU, window, logfreq = trackers.adapt_band(
        freqs, 2049, 4096 / 44100, tolerance=1.0, adaptation_mode="Constant", i=3)
    assert NL < 1030 * 4096 / 44100 < NU
    NL2, NU2, _, logfreq2 = trackers.adapt_band(
        freqs, 2049, 4096 / 44100, tolerance=1.0, adaptation_mode="Linear", i=3)
    assert logfreq2 > logfreq  # rising trend predicted upward


# ---------------------------------------------------------------------------
# viz (headless smoke)
# ---------------------------------------------------------------------------

def test_save_spectrogram(tmp_path, rng):
    import matplotlib
    matplotlib.use("Agg")
    mag = np.abs(rng.standard_normal((129, 200))).astype(np.float32)
    line = _line()
    from pyaudiorestoration_tpu.models import viz
    path = viz.save_spectrogram(str(tmp_path / "s.png"), mag, 8000, 64,
                                markers=[line])
    import os
    assert os.path.getsize(path) > 1000


def test_metrics_flutter_and_snr(flutter):
    from pyaudiorestoration_tpu.utils import metrics

    sig, sr = flutter
    f = metrics.flutter(sig, sr)
    assert 0.003 < f < 0.01  # the fixture's known wow depth
    clean = np.sin(2 * np.pi * 1000 * np.arange(sr) / sr)
    assert metrics.flutter(clean, sr) < 1e-4
    noisy = clean + 0.01 * np.random.default_rng(0).standard_normal(sr)
    # sine power 0.5 over noise power 1e-4 -> ~37 dB
    assert 36 < metrics.snr_db(clean, noisy) < 38
    assert metrics.snr_db(clean, clean) == float("inf")


def test_metrics_spectral_distance(flutter):
    from pyaudiorestoration_tpu.utils import metrics

    sig, sr = flutter
    d_self = metrics.spectral_distance_db(sig, sig, sr)
    assert d_self == 0.0
    d_off = metrics.spectral_distance_db(sig, sig * 0.5, sr)
    # a -6 dB level change measures ~6 dB in loud mels; the quiet-mel floor
    # clamp pulls the mean a bit below that
    assert 3.0 < d_off < 6.5
