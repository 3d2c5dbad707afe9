"""End-to-end larger-than-memory restoration (VERDICT round 1, Missing #2).

A long wobbling tone is written to disk IN CHUNKS via StreamWriter (never
fully materialized through the write path), restored with the two-pass
streamed pipeline using tiny block/tile sizes (forcing many boundaries),
and compared against the in-memory device path on the same file.
Reference pattern: experiments/pyrespeeder_cmd.py:16-49.
"""

import numpy as np
import pytest

from pyaudiorestoration_tpu.pipelines import respeeder_device
from pyaudiorestoration_tpu.utils import audio_io

SR = 8000
F0 = 1000.0


def _write_long_tone(path, seconds=8.0, channels=2):
    n = int(seconds * SR)
    with audio_io.StreamWriter(path, SR, channels) as w:
        phase = 0.0
        for start in range(0, n, SR):
            stop = min(n, start + SR)
            t = np.arange(start, stop) / SR
            speed = 1.0 + 0.01 * np.sin(2 * np.pi * 1.5 * t)
            inc = 2 * np.pi * F0 * speed / SR
            ph = phase + np.cumsum(inc)
            phase = ph[-1]
            block = 0.5 * np.sin(ph).astype(np.float32)
            cols = [block * (1.0 - 0.3 * c) for c in range(channels)]
            w.write(np.stack(cols, axis=-1))
    return n


def test_stream_writer_roundtrip(tmp_path):
    path = str(tmp_path / "sw.wav")
    data = np.random.default_rng(0).standard_normal((1000, 2)).astype(np.float32)
    with audio_io.StreamWriter(path, 44100, 2) as w:
        w.write(data[:400])
        w.write(data[400:])
    sig, sr, ch = audio_io.read_file(path)
    assert sr == 44100 and ch == 2
    np.testing.assert_array_equal(sig, data)


def test_streamed_restore_matches_in_memory(tmp_path):
    path = str(tmp_path / "long.wav")
    _write_long_tone(path, seconds=8.0)

    out_mem = respeeder_device.restore_file_fast(
        path, f0_hz=F0, fft_size=1024, fft_overlap=4, zeropad=1,
        sinc_quality=16, suffix="_mem", stream=False)
    # tiny blocks/tiles force many pass-1 spans and pass-2 windows
    out_str = respeeder_device.restore_file_streamed(
        path, f0_hz=F0, fft_size=1024, fft_overlap=4, zeropad=1,
        sinc_quality=16, suffix="_str", frames_per_block=37, seg_tile=41)

    a, sr_a, _ = audio_io.read_file(out_mem)
    b, sr_b, _ = audio_io.read_file(out_str)
    assert sr_a == sr_b == SR
    assert a.shape == b.shape  # identical plan => identical output length
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_streamed_restore_reduces_flutter(tmp_path):
    path = str(tmp_path / "long2.wav")
    _write_long_tone(path, seconds=6.0, channels=1)
    out = respeeder_device.restore_file_streamed(
        path, f0_hz=F0, fft_size=1024, fft_overlap=4, zeropad=1,
        sinc_quality=16, frames_per_block=512, seg_tile=512)

    def flutter(p):
        sig, sr, _ = audio_io.read_file(p)
        x = sig[:, 0]
        s = np.sign(x)
        idx = np.nonzero((s[:-1] < 0) & (s[1:] >= 0))[0]
        fr = x[idx + 1] - x[idx]
        sub = idx - x[idx] / np.where(fr == 0, 1, fr)
        per = np.diff(sub)
        per = per[per > 1]
        return np.std(per) / np.mean(per)

    assert flutter(out) < flutter(path) / 3


def test_restore_file_fast_auto_threshold_dispatch(tmp_path, monkeypatch):
    path = str(tmp_path / "short.wav")
    _write_long_tone(path, seconds=2.0, channels=1)
    calls = {}
    real = respeeder_device.restore_file_streamed

    def spy(*a, **k):
        calls["streamed"] = True
        return real(*a, **k)

    monkeypatch.setattr(respeeder_device, "restore_file_streamed", spy)
    # tiny threshold -> auto path must route through the streamed pipeline
    out = respeeder_device.restore_file_fast(
        path, f0_hz=F0, fft_size=1024, fft_overlap=4, zeropad=1,
        sinc_quality=16, stream="auto", stream_threshold_bytes=1024)
    assert calls.get("streamed")
    sig, _, _ = audio_io.read_file(out)
    assert len(sig) > 0
