"""Byte-level fuzzing of the native codec entry points.

The FLAC residual-partition overflow (ADVICE round 1, high) showed the
decoder faces untrusted input.  These tests mutate real container bytes with
a fixed seed and require every variant to either decode or raise cleanly —
the process must survive all of them (a crash here fails the whole pytest
session, which is the point).
"""

import numpy as np
import pytest

from pyaudiorestoration_tpu.utils import audio_io

N_MUTANTS = 150


def _mutate(data: bytes, rng, n_flips=24):
    buf = bytearray(data)
    # bias mutations toward the header/metadata region where parsing lives
    limit = min(len(buf), 4096)
    for _ in range(n_flips):
        if rng.random() < 0.7:
            pos = int(rng.integers(0, limit))
        else:
            pos = int(rng.integers(0, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    # occasionally truncate
    if rng.random() < 0.3:
        buf = buf[: int(rng.integers(8, len(buf)))]
    return bytes(buf)


def _fuzz_reader(base_bytes, tmp_path, opener):
    rng = np.random.default_rng(20260816)
    survived = decoded = 0
    path = tmp_path / "fuzz.bin"
    for _ in range(N_MUTANTS):
        path.write_bytes(_mutate(base_bytes, rng))
        try:
            opener(path)
            decoded += 1
        except Exception:
            pass
        survived += 1
    assert survived == N_MUTANTS
    return decoded


def test_fuzz_flac_decoder(samples_dir, tmp_path):
    base = (samples_dir / "flutter.flac").read_bytes()

    def opener(p):
        sig, sr, ch = audio_io.read_file(p)
        assert np.all(np.isfinite(sig[:64]))

    decoded = _fuzz_reader(base, tmp_path, opener)
    # some mutants only touch audio payload and still decode — both outcomes
    # are fine; what matters is that none crashed the process
    assert decoded >= 0


def test_fuzz_wav_decoder_and_stream(tmp_path):
    sr = 8000
    sig = (0.1 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    base_path = tmp_path / "base.wav"
    audio_io.write_wav(base_path, np.stack([sig, sig], -1), sr)
    base = base_path.read_bytes()

    def opener(p):
        audio_io.read_file(p)

    _fuzz_reader(base, tmp_path, opener)

    def stream_opener(p):
        with audio_io.StreamReader(p) as r:
            if r.frames > 0:
                r.read(0, min(256, r.frames))

    _fuzz_reader(base, tmp_path, stream_opener)


def test_fuzz_rf64_decoder_and_stream(tmp_path):
    """Byte-fuzz the RF64/ds64 parsing paths (both decoders)."""
    sr = 8000
    sig = (0.1 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    base_path = tmp_path / "base_rf64.wav"
    with audio_io.StreamWriter(base_path, sr, 1, force_rf64=True) as w:
        w.write(sig)
    base = base_path.read_bytes()

    def opener(p):
        audio_io.read_file(p)

    _fuzz_reader(base, tmp_path, opener)

    def stream_opener(p):
        with audio_io.StreamReader(p) as r:
            if r.frames > 0:
                r.read(0, min(256, r.frames))

    _fuzz_reader(base, tmp_path, stream_opener)


def test_crafted_rf64_huge_ds64_size(tmp_path):
    """A near-max 64-bit ds64 data size must not bypass the bounds clamp via
    uint64 wraparound (pos + SIZE_MAX wraps past the buffer length) in either
    decoder."""
    sr = 8000
    sig = (0.1 * np.sin(2 * np.pi * 440 * np.arange(1024) / sr)).astype(np.float32)
    base_path = tmp_path / "huge.wav"
    with audio_io.StreamWriter(base_path, sr, 1, force_rf64=True) as w:
        w.write(sig)
    raw = bytearray(base_path.read_bytes())
    # ds64 payload starts at 20: riff(8) data(8) frames(8); poison the sizes
    for off in (20, 28, 36):
        raw[off:off + 8] = (0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(bytes(raw))
    # in-memory decode clamps to the real bytes
    data, sr2, ch = audio_io.read_file(str(bad))
    assert sr2 == sr and ch == 1 and len(data) == len(sig)
    np.testing.assert_array_equal(data[:, 0], sig)
    # streaming reader clamps frames to the file size
    r = audio_io.StreamReader(str(bad))
    assert r.frames == len(sig)
    np.testing.assert_array_equal(r.read(0, r.frames)[:, 0], sig)
