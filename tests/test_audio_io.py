"""Native audio I/O tests: FLAC bit-exactness (STREAMINFO MD5) and WAV round-trip."""

import hashlib

import os

import numpy as np
import pytest

from pyaudiorestoration_tpu.utils import audio_io


def _streaminfo(path):
    raw = open(path, "rb").read()
    assert raw[:4] == b"fLaC"
    p = raw[8:8 + 34]
    bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1
    total = ((p[13] & 0xF) << 32) | (p[14] << 24) | (p[15] << 16) | (p[16] << 8) | p[17]
    md5 = raw[8 + 18:8 + 34].hex()
    return bps, total, md5


@pytest.mark.parametrize("name", [
    "flutter.flac", "flutter_192.flac", "rhythm.flac",
    "rhythm+1percent.flac", "rhythm+5percent.flac", "dropouts_sample.flac",
])
def test_flac_md5_exact(samples_dir, name):
    path = samples_dir / name
    sig, sr, ch = audio_io.read_file(path)
    bps, total, md5_ref = _streaminfo(path)
    assert len(sig) == total
    assert sig.dtype == np.float32
    ints = np.round(sig.astype(np.float64) * (2 ** (bps - 1))).astype(np.int64)
    assert bps == 16
    assert hashlib.md5(ints.astype("<i2").tobytes()).hexdigest() == md5_ref


def test_wav_read(samples_dir):
    sig, sr, ch = audio_io.read_file(samples_dir / "nr_signal.wav")
    assert sr == 44100
    assert sig.shape[1] == ch == 1
    assert 0.01 < np.sqrt((sig ** 2).mean()) < 1.0


def test_wav_roundtrip_f32(tmp_path, rng):
    sig = rng.standard_normal((1000, 2)).astype(np.float32) * 0.3
    path = tmp_path / "rt.wav"
    audio_io.write_wav(path, sig, 48000)
    back, sr, ch = audio_io.read_file(path)
    assert sr == 48000 and ch == 2
    np.testing.assert_array_equal(back, sig)


def test_stream_reader_wav(tmp_path, rng):
    sig = (rng.standard_normal((10000, 2)) * 0.2).astype(np.float32)
    path = tmp_path / "s.wav"
    audio_io.write_wav(path, sig, 48000)
    with audio_io.StreamReader(str(path)) as r:
        assert (r.sample_rate, r.channels, r.frames) == (48000, 2, 10000)
        np.testing.assert_array_equal(r.read(5000, 100), sig[5000:5100])
        assert r.read(9950, 100).shape == (50, 2)  # clipped at EOF


def test_stream_reader_flac_fallback(samples_dir):
    with audio_io.StreamReader(str(samples_dir / "flutter.flac")) as r:
        full, sr, _ = audio_io.read_file(samples_dir / "flutter.flac")
        assert r.frames == len(full)
        np.testing.assert_array_equal(r.read(1000, 256), full[1000:1256])


def test_write_file_suffix(tmp_path, rng):
    sig = rng.standard_normal(500).astype(np.float32) * 0.1
    src = tmp_path / "x.flac"
    src.touch()
    out = audio_io.write_file(str(src), sig, 44100, suffix="_res")
    assert out.endswith("x_res.wav")
    back, sr, ch = audio_io.read_file(out)
    np.testing.assert_array_equal(back[:, 0], sig)


def test_stream_writer_fact_and_riff_sizes(tmp_path, rng):
    """Streamed WAVs carry a spec-required fact chunk (IEEE-float format)
    and exact RIFF/data sizes; the JUNK reservation must be skipped by all
    readers."""
    from pyaudiorestoration_tpu.utils import audio_io

    sig = rng.standard_normal((5000, 2)).astype(np.float32)
    path = str(tmp_path / "s.wav")
    with audio_io.StreamWriter(path, 22050, 2) as w:
        w.write(sig[:3000])
        w.write(sig[3000:])
    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF"
    assert int.from_bytes(raw[4:8], "little") == len(raw) - 8
    assert raw[12:16] == b"JUNK" and b"fact" in raw[:92]
    back, sr, ch = audio_io.read_file(path)
    assert (sr, ch) == (22050, 2)
    np.testing.assert_array_equal(back, sig)
    r = audio_io.StreamReader(path)
    assert r.frames == 5000
    np.testing.assert_array_equal(r.read(1000, 500), sig[1000:1500])


def test_stream_writer_rf64_finalize(tmp_path, rng):
    """Outputs >= 4 GiB finalize as RF64 (sizes in ds64) instead of
    overflowing the 32-bit RIFF fields and losing the whole take; the
    force_rf64 hook exercises that path at test size, and both the
    in-memory decoder and the streaming reader parse it."""
    from pyaudiorestoration_tpu.utils import audio_io

    sig = rng.standard_normal((4096, 1)).astype(np.float32)
    path = str(tmp_path / "big.wav")
    with audio_io.StreamWriter(path, 48000, 1, force_rf64=True) as w:
        w.write(sig)
    raw = open(path, "rb").read()
    assert raw[:4] == b"RF64"
    assert raw[4:8] == b"\xff\xff\xff\xff"
    assert raw[12:16] == b"ds64"
    assert int.from_bytes(raw[28:36], "little") == sig.nbytes  # ds64 data size
    back, sr, ch = audio_io.read_file(path)
    assert (sr, ch) == (48000, 1)
    np.testing.assert_array_equal(back, sig)
    r = audio_io.StreamReader(path)
    assert r.frames == 4096
    np.testing.assert_array_equal(r.read(4000, 96), sig[4000:])


def test_flac_stream_reader_random_access(samples_dir):
    """FLAC streaming (round 3): the reader indexes frames at open and
    decodes on demand — random-access block reads must be bit-identical to
    the whole-file decode on every fixture, with no in-memory fallback."""
    import numpy as np

    from pyaudiorestoration_tpu.utils import audio_io

    for name in ("flutter.flac", "rhythm.flac", "dropouts_sample.flac"):
        path = str(samples_dir / name)
        full, sr, ch = audio_io.read_file(path)
        with audio_io.StreamReader(path) as r:
            assert r.sample_rate == sr and r.channels == ch
            assert int(r.frames) == len(full)
            n = len(full)
            rng = np.random.default_rng(7)
            spans = [(0, 1000), (n - 1000, 1000), (n // 2 - 37, 4097)]
            spans += [(int(rng.integers(0, n - 2048)), 2048) for _ in range(5)]
            for start, count in spans:
                blk = r.read(start, count)
                np.testing.assert_array_equal(blk, full[start:start + count],
                                              err_msg=f"{name} @{start}")


def test_probe_file_header_only(samples_dir, tmp_path):
    """The native header probe returns (sr, channels, frames) for WAV and
    FLAC without decoding, matching the full reader."""
    import numpy as np

    from pyaudiorestoration_tpu.utils import audio_io, streaming

    flac = str(samples_dir / "flutter.flac")
    sig, sr, ch = audio_io.read_file(flac)
    psr, pch, pfr = audio_io.probe_file(flac)
    assert (psr, pch, pfr) == (sr, ch, len(sig))
    wav = str(tmp_path / "a.wav")
    audio_io.write_wav(wav, sig[:1000], sr)
    psr, pch, pfr = audio_io.probe_file(wav)
    assert (psr, pch, pfr) == (sr, ch, 1000)
    assert streaming.decoded_bytes(flac) == len(sig) * ch * 4


def test_flac_index_sidecar_cache(samples_dir, tmp_path, monkeypatch):
    """The frame index caches to a sidecar keyed by container size: a second
    open reuses it (and a stale sidecar for a different file is rejected)."""
    monkeypatch.delenv("AUDIOIO_NO_IDX", raising=False)
    import shutil

    import numpy as np

    from pyaudiorestoration_tpu.utils import audio_io

    src = str(tmp_path / "a.flac")
    shutil.copy(str(samples_dir / "flutter.flac"), src)
    full, sr, ch = audio_io.read_file(src)
    with audio_io.StreamReader(src) as r:
        b1 = r.read(1000, 2000)
    idx = src + ".flacidx"
    assert os.path.exists(idx)
    with audio_io.StreamReader(src) as r:  # cached-index open
        assert int(r.frames) == len(full)
        b2 = r.read(1000, 2000)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(b1, full[1000:3000])
    # stale sidecar (wrong container size) must be ignored and rebuilt
    shutil.copy(str(samples_dir / "rhythm.flac"), src)
    with audio_io.StreamReader(src) as r:
        full2, sr2, _ = audio_io.read_file(src)
        assert int(r.frames) == len(full2)
        np.testing.assert_array_equal(r.read(500, 500), full2[500:1000])


def test_flac_encoder_roundtrip(tmp_path):
    """The native FLAC encoder (fixed predictors + rice) round-trips
    bit-exactly at the quantized depth through the native decoder, for mono
    and stereo, 16 and 24 bit, odd lengths, and degenerate signals."""
    sr = 16000
    rng = np.random.default_rng(3)
    cases = {
        "tone+noise": (0.5 * np.sin(2 * np.pi * 440 * np.arange(12345) / sr)
                       + 0.01 * rng.standard_normal(12345)),
        "silence": np.zeros(5000),
        "constant": np.full(4097, 0.25),
        "noise": 0.9 * rng.standard_normal(9001) * 0.3,
        "clip": np.clip(2.0 * np.sin(2 * np.pi * 50 * np.arange(6000) / sr), -1, 1),
    }
    for bits in (16, 24):
        scale = float(1 << (bits - 1))
        lim = (1 << (bits - 1)) - 1
        for name, sig in cases.items():
            for ch in (1, 2):
                x = np.stack([sig, 0.5 * sig], -1)[:, :ch].astype(np.float32)
                p = str(tmp_path / f"{name}_{bits}_{ch}.flac")
                audio_io.write_flac(p, x, sr, bits_per_sample=bits)
                back, sr2, ch2 = audio_io.read_file(p)
                assert (sr2, ch2) == (sr, ch)
                assert back.shape == x.shape
                # the decoder must return EXACTLY the quantized values
                q = np.clip(np.trunc(np.abs(x.astype(np.float64)) * scale + 0.5)
                            * np.sign(x), -lim - 1, lim) / scale
                np.testing.assert_array_equal(back.astype(np.float64), q,
                                              err_msg=f"{name}/{bits}/{ch}")


def test_flac_encoder_reencodes_fixture(samples_dir, tmp_path):
    """Re-encoding a 16-bit fixture reproduces its samples exactly (the
    fixture's decoded floats are already on the 16-bit grid)."""
    full, sr, ch = audio_io.read_file(str(samples_dir / "flutter.flac"))
    p = str(tmp_path / "re.flac")
    audio_io.write_flac(p, full, sr, bits_per_sample=16)
    back, sr2, ch2 = audio_io.read_file(p)
    assert (sr2, ch2) == (sr, ch)
    np.testing.assert_array_equal(back, full)
    # and it streams
    with audio_io.StreamReader(p) as r:
        np.testing.assert_array_equal(r.read(777, 2048), full[777:777 + 2048])


def test_flac_encoder_mid_side_stereo(tmp_path):
    """Correlated stereo triggers mid/side frames; the round trip stays
    exact (the decoder's ch_code 10 path reconstructs L/R)."""
    sr = 16000
    rng = np.random.default_rng(9)
    t = np.arange(3 * sr) / sr
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)
           + 0.02 * rng.standard_normal(len(t)))
    x = np.stack([sig, sig * 0.97 + 0.001 * rng.standard_normal(len(t))],
                 -1).astype(np.float32)
    p = str(tmp_path / "ms.flac")
    audio_io.write_flac(p, x, sr)
    back, sr2, ch2 = audio_io.read_file(p)
    scale, lim = 32768.0, 32767
    q = np.clip(np.trunc(np.abs(x.astype(np.float64)) * scale + 0.5)
                * np.sign(x), -32768, lim) / scale
    np.testing.assert_array_equal(back.astype(np.float64), q)


def test_flac_stream_writer_matches_oneshot(tmp_path, rng):
    """The incremental FLAC writer produces BYTE-identical output to the
    whole-file encoder (shared block encoder + STREAMINFO patched on close),
    regardless of how the frames arrive (odd block sizes, carry buffering)."""
    sr = 22050
    sig = (0.3 * np.sin(2 * np.pi * 1000 * np.arange(20000) / sr)
           + 0.01 * rng.standard_normal(20000))
    x = np.stack([sig, -0.7 * sig], -1).astype(np.float32)
    p_one = str(tmp_path / "one.flac")
    audio_io.write_flac(p_one, x, sr, bits_per_sample=16)
    p_str = str(tmp_path / "streamed.flac")
    with audio_io.FlacStreamWriter(p_str, sr, 2, bits=16) as w:
        cuts = [0, 1, 4097, 4098, 10000, 16384, 20000]
        for a, b in zip(cuts[:-1], cuts[1:]):
            w.write(x[a:b])
    with open(p_one, "rb") as f1, open(p_str, "rb") as f2:
        assert f1.read() == f2.read()
    back, sr2, ch2 = audio_io.read_file(p_str)
    assert (sr2, ch2) == (sr, 2)
    assert back.shape == x.shape


def test_flac_stream_writer_streams_back(tmp_path, rng):
    """A streamed-out FLAC streams back in through the indexed reader with
    exact quantized values (close patches the frame count the reader needs)."""
    sr = 8000
    x = (0.2 * rng.standard_normal((30000, 1))).astype(np.float32)
    p = str(tmp_path / "s.flac")
    with audio_io.FlacStreamWriter(p, sr, 1, bits=24) as w:
        for s0 in range(0, len(x), 7001):
            w.write(x[s0:s0 + 7001])
    full, sr2, _ = audio_io.read_file(p)
    assert len(full) == len(x)
    with audio_io.StreamReader(p) as r:
        assert r.frames == len(x)
        np.testing.assert_array_equal(r.read(12345, 4096), full[12345:12345 + 4096])
    scale = float(1 << 23)
    np.testing.assert_allclose(full, x, atol=1.0 / scale)


def test_open_writer_extension_routing(tmp_path, rng):
    """open_writer picks the encoder by extension; both results read back."""
    sr = 8000
    x = (0.1 * rng.standard_normal((5000, 2))).astype(np.float32)
    for name, cls in (("a.wav", audio_io.StreamWriter),
                      ("a.FLAC", audio_io.FlacStreamWriter)):
        p = str(tmp_path / name)
        with audio_io.open_writer(p, sr, 2) as w:
            assert isinstance(w, cls)
            w.write(x)
        back, sr2, ch = audio_io.read_file(p)
        assert (sr2, ch, len(back)) == (sr, 2, len(x))


def test_write_file_output_format(tmp_path, rng):
    """set_output_format('flac') reroutes write_file (and out_ext) to the
    archive format; resetting restores float32 WAV."""
    sig = (0.1 * rng.standard_normal(3000)).astype(np.float32)
    src = str(tmp_path / "in.wav")
    audio_io.write_wav(src, sig, 8000)
    try:
        audio_io.set_output_format("flac", bits=16)
        assert audio_io.out_ext() == "flac"
        out = audio_io.write_file(src, sig, 8000)
        assert out.endswith("_out.flac")
        back, sr2, _ = audio_io.read_file(out)
        np.testing.assert_allclose(back[:, 0], sig, atol=1.0 / 32768)
    finally:
        audio_io.set_output_format("wav")
    assert audio_io.write_file(src, sig, 8000, suffix="_w").endswith("_w.wav")


def test_no_idx_env_suppresses_sidecar(tmp_path):
    """AUDIOIO_NO_IDX=1 (set by conftest) must keep source dirs pristine:
    streaming a FLAC writes no .flacidx next to it."""
    sr = 8000
    sig = (0.5 * np.sin(2 * np.pi * 220 * np.arange(20000) / sr)
           ).astype(np.float32)[:, None]
    p = str(tmp_path / "clean.flac")
    audio_io.write_flac(p, sig, sr)
    with audio_io.StreamReader(p) as r:
        r.read(5000, 1000)
    assert not os.path.exists(p + ".flacidx")


def test_flac_index_sidecar_same_size_replacement(tmp_path, monkeypatch):
    monkeypatch.delenv("AUDIOIO_NO_IDX", raising=False)
    """A sidecar is keyed by a header fingerprint in addition to size: a
    same-size replacement file (different STREAMINFO MD5) must invalidate
    the cached frame index instead of reusing stale offsets."""
    sr = 8000
    t = np.arange(20000) / sr
    a = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None]
    b = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None]
    pa, pb = str(tmp_path / "x.flac"), str(tmp_path / "b.flac")
    audio_io.write_flac(pa, a, sr)
    audio_io.write_flac(pb, b, sr)
    # pad the smaller container with trailing zeros so both have the SAME
    # byte size (the reader stops at total_samples, so a padded tail is
    # ignored); this forces the fingerprint to be the only discriminator
    sa, sb = os.path.getsize(pa), os.path.getsize(pb)
    size = max(sa, sb)
    for p, s in ((pa, sa), (pb, sb)):
        with open(p, "ab") as f:
            f.write(b"\0" * (size - s))
    with audio_io.StreamReader(pa) as r:
        got_a = r.read(5000, 1000)
    assert os.path.exists(pa + ".flacidx")
    # same-size replacement: copy b's bytes over a's path
    with open(pb, "rb") as f:
        data = f.read()
    with open(pa, "wb") as f:
        f.write(data)
    with audio_io.StreamReader(pa) as r:
        got_b = r.read(5000, 1000)
    full_b, _, _ = audio_io.read_file(pb)
    np.testing.assert_array_equal(got_b, full_b[5000:6000])
    assert not np.array_equal(got_a, got_b)


def test_flac_level0_fast_preset(tmp_path):
    """level=0 (fixed predictors only, like `flac -0`) must produce a valid
    stream that round-trips exactly like level=1, never smaller than it, and
    the streamed writer must honour the preset (byte-identical to one-shot
    at the same level).  Reference role: io_ops.py:7-23 (FLAC interchange)."""
    sr = 16000
    rng = np.random.default_rng(11)
    t = np.arange(30000) / sr
    sig = (0.6 * np.sin(2 * np.pi * 440 * t)
           + 0.01 * rng.standard_normal(t.size))
    x = np.stack([sig, 0.5 * sig], -1).astype(np.float32)
    p0 = str(tmp_path / "l0.flac")
    p1 = str(tmp_path / "l1.flac")
    audio_io.write_flac(p0, x, sr, bits_per_sample=16, level=0)
    audio_io.write_flac(p1, x, sr, bits_per_sample=16, level=1)
    b0, sr0, _ = audio_io.read_file(p0)
    b1, sr1, _ = audio_io.read_file(p1)
    assert sr0 == sr1 == sr
    np.testing.assert_array_equal(b0, b1)  # same quantized samples
    # LPC can only shrink the stream; a tonal signal must show it
    assert os.path.getsize(p1) < os.path.getsize(p0)
    # streamed writer at level 0 is byte-identical to the one-shot encoder
    ps = str(tmp_path / "l0_stream.flac")
    with audio_io.FlacStreamWriter(ps, sr, 2, bits=16, level=0) as w:
        for i in range(0, len(x), 5000):
            w.write(x[i:i + 5000])
    with open(p0, "rb") as fa, open(ps, "rb") as fb:
        assert fa.read() == fb.read()


def test_flac_level_plumbs_through_output_format(tmp_path, rng):
    """set_output_format(level=0) reaches both write_file and open_writer;
    invalid levels are rejected."""
    sig = (0.1 * rng.standard_normal(12000)).astype(np.float32)
    src = str(tmp_path / "in.wav")
    audio_io.write_wav(src, sig, 16000)
    try:
        audio_io.set_output_format("flac", bits=16, level=0)
        out = audio_io.write_file(src, sig, 16000, suffix="_f")
        assert out.endswith("_f.flac")
        with audio_io.open_writer(str(tmp_path / "s.flac"), 16000, 1) as w:
            assert w.level == 0 and w.bits == 16
        import pytest as _pytest
        with _pytest.raises(ValueError):
            audio_io.set_output_format("flac", level=7)
    finally:
        audio_io.set_output_format("wav")
    back, _, _ = audio_io.read_file(out)
    x64 = sig.astype(np.float64)
    q = np.clip(np.trunc(np.abs(x64) * 32768 + 0.5) * np.sign(x64),
                -32768, 32767)  # encoder rounds half away from zero
    np.testing.assert_array_equal(back[:, 0].astype(np.float64) * 32768, q)
