"""Streamed spectral tools vs their in-memory twins (round 3, VERDICT #2).

The reference blocks big files with halos (util/fourier.py:390-407,
experiments/pyrespeeder_cmd.py:16-49); our streamed paths must match the
in-memory paths in the interior — renoise to ~1 ulp (same frames, same OLA
order), heal/hpss within the kernels' float envelopes.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pyaudiorestoration_tpu.models import markers as mk  # noqa: E402
from pyaudiorestoration_tpu.pipelines import dropouts, hpss_tool, renoiser  # noqa: E402
from pyaudiorestoration_tpu.utils import audio_io, streaming  # noqa: E402

SR = 22050


def _noisy_tone(n, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = (np.sin(2 * np.pi * 880 * t) * 0.4
           + rng.standard_normal(n).astype(np.float64) * 0.01)
    return np.stack([sig, 0.6 * sig], -1).astype(np.float32)


def _pair(tmp_path, x):
    p_mem = str(tmp_path / "mem.wav")
    p_str = str(tmp_path / "str.wav")
    audio_io.write_wav(p_mem, x, SR)
    audio_io.write_wav(p_str, x, SR)
    return p_mem, p_str


def test_decoded_bytes_and_should_stream(tmp_path):
    x = _noisy_tone(SR)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, SR)
    assert streaming.decoded_bytes(p) == SR * 2 * 4
    assert streaming.should_stream(p, "auto", threshold_bytes=100)
    assert not streaming.should_stream(p, "auto", threshold_bytes=1 << 30)
    assert streaming.should_stream(p, True, threshold_bytes=1 << 60)


def test_renoise_streamed_interior_parity(tmp_path):
    """renoise --stream matches the in-memory masked round trip to ~1 ulp in
    the interior (the VERDICT 'Done' criterion, scaled to CI size — the
    engine's memory high-water is one block regardless of length)."""
    x = _noisy_tone(int(5.3 * SR))
    p_mem, p_str = _pair(tmp_path, x)
    kw = dict(selection=(1.0, 2.0), gain=-30.0, fft_size=1024, fft_overlap=4)
    o_mem = renoiser.process_file(p_mem, stream=False, **kw)
    o_str = renoiser.process_file(p_str, stream=True, **kw)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    np.testing.assert_allclose(a[1024:-1024], b[1024:-1024], atol=2e-7)


def test_heal_streamed_matches_memory(tmp_path):
    """Streamed heal: per-box patches from local frames + max-merge equal the
    in-memory device scan within float tolerance."""
    n = int(4.2 * SR)
    x = _noisy_tone(n, seed=2)
    # carve two dropouts
    for c0 in (int(1.5 * SR), int(2.6 * SR)):
        x[c0:c0 + 800] *= 0.05
    p_mem, p_str = _pair(tmp_path, x)
    drops = [mk.DropoutSample((1.5 * SR / SR - 0.02, 500.0),
                              (1.5 * SR / SR + 0.05, 8000.0), 0.5),
             mk.DropoutSample((2.6 * SR / SR - 0.02, 500.0),
                              (2.6 * SR / SR + 0.05, 8000.0), 0.5)]
    o_mem = dropouts.heal_file(p_mem, drops, 512, 16, stream=False)
    o_str = dropouts.heal_file(p_str, drops, 512, 16, stream=True)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    np.testing.assert_allclose(a[512:-512], b[512:-512], atol=1e-4)
    # the heal actually did something
    sig, _, _ = audio_io.read_file(p_mem)
    assert not np.allclose(a, sig[: len(a)], atol=1e-5)


def test_heal_streamed_single_patch_shape(tmp_path, monkeypatch):
    """Boxes of very different sizes must all STFT at ONE span shape (the
    rounded max), so the patch stage compiles once per file — not once per
    64-frame bucket (VERDICT r03 weak #6)."""
    n = int(6.0 * SR)
    x = _noisy_tone(n, seed=3)
    p = str(tmp_path / "h.wav")
    audio_io.write_wav(p, x, SR)
    # a short box (~0.03 s) and a long one (~1.2 s): different buckets before
    drops = [mk.DropoutSample((1.0, 500.0), (1.03, 8000.0), 0.5),
             mk.DropoutSample((2.5, 500.0), (3.7, 8000.0), 0.5)]
    shapes = []
    real_stft = dropouts.fourier.stft

    def spy(x, *a, **kw):
        shapes.append(tuple(x.shape))
        return real_stft(x, *a, **kw)

    monkeypatch.setattr(dropouts.fourier, "stft", spy)
    dropouts.heal_file(p, drops, 512, 16, stream=True)
    patch_shapes = set(shapes[:len(drops)])
    assert len(patch_shapes) == 1, patch_shapes


def test_hpss_streamed_matches_memory(tmp_path):
    """Streamed HPSS (one pass, H+P together, median halo frames) matches the
    in-memory separation in the interior."""
    n = int(3.7 * SR)
    rng = np.random.default_rng(5)
    t = np.arange(n) / SR
    sig = (np.sin(2 * np.pi * 440 * t) * 0.4).astype(np.float32)
    clicks = np.zeros(n, np.float32)
    clicks[::2048] = 0.5
    x = np.stack([sig + clicks, 0.5 * (sig + clicks)], -1)
    p_mem, p_str = _pair(tmp_path, x)
    outs_mem = hpss_tool.separate_file(p_mem, 1024, 4, kernel_size=17,
                                       stream=False)
    outs_str = hpss_tool.separate_file(p_str, 1024, 4, kernel_size=17,
                                       stream=True)
    assert len(outs_mem) == len(outs_str) == 2
    for pm, ps in zip(outs_mem, outs_str):
        a, _, _ = audio_io.read_file(pm)
        b, _, _ = audio_io.read_file(ps)
        assert a.shape == b.shape
        np.testing.assert_allclose(a[2048:-2048], b[2048:-2048], atol=1e-5)


def test_dropouts_batch_streamed_matches_memory(tmp_path):
    """Streamed heuristic repair: frame-exact band volume curves (pass 1) and
    a blockwise IIR cascade (pass 2) track the in-memory host-backend path in
    the interior."""
    n = int(4.1 * SR)
    x = _noisy_tone(n, seed=7)
    # punch a few dropouts into the 3-12 kHz band
    rng = np.random.default_rng(8)
    t = np.arange(n) / SR
    x += (np.sin(2 * np.pi * 6000 * t) * 0.2)[:, None].astype(np.float32)
    for c0 in (int(1.1 * SR), int(2.9 * SR)):
        x[c0:c0 + 400] *= 0.1
    p_mem, p_str = _pair(tmp_path, x)
    o_mem = dropouts.process_heuristic(p_mem, 1024, 4, num_bands=6,
                                       filter_backend="host", stream=False)
    o_str = dropouts.process_heuristic(p_str, 1024, 4, num_bands=6,
                                       stream=True)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    h = 4096
    np.testing.assert_allclose(a[h:-h], b[h:-h], atol=1e-5)


def test_stream_masked_stft_multi_output(tmp_path):
    """The engine writes N output files from N factor sets in one pass."""
    x = _noisy_tone(SR * 2)
    p = str(tmp_path / "in.wav")
    audio_io.write_wav(p, x, SR)
    outs = [str(tmp_path / "h.wav"), str(tmp_path / "q.wav")]

    def make_fac(spec, t_lo):
        return [jnp.ones((), jnp.float32), jnp.full((), 0.5, jnp.float32)]

    streaming.stream_masked_stft(p, outs, make_fac, 1024, 256, [0, 1])
    a, _, _ = audio_io.read_file(outs[0])
    b, _, _ = audio_io.read_file(outs[1])
    np.testing.assert_allclose(b, 0.5 * a, atol=1e-7)
    np.testing.assert_allclose(a[1024:-1024], x[1024:-1024], atol=1e-5)


def test_expander_streamed_matches_memory(tmp_path):
    """Streamed expansion: frame-exact envelopes + blockwise gain/split +
    copy-normalize match the in-memory expander in the interior."""
    from pyaudiorestoration_tpu.pipelines import expander

    n = int(4.4 * SR)
    rng = np.random.default_rng(11)
    t = np.arange(n) / SR
    hiss = rng.standard_normal(n).astype(np.float64) * 0.003
    amp = 0.02 + 0.3 * (np.sin(2 * np.pi * 0.4 * t) > 0)
    sig = (np.sin(2 * np.pi * 15000 * t) * amp + hiss)
    x = np.stack([sig, 0.8 * sig], -1).astype(np.float32)
    p_mem, p_str = _pair(tmp_path, x)
    kw = dict(channel_mode="L+R", fft_size=512, band_lower=13000,
              band_upper=17000, clip_lower=-60, clip_upper=-25,
              transition=8000)
    o_mem = expander.expand_file(p_mem, stream=False, **kw)
    o_str = expander.expand_file(p_str, stream=True, **kw)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    h = 4096
    np.testing.assert_allclose(a[h:-h], b[h:-h], atol=2e-4)


def test_flat_spectrum_streamed_matches_memory(tmp_path):
    """Blockwise temporal-mean spectra (the difeq analysis input) match the
    in-memory mean to float tolerance."""
    from pyaudiorestoration_tpu.models import spectrum_flat

    x = _noisy_tone(int(3.3 * SR), seed=13)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, SR)
    for mode in ("L", "L+R", "Mean"):
        s_mem, sr1 = spectrum_flat.spectra_from_audio(p, 2048, 512, mode,
                                                      stream=False)
        s_str, sr2 = spectrum_flat.spectra_from_audio(p, 2048, 512, mode,
                                                      stream=True)
        assert sr1 == sr2 and len(s_mem) == len(s_str)
        for a, b in zip(s_mem, s_str):
            np.testing.assert_allclose(a, b, atol=1e-3)


def test_heal_streamed_no_dropouts_is_identity_roundtrip(tmp_path):
    """No markers -> the streamed masked round trip acts as an interior
    identity (and does not crash on an empty patch list)."""
    x = _noisy_tone(SR)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, SR)
    out = dropouts.heal_file(p, [], 512, 16, stream=True)
    b, _, _ = audio_io.read_file(out)
    np.testing.assert_allclose(b[512:-512], x[512:-512], atol=1e-5)


def test_streamed_restore_checkpoint_resume(tmp_path):
    """Pass-1 tracking checkpoints to a sidecar: a crash during pass 2 leaves
    it behind, and the rerun resumes WITHOUT re-tracking (identical output);
    the sidecar is removed after success."""
    import os

    from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev

    sr = 16000
    n = 6 * sr
    t = np.arange(n) / sr
    speed = 1.0 + 0.01 * np.sin(2 * np.pi * 1.5 * t)
    sig = np.sin(2 * np.pi * 1000 * np.cumsum(speed) / sr).astype(np.float32)
    p = str(tmp_path / "take.wav")
    audio_io.write_wav(p, sig[:, None], sr)
    kw = dict(fft_size=1024, fft_overlap=8, zeropad=2, sinc_quality=16)
    out1 = rdev.restore_file_streamed(p, **kw)
    a, _, _ = audio_io.read_file(out1)
    assert not os.path.exists(str(tmp_path / "take_res.speeds.npz"))

    # crash pass 2 on the first write -> the checkpoint must survive
    class Boom(Exception):
        pass

    orig_write = audio_io.StreamWriter.write
    audio_io.StreamWriter.write = lambda self, block: (_ for _ in ()).throw(Boom())
    try:
        with pytest.raises(Boom):
            rdev.restore_file_streamed(p, suffix="_r", **kw)
    finally:
        audio_io.StreamWriter.write = orig_write
    ckpt = str(tmp_path / "take_res_r.speeds.npz")
    assert os.path.exists(ckpt)

    # rerun: tracking must NOT rerun, and the output must match run 1
    orig_track = rdev.track_peaks_span
    rdev.track_peaks_span = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("tracking must not rerun when resuming"))
    try:
        out3 = rdev.restore_file_streamed(p, suffix="_r", **kw)
    finally:
        rdev.track_peaks_span = orig_track
    assert not os.path.exists(ckpt)
    c, _, _ = audio_io.read_file(out3)
    np.testing.assert_allclose(a, c, atol=1e-6)


def test_renoise_blockwise_in_memory_interior_parity(tmp_path):
    """renoiser.process(blockwise=N) (stream_process halo-trim blocking)
    matches whole-take processing in the interior."""
    x = _noisy_tone(int(4.0 * SR), seed=21)
    prof = np.full((513,), -60.0, np.float32)
    from pyaudiorestoration_tpu.pipelines import renoiser

    a = renoiser.process(x, SR, prof, -30.0, 1024, 4)
    b = renoiser.process(x, SR, prof, -30.0, 1024, 4, blockwise=256)
    assert a.shape == b.shape
    h = 8192
    np.testing.assert_allclose(a[h:-h], b[h:-h], atol=1e-4)


def test_max_mono_streamed_matches_memory(tmp_path):
    """Streamed max/min mono folds (engine mix-down) match the in-memory
    folds in the interior."""
    x = _noisy_tone(int(3.1 * SR), seed=31)
    x[:, 1] = np.roll(x[:, 1], 5)  # decorrelate so masks vary
    p_mem, p_str = _pair(tmp_path, x)
    outs_mem = dropouts.process_max_mono(p_mem, 1024, 4, stream=False)
    outs_str = dropouts.process_max_mono(p_str, 1024, 4, stream=True)
    assert len(outs_mem) == len(outs_str) == 2
    for pm, ps in zip(outs_mem, outs_str):
        a, _, _ = audio_io.read_file(pm)
        b, _, _ = audio_io.read_file(ps)
        assert a.shape == b.shape
        np.testing.assert_allclose(a[2048:-2048], b[2048:-2048], atol=1e-5)


def test_pan_streamed_matches_memory(tmp_path):
    """Streamed pan application equals the in-memory path exactly (pure
    sample-domain gain, no transform boundaries)."""
    from pyaudiorestoration_tpu.models import markers as mk
    from pyaudiorestoration_tpu.pipelines import pan

    x = _noisy_tone(int(2.5 * SR), seed=41)
    p_mem, p_str = _pair(tmp_path, x)
    samples = [mk.PanSample((0.5, 100.0), (1.0, 8000.0), 0.6),
               mk.PanSample((1.5, 100.0), (2.0, 8000.0), 1.3)]
    o_mem = pan.pan_file(p_mem, samples, stream=False)
    o_str = pan.pan_file(p_str, samples, stream=True)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_decompressor_streamed_matches_memory(tmp_path):
    """Streamed dynamics matching: blockwise band-passed RMS envelopes + a
    streamed gain multiply track the in-memory path in the interior."""
    from pyaudiorestoration_tpu.pipelines import decompressor

    n = int(3.2 * SR)
    t = np.arange(n) / SR
    rng = np.random.default_rng(51)
    env_ref = 0.1 + 0.5 * (np.sin(2 * np.pi * 0.5 * t) > 0)
    env_src = 0.3 + 0.1 * (np.sin(2 * np.pi * 0.5 * t) > 0)  # compressed
    carrier = np.sin(2 * np.pi * 1000 * t) + 0.1 * rng.standard_normal(n)
    ref = (carrier * env_ref).astype(np.float32)[:, None]
    src = (carrier * env_src).astype(np.float32)[:, None]
    ps_mem = str(tmp_path / "src_mem.wav")
    ps_str = str(tmp_path / "src_str.wav")
    pr = str(tmp_path / "ref.wav")
    audio_io.write_wav(ps_mem, src, SR)
    audio_io.write_wav(ps_str, src, SR)
    audio_io.write_wav(pr, ref, SR)
    o_mem = decompressor.decompress_file(ps_mem, pr, stream=False)
    o_str = decompressor.decompress_file(ps_str, pr, stream=True)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert a.shape == b.shape
    h = SR // 2
    np.testing.assert_allclose(a[h:-h], b[h:-h], atol=5e-4)


def test_humspeed_streamed_matches_memory(tmp_path):
    """Streamed constant-ratio resample (a constant speed curve through the
    two-pass restore) produces the same pitch shift as the in-memory global
    resample; the two engines differ only by a constant sub-window offset
    (different position conventions), so compare after xcorr alignment."""
    from pyaudiorestoration_tpu.pipelines import humspeed

    n = int(4.0 * SR)
    t = np.arange(n) / SR
    sig = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)[:, None]
    p_mem, p_str = _pair(tmp_path, sig)
    ratio = 1.02
    o_mem = humspeed.resample_file(p_mem, ratio=ratio, stream=False)
    o_str = humspeed.resample_file(p_str, ratio=ratio, stream=True)
    a, _, _ = audio_io.read_file(o_mem)
    b, _, _ = audio_io.read_file(o_str)
    assert abs(len(a) - len(b)) < 1024
    # both outputs carry the ratio-shifted tone
    from pyaudiorestoration_tpu.utils.metrics import flutter

    for y in (a, b):
        x = y[:, 0].astype(np.float64)
        idx = np.where(np.bitwise_xor(x[1:] > 0, x[:-1] > 0))[0]
        frac = x[idx] / (x[idx] - x[idx + 1])
        cr = idx + frac
        freq = SR / np.mean(np.diff(cr[len(cr) // 4: -len(cr) // 4])) / 2
        assert abs(freq - 440 * ratio) < 1.0, freq
    # xcorr-align then compare the interior
    h = 8192
    m = min(len(a), len(b)) - h
    xa, xb = a[h:m, 0], b[h:m, 0]
    lag_scan = [np.dot(xa[64:4096], xb[64 + k:4096 + k])
                for k in range(-64, 65)]
    k = int(np.argmax(lag_scan)) - 64
    xa2 = xa[64:20000]
    xb2 = xb[64 + k:20000 + k]
    np.testing.assert_allclose(xa2, xb2, atol=5e-3)


def test_spd_project_streamed_replay(tmp_path):
    """A saved .spd project replays through the streamed two-pass restore
    (master curve -> speed_curve override) with the same flutter fix as the
    in-memory replay."""
    from pyaudiorestoration_tpu.pipelines import respeeder
    from pyaudiorestoration_tpu.utils import metrics

    sr = 22050
    n = 6 * sr
    t = np.arange(n) / sr
    speed = 1.0 + 0.012 * np.sin(2 * np.pi * 1.4 * t)
    sig = (np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5).astype(np.float32)
    p_mem = str(tmp_path / "m.wav")
    p_str = str(tmp_path / "s.wav")
    audio_io.write_wav(p_mem, sig[:, None], sr)
    audio_io.write_wav(p_str, sig[:, None], sr)
    kw = dict(fft_size=2048, fft_overlap=8, zeropad=2, sinc_quality=16,
              save_project=True)
    respeeder.restore_file(p_mem, **kw)
    respeeder.restore_file(p_str, **kw)
    out_mem = respeeder.run_project(str(tmp_path / "m.spd"), stream=False,
                                    out_suffix="_replay")
    out_str = respeeder.run_project(str(tmp_path / "s.spd"), stream=True,
                                    out_suffix="_replay")
    a, _, _ = audio_io.read_file(out_mem[0])
    b, _, _ = audio_io.read_file(out_str[0])
    f_in = metrics.flutter(sig, sr)
    assert metrics.flutter(a, sr) < f_in / 5
    assert metrics.flutter(b, sr) < f_in / 5


def test_streamed_export_honours_flac_output(tmp_path):
    """With the FLAC output format set, a streamed spectral tool writes its
    larger-than-memory output through the incremental native FLAC encoder —
    and the file round-trips within the quantization step of the bit depth."""
    n = int(1.9 * SR)
    x = _noisy_tone(n, seed=11)
    p_wav, p_flac = _pair(tmp_path, x)
    drops = [mk.DropoutSample((0.6, 200.0), (0.65, 8000.0), 0.5)]
    out_wav = dropouts.heal_file(p_wav, drops, 512, 16, stream=True)
    try:
        audio_io.set_output_format("flac", bits=24)
        out_flac = dropouts.heal_file(p_flac, drops, 512, 16, stream=True)
    finally:
        audio_io.set_output_format("wav")
    assert out_flac.endswith(".flac")
    a, sra, _ = audio_io.read_file(out_wav)
    b, srb, _ = audio_io.read_file(out_flac)
    assert sra == srb and a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1.5 / (1 << 23))


def test_streamed_restore_checkpoint_rejects_replaced_input(tmp_path):
    """A checkpoint left by a crashed run must NOT be resumed when the input
    file has been replaced by a different file with identical geometry (the
    key includes size + mtime, not just frame counts) — round-3 ADVICE."""
    import os
    import time

    from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev

    sr = 16000
    n = 6 * sr
    t = np.arange(n) / sr

    def take(rate):
        speed = 1.0 + 0.01 * np.sin(2 * np.pi * rate * t)
        return np.sin(2 * np.pi * 1000 * np.cumsum(speed) / sr).astype(np.float32)

    p = str(tmp_path / "swap.wav")
    kw = dict(fft_size=1024, fft_overlap=8, zeropad=2, sinc_quality=16)

    audio_io.write_wav(p, take(1.5)[:, None], sr)

    class Boom(Exception):
        pass

    orig_write = audio_io.StreamWriter.write
    audio_io.StreamWriter.write = lambda self, block: (_ for _ in ()).throw(Boom())
    try:
        with pytest.raises(Boom):
            rdev.restore_file_streamed(p, **kw)
    finally:
        audio_io.StreamWriter.write = orig_write
    ckpt = str(tmp_path / "swap_res.speeds.npz")
    assert os.path.exists(ckpt)

    # replace the input with a DIFFERENT take of identical geometry; ensure
    # the mtime actually changes even on coarse filesystem clocks
    audio_io.write_wav(p, take(3.1)[:, None], sr)
    os.utime(p, ns=(time.time_ns() + 10**9, time.time_ns() + 10**9))

    tracked = {}
    orig_track = rdev.track_peaks_span

    def spy(*a, **k):
        tracked["ran"] = True
        return orig_track(*a, **k)

    rdev.track_peaks_span = spy
    try:
        out = rdev.restore_file_streamed(p, **kw)
    finally:
        rdev.track_peaks_span = orig_track
    assert tracked.get("ran"), "stale checkpoint was resumed for a replaced input"
    ref = rdev.restore_file_streamed(p, suffix="_ref", **kw)
    a, _, _ = audio_io.read_file(out)
    b, _, _ = audio_io.read_file(ref)
    np.testing.assert_allclose(a, b, atol=1e-6)
