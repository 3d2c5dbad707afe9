"""Batch data-parallel restoration over the virtual mesh."""

import numpy as np
import pytest

import jax

from pyaudiorestoration_tpu.parallel import batch
from pyaudiorestoration_tpu.utils import audio_io


def test_load_batch_pads(tmp_path, rng):
    sr = 8000
    p1 = tmp_path / "a.wav"
    p2 = tmp_path / "b.wav"
    audio_io.write_wav(p1, rng.standard_normal(5000).astype(np.float32) * 0.1, sr)
    audio_io.write_wav(p2, rng.standard_normal(7000).astype(np.float32) * 0.1, sr)
    b, sr2, lengths = batch.load_batch([str(p1), str(p2)], multiple=1024)
    assert sr2 == sr
    assert b.shape == (2, 7168)
    assert lengths == [5000, 7000]
    assert np.all(b[0, 5000:] == 0)


def test_load_batch_reflect_tail_short_take(tmp_path, rng):
    """A take SHORTER than the reflect tail must load without crashing
    (regression: the reversed-slice tail hit a negative stop at k == L-1 and
    raised ValueError) and must carry the device reflect_row's clamped
    single reflection."""
    sr = 8000
    s1 = rng.standard_normal(1000).astype(np.float32) * 0.1
    s2 = rng.standard_normal(50000).astype(np.float32) * 0.1
    p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
    audio_io.write_wav(p1, s1, sr)
    audio_io.write_wav(p2, s2, sr)
    b, _, lengths = batch.load_batch([str(p1), str(p2)], reflect_tail=4096)
    assert lengths == [1000, 50000]
    L, k = 1000, 4096
    idx = np.clip(2 * (L - 1) - (L + np.arange(k)), 0, L - 1)
    np.testing.assert_array_equal(b[0, L:L + k], s1[idx])
    # beyond 2(L-1) the reflection clamps at sample 0 (device convention)
    assert np.all(b[0, 2 * (L - 1):L + k] == s1[0])


def test_restore_batch_files(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    sr = 8192
    f0 = 1024.0
    n = 2 * sr
    t = np.arange(n) / sr
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 2.0 * t)
    sig = np.sin(2 * np.pi * f0 * np.cumsum(speed) / sr).astype(np.float32)
    paths = []
    for i in range(2):
        p = tmp_path / f"f{i}.wav"
        audio_io.write_wav(p, sig, sr)
        paths.append(str(p))
    outs = batch.restore_batch_files(paths, f0, n_files_axis=2,
                                     n_fft=512, step=128)
    assert len(outs) == 2
    for o in outs:
        out, osr, _ = audio_io.read_file(o)
        assert osr == sr and len(out) == n
        assert np.sqrt((out ** 2).mean()) > 0.1
