"""End-to-end wow/flutter restoration tests on synthetic tones and the
flutter.flac fixture: the restored pilot tone must be measurably steadier."""

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import markers as mk
from pyaudiorestoration_tpu.pipelines import respeeder
from pyaudiorestoration_tpu.utils import audio_io, project


def tone_stability(sig, sr, smooth_periods=32):
    """Relative std of a tone's instantaneous frequency.

    Uses sub-sample (linearly interpolated) zero crossings averaged over
    ``smooth_periods`` periods so quantization noise doesn't mask the wow."""
    idx = np.where(np.bitwise_xor(sig[1:] > 0, sig[:-1] > 0))[0]
    frac = sig[idx] / (sig[idx] - sig[idx + 1])
    crossings = idx + frac  # sub-sample positions
    periods = crossings[2:] - crossings[:-2]  # full periods (skip half-cycles)
    k = smooth_periods
    avg = (crossings[2 * k:] - crossings[:-2 * k]) / k
    freqs = 2 * sr / avg
    core = freqs[len(freqs) // 10: -len(freqs) // 10]
    return np.std(core) / np.mean(core)


def make_wow_tone(sr=44100, duration=3.0, f0=3000.0, wow_hz=0.6, depth=0.02):
    n = int(duration * sr)
    t = np.arange(n) / sr
    speed = 1.0 + depth * np.sin(2 * np.pi * wow_hz * t)
    phase = 2 * np.pi * f0 * np.cumsum(speed) / sr
    return (np.sin(phase) * 0.5).astype(np.float32)


def test_respeeder_synthetic_end_to_end(tmp_path):
    sr = 44100
    sig = make_wow_tone(sr=sr)
    src = tmp_path / "wow.wav"
    audio_io.write_wav(src, sig, sr)
    before = tone_stability(sig.astype(float), sr)
    out_paths = respeeder.restore_file(str(src), mode="Peak", fft_size=4096,
                                       fft_overlap=8, zeropad=2, sinc_quality=30)
    out, osr, _ = audio_io.read_file(out_paths[0])
    after = tone_stability(out[:, 0].astype(float), osr)
    assert after < before * 0.2, (before, after)


def test_respeeder_flutter_fixture(tmp_path, samples_dir):
    """BASELINE config 1: wow/flutter fix of samples/flutter.flac."""
    import shutil
    src = tmp_path / "flutter.flac"
    shutil.copy(samples_dir / "flutter.flac", src)
    sig, sr, _ = audio_io.read_file(src)
    before = tone_stability(sig[:, 0].astype(float), sr)
    # fast flutter (6-16 Hz) needs a short analysis window; zeropad recovers
    # the frequency precision (cf. README.md spectra-zeropadding note)
    out_paths = respeeder.restore_file(str(src), mode="Peak", fft_size=1024,
                                       fft_overlap=8, zeropad=4, sinc_quality=50)
    out, osr, _ = audio_io.read_file(out_paths[0])
    after = tone_stability(out[:, 0].astype(float), osr)
    # flutter must be reduced substantially (measured ~5x)
    assert after < before * 0.35, (before, after)


def test_run_project_headless(tmp_path):
    """Save a .spd via the trace pipeline, then execute it headlessly —
    the GUI project workflow end to end."""
    sr = 22050
    sig = make_wow_tone(sr=sr, duration=2.0, f0=2000.0)
    src = tmp_path / "take.wav"
    audio_io.write_wav(src, sig, sr)
    respeeder.restore_file(str(src), mode="Peak", fft_size=2048, fft_overlap=8,
                           zeropad=2, sinc_quality=16, save_project=True)
    proj_path = tmp_path / "take.spd"
    assert proj_path.is_file()
    paths = respeeder.run_project(str(proj_path), out_suffix="_p2")
    out, osr, _ = audio_io.read_file(paths[0])
    assert osr == sr
    before = tone_stability(sig.astype(float), sr)
    after = tone_stability(out[:, 0].astype(float), osr)
    assert after < before * 0.3


def test_spd_project_roundtrip(tmp_path):
    line = mk.TraceLine([0.0, 1.0, 2.0], [440.0, 445.0, 442.0], offset=0.1)
    reg = mk.RegLine(0.5, 1.5, 0.01, 3.2, 0.1, 0.0)
    proj = project.Project(".spd", {"fft_size": 1024, "fft_overlap": 4},
                           {"lines": [line], "regs": [reg]})
    path = tmp_path / "t.spd"
    proj.save(str(path))
    back = project.Project.load(str(path))
    assert back.fft_size == 1024
    l2 = back.marker_list("lines")[0]
    np.testing.assert_allclose(l2.times, line.times)
    np.testing.assert_allclose(l2.freqs, line.freqs)
    assert l2.offset == pytest.approx(line.offset)
    r2 = back.marker_list("regs")[0]
    assert r2.omega == pytest.approx(reg.omega)


def test_master_speed_line_merging():
    t = np.linspace(0, 2, 100)
    l1 = mk.TraceLine(t, 440 * (1 + 0.01 * np.sin(t)))
    l2 = mk.TraceLine(t + 1.5, 880 * (1 + 0.01 * np.sin(t + 1.5)))
    groups = mk.MasterSpeedLine.get_overlapping_lines([l1, l2])
    assert len(groups) == 1  # they overlap
    l3 = mk.TraceLine(t + 5.0, 440 * np.ones_like(t))
    groups = mk.MasterSpeedLine.get_overlapping_lines([l1, l2, l3])
    assert len(groups) == 2


def test_master_reg_line_phase_continuity():
    regs = [mk.RegLine(0, 2, 0.02, 2 * np.pi * 0.5, 0.0, 0),
            mk.RegLine(3, 5, 0.02, 2 * np.pi * 0.5, 0.1, 0)]
    master = mk.MasterRegLine(44100, 256, 6.0)
    data = master.update(regs)
    assert data.shape[1] == 2
    assert np.all(np.isfinite(data))
    # blended curve amplitude stays near 1.5 * amp
    assert np.max(np.abs(data[:, 1])) <= 0.02 * 1.5 + 1e-6


def test_restore_file_blockwise_matches_whole(tmp_path):
    """Blockwise tracing (stream_trace, the reference's pyrespeeder_cmd
    pattern) restores as well as whole-take tracing on a wobbling tone."""
    import numpy as np

    from pyaudiorestoration_tpu.pipelines import respeeder
    from pyaudiorestoration_tpu.utils import audio_io, metrics

    sr = 22050
    n = 6 * sr
    t = np.arange(n) / sr
    speed = 1.0 + 0.015 * np.sin(2 * np.pi * 1.2 * t)
    sig = (np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5).astype(np.float32)
    p_a = str(tmp_path / "a.wav")
    p_b = str(tmp_path / "b.wav")
    audio_io.write_wav(p_a, sig[:, None], sr)
    audio_io.write_wav(p_b, sig[:, None], sr)
    kw = dict(fft_size=2048, fft_overlap=8, zeropad=2, sinc_quality=16)
    out_a = respeeder.restore_file(p_a, **kw)
    out_b = respeeder.restore_file(p_b, blockwise=128, **kw)
    a, _, _ = audio_io.read_file(out_a[0])
    b, _, _ = audio_io.read_file(out_b[0])
    f_in = metrics.flutter(sig, sr)
    f_a = metrics.flutter(a, sr)
    f_b = metrics.flutter(b, sr)
    assert f_a < f_in / 5 and f_b < f_in / 5, (f_in, f_a, f_b)
