"""Headless compare affordances (VERDICT round 1, Missing #4 / Next #9-10):
2-source red/green overlay, renoiser re-mask fast path, izo colormap.
"""

import json
import os

import numpy as np
import pytest

from pyaudiorestoration_tpu.models import viz
from pyaudiorestoration_tpu.ops import fourier
from pyaudiorestoration_tpu.pipelines import renoiser
from pyaudiorestoration_tpu.utils import audio_io

SR = 8000


def _tone(f0, seconds=1.0, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_izo_colormap_loads():
    cmap = viz.get_cmap("izo")
    assert cmap.N == 256
    rgba = cmap(np.linspace(0, 1, 5))
    assert rgba.shape == (5, 4)
    assert np.all((rgba >= 0) & (rgba <= 1))
    # idempotent re-registration
    assert viz.get_cmap("izo").name == "izo"
    assert viz.get_cmap("magma") == "magma"


def test_compare_spectrograms_offset_fuses_channels(tmp_path):
    sig = _tone(1000.0, 1.0)
    mag = np.asarray(fourier.get_mag(sig, 512, 128))
    off_s = 0.25
    off_frames = int(round(off_s * SR / 128))
    path = str(tmp_path / "cmp.png")
    viz.save_comparison(path, mag, mag, SR, 128, offset_b=-off_s, mel=False)
    assert os.path.getsize(path) > 0

    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    viz.compare_spectrograms(mag, mag, SR, 128, offset_b=-off_s, mel=False, ax=ax)
    rgb = ax.images[0].get_array()
    plt.close(fig)
    # B shifted left by off_frames: in the overlap region red==green (yellow)
    red, green = rgb[..., 0], rgb[..., 1]
    overlap = slice(off_frames, mag.shape[1] - off_frames)
    np.testing.assert_allclose(red[:, off_frames:mag.shape[1]],
                               green[:, :mag.shape[1] - off_frames], atol=1e-6)
    # and outside the overlap only one channel is lit
    assert green[:, mag.shape[1] - off_frames:].max() > 0.3


def test_renoise_preview_remask_matches_process():
    rng = np.random.default_rng(2)
    sig = _tone(1000.0, 1.0) + 0.01 * rng.standard_normal(SR).astype(np.float32)
    pv = renoiser.RenoisePreview(sig, SR, 512, 4)
    profile = pv.noise_profile_from_selection(0.0, 1.0) - 20.0
    masked = pv.remask(profile, gain=-40.0)
    assert masked.shape == pv.magnitude().shape
    # remask must equal the full pipeline's mask arithmetic
    fac = np.asarray(renoiser.get_mask_fac(pv.magnitude(), profile, -40.0))
    np.testing.assert_allclose(masked, pv.magnitude() * fac, rtol=1e-5)
    # render path inverts to audio of the original length
    audio = pv.render(profile, gain=-40.0)
    assert audio.shape == (len(sig),)
    assert np.all(np.isfinite(audio))


def test_renoise_preview_is_remask_only(monkeypatch):
    """Parameter sweeps must not recompute the STFT (renoiser_gui.py:253-271)."""
    sig = _tone(800.0, 0.5)
    pv = renoiser.RenoisePreview(sig, SR, 512, 4)
    profile = pv.noise_profile_from_selection(0.0, 0.5)
    calls = {"n": 0}
    real = fourier.stft

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(fourier, "stft", spy)
    for gain in (-10.0, -20.0, -30.0):
        pv.remask(profile, gain)
    assert calls["n"] == 0


def test_cli_renoise_preview_and_tapesync_compare(tmp_path, capsys):
    from pyaudiorestoration_tpu import cli

    wav = str(tmp_path / "n.wav")
    rng = np.random.default_rng(4)
    sig = _tone(1200.0, 1.0) + 0.02 * rng.standard_normal(SR).astype(np.float32)
    audio_io.write_wav(wav, sig, SR)
    png = str(tmp_path / "prev.png")
    rc = cli.main(["renoise", wav, "--selection", "0.0", "1.0",
                   "--gain", "-30", "--preview", png,
                   "--fft-size", "512", "--fft-overlap", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["preview"] == png and os.path.getsize(png) > 0


def test_freq_and_time_tick_helpers():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    viz.apply_freq_ticks(ax, 44100, mel=True)
    labels = [t.get_text() for t in ax.get_yticklabels()]
    assert "1k" in labels and "20k" in labels and "50k" not in labels
    viz.format_time_ticks(ax)
    fmt = ax.xaxis.get_major_formatter()
    assert fmt(61.5, 0) == "1:01.5"
    assert fmt(0.25, 0) == "0:00.25"
    assert fmt(120.0, 0) == "2:00"
    plt.close(fig)


def test_interactive_html_viewer(tmp_path, flutter):
    """The self-contained viewer embeds a valid PNG of the mel spectrogram,
    the geometry metadata, and the marker polylines."""
    import base64
    import json
    import re
    import struct
    import zlib

    from pyaudiorestoration_tpu.models import viz_html
    from pyaudiorestoration_tpu.ops import fourier

    sig, sr = flutter
    fft_size, hop = 1024, 256
    mag = np.asarray(fourier.get_mag(sig[:, 0], fft_size, hop))
    out = str(tmp_path / "v.html")
    viz_html.save_interactive_html(
        out, mag, sr, hop,
        markers=[{"t": [0.5, 1.0], "f": [2000.0, 2100.0], "color": "#0f0"}],
        title="take")
    html = open(out, encoding="utf-8").read()
    assert "<canvas" in html and "wheel" in html and "mousemove" in html

    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["w"] == mag.shape[1]
    assert meta["duration"] == pytest.approx(mag.shape[1] * hop / sr)
    assert meta["fmax"] == sr / 2

    markers = json.loads(re.search(r"const MARKERS = (\[.*?\]);", html).group(1))
    assert markers[0]["f"] == [2000.0, 2100.0]

    png = base64.b64decode(re.search(r'base64,([A-Za-z0-9+/=]+)"', html).group(1))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (meta["w"], meta["h"])
    # IDAT decompresses to h scanlines of 1 filter byte + w*3 pixels
    idat_off = png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", png[idat_off - 8:idat_off - 4])[0]
    raw = zlib.decompress(png[idat_off:idat_off + idat_len])
    assert len(raw) == h * (1 + w * 3)


def test_interactive_compare_html(tmp_path, flutter):
    import json
    import re

    from pyaudiorestoration_tpu.models import viz_html
    from pyaudiorestoration_tpu.ops import fourier

    sig, sr = flutter
    mag = np.asarray(fourier.get_mag(sig[:, 0], 1024, 256))
    out = str(tmp_path / "cmp.html")
    viz_html.save_interactive_compare_html(out, mag, mag, sr, 256,
                                           offset_b=0.1)
    html = open(out, encoding="utf-8").read()
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    off = round(0.1 * sr / 256)
    assert meta["w"] == mag.shape[1] + off
    with pytest.raises(ValueError):
        viz_html.save_interactive_compare_html(out, mag, mag[:-1], sr, 256)


def test_audition_html_page(tmp_path):
    """The headless playback page (GUI AudioWidget + CursorUpdater
    equivalent): two takes embed as 16-bit WAV data URIs with spectrogram
    lanes, an rAF-driven cursor, and A/B switching."""
    import numpy as np

    from pyaudiorestoration_tpu.models import audition

    sr = 8000
    t = np.arange(2 * sr) / sr
    a = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = audition.save_audition_html(
        str(tmp_path / "aud.html"), [("orig", a), ("restored", 0.5 * a)], sr,
        title="t </script>")
    h = open(out, encoding="utf-8").read()
    assert h.count("<audio") == 2
    assert h.count("audio/wav;base64") == 2
    assert "requestAnimationFrame" in h and "toggle()" in h
    assert "</script><" not in h.split("<script>")[0]  # title escaped
    # 16-bit payload decodes back to the tone
    import base64
    b64 = h.split('audio/wav;base64,')[1].split('"')[0]
    wav = base64.b64decode(b64)
    assert wav[:4] == b"RIFF" and len(wav) == 44 + 2 * sr * 2
