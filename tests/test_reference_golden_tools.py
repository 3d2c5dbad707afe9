"""Golden parity vs the reference's TOOL-level code, executed in-process.

With the Qt/vispy import stubs in ``reference_shim`` (no GUI code is ever
*run* — the stubs only satisfy imports), all nine reference tool modules and
the experiments import cleanly, so the tool pipelines themselves become
golden-testable:

- difeq_gui.get_eq                       (difeq_gui.py:24-38)
- humspeed_gui.get_spectrum              (humspeed_gui.py:18-24)
- dropouts_gui process_heuristic/max_mono (dropouts_gui.py:137-163, 241-323,
  run as unbound methods on a plain-data fake ``self``)
- experiments/decompressor_cmd.process   (decompressor_cmd.py:26-190)
- experiments/group_delay.get_group_delay (group_delay.py:30-97, extracted by
  AST because that file runs hardcoded-path code at module level)

Skipped wholesale when /root/reference is not present.
"""

import types

import numpy as np
import pytest

from tests import reference_shim

pytestmark = pytest.mark.skipif(
    not reference_shim.reference_available(),
    reason="reference tree not available for golden execution",
)

SR = 44100


@pytest.fixture(scope="module")
def rng_tools():
    return np.random.default_rng(77)


def _write(path, sig, sr):
    from pyaudiorestoration_tpu.utils import audio_io

    audio_io.write_wav(str(path), np.asarray(sig, np.float32), sr)
    return str(path)


# ------------------------------------------------------------------ difeq --


@pytest.mark.parametrize("channel_mode", ["L", "L+R", "Mean"])
def test_difeq_get_eq_golden(tmp_path, rng_tools, channel_mode):
    ref_difeq = reference_shim.load_tool("difeq_gui")
    from pyaudiorestoration_tpu.pipelines import difeq

    t = np.arange(2 * SR) / SR
    base = (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng_tools.standard_normal(len(t))).astype(np.float32)
    tilted = base * 0.7 + 0.05 * np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    src = _write(tmp_path / "src.wav", np.stack([base, base * 0.9], 1), SR)
    ref = _write(tmp_path / "ref.wav", np.stack([tilted, tilted], 1), SR)

    g_freqs, g_eq = ref_difeq.get_eq(src, ref, channel_mode)
    freqs, eq = difeq.get_eq(src, ref, channel_mode)
    np.testing.assert_allclose(freqs, g_freqs, rtol=1e-9)
    assert np.asarray(eq).shape == np.asarray(g_eq).shape
    # float32 device spectra vs the reference's float64 fftpack fallback:
    # agreement to 0.05 dB everywhere incl. the -100 dB noise floor
    np.testing.assert_allclose(np.asarray(eq), np.asarray(g_eq), atol=5e-2)


def test_difeq_write_eq_txt_golden(tmp_path, rng_tools):
    ref_difeq = reference_shim.load_tool("difeq_gui")
    from pyaudiorestoration_tpu.pipelines import difeq

    freqs = np.linspace(20, 20000, 40)
    db = rng_tools.normal(0, 3, 40)
    f_ref = tmp_path / "ref_eq.txt"
    f_our = tmp_path / "our_eq.txt"
    ref_difeq.write_eq_txt(str(f_ref), freqs, db)
    difeq.write_eq_txt(str(f_our), freqs, db)
    assert f_our.read_text() == f_ref.read_text()


# --------------------------------------------------------------- humspeed --


def test_humspeed_get_spectrum_golden(samples_dir):
    ref_hum = reference_shim.load_tool("humspeed_gui")
    from pyaudiorestoration_tpu.pipelines import humspeed

    path = str(samples_dir / "flutter.flac")
    g_freqs, g_spec, g_sr = ref_hum.get_spectrum(path, "L", 2 ** 15)
    freqs, spec, sr = humspeed.get_spectrum(path, "L", 2 ** 15)
    assert sr == g_sr
    np.testing.assert_allclose(freqs, g_freqs, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(g_spec), atol=5e-2)


# --------------------------------------------------------------- dropouts --


def _fake_dropouts_self(path, **widget):
    name = "input"
    return types.SimpleNamespace(
        dropout_widget=types.SimpleNamespace(**widget),
        file_names=[name],
        names_to_full_paths={name: str(path)},
    )


def test_dropouts_heuristic_golden(tmp_path, rng_tools):
    """Unbound dropouts_gui.MainWindow.process_heuristic on a fake self vs
    our pipeline.  fft_size/f_upper are chosen so band_hz * fft_size stays
    below 65536: the reference builds its band edges as uint16
    (dropouts_gui.py:253) and under NumPy 2's NEP-50 promotion larger
    products wrap mod 2**16 inside the reference itself — there is no
    uncorrupted golden value to compare against beyond that range."""
    ref_drop = reference_shim.load_tool("dropouts_gui")
    from pyaudiorestoration_tpu.pipelines import dropouts
    from pyaudiorestoration_tpu.utils import audio_io

    # deterministic multi-tone: per-band volume curves are flat except at the
    # carved dropouts, so no find_peaks prominence or slope-gate decision sits
    # near its threshold (float32-vs-float64 spectra flip marginal decisions)
    sr = 8000
    t = np.arange(2 * sr) / sr
    sig = (0.4 * np.sin(2 * np.pi * 500 * t)
           + 0.25 * np.sin(2 * np.pi * 300 * t)
           + 0.15 * np.sin(2 * np.pi * 800 * t)
           + 0.1 * np.sin(2 * np.pi * 137 * t)).astype(np.float32)
    # carve two deep dropouts (~30 dB valleys)
    for c in (0.7, 1.4):
        i = int(c * sr)
        sig[i:i + 150] *= 0.03
    sig2 = np.stack([sig, np.roll(sig, 3)], 1)

    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = _write(d_ref / "tone.wav", sig2, sr)
    f_our = _write(d_our / "tone.wav", sig2, sr)

    fft_size, overlap = 64, 4
    widget = dict(max_width=0.08, max_slope=0.5, num_bands=6,
                  bottom_freedom=2.0, f_lower=100.0, f_upper=1000.0)
    fake = _fake_dropouts_self(f_ref, **widget)
    ref_drop.MainWindow.process_heuristic(fake, fft_size, fft_size // overlap)
    out = dropouts.process_heuristic(f_our, fft_size=fft_size,
                                     fft_overlap=overlap,
                                     filter_backend="host", **widget)

    g, sr_a, _ = audio_io.read_file(str(d_ref / "tone_out.wav"))
    o, sr_b, _ = audio_io.read_file(str(out))
    assert sr_a == sr_b == sr
    assert g.shape == o.shape
    assert not np.allclose(g, sig2, atol=1e-5)  # it actually patched something
    np.testing.assert_allclose(o, g, atol=2e-4)

    # the default device IIR cascade is PARITY-GRADE against the float64
    # golden output (defect-refined scan, VERDICT r03 #5; the host scipy
    # path above is kept as the test oracle only)
    out_dev = dropouts.process_heuristic(f_our, fft_size=fft_size,
                                         fft_overlap=overlap,
                                         suffix="_dev", **widget)
    o_dev, _, _ = audio_io.read_file(str(out_dev))
    snr = 10 * np.log10(np.mean(g ** 2) / np.mean((o_dev - g) ** 2))
    assert snr > 100.0, snr


def test_dropouts_max_mono_golden(tmp_path, rng_tools):
    ref_drop = reference_shim.load_tool("dropouts_gui")
    from pyaudiorestoration_tpu.pipelines import dropouts
    from pyaudiorestoration_tpu.utils import audio_io

    t = np.arange(SR) / SR
    left = (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng_tools.standard_normal(len(t))).astype(np.float32)
    right = (0.4 * np.sin(2 * np.pi * 880 * t)
             + 0.05 * rng_tools.standard_normal(len(t))).astype(np.float32)
    sig = np.stack([left, right], 1)

    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = _write(d_ref / "st.wav", sig, SR)
    f_our = _write(d_our / "st.wav", sig, SR)

    fake = _fake_dropouts_self(f_ref)
    ref_drop.MainWindow.process_max_mono(fake, 1024, 256)
    dropouts.process_max_mono(f_our, fft_size=1024, fft_overlap=4)

    for op in ("max", "min"):
        g, _, _ = audio_io.read_file(str(d_ref / f"stmax.wav")
                                     if op == "max" else str(d_ref / "stmin.wav"))
        o, _, _ = audio_io.read_file(str(d_our / f"st{op}.wav"))
        assert g.shape == o.shape
        np.testing.assert_allclose(o, g, atol=2e-4)


# ----------------------------------------------------------- decompressor --


def test_decompressor_golden(tmp_path, rng_tools):
    ref_cmd = reference_shim.load_tool("decompressor_cmd")
    from pyaudiorestoration_tpu.pipelines import decompressor
    from pyaudiorestoration_tpu.utils import audio_io

    # the reference's envelope reassembly needs len(signal)/hop >> corr_hop
    # (2048) RMS frames — with fewer, its window loop never runs and the
    # aligned envelope collapses to zeros (decompressor_cmd.py:139-158), so
    # use a 16 s take as the tool intends (full songs)
    sr = 22050
    t = np.arange(16 * sr) / sr
    env = 0.2 + 0.8 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t)) ** 2
    carrier = np.sin(2 * np.pi * 523 * t) + 0.2 * rng_tools.standard_normal(len(t))
    dynamic = (env * carrier * 0.4).astype(np.float32)
    compressed = (np.cbrt(np.abs(env)) * np.sign(env) * carrier * 0.3
                  ).astype(np.float32)

    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    src_ref = _write(d_ref / "take.wav", np.stack([compressed] * 2, 1), sr)
    ref_f = _write(d_ref / "master.wav", np.stack([dynamic] * 2, 1), sr)
    src_our = _write(d_our / "take.wav", np.stack([compressed] * 2, 1), sr)
    our_f = _write(d_our / "master.wav", np.stack([dynamic] * 2, 1), sr)

    ref_cmd.process(src_ref, ref_f)
    out = decompressor.decompress_file(src_our, our_f)

    g, sr_a, _ = audio_io.read_file(src_ref + "decompressed.wav")
    o, sr_b, _ = audio_io.read_file(str(out))
    assert sr_a == sr_b == sr
    assert g.shape == o.shape
    # compare the covered interior: the reference's no-sync path reassembles
    # the envelope through 50%-overlapped symmetric-hann windows
    # (decompressor_cmd.py:120-158) whose coverage is ~1 (ripple ~8e-4)
    # except the final ~2*corr_hop envelope frames, where its window loop
    # runs out and the envelope decays to hann-tail garbage; ours skips the
    # no-op reassembly entirely
    right = 3 * 2048 * 32
    gi, oi = g[:-right], o[:-right]
    snr = 10 * np.log10(np.mean(gi ** 2) / np.mean((oi - gi) ** 2))
    assert snr > 45.0


# ------------------------------------------------------------ group delay --


def test_group_delay_golden(rng_tools):
    """Both implementations must recover a known broadband inter-channel
    delay per band.  The reference function plots instead of returning, so
    the plotting sink is captured; its file cannot be imported (module-level
    hardcoded-path code), so the function is AST-extracted and run with the
    reference's own util modules as globals."""
    ref_filters = reference_shim.load("filters")
    ref_corr = reference_shim.load("correlation")
    from itertools import tee

    def pairwise(it):
        a, b = tee(it)
        next(b, None)
        return zip(a, b)

    captured = {}

    def plot_corr_lag(band_centers, correlations, lags, magnitudes):
        captured.update(centers=band_centers, corrs=correlations, lags=lags,
                        mags=magnitudes)

    import logging

    ns = {"np": np, "logging": logging, "filters": ref_filters,
          "xcorr": ref_corr.xcorr, "parabolic": ref_corr.parabolic,
          "pairwise": pairwise, "plot_corr_lag": plot_corr_lag}
    get_group_delay = reference_shim.extract_function(
        "experiments/group_delay.py", "get_group_delay", ns)

    true_delay = 21
    noise = rng_tools.standard_normal(3 * SR).astype(np.float32)
    ref_sig = noise
    src_sig = np.roll(noise, -true_delay)  # src lags ref by true_delay
    get_group_delay(ref_sig, src_sig)
    assert len(captured["lags"]) > 10
    # reference lag convention: (len//2) - peak of xcorr(ref, src)
    ref_median = np.median(captured["lags"])
    assert ref_median == pytest.approx(-true_delay, abs=1.0)

    from pyaudiorestoration_tpu.pipelines import group_delay

    rows = group_delay.band_delays(ref_sig, src_sig, SR)
    assert len(rows) > 10
    our_median = np.median([r["lag_samples"] for r in rows])
    # ours reports find_delay's convention (peak - center) = -reference's
    assert our_median == pytest.approx(true_delay, abs=1.0)
    assert ref_median == pytest.approx(-our_median, abs=1.5)


# --------------------------------------------------------------- expander --


def test_expander_golden(tmp_path, rng_tools):
    """Unbound expander_gui MainWindow methods on a plain-data fake self
    (expander_gui.py:116-142 envelope, 178-210 expand) vs our pipeline."""
    ref_exp = reference_shim.load_tool("expander_gui")
    ref_flat = reference_shim.load("spectrum_flat")
    from pyaudiorestoration_tpu.pipelines import expander
    from pyaudiorestoration_tpu.utils import audio_io

    sr = 22050
    t = np.arange(3 * sr) / sr
    env = 10.0 ** ((-30 + 12 * np.sin(2 * np.pi * 0.5 * t)) / 20)
    sig = (env * np.sin(2 * np.pi * 5000 * t)
           + 0.001 * rng_tools.standard_normal(len(t))).astype(np.float32)
    sig2 = np.stack([sig, sig * 0.8], 1)
    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = _write(d_ref / "comp.wav", sig2, sr)
    f_our = _write(d_our / "comp.wav", sig2, sr)

    fft_size, fft_hop = 512, 64
    band_lower, band_upper = 4000, 6000
    clip_lower, clip_upper = -45, -25
    smoothing_s, transition, order = 0.11, 1000, 3

    class V:
        def __init__(self, v):
            self._v = v

        def value(self):
            return self._v

    fake = object.__new__(ref_exp.MainWindow)
    fake.file_src = f_ref
    fake.fft_size = fft_size
    fake.fft_hop = fft_hop
    fake.sr = sr
    fake.s_band_lower = V(band_lower)
    fake.s_band_upper = V(band_upper)
    fake.s_clip_lower = V(clip_lower)
    fake.s_clip_upper = V(clip_upper)
    fake.s_smoothing = V(smoothing_s)
    fake.s_transition = V(transition)
    fake.s_transition_order = V(order)
    fake.plot = lambda: None
    fake.spectra, _ = ref_flat.spectra_from_audio(f_ref, fft_size, fft_hop,
                                                  "L+R", temporal_mean=False)
    fake.t = np.arange(0, fft_hop * len(fake.spectra[0][0]), fft_hop) / sr
    ref_exp.MainWindow.on_param_changed(fake)
    ref_exp.MainWindow.expand(fake)

    out = expander.expand_file(f_our, channel_mode="L+R", fft_size=fft_size,
                               band_lower=band_lower, band_upper=band_upper,
                               clip_lower=clip_lower, clip_upper=clip_upper,
                               smoothing_s=smoothing_s, transition=transition,
                               order=order)
    g, _, _ = audio_io.read_file(str(d_ref / "comp_decompressed.wav"))
    o, _, _ = audio_io.read_file(str(out))
    assert g.shape == o.shape
    assert not np.allclose(g, sig2, atol=1e-4)  # it expanded something
    snr = 10 * np.log10(np.mean(g ** 2) / np.mean((o - g) ** 2))
    assert snr > 55.0


# ----------------------------------------------------------- dropout heal --


def test_dropout_heal_golden(tmp_path, samples_dir):
    """Unbound dropout_healer Canvas.resample_files vs our heal pipeline on
    the curated dropouts_sample fixture + its .drop project
    (dropout_healer_gui.py:111-166)."""
    ref_heal = reference_shim.load_tool("dropout_healer_gui")
    from pyaudiorestoration_tpu.pipelines import dropouts
    from pyaudiorestoration_tpu.utils import audio_io, project

    proj = project.Project.load(str(samples_dir / "dropouts_sample.drop"))
    drops = proj.marker_list("dropouts")
    sig, sr, _ = audio_io.read_file(str(samples_dir / "dropouts_sample.flac"))

    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = _write(d_ref / "take.wav", sig, sr)
    f_our = _write(d_our / "take.wav", sig, sr)

    fft_size, overlap = 512, 16
    fake = object.__new__(ref_heal.Canvas)
    fake.fft_size = fft_size
    fake.hop = fft_size // overlap
    # sr/filenames are properties derived from the spectra list
    # (spectrum.py:320-341)
    fake.spectra = [types.SimpleNamespace(sr=sr, audio_path=f_ref)]
    fake.markers = [types.SimpleNamespace(t=d.t, f=d.f, width=d.width,
                                          height=d.height,
                                          surrounding=d.surrounding)
                    for d in drops]
    fake.props = types.SimpleNamespace(
        files_widget=types.SimpleNamespace(files=[types.SimpleNamespace(
            channel_widget=types.SimpleNamespace(channels=[0]))]),
        output_widget=types.SimpleNamespace(bump_index=lambda: None,
                                            suffix=""),
    )
    ref_heal.Canvas.resample_files(fake, [f_ref])
    out = dropouts.heal_file(f_our, drops, fft_size=fft_size,
                             fft_overlap=overlap, channels=[0])

    g, _, _ = audio_io.read_file(str(d_ref / "take_drops.wav"))
    o, _, _ = audio_io.read_file(str(out))
    assert g.shape == o.shape
    assert not np.allclose(g, sig, atol=1e-5)  # gains were applied
    snr = 10 * np.log10(np.mean(g ** 2) / np.mean((o - g) ** 2))
    assert snr > 55.0


# ----------------------------------------------------------------- renoiser --


def test_renoiser_mask_and_export_golden(tmp_path, rng_tools):
    """Unbound renoiser Canvas.get_mask_fac + run_resample vs our fused
    masked pipeline (renoiser_gui.py:273-278, 296-319)."""
    ref_ren = reference_shim.load_tool("renoiser_gui")
    ref_four = reference_shim.load("fourier")
    from pyaudiorestoration_tpu.pipelines import renoiser
    from pyaudiorestoration_tpu.utils import audio_io

    sr = 22050
    t = np.arange(2 * sr) / sr
    sig = (0.3 * np.sin(2 * np.pi * 880 * t)
           + 0.01 * rng_tools.standard_normal(len(t))).astype(np.float32)
    sig2 = np.stack([sig, sig], 1)
    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = _write(d_ref / "noisy.wav", sig2, sr)
    _write(d_our / "noisy.wav", sig2, sr)

    fft_size, overlap, gain = 1024, 4, -30.0
    hop = fft_size // overlap
    num_bins = fft_size // 2 + 1
    profile = np.linspace(-55.0, -45.0, num_bins).astype(np.float32)

    fake = object.__new__(ref_ren.Canvas)
    fake.fft_size = fft_size
    fake.hop = hop
    fake.final_profile = profile
    fake.parent = types.SimpleNamespace(props=types.SimpleNamespace(
        noise_widget=types.SimpleNamespace(gain=gain)))
    fake.props = types.SimpleNamespace(files_widget=types.SimpleNamespace(
        files=[types.SimpleNamespace(channel_widget=types.SimpleNamespace(
            channels=[0, 1]))]))
    # sr is a property derived from the spectra list (spectrum.py:320-323)
    fake.spectra = [types.SimpleNamespace(audio_path=f_ref, signal=sig2,
                                          sr=sr)]

    # mask parity on one spectrogram
    mag = np.asarray(ref_four.to_mag(ref_four.stft(sig, n_fft=fft_size,
                                                   step=hop)))
    g_fac = ref_ren.Canvas.get_mask_fac(fake, mag)
    o_fac = np.asarray(renoiser.get_mask_fac(mag, profile, gain))
    np.testing.assert_allclose(o_fac, g_fac, atol=1e-6)

    # full masked export parity
    ref_ren.Canvas.run_resample(fake)
    out = renoiser.process(sig2, sr, profile, gain, fft_size=fft_size,
                           fft_overlap=overlap)
    g, _, _ = audio_io.read_file(str(d_ref / f"noisy fft={fft_size}.wav"))
    assert g.shape == out.shape
    assert not np.allclose(g, sig2, atol=1e-5)  # it denoised something
    snr = 10 * np.log10(np.mean(g ** 2) / np.mean((out - g) ** 2))
    assert snr > 55.0


# ---------------------------------------------------------------- tapesynch --


def test_tapesynch_correlate_sources_golden(rng_tools):
    """Unbound pytapesynch Canvas.correlate_sources on fake Spectrum objects
    vs our pipeline (pytapesynch_gui.py:108-133, spectrum.py:153-171)."""
    ref_tape = reference_shim.load_tool("pytapesynch_gui")
    ref_spec_mod = reference_shim.load("spectrum")
    from pyaudiorestoration_tpu.pipelines import tapesynch

    sr = SR
    true_delay_s = 0.0137
    noise = rng_tools.standard_normal(4 * sr).astype(np.float32)
    ref_sig = noise[:, None]
    src_sig = np.roll(noise, int(round(true_delay_s * sr)))[:, None]

    def fake_spectrum(sig):
        s = object.__new__(ref_spec_mod.Spectrum)
        s.signal = sig
        s.sr = sr
        s.selected_channel = 0
        return s

    fake = object.__new__(ref_tape.Canvas)
    fake.spectra = [fake_spectrum(ref_sig), fake_spectrum(src_sig)]
    fake.parent = types.SimpleNamespace(props=types.SimpleNamespace(
        alignment_widget=types.SimpleNamespace(match_speed=False,
                                               ignore_phase=False)))

    t0, t1, lower, upper = 1.2, 2.4, 200.0, 4000.0
    g_delay, g_corr = ref_tape.Canvas.correlate_sources(fake, t0, t1, 0.0,
                                                        lower, upper)
    o_delay, o_corr = tapesynch.correlate_sources(ref_sig, src_sig, sr, t0, t1,
                                                  0.0, lower, upper)
    assert o_delay == pytest.approx(g_delay, abs=2e-6)
    assert o_corr == pytest.approx(g_corr, abs=1e-4)
    # both recover the planted shift (negative in find_delay's ref-vs-src
    # convention: the source lags, so the refinement subtracts)
    assert g_delay == pytest.approx(-true_delay_s, abs=2e-5)


# ----------------------------------------------------- humspeed track_to --


def test_humspeed_track_to_golden(rng_tools):
    """Unbound humspeed MainWindow.track_to on a fake self vs our pipeline
    (humspeed_gui.py:138-183)."""
    ref_hum = reference_shim.load_tool("humspeed_gui")
    from pyaudiorestoration_tpu.pipelines import humspeed

    sr, fft_size = SR, 2 ** 15
    freqs = np.fft.rfftfreq(fft_size, 1 / sr)
    # spectrum with a hum peak slightly off 100 Hz (0.8% fast)
    spectrum = np.full(len(freqs), -90.0)
    peak_freq = 100.0 * 1.008
    pb = int(round(peak_freq * fft_size / sr))
    spectrum[pb - 1: pb + 2] = (-42.0, -30.0, -41.0)
    hum_freqs = np.array([50.0, 100.0, 150.0])

    class V:
        def __init__(self, v):
            self._v = v

        def value(self):
            return self._v

    class CB:
        Clipboard = 0

        def clear(self, mode=None):
            pass

        def setText(self, s, mode=None):
            self.text = s

    fake = types.SimpleNamespace(
        freqs=freqs, spectrum=spectrum, sr=sr, fft_size=fft_size,
        hum_freqs=hum_freqs, s_tolerance=V(8),
        marker_freqs=[], marker_dBs=[], ratios=[],
        l_result=types.SimpleNamespace(setText=lambda s: None), cb=CB())
    ref_hum.MainWindow.track_to(fake, 101.0)
    assert fake.ratios, "reference matched the hum"

    res = humspeed.track_to(freqs, spectrum, sr, fft_size, 101.0, hum_freqs,
                            tolerance=8)
    assert res is not None
    freq, db, ratio, percent = res
    # ours refines the peak on device in float32
    assert freq == pytest.approx(fake.marker_freqs[0], rel=1e-6)
    assert db == pytest.approx(fake.marker_dBs[0], rel=1e-5)
    assert ratio == pytest.approx(fake.ratios[0], rel=1e-6)
    # the parabola apex of the synthetic 3-point peak lands at ~100.97 Hz,
    # so the matched 100 Hz hum implies ~ -0.96% speed change
    assert percent == pytest.approx(-0.957, abs=0.05)


# ------------------------------------------------------- spectrum fft cache --


def test_spectrum_cache_stride_reuse_golden(rng_tools):
    """Denser-hop stride reuse vs the reference's get_related_keys
    (spectrum.py:52-68, 355-376)."""
    ref_spec_mod = reference_shim.load("spectrum")
    from pyaudiorestoration_tpu.utils import cache

    spec = object.__new__(ref_spec_mod.Spectrum)
    spec.fft_storage = {}
    a128 = rng_tools.standard_normal((513, 64)).astype(np.float32)
    a256 = a128[:, ::2]
    spec.fft_storage[(1024, 0, 128, 1)] = a128
    spec.fft_storage[(1024, 0, 256, 1)] = a256
    spec.key = (1024, 0, 512, 1)
    more_dense, more_sparse = ref_spec_mod.Spectrum.get_related_keys(spec)
    assert more_dense == (1024, 0, 256, 1)
    # the canvas then strides it down (spectrum.py:373-375)
    step = spec.key[2] // more_dense[2]
    golden = np.array(spec.fft_storage[more_dense][:, ::step])

    c = cache.SpectrumCache()
    c.store(1024, 0, 128, 1, a128)
    c.store(1024, 0, 256, 1, a256)
    hit = c.lookup(1024, 0, 512, 1)
    assert hit is not None
    np.testing.assert_allclose(np.asarray(hit), golden)

    # quirk guard: for NON-dividing denser hops the reference still strides
    # with floor division (step = 512//384 = 1) and would store a hop-384
    # spectrogram under the hop-512 key — silently wrong; ours refuses
    spec.fft_storage[(1024, 0, 384, 1)] = rng_tools.standard_normal(
        (513, 43)).astype(np.float32)
    more_dense, _ = ref_spec_mod.Spectrum.get_related_keys(spec)
    assert more_dense == (1024, 0, 384, 1)  # closest, not divisible
    c2 = cache.SpectrumCache()
    c2.store(1024, 0, 384, 1, spec.fft_storage[(1024, 0, 384, 1)])
    assert c2.lookup(1024, 0, 512, 1) is None


# ------------------------------------------------------- legacy text formats --


def test_legacy_readers_golden(tmp_path):
    """read_trace/.speed, read_regs/.sin, read_lag/.syn vs the reference's
    executed parsers (io_ops.py:26-82)."""
    ref_io = reference_shim.load("io_ops")
    from pyaudiorestoration_tpu.utils import project

    base = tmp_path / "take.wav"
    base.write_bytes(b"")
    (tmp_path / "take.speed").write_text(
        "? 0.125\n0.0 980.5\n0.5 991.25\n? -0.5\n1.0 1003.0\n1.5 1001.5\n")
    (tmp_path / "take.sin").write_text(
        "1.0 3.0 0.012 3.5 0.4 0.0\n4.0 6.0 0.02 3.1 2.9 0.25\n")
    (tmp_path / "take.syn").write_text(
        "0.0 100.0 1.0 200.0 0.0123\n2.0 100.0 3.0 200.0 0.011\n")

    g_trace = ref_io.read_trace(str(base))
    o_trace = project.read_trace(str(base))
    assert len(o_trace) == len(g_trace) == 2
    for (go, gt, gf), (oo, ot, of) in zip(g_trace, o_trace):
        assert oo == go
        np.testing.assert_allclose(ot, gt)
        np.testing.assert_allclose(of, gf)

    np.testing.assert_allclose(project.read_regs(str(base)),
                               ref_io.read_regs(str(base)))
    np.testing.assert_allclose(project.read_lag(str(base)),
                               ref_io.read_lag(str(base)))
