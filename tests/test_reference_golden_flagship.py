"""Whole-chain golden: the flagship respeeder workflow vs the reference's
executed code — spectrogram -> PeakTracker -> TraceLine -> MasterSpeedLine
-> speed curve -> sinc resample -> WAV (SURVEY.md §3.2-3.3 call stacks),
all on the real flutter.flac fixture.

Component-level goldens pin each stage exactly; this test pins the
COMPOSITION.  The final waveforms are compared by SNR because a ~1e-6
relative speed-curve difference (float32 device tracking vs the reference's
float64 fftpack) integrates to a fraction-of-a-sample phase drift over the
4 s take, which a naive allclose would misread as error.
"""

import types

import numpy as np
import pytest

from tests import reference_shim

pytestmark = pytest.mark.skipif(
    not reference_shim.reference_available(),
    reason="reference tree not available for golden execution",
)


@pytest.mark.parametrize("mode,min_reduction", [("Peak", 2.0), ("Center of Gravity", 1.7)])
def test_respeeder_workflow_golden(tmp_path, samples_dir, mode, min_reduction):
    ref_fourier = reference_shim.load("fourier")
    ref_wow = reference_shim.load("wow_detection")
    ref_markers = reference_shim.load("markers")
    ref_resampling = reference_shim.load("resampling")
    from pyaudiorestoration_tpu.pipelines import respeeder
    from pyaudiorestoration_tpu.utils import audio_io

    sig, sr, _ = audio_io.read_file(str(samples_dir / "flutter.flac"))
    duration = len(sig) / sr
    fft_size, overlap, quality = 1024, 8, 16
    hop = fft_size // overlap
    bands = (0.0, 20.0)  # the tool's speed-curve band filter default

    # the pilot tone
    mean_spec = np.abs(np.fft.rfft(sig[: 1 << 16, 0]))
    f0 = float(np.argmax(mean_spec[10:]) + 10) / (1 << 16) * sr
    trail = [(0.0, f0), (duration, f0)]

    d_ref = tmp_path / "ref"
    d_our = tmp_path / "ours"
    d_ref.mkdir()
    d_our.mkdir()
    f_ref = str(d_ref / "take.wav")
    f_our = str(d_our / "take.wav")
    audio_io.write_wav(f_ref, sig, sr)
    audio_io.write_wav(f_our, sig, sr)

    # --- reference chain, executed ---
    spectrum = np.asarray(ref_fourier.get_mag(sig[:, 0], fft_size, hop,
                                              "blackmanharris"))
    track = ref_wow.wow_detectors[mode](spectrum, sig, list(trail),
                                        fft_size, hop, sr, tolerance_st=1.0)
    canvas = types.SimpleNamespace(
        markers=[], views=[], lines=[], duration=duration, sr=sr, hop=hop,
        spectra=[types.SimpleNamespace(mel_transform=None)],
        speed_view=types.SimpleNamespace(scene=None))
    line = ref_markers.TraceLine(canvas, track.times, track.freqs)
    canvas.lines = [line]
    master = ref_markers.MasterSpeedLine(canvas)
    master.update_bands(bands)
    g_curve = master.get_linspace()
    ref_resampling.run([f_ref], speed_curve=g_curve, resampling_mode="Sinc",
                       sinc_quality=quality)

    # --- our chain ---
    o_line = respeeder.trace_trail(sig, sr, list(trail), mode, fft_size,
                                   overlap, tolerance=1.0)
    o_curve = respeeder.get_speed_curve([o_line], [], sr, hop, duration, bands)
    np.testing.assert_allclose(o_curve[:, 0], g_curve[:, 0], rtol=1e-9)
    np.testing.assert_allclose(o_curve[:, 1], g_curve[:, 1], rtol=3e-5)
    respeeder.restore_file(f_our, mode=mode, fft_size=fft_size,
                           fft_overlap=overlap, tolerance=1.0,
                           trail=list(trail), sinc_quality=quality,
                           bands=bands)

    g_out, _, _ = audio_io.read_file(str(d_ref / "take_res.wav"))
    o_out, _, _ = audio_io.read_file(str(d_our / "take_res.wav"))
    assert abs(len(g_out) - len(o_out)) <= 2
    n = min(len(g_out), len(o_out))
    # skip the reference sinc kernel's misaligned edge taps
    gi, oi = g_out[quality:n - quality, 0], o_out[quality:n - quality, 0]
    snr = 10 * np.log10(np.mean(gi ** 2) / np.mean((oi - gi) ** 2))
    assert snr > 35.0

    # and both actually restore: flutter drops several-fold
    def flutter_of(x):
        idx = np.where(np.bitwise_xor(x[1:] > 0, x[:-1] > 0))[0]
        frac = x[idx] / (x[idx] - x[idx + 1])
        cr = idx + frac
        k = 32
        avg = (cr[2 * k:] - cr[:-2 * k]) / k
        fr = 2 * sr / avg
        core = fr[len(fr) // 10: -len(fr) // 10]
        return float(np.std(core) / np.mean(core))

    before = flutter_of(sig[:, 0].astype(float))
    g_after = flutter_of(g_out[:, 0].astype(float))
    o_after = flutter_of(o_out[:, 0].astype(float))
    # CoG's hann-weighted center tracks slightly softer than Peak here
    assert before / g_after > min_reduction
    assert before / o_after > min_reduction
    assert o_after == pytest.approx(g_after, rel=0.1)
