"""Golden parity for the data-marker classes vs the reference's executed
markers.py (TraceLine auto-align, RegLine conventions, AzimuthLine
reject/median postprocess; markers.py:91-563).

The reference markers only touch vispy for display; on a plain-data fake
canvas their constructors/postprocessors run the real numpy math.
"""

import types

import numpy as np
import pytest

from tests import reference_shim

pytestmark = pytest.mark.skipif(
    not reference_shim.reference_available(),
    reason="reference tree not available for golden execution",
)


@pytest.fixture(scope="module")
def ref_markers():
    return reference_shim.load("markers")


def _marker_canvas(**kwargs):
    base = dict(
        markers=[],
        views=[],
        spectra=[types.SimpleNamespace(mel_transform=None)],
        lines=[],
    )
    base.update(kwargs)
    return types.SimpleNamespace(**base)


def test_trace_line_golden(ref_markers, rng):
    """log2 / mean-center / offset handling (markers.py:179-226)."""
    from pyaudiorestoration_tpu.models import markers

    times = np.linspace(1.0, 3.0, 120)
    freqs = 1000.0 * np.exp(0.01 * np.sin(2 * np.pi * 2 * times))
    canvas = _marker_canvas()
    ref_line = ref_markers.TraceLine(canvas, times, freqs)
    ours = markers.TraceLine(times, freqs)
    np.testing.assert_allclose(ours.speed, ref_line.speed, atol=1e-12)
    assert ours.offset == ref_line.offset == 0
    assert (ours.start, ours.end) == (ref_line.start, ref_line.end)


def test_trace_line_auto_align_golden(ref_markers, rng):
    """auto_align offsets a new trace onto the mean of existing lines
    (markers.py:199-207)."""
    from pyaudiorestoration_tpu.models import markers

    t1 = np.linspace(0.5, 2.5, 100)
    f1 = 980.0 * np.exp(0.008 * np.sin(7 * t1))
    t2 = np.linspace(1.5, 3.5, 100)
    f2 = 1015.0 * np.exp(0.008 * np.sin(7 * t2 + 1.0))

    canvas = _marker_canvas()
    ref_a = ref_markers.TraceLine(canvas, t1, f1)
    ref_a.initialize()
    canvas.lines = [ref_a]  # the respeeder canvas exposes traces as .lines
    ref_b = ref_markers.TraceLine(canvas, t2, f2, auto_align=True)

    our_a = markers.TraceLine(t1, f1)
    our_b = markers.TraceLine(t2, f2, auto_align=True, other_lines=[our_a])
    assert our_b.offset == pytest.approx(ref_b.offset, abs=1e-9)
    np.testing.assert_allclose(our_b.speed, ref_b.speed, atol=1e-7)


def test_reg_line_conventions_golden(ref_markers):
    """Negative-amplitude flip + phase shift convention (markers.py:118-133)."""
    from pyaudiorestoration_tpu.models import markers

    canvas = _marker_canvas()
    for amp, phase in ((-0.02, 0.4), (0.015, -1.2)):
        ref_reg = ref_markers.RegLine(canvas, 1.0, 3.0, amp, 3.3, phase, 0.1)
        ours = markers.RegLine(1.0, 3.0, amp, 3.3, phase, 0.1)
        assert ours.amplitude == pytest.approx(ref_reg.amplitude, abs=1e-12)
        assert ours.phase == pytest.approx(ref_reg.phase, abs=1e-12)
        assert ours.t_center == pytest.approx(ref_reg.t_center)
        # the blended speed curve samples identically
        grid = np.linspace(1.0, 3.0, 50)
        ref_speed = ref_reg.amplitude * np.sin(ref_reg.omega * grid + ref_reg.phase)
        np.testing.assert_allclose(ours.speed_at(grid), ref_speed, atol=1e-12)


@pytest.mark.parametrize("overlap,reject", [(4, 0.5), (7, 0.8)])
def test_azimuth_reject_golden(ref_markers, rng, overlap, reject, monkeypatch):
    """Correlation-gated rejection + NaN lerp + median filter
    (markers.py:540-554)."""
    from pyaudiorestoration_tpu.models import markers

    # the reference still spells np.NaN, which NumPy 2 removed
    monkeypatch.setattr(np, "NaN", np.nan, raising=False)

    times = np.linspace(2.0, 4.0, 30)
    lags = 0.01 + 0.002 * rng.standard_normal(30)
    corrs = rng.uniform(0.2, 1.0, 30)
    canvas = _marker_canvas(spectra=[types.SimpleNamespace(mel_transform=None),
                                     types.SimpleNamespace(mel_transform=None)])
    ref_az = ref_markers.AzimuthLine(canvas, times.copy(), lags.copy(),
                                     corrs.copy(), 500.0, 2000.0)
    ref_az.update_reject(overlap, reject)

    ours = markers.AzimuthLine(times.copy(), lags.copy(), corrs.copy(),
                               500.0, 2000.0)
    ours.update_reject(overlap, reject)
    np.testing.assert_allclose(ours.lags, ref_az.lags, atol=1e-12)
    assert ours.d == pytest.approx(ref_az.d, abs=1e-12)


def test_merge_traces_golden(ref_markers):
    """The merge-traces glue (pyrespeeder_gui.py:91-110): master-curve slice
    -> 2^ re-centering on the traces' mean frequency -> auto-aligned new
    TraceLine.  Runs the reference Canvas method on a plain-data fake."""
    ref_resp = reference_shim.load_tool("pyrespeeder_gui")
    from pyaudiorestoration_tpu.models import markers
    from pyaudiorestoration_tpu.pipelines import respeeder

    sr, hop, duration = 44100, 256, 6.0

    # two overlapping traces on a fake canvas
    canvas = _marker_canvas()
    t1 = np.linspace(0.5, 2.5, 100)
    f1 = 990.0 * np.exp(0.008 * np.sin(7 * t1))
    t2 = np.linspace(1.5, 3.5, 100)
    f2 = 1010.0 * np.exp(0.008 * np.sin(7 * t2 + 1.0))
    ref_a = ref_markers.TraceLine(canvas, t1, f1)
    ref_b = ref_markers.TraceLine(canvas, t2, f2)
    canvas.lines = [ref_a, ref_b]
    canvas.sr, canvas.hop, canvas.duration = sr, hop, duration
    canvas.speed_view = types.SimpleNamespace(scene=None)
    master = ref_markers.MasterSpeedLine(canvas)
    master.update()
    canvas.master_speed = master

    merged = {}
    canvas.props = types.SimpleNamespace(undo_stack=types.SimpleNamespace(
        push=lambda action: merged.update(line=action.traces[0])))
    fake = canvas  # Canvas.merge_traces only touches these attrs
    ref_resp.Canvas.merge_traces(fake, [ref_a, ref_b])
    g_line = merged["line"]

    our_a = markers.TraceLine(t1, f1)
    our_b = markers.TraceLine(t2, f2)
    our_master = markers.MasterSpeedLine(sr, hop, duration)
    data = our_master.update([our_a, our_b])
    o_line = respeeder.merge_traces([our_a, our_b], data, sr, hop)
    np.testing.assert_allclose(o_line.times, g_line.times, rtol=1e-9)
    assert o_line.offset == pytest.approx(g_line.offset, abs=1e-7)
    np.testing.assert_allclose(o_line.speed, g_line.speed, atol=1e-6)
