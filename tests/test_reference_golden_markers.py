"""Golden parity for the master-curve assembly vs the reference's executed
markers.py classes (markers.py:566-840).

The reference curve classes only touch vispy for display (scene.Line
set_data); with the import stubs they instantiate on a plain-data fake
canvas, `update()` runs their real numpy math, and `.data` is the golden
value for our headless `models/markers.py` equivalents.
"""

import types

import numpy as np
import pytest

from tests import reference_shim

pytestmark = pytest.mark.skipif(
    not reference_shim.reference_available(),
    reason="reference tree not available for golden execution",
)

SR, HOP, DURATION = 44100, 256, 6.0


@pytest.fixture(scope="module")
def ref_markers():
    return reference_shim.load("markers")


def _canvas(**kwargs):
    base = dict(duration=DURATION, sr=SR, hop=HOP,
                speed_view=types.SimpleNamespace(scene=None))
    base.update(kwargs)
    return types.SimpleNamespace(**base)


def _traces():
    """Three drawn traces: two overlapping, one separate."""
    out = []
    for t0, t1, f in ((0.5, 2.5, 1.1), (2.0, 3.5, 0.7), (4.5, 5.5, 2.3)):
        times = np.linspace(t0, t1, 80)
        speed = 0.01 * np.sin(2 * np.pi * f * times)
        out.append(types.SimpleNamespace(times=times, speed=speed,
                                         start=t0, end=t1))
    return out


def test_master_speed_line_golden(ref_markers):
    from pyaudiorestoration_tpu.models import markers

    traces = _traces()
    canvas = _canvas(lines=traces)
    ref_line = ref_markers.MasterSpeedLine(canvas)
    ref_line.update_bands((0.0, 5.0))  # update_bands triggers update()

    ours = markers.MasterSpeedLine(SR, HOP, DURATION, bands=(0.0, 5.0))
    data = ours.update(traces)
    assert data.shape == ref_line.data.shape
    np.testing.assert_allclose(data[:, 0], ref_line.data[:, 0], rtol=1e-9)
    np.testing.assert_allclose(data[:, 1], ref_line.data[:, 1], atol=1e-7)

    # overlap grouping (markers.py:641-664)
    ref_groups = ref_line.get_overlapping_lines()
    our_groups = markers.MasterSpeedLine.get_overlapping_lines(traces)
    assert [[id(l) for l in g] for g in ref_groups] == \
           [[id(l) for l in g] for g in our_groups]

    # linspace conversion (markers.py:595-599)
    np.testing.assert_allclose(ours.get_linspace(traces),
                               ref_line.get_linspace(), atol=1e-7)


def test_master_reg_line_golden(ref_markers):
    from pyaudiorestoration_tpu.models import markers

    regs = [types.SimpleNamespace(t_center=1.2, amplitude=0.012, omega=3.5,
                                  phase=0.4, offset=0.0),
            types.SimpleNamespace(t_center=3.8, amplitude=0.02, omega=3.1,
                                  phase=2.9, offset=0.25)]
    canvas = _canvas(regs=list(regs))
    ref_line = ref_markers.MasterRegLine(canvas)
    ref_line.update()

    ours = markers.MasterRegLine(SR, HOP, DURATION)
    data = ours.update(list(regs))
    assert data.shape == ref_line.data.shape
    np.testing.assert_allclose(data, ref_line.data, atol=1e-10)


@pytest.mark.parametrize("smoothing", [1, 2, 3])
def test_lag_line_golden(ref_markers, smoothing):
    from pyaudiorestoration_tpu.models import markers

    lag_samples = [types.SimpleNamespace(t=t, d=d, corr=c) for t, d, c in
                   ((0.4, 0.010, 0.9), (2.0, 0.013, 0.8), (3.5, 0.008, 0.95),
                    (5.2, 0.011, 0.85))]
    az_times = np.linspace(1.0, 2.2, 24)
    azimuths = [types.SimpleNamespace(
        times=az_times,
        lags=0.012 + 0.001 * np.sin(az_times * 4),
        corrs=np.full(24, 0.7))]
    canvas = _canvas(markers=list(lag_samples), lags=list(lag_samples),
                     azimuths=list(azimuths))
    ref_line = ref_markers.LagLine(canvas)
    ref_line.smoothing = smoothing
    ref_line.update()

    ours = markers.LagLine(SR, HOP, DURATION, smoothing=smoothing)
    data = ours.update(lag_samples, azimuths)
    assert data.shape == ref_line.data.shape
    # the azimuth resample passes through a float32 staging array in one
    # implementation and float64 in the other
    np.testing.assert_allclose(data, ref_line.data, atol=1e-5)


def test_pan_line_golden(ref_markers):
    from pyaudiorestoration_tpu.models import markers

    pans = [types.SimpleNamespace(t=t, pan=p) for t, p in
            ((0.8, 1.2), (2.5, 0.8), (4.9, 1.05))]
    canvas = _canvas(markers=list(pans))
    ref_line = ref_markers.PanLine(canvas)
    ref_line.update()

    ours = markers.PanLine(SR, HOP, DURATION)
    data = ours.update(list(pans))
    assert data.shape == ref_line.data.shape
    np.testing.assert_allclose(data, ref_line.data, atol=1e-12)
