"""Zero-phase IIR filtering on TPU.

Reference semantics: util/filters.py:7-37 — Butterworth low/high/band-pass
selected by which cutoffs are in (0, nyquist), applied forward-backward
(``sosfiltfilt``), plus a cumsum moving average.

TPU-first design: the sequential biquad recurrence is rewritten as an
*associative scan* over 2x2 state-transition matrices (Direct Form II
transposed state space), so the whole filter runs as a parallel prefix on the
VPU instead of a per-sample loop.  Coefficient design and initial conditions
come from scipy on the host (static per filter spec).

A ``backend="host"`` escape hatch calls scipy directly — used by the
control-plane master-curve code where bit-parity with the reference matters
and data is frame-rate sized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _dsp

__all__ = ["butter_bandpass_filter", "sosfiltfilt", "sosfilt", "moving_average", "make_odd"]


@functools.lru_cache(maxsize=256)
def _design_butter(lowcut: float, highcut: float, fs: float, order: int):
    """Reference's band selection logic (filters.py:7-24). Returns sos or None."""
    nyq = 0.5 * fs
    low = lowcut / nyq
    high = highcut / nyq
    low_ok = 0 < low < 1
    high_ok = 0 < high < 1
    if low_ok and high_ok:
        sos = _dsp.butter(order, [low, high], btype="band", output="sos")
    elif low_ok:
        sos = _dsp.butter(order, low, btype="high", output="sos")
    elif high_ok:
        sos = _dsp.butter(order, high, btype="low", output="sos")
    else:
        return None
    return np.asarray(sos, dtype=np.float64)


def _sos_section_scan(x, b0, b1, b2, a1, a2, zi):
    """One biquad over the last axis via associative scan.

    DF2T state space: s_n = A s_{n-1} + B x_n,  y_n = b0 x_n + s1_{n-1}
    with A = [[-a1, 1], [-a2, 0]], B = [b1 - a1*b0, b2 - a2*b0].
    """
    A = jnp.array([[-a1, 1.0], [-a2, 0.0]], dtype=x.dtype)
    B = jnp.array([b1 - a1 * b0, b2 - a2 * b0], dtype=x.dtype)
    # Keep the time axis at -3 for BOTH leaves so associative_scan sees one
    # consistent scan axis for arbitrary batch dims: cs (..., n, 2, 1),
    # As broadcast to (..., n, 2, 2).
    cs = (x[..., None] * B)[..., None]
    As = jnp.broadcast_to(A, cs.shape[:-2] + (2, 2))

    # full float32 on the tiny 2x2 products: TPU matmul defaults to bfloat16,
    # whose ~0.4% per-step error compounds MULTIPLICATIVELY over the ~1e5
    # prefix compositions and overflows to inf/NaN for narrowband filters
    hi = jax.lax.Precision.HIGHEST

    def combine(left, right):
        A1, c1 = left
        A2, c2 = right
        return (jnp.matmul(A2, A1, precision=hi),
                jnp.matmul(A2, c1, precision=hi) + c2)

    M, c = jax.lax.associative_scan(combine, (As, cs), axis=-3)
    # s_n = M_n @ zi + c_n ; y_n needs s_{n-1}
    zi = zi.astype(x.dtype)
    s = (jnp.matmul(M, zi[..., None, :, None], precision=hi) + c)[..., 0]  # (..., n, 2)
    s0 = jnp.broadcast_to(zi[..., None, :], s[..., :1, :].shape)
    s_prev = jnp.concatenate([s0, s[..., :-1, :]], axis=-2)
    return b0 * x + s_prev[..., 0]


def sosfilt(sos, x, zi=None):
    """Cascaded biquad filtering along the last axis (associative-scan based).

    ``sos``: (n_sections, 6) host array. ``zi``: (n_sections, 2) initial
    conditions in scipy's sosfilt convention.
    """
    sos = np.asarray(sos)
    x = jnp.asarray(x)
    if zi is None:
        zi = np.zeros((sos.shape[0], 2))
    for k in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[k]
        x = _sos_section_scan(x, float(b0), float(b1), float(b2), float(a1), float(a2),
                              jnp.asarray(zi[k]))
    return x


@functools.partial(jax.jit, static_argnames=("sos_tuple", "zi_tuple", "padlen"))
def _sosfiltfilt_device(x, sos_tuple, zi_tuple, padlen: int):
    sos_arr = np.asarray(sos_tuple, dtype=np.float64).reshape(-1, 6)
    zi_arr = np.asarray(zi_tuple, dtype=np.float32).reshape(-1, 2)
    n = x.shape[-1]
    # odd extension at both ends (scipy's default 'pad' method)
    left = 2 * x[..., :1] - x[..., 1:padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1:-1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    def run(sig):
        # scipy's sosfilt_zi pre-folds cumulative section DC gain, so every
        # section's zi is scaled by the overall input's first sample.
        x0 = sig[..., 0]
        s = sig
        for k in range(sos_arr.shape[0]):
            b0, b1, b2, _, a1, a2 = [float(v) for v in np.asarray(sos_arr)[k]]
            s = _sos_section_scan(s, b0, b1, b2, a1, a2,
                                  jnp.asarray(zi_arr[k]) * x0[..., None])
        return s

    fwd = run(ext)
    bwd = run(fwd[..., ::-1])[..., ::-1]
    return bwd[..., padlen:padlen + n]


def sosfiltfilt(sos, x, padlen=None):
    """Zero-phase forward-backward filter (device, scan-based)."""
    sos = np.asarray(sos, dtype=np.float64)
    x = jnp.asarray(x, jnp.float32)
    if padlen is None:
        # scipy's sosfiltfilt edge formula (first-order sections shorten it)
        ntaps = 2 * sos.shape[0] + 1
        ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
        padlen = 3 * int(ntaps)
    padlen = min(padlen, x.shape[-1] - 1)
    zi = _dsp.sosfilt_zi(sos)  # (n_sections, 2), scaled by the input's x0 at runtime
    return _sosfiltfilt_device(
        x, tuple(sos.reshape(-1).tolist()), tuple(zi.reshape(-1).astype(np.float32).tolist()),
        int(padlen))


def _sosfiltfilt_host_zi(sos, x):
    """scipy path, exact reference parity (float64)."""
    return _dsp.sosfiltfilt(sos, np.asarray(x)).astype(np.float32)


def butter_bandpass_filter(data, lowcut, highcut, fs, order=5, backend="device"):
    """Low/high/band-pass depending on which cutoffs are valid (filters.py:7-24).

    ``backend="device"`` runs the associative-scan filter under jit;
    ``backend="host"`` calls scipy (float64, exact parity).
    """
    sos = _design_butter(float(lowcut), float(highcut), float(fs), int(order))
    if sos is None:
        return data
    if backend == "host":
        return _sosfiltfilt_host_zi(sos, data)
    return sosfiltfilt(sos, data)


def moving_average(a, n=3):
    """Trailing moving average, length len(a)-n+1 (filters.py:27-30)."""
    if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
        ret = jnp.cumsum(a, dtype=jnp.float32)
        ret = ret.at[n:].set(ret[n:] - ret[:-n])
        return ret[n - 1:] / n
    ret = np.cumsum(a, dtype=float)
    ret[n:] = ret[n:] - ret[:-n]
    return ret[n - 1:] / n


def make_odd(n):
    return n if n % 2 else n + 1
