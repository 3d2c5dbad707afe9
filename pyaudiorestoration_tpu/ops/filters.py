"""Zero-phase IIR filtering on TPU.

Reference semantics: util/filters.py:7-37 — Butterworth low/high/band-pass
selected by which cutoffs are in (0, nyquist), applied forward-backward
(``sosfiltfilt``), plus a cumsum moving average.

TPU-first design: the sequential biquad recurrence is rewritten as an
*associative scan* over 2x2 state-transition matrices (Direct Form II
transposed state space), so the whole filter runs as a parallel prefix on the
VPU instead of a per-sample loop.  Coefficient design and initial conditions
come from scipy on the host (static per filter spec).

A ``backend="host"`` escape hatch calls scipy directly.  Production call
sites use it in exactly two deliberate situations (each documented in
place): frame-rate control curves (master speed / lag curves, a few
hundred points — device round-trip costs more than the filter) and
host-resident streamed block loops where the data never touches the
device either side of the filter.  The audio-rate device paths
(dropout cascade, tapesynch correlate_sources) default to the
defect-refined device scan; the host path otherwise serves as the test
oracle.
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


# ---------------------------------------------------------------------------
# Parity-grade device IIR via ITERATIVE REFINEMENT (float64-less hardware):
# run the cheap f32 associative scan, evaluate the recurrence's RESIDUAL
# with error-free transforms (Knuth two-sum, Dekker two-prod — elementwise,
# no scan), then solve the defect recurrence d_n = A d_{n-1} + r_n with the
# SAME f32 scan and add the correction.  Each pass multiplies the error by
# ~2**-24 of the defect, so two passes reach the f32-representation floor
# (>100 dB to scipy's float64 sosfiltfilt on narrowband cascades — the
# plain scan bottoms out near 55 dB).  Unlike a full double-float scan
# (whose 12-leaf compensated combine blew XLA compile time 40x), this
# reuses the plain scan's compiled structure: ~3x compile, ~3x VPU work.
# Coefficients enter the residual as (hi, lo) float32 pairs of their
# float64 values, so the refined target IS the float64-coefficient filter.
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    v = s - a
    return s, (a - (s - v)) + (b - v)


def _split(a):
    c = a * 4097.0  # 2**12 + 1 splits a 24-bit mantissa into 12+12
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df_const(v):
    """Host: python/f64 scalar -> exact (hi, lo) float32 pair.

    Returned as np.float32 scalars, NOT python floats: a python float fed
    to :func:`_two_prod` would run the Dekker split in host f64 arithmetic,
    where the split degenerates (hi == a, lo == 0) and the error term is
    silently wrong."""
    hi = np.float32(v)
    return hi, np.float32(np.float64(v) - np.float64(hi))


def _state_scan(a1h, a2h, c0, c1, zi):
    """f32 associative scan of s_n = A s_{n-1} + c_n over the last axis.

    A = [[-a1, 1], [-a2, 0]] (DF2T), c_n given per component.  Returns the
    state components s0, s1, each shaped like c0."""
    A = jnp.array([[-a1h, 1.0], [-a2h, 0.0]], dtype=c0.dtype)
    cs = jnp.stack([c0, c1], axis=-1)[..., None]  # (..., n, 2, 1)
    As = jnp.broadcast_to(A, cs.shape[:-2] + (2, 2))
    hi = jax.lax.Precision.HIGHEST

    def combine(left, right):
        A1, c1_ = left
        A2, c2_ = right
        return (jnp.matmul(A2, A1, precision=hi),
                jnp.matmul(A2, c1_, precision=hi) + c2_)

    M, c = jax.lax.associative_scan(combine, (As, cs), axis=-3)
    s = (jnp.matmul(M, zi[..., None, :, None], precision=hi) + c)[..., 0]
    return s[..., 0], s[..., 1]


def _sos_section_scan_df(x, b0, b1, b2, a1, a2, zi, passes: int = 2):
    """One biquad over the last axis, refined to float64-coefficient parity.

    Same DF2T recurrence as :func:`_sos_section_scan`; ``b*, a*`` are
    float64 host scalars, ``zi``: (..., 2) float32 initial conditions
    (already x0-scaled).  Returns float32 y."""
    f64 = np.float64
    a1h, a1l = _df_const(f64(a1))
    a2h, a2l = _df_const(f64(a2))
    B0h, B0l = _df_const(f64(b1) - f64(a1) * f64(b0))
    B1h, B1l = _df_const(f64(b2) - f64(a2) * f64(b0))
    b0h, b0l = _df_const(f64(b0))

    z0 = zi[..., 0:1]
    z1 = zi[..., 1:2]
    zeros = jnp.zeros_like(x)

    # pass 0: plain f32 scan (c rounding lands in the first residual)
    s0h, s1h = _state_scan(a1h, a2h, B0h * x, B1h * x, zi)
    s0l = s1l = zeros

    def prev(s, z):
        return jnp.concatenate([z, s[..., :-1]], axis=-1)

    def one_pass(_, state):
        # residual of the float64-coefficient recurrence at the current
        # (hi, lo) state estimate, via error-free transforms (elementwise):
        #   r_n = A s~_{n-1} + B x_n - s~_n
        s0h, s0l, s1h, s1l = state
        p0h, p0l = prev(s0h, z0), prev(s0l, jnp.zeros_like(z0))
        p1h, p1l = prev(s1h, z1), prev(s1l, jnp.zeros_like(z1))

        def residual(ah, al, ph, pl, Bh, Bl, sh, sl, extra_h=None,
                     extra_l=None):
            # t1 = a * s~_prev0, t2 = extra (s~_prev1 or 0), t3 = B * x
            t1h, t1e = _two_prod(ah, ph)
            t1e = t1e + (ah * pl + al * ph)
            t3h, t3e = _two_prod(Bh, x)
            t3e = t3e + Bl * x
            u, eu = _two_sum(t1h, t3h)
            if extra_h is not None:
                u2, e2 = _two_sum(u, extra_h)
                t1e = t1e + e2 + extra_l
                u = u2
            w, ew = _two_sum(u, -sh)
            return w + (eu + ew + t1e + t3e - sl)

        r0 = residual(-a1h, -a1l, p0h, p0l, B0h, B0l, s0h, s0l,
                      extra_h=p1h, extra_l=p1l)
        r1 = residual(-a2h, -a2l, p0h, p0l, B1h, B1l, s1h, s1l)
        d0, d1 = _state_scan(a1h, a2h, r0, r1,
                             jnp.zeros_like(zi))
        # fold the correction into the (hi, lo) state representation
        s0h, s0l = _two_sum(s0h, s0l + d0)
        s1h, s1l = _two_sum(s1h, s1l + d1)
        return s0h, s0l, s1h, s1l

    # fori_loop, not Python unrolling: _refinement_passes can ask for up to
    # 10 passes, and unrolling pass x section x fwd/bwd blew the XLA:CPU
    # program size up enough to crash long-lived test processes (round-4
    # full-suite SIGSEGV at the compile of this very function).  The loop
    # body compiles ONCE regardless of the pass count.
    if passes == 1:
        s0h, s0l, s1h, s1l = one_pass(0, (s0h, s0l, s1h, s1l))
    else:
        s0h, s0l, s1h, s1l = jax.lax.fori_loop(
            0, passes, one_pass, (s0h, s0l, s1h, s1l))

    # y_n = b0 x_n + s0~_{n-1}, compensated final combine
    yh, ye = _two_prod(b0h, x)
    ye = ye + b0l * x
    sh, se = _two_sum(yh, prev(s0h, z0))
    return sh + (se + ye + prev(s0l, jnp.zeros_like(z0)))


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


@functools.partial(jax.jit, static_argnames=("sos_tuple", "zi_tuple", "padlen",
                                              "passes"))
def _sosfiltfilt_device(x, sos_tuple, zi_tuple, padlen: int, passes: int = 0):
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
            zi_k = jnp.asarray(zi_arr[k]) * x0[..., None]
            if passes:
                s = _sos_section_scan_df(s, b0, b1, b2, a1, a2, zi_k,
                                         passes=passes)
            else:
                s = _sos_section_scan(s, b0, b1, b2, a1, a2, zi_k)
        return s

    fwd = run(ext)
    bwd = run(fwd[..., ::-1])[..., ::-1]
    return bwd[..., padlen:padlen + n]


def _refinement_passes(sos, n):
    """How many refinement passes reach ~105 dB parity with scipy's float64
    ``sosfiltfilt`` for this cascade.

    Empirical model (measured on order-3 Butterworth band-passes, broadband
    input): the plain f32 scan's SNR — which is also the per-pass gain of
    the defect refinement — fits ``58*log10(1 - r_max) + 186`` dB from
    BELOW within ~4 dB over the measured 16..134 dB range, where r_max is
    the largest pole radius of the cascade.  An extra
    ``10*log10(n / 2**17)`` guards long inputs (prefix error grows
    ~sqrt(n))."""
    sos = np.asarray(sos, np.float64)
    r2 = np.abs(sos[:, 5])  # |a2| = r^2 for a complex pole pair
    one_minus_r = max(1.0 - float(np.sqrt(r2.max(initial=0.0))), 1e-9)
    per_pass = 58.0 * np.log10(one_minus_r) + 186.0
    per_pass -= 10.0 * np.log10(max(n, 1 << 17) / float(1 << 17))
    per_pass = max(per_pass, 8.0)
    return int(np.clip(np.ceil(105.0 / per_pass), 1, 10))


def sosfiltfilt(sos, x, padlen=None, compensated=True):
    """Zero-phase forward-backward filter (device, scan-based).

    ``compensated=True`` (default) adds error-free-transform defect
    refinement passes (count auto-sized from the cascade's pole radii) so
    the result matches scipy's float64 ``sosfiltfilt`` to >100 dB on
    float64-less hardware.  ``False`` keeps the single plain f32 scan
    (~38-55 dB on narrowband cascades, proportionally fewer VPU ops)."""
    sos = np.asarray(sos, dtype=np.float64)
    x = jnp.asarray(x, jnp.float32)
    if padlen is None:
        # scipy's sosfiltfilt edge formula (first-order sections shorten it)
        ntaps = 2 * sos.shape[0] + 1
        ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
        padlen = 3 * int(ntaps)
    padlen = min(padlen, x.shape[-1] - 1)
    zi = _dsp.sosfilt_zi(sos)  # (n_sections, 2), scaled by the input's x0 at runtime
    passes = _refinement_passes(sos, x.shape[-1]) if compensated else 0
    return _sosfiltfilt_device(
        x, tuple(sos.reshape(-1).tolist()), tuple(zi.reshape(-1).astype(np.float32).tolist()),
        int(padlen), passes)


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
