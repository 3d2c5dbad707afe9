"""FFT cross-correlation with sub-sample parabolic refinement.

Reference semantics: util/correlation.py:6-46 — normalized xcorr (unit-energy
inputs), scipy's 'same' centering, argmax (optionally on |r|), quadratic
interpolation of the peak.  Here everything is jit-compiled and batched:
``find_delay_batch`` vmaps the whole estimator over stacks of windows, which
is what the tape-sync azimuth sweep needs (pytapesynch_gui.py:231-235 does
this in a Python loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["xcorr", "find_delay", "find_delay_batch", "parabolic", "parabolic_batch"]


def _next_fast_len(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def parabolic(f, x):
    """Quadratic-interpolate the peak at integer index ``x`` of array ``f``.

    Returns (refined_index, refined_value); correlation.py:42-46.
    """
    f = jnp.asarray(f)
    fm1 = f[x - 1]
    f0 = f[x]
    fp1 = f[x + 1]
    denom = fm1 - 2 * f0 + fp1
    denom = jnp.where(denom == 0, 1e-12, denom)
    xv = 0.5 * (fm1 - fp1) / denom + x
    yv = f0 - 0.25 * (fm1 - fp1) * (xv - x)
    return xv, yv


def parabolic_batch(f, x):
    """Vectorized ``parabolic``: f (..., n), x (...) integer indices."""
    f = jnp.asarray(f)
    x = jnp.asarray(x)
    gather = functools.partial(jnp.take_along_axis, f)
    fm1 = gather((x - 1)[..., None], axis=-1)[..., 0]
    f0 = gather(x[..., None], axis=-1)[..., 0]
    fp1 = gather((x + 1)[..., None], axis=-1)[..., 0]
    denom = fm1 - 2 * f0 + fp1
    denom = jnp.where(denom == 0, 1e-12, denom)
    xv = 0.5 * (fm1 - fp1) / denom + x
    yv = f0 - 0.25 * (fm1 - fp1) * (xv - x)
    return xv, yv


def _correlate_full(a, b):
    """FFT correlation, 'full' layout: lags -(len(b)-1) .. len(a)-1."""
    la, lb = a.shape[-1], b.shape[-1]
    n = _next_fast_len(la + lb - 1)
    fa = jnp.fft.rfft(a, n=n)
    fb = jnp.fft.rfft(b, n=n)
    cc = jnp.fft.irfft(fa * jnp.conj(fb), n=n)
    # circular lags: index k holds lag k for k < la, lag k-n for k >= n-lb+1
    neg = cc[..., n - (lb - 1):] if lb > 1 else cc[..., :0]
    pos = cc[..., :la]
    return jnp.concatenate([neg, pos], axis=-1)


def xcorr(a, b, mode: str = "full"):
    """Normalized cross correlation in [-1, 1] (correlation.py:6-13)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    full = _correlate_full(a, b)
    if mode == "full":
        return full
    if mode == "same":
        # scipy: same-size as a, centered with respect to 'full'
        la = a.shape[-1]
        start = (full.shape[-1] - la) // 2
        return jax.lax.dynamic_slice_in_dim(full, start, la, axis=-1)
    if mode == "valid":
        la, lb = a.shape[-1], b.shape[-1]
        out_len = max(la, lb) - min(la, lb) + 1
        start = min(la, lb) - 1
        return jax.lax.dynamic_slice_in_dim(full, start, out_len, axis=-1)
    raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("ignore_phase", "window_name"))
def _find_delay_core(a, b, ignore_phase: bool, window_name):
    if window_name:
        from .fourier import get_window

        a = a * jnp.asarray(get_window(window_name, a.shape[-1]))
        b = b * jnp.asarray(get_window(window_name, b.shape[-1]))
    res = xcorr(a, b, mode="same")
    if ignore_phase:
        max_index = jnp.argmax(jnp.abs(res), axis=-1)
    else:
        max_index = jnp.argmax(res, axis=-1)
    # clamp so the 3-point parabola stays in range
    max_index = jnp.clip(max_index, 1, res.shape[-1] - 2)
    i_peak, corr = parabolic_batch(res, max_index)
    sample_delay = i_peak - res.shape[-1] // 2
    return sample_delay, corr


def find_delay(a, b, ignore_phase: bool = False, window_name=None):
    """Delay between 1D signals a and b in samples (correlation.py:16-39)."""
    d, c = _find_delay_core(jnp.asarray(a)[None, :], jnp.asarray(b)[None, :],
                            bool(ignore_phase), window_name)
    return d[0], c[0]


def find_delay_batch(a, b, ignore_phase: bool = False, window_name=None):
    """Batched delay estimation: a, b of shape (batch, n).

    One fused jit call for e.g. an azimuth sweep's window stack.
    Returns (delays, corrs), each (batch,).
    """
    return _find_delay_core(jnp.asarray(a), jnp.asarray(b), bool(ignore_phase), window_name)
