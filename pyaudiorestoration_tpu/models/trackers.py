"""Wow/flutter pitch trackers as pure, jit-compiled functions.

Reference: util/wow_detection.py — a ``Track`` class hierarchy driven by a
user-drawn (time, freq) trail over a magnitude spectrogram.  Rebuilt here as
stateless functions sharing a registry (``wow_detectors``):

* ``Peak`` / ``Peak Track`` / ``Freehand``: frame-parallel -> single fused
  vmap/argmax over masked bands (the reference loops frames in Python,
  wow_detection.py:294-327).
* ``Center of Gravity``: sequential band adaptation (Czyzewski et al. 2007)
  -> ``lax.scan`` with masked full-spectrum band windows so shapes stay
  static (wow_detection.py:256-291).
* ``Zero-Crossing``: device bandpass -> host crossing extraction
  (wow_detection.py:330-358).
* ``Correlation``: per-frame log2-frequency resample + batched xcorr of
  consecutive frames -> cumsum speed curve (wow_detection.py:396-436).
* ``Sine Regression``: FFT-seeded sine fit on the master speed curve
  (wow_detection.py:190-253).

All trackers take a magnitude spectrogram ``spectrum`` of shape
(num_bins, num_frames), the raw ``signal`` (mono slice), and the ``trail``
list of (time, freq) pairs, and return ``(times, freqs)`` numpy arrays.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window

from ..ops import filters
from ..ops.correlation import parabolic_batch, xcorr

MIN_BINS = 4

__all__ = ["wow_detectors", "trace", "fit_sin", "trace_sine_reg", "interp_nans", "nan_helper"]


def nan_helper(y):
    return np.isnan(y), lambda z: z.nonzero()[0]


def interp_nans(y):
    """In-place linear interpolation over NaN runs (wow_detection.py:14-22)."""
    nans, x = nan_helper(y)
    if nans.any() and (~nans).any():
        y[nans] = np.interp(x(nans), x(~nans), y[~nans])
    return y


class _Grid:
    """Shared trail sampling / unit mapping (wow_detection.py:28-117)."""

    def __init__(self, spectrum, fft_size, hop, sr, tolerance_st=1.0):
        self.fft_size = int(fft_size)
        self.hop = int(hop)
        self.sr = int(sr)
        self.num_bins, self.num_frames = spectrum.shape
        self.tolerance = tolerance_st / 12.0

    def time_2_frame(self, t):
        return int(t * self.sr / self.hop)

    def sample_trail(self, trail):
        trail = sorted(trail, key=lambda tup: tup[0])
        times_raw = [d[0] for d in trail]
        freqs_raw = [d[1] for d in trail]
        frame_0, frame_1 = 0, self.num_frames
        if times_raw[0]:
            frame_0 = max(frame_0, self.time_2_frame(times_raw[0]))
        if times_raw[-1]:
            frame_1 = min(frame_1, self.time_2_frame(times_raw[-1]))
        if frame_0 == frame_1:
            logging.warning("No point in tracing just one FFT")
        times = np.linspace(frame_0 * self.hop / self.sr, frame_1 * self.hop / self.sr,
                            frame_1 - frame_0)
        freqs = np.interp(times, times_raw, freqs_raw)
        return frame_0, frame_1, times, freqs


def _band_limits_np(freqs, tolerance, fft_size, sr, num_bins):
    """Vectorized band limits with the reference's min-bin widening
    (wow_detection.py:97-117)."""
    logf = np.log2(freqs)
    fL = np.clip(np.power(2.0, logf - tolerance), 1.0, None)
    fU = np.minimum(np.power(2.0, logf + tolerance), sr / 2)
    NL = np.clip(np.round(fL * fft_size / sr).astype(np.int32), 1, num_bins - 1)
    NU = np.clip(np.round(fU * fft_size / sr).astype(np.int32), 1, num_bins - 1)
    width = NU - NL
    iters = np.where(width < MIN_BINS, (MIN_BINS - width + 1) // 2, 0)
    return NL - iters, NU + iters


def masked_peak_refine(frames, nl, nu, bin_offset: float = 0.0):
    """THE masked-peak core shared by every tracker tier (wow_detection.py:
    119-139): per frame, argmax within [nl, nu), parabolic refinement when
    the maximum is a true local peak (strictly above both neighbors), raw
    bin index otherwise.

    ``frames``: (..., T, F) magnitudes; ``nl``/``nu``: (..., T) int bands.
    Returns the refined peak bin as float, plus ``bin_offset`` (for callers
    whose F axis is a band slice of the full spectrum).  Reused by the dense
    trackers, the fused banded-DFT tracking (pipelines/respeeder_device.py),
    and the sharded restore step (parallel/sharded.py) so the peak math
    cannot drift between tiers.
    """
    F = frames.shape[-1]
    bins = jnp.arange(F)
    mask = (bins >= nl[..., None]) & (bins < nu[..., None])
    scores = jnp.where(mask, frames, -jnp.inf)
    peak = jnp.argmax(scores, axis=-1)
    p = jnp.clip(peak, 1, F - 2)
    fm1 = jnp.take_along_axis(frames, (p - 1)[..., None], axis=-1)[..., 0]
    f0 = jnp.take_along_axis(frames, p[..., None], axis=-1)[..., 0]
    fp1 = jnp.take_along_axis(frames, (p + 1)[..., None], axis=-1)[..., 0]
    is_peak = (fm1 < f0) & (f0 > fp1) & (peak == p)
    refined, _ = parabolic_batch(frames, p)
    out = jnp.where(is_peak, refined, peak.astype(refined.dtype))
    return out + bin_offset if bin_offset else out


@functools.partial(jax.jit, static_argnames=("fft_size", "sr"))
def _masked_peak_per_frame(spec_sel, NL, NU, fft_size: int, sr: int):
    """Peak bins -> Hz over a (num_bins, n_frames) spectrogram slice."""
    return masked_peak_refine(spec_sel.T, NL, NU) / fft_size * sr


def _trace_peak(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                adaptation_mode="None", fixed_band=False, half_after=3):
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    frame_0, frame_1, times, freqs = g.sample_trail(trail)
    if not fixed_band and adaptation_mode in ("Constant", "Linear", "Average"):
        out = _trace_peak_adaptive(spectrum[:, frame_0:frame_1], freqs[0], g,
                                   adaptation_mode)
        interp_nans(out)
        return times, out
    if fixed_band:
        # 'Peak Track': the band comes from the first drawn frequency, with
        # the tolerance halved after the first ``half_after`` frames
        # (3 in the reference, wow_detection.py:311-327)
        tol = np.full(len(freqs), g.tolerance)
        tol[min(half_after, len(tol)):] = g.tolerance / 2
        NL, NU = _band_limits_np(np.full(len(freqs), freqs[0]), tol, g.fft_size, g.sr, g.num_bins)
    else:
        NL, NU = _band_limits_np(freqs, g.tolerance, g.fft_size, g.sr, g.num_bins)
    spec_sel = jnp.asarray(spectrum)[:, frame_0:frame_1]
    out = np.asarray(_masked_peak_per_frame(spec_sel, jnp.asarray(NL), jnp.asarray(NU),
                                            g.fft_size, g.sr))
    interp_nans(out)
    return times, out


@functools.partial(jax.jit, static_argnames=("mode", "fft_size", "sr"))
def _adaptive_peak_scan(spec_frames, carry0, tolerance_st, mode: str,
                        fft_size: int, sr: int):
    """Sequential adapt_band prediction + peak pick as a ``lax.scan``.

    ``spec_frames``: (T, num_bins) magnitude frames.  ``carry0``: the last 4
    traced log2 frequencies (l[i-3..i] in reference indexing).  Each step
    predicts the next band via adapt_band's mode formulas (with adapt_band's
    own clamps and >5-bin triangular emphasis window, wow_detection.py:
    142-187), picks the strongest emphasized bin, refines parabolically on
    the raw magnitudes, and shifts the history.
    """
    def step(hist, frame):
        return adaptive_step_core(frame, hist, tolerance_st, mode, fft_size, sr)

    _, freqs = jax.lax.scan(step, carry0, spec_frames)
    return freqs


def adaptive_step_core(frame, hist, tolerance_st, mode: str, fft_size: int,
                       sr: int):
    """One adapt_band prediction + emphasized peak pick (wow_detection.py:
    142-187): the per-frame core of the adaptive scan, shared with the
    sharded tier (parallel/sharded.adaptive_peak_sharded) so the two cannot
    drift.  ``frame``: (num_bins,) magnitudes; ``hist``: 4-tuple of the last
    traced log2 frequencies.  Returns (new_hist, freq)."""
    num_bins = frame.shape[-1]
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    freq_2_bin = fft_size / sr
    l1, l2, l3, l4 = hist
    if mode == "Constant":
        logfreq = l4
    elif mode == "Linear":
        logfreq = l4 + (l4 - l2)
    else:  # Average
        logfreq = l1 + (l4 - l1) / 3.0 * 4.0
    fL = jnp.power(2.0, logfreq - tolerance_st / 12.0)
    fU = jnp.power(2.0, logfreq + tolerance_st / 12.0)
    NL = jnp.clip(jnp.round(fL * freq_2_bin).astype(jnp.int32), 1, num_bins - 3)
    NU = jnp.clip(jnp.round(fU * freq_2_bin).astype(jnp.int32), 1, num_bins - 2)
    # triangular emphasis window peaked at the predicted frequency
    pb = jnp.power(2.0, logfreq) * freq_2_bin
    nlf, nuf = NL.astype(jnp.float32), NU.astype(jnp.float32)
    up = (bins - nlf) / jnp.maximum(pb - nlf, 1e-6)
    down = (nuf - 1.0 - bins) / jnp.maximum(nuf - 1.0 - pb, 1e-6)
    tri = jnp.clip(jnp.minimum(up, down), 0.0, 1.0)
    window = jnp.where(NU - NL > 5, tri, 1.0)
    mask = (bins >= nlf) & (bins < nuf)
    scores = jnp.where(mask, frame * window, -jnp.inf)
    peak = jnp.argmax(scores, axis=-1)
    p = jnp.clip(peak, 1, num_bins - 2)
    fm1, f0, fp1 = frame[p - 1], frame[p], frame[p + 1]
    denom = jnp.where(fm1 - 2 * f0 + fp1 == 0, 1e-12, fm1 - 2 * f0 + fp1)
    refined = p.astype(jnp.float32) + 0.5 * (fm1 - fp1) / denom
    is_peak = (fm1 < f0) & (f0 > fp1) & (peak == p)
    peak_bin = jnp.where(is_peak, refined, peak.astype(jnp.float32))
    # collapsed band (NU <= NL) -> hold the previous frequency instead of
    # emitting bin 0 and poisoning the history (mirrors the host warm
    # loop's NU <= NL guard)
    band_ok = NU > NL
    freq = jnp.where(band_ok, peak_bin / fft_size * sr,
                     jnp.power(2.0, l4))
    lf = jnp.where(band_ok, jnp.log2(jnp.maximum(freq, 1e-12)), l4)
    return (l2, l3, l4, lf), freq


def _trace_peak_adaptive(spec_sel, seed_freq, g, mode):
    """adapt_band-driven tracking: first 4 frames sequentially on the host
    (exact reference early-history slicing), then the device scan."""
    T = spec_sel.shape[1]
    freq_2_bin = g.fft_size / g.sr
    freqs = [float(seed_freq)]
    warm = min(4, T)
    out = np.empty(T, dtype=np.float32)
    for t in range(warm):
        i = len(freqs) - 1
        NL, NU, window, _ = adapt_band(freqs, g.num_bins, freq_2_bin,
                                       g.tolerance * 12, mode, i)
        frame = np.asarray(spec_sel[:, t])
        if NU <= NL:
            out[t] = freqs[-1]
            freqs.append(freqs[-1])
            continue
        scores = frame[NL:NU] * window
        peak = int(np.argmax(scores)) + NL
        p = min(max(peak, 1), g.num_bins - 2)
        fm1, f0, fp1 = frame[p - 1], frame[p], frame[p + 1]
        denom = fm1 - 2 * f0 + fp1 or 1e-12
        refined = p + 0.5 * (fm1 - fp1) / denom
        is_peak = (fm1 < f0) and (f0 > fp1) and (peak == p)
        peak_bin = refined if is_peak else float(peak)
        out[t] = peak_bin / g.fft_size * g.sr
        freqs.append(float(out[t]))
    if T > warm:
        hist = np.log2(np.maximum(freqs[-4:], 1e-12)).astype(np.float32)
        carry0 = tuple(jnp.asarray(v) for v in hist)
        rest = jnp.asarray(spec_sel[:, warm:]).T
        out[warm:] = np.asarray(_adaptive_peak_scan(
            rest, carry0, np.float32(g.tolerance * 12), mode, g.fft_size, g.sr))
    return out


def trace_peak(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
               adaptation_mode="None"):
    return _trace_peak(spectrum, signal, trail, fft_size, hop, sr, tolerance_st,
                       adaptation_mode=adaptation_mode)


def trace_peak_track(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                     adaptation_mode="None"):
    return _trace_peak(spectrum, signal, trail, fft_size, hop, sr, tolerance_st,
                       fixed_band=True)


def trace_freehand(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                   adaptation_mode="None"):
    """Use the drawn trail verbatim (wow_detection.py:390-394)."""
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    _, _, times, freqs = g.sample_trail(trail)
    return times, freqs


def cog_step_core(frame, NL, NU, log2_fft_freqs, tolerance, fft_size: int, sr: int):
    """One center-of-gravity step: masked-hann COG of ``frame`` within
    [NL, NU) plus the next band (freq_plus_tolerance + set_bin_limits with
    clamping and min-bin widening, wow_detection.py:256-291).

    Broadcast-friendly: ``frame`` is (..., F) and ``NL``/``NU`` are (...,)
    int32, so the same core drives the single-recording scan here and the
    cross-shard batched scan in parallel/sharded.py.
    """
    num_bins = frame.shape[-1]
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    NLf = NL[..., None].astype(jnp.float32)
    NUf = NU[..., None].astype(jnp.float32)
    w = jnp.maximum(NUf - NLf, 1.0)
    k = bins - NLf
    hann = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / jnp.maximum(w - 1.0, 1.0))
    mask = (bins >= NLf) & (bins < NUf)
    wm = jnp.where(mask, hann * frame, 0.0)
    cog_log2 = jnp.sum(wm * log2_fft_freqs, axis=-1) / jnp.maximum(
        jnp.sum(wm, axis=-1), 1e-20)
    cog = jnp.power(2.0, cog_log2)
    fL = jnp.clip(jnp.power(2.0, cog_log2 - tolerance), 1.0, None)
    fU = jnp.minimum(jnp.power(2.0, cog_log2 + tolerance), sr / 2)
    nl = jnp.clip(jnp.round(fL * fft_size / sr).astype(jnp.int32), 1, num_bins - 1)
    nu = jnp.clip(jnp.round(fU * fft_size / sr).astype(jnp.int32), 1, num_bins - 1)
    width = nu - nl
    iters = jnp.where(width < MIN_BINS, (MIN_BINS - width + 1) // 2, 0)
    return nl - iters, nu + iters, cog


@functools.partial(jax.jit, static_argnames=("fft_size", "sr", "n_steps"))
def _cog_scan(spec_sel, log2_fft_freqs, NL0, NU0, tolerance, fft_size: int, sr: int,
              n_steps: int):
    """Center-of-gravity tracking with sequential band adaptation.

    Bands are realized as masked continuous-hann windows over the full
    spectrum so every scan step has static shapes."""

    def step(carry, frame):
        NL, NU = carry
        nl, nu, cog = cog_step_core(frame, NL, NU, log2_fft_freqs, tolerance,
                                    fft_size, sr)
        return (nl, nu), cog

    _, cogs = jax.lax.scan(step, (NL0, NU0), spec_sel.T[:n_steps])
    return cogs


def trace_cog(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
              adaptation_mode="None"):
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    frame_0, frame_1, times, freqs = g.sample_trail(trail)
    NL, NU = _band_limits_np(freqs[:1], g.tolerance, g.fft_size, g.sr, g.num_bins)
    from ..ops.fourier import fft_freqs
    # log2 of bin frequencies; bin 0 is DC -> -inf, masked out by NL >= 1
    with np.errstate(divide="ignore"):
        lff = np.log2(np.maximum(fft_freqs(g.fft_size, g.sr), 1e-12)).astype(np.float32)
    spec_sel = jnp.asarray(spectrum)[:, frame_0:frame_1]
    cogs = np.asarray(_cog_scan(spec_sel, jnp.asarray(lff), jnp.asarray(NL[0]),
                                jnp.asarray(NU[0]), g.tolerance, g.fft_size, g.sr,
                                frame_1 - frame_0))
    interp_nans(cogs)
    return times, cogs


def zero_crossings(a):
    positive = a > 0
    return np.where(np.bitwise_xor(positive[1:], positive[:-1]))[0]


def trace_zero_crossing(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                        adaptation_mode="None"):
    """Zero-crossing distance pitch tracking (wow_detection.py:330-358)."""
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    _, _, times, freqs = g.sample_trail(trail)
    tol = g.tolerance
    fL = np.power(2.0, np.log2(np.min(freqs)) - tol)
    fU = np.power(2.0, np.log2(np.max(freqs)) + tol)
    s_0 = int(times[0] * sr)
    s_1 = int(times[-1] * sr)
    sig = signal[s_0:s_1, 0] if signal.ndim == 2 else signal[s_0:s_1]
    filtered = np.asarray(filters.butter_bandpass_filter(sig, fL, fU, sr, order=3))
    crossings = zero_crossings(filtered)
    deltas = np.diff(crossings).astype(np.float32)
    # PDM -> PCM: hann smoothing sized by the mean crossing distance
    size = int(sr / 100 / np.mean(deltas))
    padded = np.pad(deltas, size, mode="reflect")
    win = get_window("hann", size)
    deltas_conv = np.convolve(padded, win / size * 2, mode="same")[size:-size]
    out = np.interp(times, crossings[:len(deltas_conv)] / sr + times[0],
                    sr / 2 / deltas_conv)
    return times, out


@functools.partial(jax.jit, static_argnames=("num_freq_samples",))
def _correlation_changes(spec_band, log_lo, log_hi, num_freq_samples: int):
    """Per-frame log2-grid resample + consecutive-frame xcorr peak deltas."""
    n_bins, n_frames = spec_band.shape
    src_log = jnp.linspace(log_lo, log_hi, n_bins)
    dst_log = jnp.linspace(log_lo, log_hi, num_freq_samples)
    resampled = jax.vmap(lambda col: jnp.interp(dst_log, src_log, col),
                         in_axes=1, out_axes=1)(spec_band)
    wind = jnp.asarray(np.hanning(num_freq_samples).astype(np.float32))
    a = resampled[:, :-1].T * wind  # (n_frames-1, F)
    b = resampled[:, 1:].T * wind
    res = xcorr(a, b, mode="same")
    i_peak = jnp.clip(jnp.argmax(res, axis=-1), 1, res.shape[-1] - 2)
    i_interp, _ = parabolic_batch(res, i_peak)
    return (num_freq_samples // 2) - i_interp


def trace_correlation(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                      adaptation_mode="None"):
    """Spectral-flow speed tracking (wow_detection.py:396-436).

    The reference resamples each frame with a quadratic spline in a Python
    loop; here the resample is a linear log2-grid interp fused into one
    batched xcorr (the parabolic refinement absorbs the interpolation-order
    difference at the peak)."""
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    frame_0, frame_1, times, freqs = g.sample_trail(trail)
    fL, fU = float(np.min(freqs)), float(np.max(freqs))
    # the reference sets limits from the raw fL/fU (no tolerance applied)
    NL = max(1, min(g.num_bins - 1, int(round(fL * g.fft_size / g.sr))))
    NU = max(1, min(g.num_bins - 1, int(round(fU * g.fft_size / g.sr))))
    while NU - NL < MIN_BINS:
        NL -= 1
        NU += 1
    num_freq_samples = (NU - NL) * 4
    from ..ops.fourier import fft_freqs
    lff = np.log2(fft_freqs(g.fft_size, g.sr)[NL:NU])
    spec_band = jnp.asarray(spectrum)[NL:NU, frame_0:frame_1]
    n = frame_1 - frame_0
    changes = np.ones(n)
    changes[:n - 1] = np.asarray(
        _correlation_changes(spec_band, float(lff[0]), float(lff[-1]), num_freq_samples))[:n - 1]
    speed = np.cumsum(changes)
    speed = speed / num_freq_samples * (lff[-1] - lff[0])
    log_mean = np.log2((fL + fU) / 2)
    return times, np.power(2.0, log_mean + speed)


def adapt_band(freqs, num_bins, freq_2_bin, tolerance, adaptation_mode, i):
    """Predict the next detection band from recent peaks
    (wow_detection.py:142-187; UI-hidden in the reference).

    Returns (NL, NU, window, logfreq): bin limits, a triangular emphasis
    window over the band, and the predicted log2 frequency.
    """
    logfreq = np.log2(freqs[i])
    if adaptation_mode in ("None", "Constant"):
        pass
    elif adaptation_mode == "Linear":
        if len(freqs) > 1:
            delta = logfreq - np.log2(freqs[i - 2])
            logfreq += delta
    elif adaptation_mode == "Average":
        logfreqs = np.log2(freqs[max(0, i - 3):i + 1])
        deltas = np.diff(logfreqs)
        logfreq = logfreqs[0]
        if len(deltas):
            logfreq += np.nanmean(deltas) * len(logfreqs)
    fL = np.power(2, (logfreq - tolerance / 12))
    fU = np.power(2, (logfreq + tolerance / 12))
    NL = max(1, min(num_bins - 3, int(round(fL * freq_2_bin))))
    NU = min(num_bins - 2, max(1, int(round(fU * freq_2_bin))))
    if NU - NL > 5:
        window = np.interp(np.arange(NL, NU),
                           (NL, np.power(2, logfreq) * freq_2_bin, NU - 1), (0, 1, 0))
    else:
        window = np.ones(NU - NL)
    return NL, NU, window, logfreq


@functools.partial(jax.jit, static_argnames=())
def _local_peaks_device(frames, threshold_frac):
    """All local spectral maxima per frame above a fraction of the frame max."""
    fm1 = frames[:, :-2]
    f0 = frames[:, 1:-1]
    fp1 = frames[:, 2:]
    is_peak = (f0 > fm1) & (f0 > fp1)
    strong = f0 > threshold_frac * jnp.max(frames, axis=-1, keepdims=True)
    denom = jnp.where(fm1 - 2 * f0 + fp1 == 0, 1e-12, fm1 - 2 * f0 + fp1)
    refined = jnp.arange(1, frames.shape[-1] - 1)[None, :] + 0.5 * (fm1 - fp1) / denom
    keep = is_peak & strong
    return jnp.where(keep, refined, 0.0), jnp.where(keep, f0, 0.0)


def trace_partials(spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
                   adaptation_mode="None", threshold=0.15):
    """Partial tracking diagnostic (wow_detection.py:361-387 uses librosa
    piptrack and only plots).  Returns per-frame (pitches_hz, magnitudes)
    arrays of all local peaks inside the trail band — device-vectorized."""
    g = _Grid(spectrum, fft_size, hop, sr, tolerance_st)
    frame_0, frame_1, times, freqs = g.sample_trail(trail)
    fl, fu = float(np.min(freqs)), float(np.max(freqs))
    bl = max(1, int(fl * fft_size / sr))
    bu = min(g.num_bins - 1, int(np.ceil(fu * fft_size / sr)))
    frames = jnp.asarray(spectrum)[bl:bu, frame_0:frame_1].T
    bins, mags = _local_peaks_device(frames, threshold)
    pitches = np.asarray(bins)
    pitches = np.where(pitches > 0, (pitches + bl) / fft_size * sr, 0.0)
    return times, pitches, np.asarray(mags)


def _sine_varpro_seed(tt, yy, w0):
    """Variable-projection seeding: for each candidate omega the model is
    LINEAR in (A sin, A cos, c), so the subproblem solves exactly; the best
    candidate on a log grid around the FFT seed starts LM inside the right
    basin (plain LM from a coarse phase seed can jump basins)."""
    best = None
    for w in np.geomspace(0.5, 2.0, 121) * w0:
        M = np.stack([np.sin(w * tt), np.cos(w * tt), np.ones_like(tt)], axis=1)
        coef, *_ = np.linalg.lstsq(M, yy, rcond=None)
        r = M @ coef - yy
        rss = float(r @ r)
        if best is None or rss < best[0]:
            best = (rss, w, coef)
    _, w, (a, b, c) = best
    A = float(np.hypot(a, b))
    p = float(np.arctan2(b, a))
    return np.array([A, w, p, c])


def _sine_lm(tt, yy, guess, max_iter=100):
    """Levenberg-Marquardt refinement of ``A sin(w t + p) + c`` (float64).

    First-party replacement for scipy ``curve_fit`` (SURVEY §7 step 3): a
    variable-projection omega sweep picks the basin, then damped 4x4 normal
    equations converge it; covariance follows curve_fit's convention
    ``inv(J'J) * rss/(n-4)``.
    """
    A, w, p, c = _sine_varpro_seed(tt, yy, float(guess[1]))

    def resid(A, w, p, c):
        return A * np.sin(w * tt + p) + c - yy

    r = resid(A, w, p, c)
    cost = float(r @ r)
    lam = 1e-3
    H = np.eye(4)
    for _ in range(max_iter):
        s = np.sin(w * tt + p)
        co = np.cos(w * tt + p)
        J = np.stack([s, A * tt * co, A * co, np.ones_like(tt)], axis=1)
        g = J.T @ r
        H = J.T @ J
        step_ok = False
        for _ in range(50):
            D = np.diag(np.maximum(np.diag(H), 1e-12))
            try:
                dp = np.linalg.solve(H + lam * D, -g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            cand = (A + dp[0], w + dp[1], p + dp[2], c + dp[3])
            r2 = resid(*cand)
            cost2 = float(r2 @ r2)
            if cost2 <= cost:
                A, w, p, c = cand
                r, cost = r2, cost2
                lam = max(lam * 0.3, 1e-14)
                step_ok = True
                break
            lam *= 10.0
            if lam > 1e14:
                break
        if not step_ok or np.linalg.norm(dp) < 1e-14 * (1.0 + abs(A) + abs(w)):
            break
    popt = np.array([A, w, p, c])
    dof = max(len(tt) - 4, 1)
    try:
        pcov = np.linalg.inv(H) * cost / dof
    except np.linalg.LinAlgError:
        pcov = np.full((4, 4), np.inf)
    return popt, pcov


def fit_sin(tt, yy, assumed_freq=None):
    """FFT-seeded sine regression (wow_detection.py:190-228).

    Returns a dict with amp/omega/phase/offset/freq/period.  The nonlinear
    refinement is a first-party float64 Levenberg-Marquardt on the host
    (4 parameters, frame-rate sized data)."""
    tt = np.asarray(tt, float)
    yy = np.asarray(yy, float)
    ff = np.fft.rfftfreq(len(tt), (tt[1] - tt[0]))
    fft_data = np.fft.rfft(yy)[1:]
    if assumed_freq:
        period = tt[1] - tt[0]
        N = len(yy) + 1
        peak_est = int(round(assumed_freq * N * period))
        win = np.interp(np.arange(0, len(fft_data)), (0, peak_est, len(fft_data)), (0, 1, 0))
        fft_data = fft_data * win
    peak_bin = np.argmax(np.abs(fft_data)) + 1
    guess_freq = ff[peak_bin]
    guess_amp = np.std(yy) * 2.0 ** 0.5
    guess_offset = np.mean(yy)
    guess_phase = np.angle(fft_data[peak_bin])
    guess = np.array([guess_amp, 2.0 * np.pi * guess_freq, guess_phase, guess_offset])

    popt, pcov = _sine_lm(tt, yy, guess)
    A, w, p, c = popt
    f = w / (2.0 * np.pi)
    return {"amp": A, "omega": w, "phase": p, "offset": c, "freq": f,
            "period": 1.0 / f, "fitfunc": lambda t: A * np.sin(w * t + p) + c,
            "maxcov": np.max(pcov), "rawres": (guess, popt, pcov)}


def trace_sine_reg(speed_curve, t0, t1, rpm=None):
    """Sine regression over a span of the master speed curve
    (wow_detection.py:231-253). Returns (amplitude, omega, phase, offset)."""
    times = speed_curve[:, 0]
    speeds = speed_curve[:, 1]
    period = times[1] - times[0]
    ind_start = int(t0 / period)
    ind_stop = int(t1 / period)
    try:
        assumed_freq = float(rpm) / 60.0
    except (TypeError, ValueError):
        assumed_freq = None
    res = fit_sin(times[ind_start:ind_stop], speeds[ind_start:ind_stop],
                  assumed_freq=assumed_freq)
    return res["amp"], res["omega"], res["phase"], 0


wow_detectors = {
    "Center of Gravity": trace_cog,
    "Peak": trace_peak,
    "Peak Track": trace_peak_track,
    "Zero-Crossing": trace_zero_crossing,
    "Freehand Draw": trace_freehand,
    "Correlation": trace_correlation,
    # 'Partials' (wow_detection.py:361-387) is a diagnostic that returns
    # per-frame peak stacks rather than one curve: see trace_partials
}


def trace(mode, spectrum, signal, trail, fft_size, hop, sr, tolerance_st=1.0,
          adaptation_mode="None"):
    """Dispatch by tracker name (registry mirror of wow_detection.py:453-456)."""
    return wow_detectors[mode](spectrum, signal, trail, fft_size, hop, sr,
                               tolerance_st, adaptation_mode)
