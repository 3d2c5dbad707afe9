"""Re-noising / denoise-repair (reference tool: renoiser_gui.py).

A noise-floor dB profile (from a spectrogram selection or a noise file) plus
a draggable control curve define a per-bin threshold; bins below threshold
get a gain (negative dB = denoise, positive = re-noise)
(renoiser_gui.py:239-345).  The masked STFT -> iSTFT round trip runs on
device; ``sniff_offset`` scans hop phases for maximal transient contrast
(renoiser_gui.py:347-380).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fourier, resampling, units
from ..utils import audio_io

__all__ = [
    "noise_profile_from_file", "noise_profile_from_selection", "final_profile",
    "get_mask_fac", "process", "process_file", "sniff_offset", "RenoisePreview",
]


class RenoisePreview:
    """Re-mask-only fast path for parameter sweeps (renoiser_gui.py:253-271).

    The GUI's live preview re-applies the gain mask to the CACHED spectrogram
    when gain/control/overhead change, never recomputing the STFT.  Here the
    complex spectrogram stays resident on device; ``remask`` is one fused
    threshold+scale and returns the masked magnitude (the preview image), and
    ``render`` inverts to audio only when asked.
    """

    def __init__(self, signal, sr, fft_size=1024, fft_overlap=4, channel=0):
        self.sr = sr
        self.fft_size = fft_size
        self.hop = fft_size // fft_overlap
        n = len(signal)
        self._n = n
        x = signal[:, channel] if signal.ndim == 2 else signal
        padded = np.asarray(fourier.fix_length(x, n + fft_size // 2))
        self._spec = fourier.stft(padded, n_fft=fft_size, step=self.hop)
        self._mag = jnp.abs(self._spec) + 1e-7  # device-resident
        self.freqs = fourier.fft_freqs(fft_size, sr)

    def magnitude(self):
        """The cached unmasked magnitude (host copy)."""
        return np.asarray(self._mag)

    def noise_profile_from_selection(self, t0, t1):
        return noise_profile_from_selection(self.magnitude(), self.sr,
                                            self.hop, t0, t1)

    def remask(self, profile, gain, control_curve=(), overhead=0.0):
        """Masked magnitude for the current parameters — ONE device op, no
        STFT recompute.  Returns (num_bins, num_frames) float32 (host)."""
        prof = final_profile(profile, self.freqs, control_curve, 0.0, overhead)
        fac = _mask_fac(20.0 * jnp.log10(self._mag),
                        jnp.asarray(prof, jnp.float32), float(gain))
        return np.asarray(self._mag * fac)

    def render(self, profile, gain, control_curve=(), overhead=0.0):
        """Masked iSTFT audio for the chosen parameters (single channel)."""
        prof = final_profile(profile, self.freqs, control_curve, 0.0, overhead)
        fac = _mask_fac(20.0 * jnp.log10(self._mag),
                        jnp.asarray(prof, jnp.float32), float(gain))
        return np.asarray(fourier.istft(self._spec * fac, length=self._n,
                                        hop_length=self.hop))


def noise_profile_from_file(noise_path, sr, fft_size=1024, fft_overlap=4, zeropad=1):
    """Average dB spectrum of a (resampled) noise file (renoiser_gui.py:239-251)."""
    hop = fft_size // fft_overlap
    noise, noise_sr, _ = audio_io.read_file(noise_path)
    if noise_sr != sr:
        noise = resampling.resample_ratio(noise, noise_sr, sr, axis=0)
    mag = np.asarray(fourier.get_mag(noise[:, 0], fft_size, hop, "blackmanharris",
                                     zeropad=zeropad))
    return np.average(units.to_dB(mag), axis=1)


def noise_profile_from_selection(spec_mag, sr, hop, t0, t1):
    """Average dB spectrum of a spectrogram time slice (renoiser_gui.py:327-345)."""
    f0 = max(0, int(t0 * sr / hop))
    f1 = min(spec_mag.shape[1] - 1, int(t1 * sr / hop))
    return units.to_dB(np.average(spec_mag[:, f0:f1], axis=1))


def final_profile(noise_profile, freqs, control_curve=(), gain=0.0, overhead=0.0):
    """Threshold = floor + gain + control + overhead (renoiser_gui.py:306-312).

    ``control_curve``: iterable of (freq_hz, dB) points.
    """
    if len(control_curve):
        pts = sorted((float(f), float(d)) for f, d in control_curve)
        control = np.interp(freqs, [p[0] for p in pts], [p[1] for p in pts])
    else:
        control = 0.0
    return np.asarray(noise_profile) + gain + control + overhead


@functools.partial(jax.jit, static_argnames=())
def _mask_fac(spec_db, profile, gain):
    gain_mask = jnp.where(spec_db > profile[:, None], 0.0, gain)
    return jnp.power(10.0, gain_mask / 20.0).astype(jnp.float32)


def get_mask_fac(spec_mag, profile, gain):
    """Gain factor per bin: ``gain`` dB below threshold, 0 dB above
    (renoiser_gui.py:273-278)."""
    spec_db = 20.0 * jnp.log10(jnp.asarray(spec_mag))
    return _mask_fac(spec_db, jnp.asarray(profile, jnp.float32), float(gain))


@functools.partial(jax.jit, static_argnames=("fft_size", "hop", "length"))
def _process_fused(x, profile, gain, fft_size: int, hop: int, length: int):
    """One-jit masked STFT -> iSTFT for a single channel."""
    spec = fourier.stft(x, n_fft=fft_size, step=hop)
    fac = _mask_fac(20.0 * jnp.log10(jnp.abs(spec) + 1e-7), profile, gain)
    return fourier.istft(spec * fac, length=length, hop_length=hop)


def process(signal, sr, profile, gain, fft_size=1024, fft_overlap=4,
            channels=None, blockwise: int = 0):
    """Masked STFT -> iSTFT of all channels (renoiser_gui.py:296-319).

    The whole round trip runs as ONE vmapped jit dispatch for every selected
    channel (round 3: the per-channel dispatch loop is gone).

    ``blockwise``: process in blocks of this many frames with halo trim
    (``utils/streaming.stream_process``, the reference's 256 KB iSTFT
    blocking writ large, util/fourier.py:390-407) — bounds device temporaries
    for big in-memory arrays; 0 processes the whole take at once.  (For
    file-to-file streaming use ``process_file(stream=True)``.)
    """
    hop = fft_size // fft_overlap
    channels = list(channels) if channels else list(range(signal.shape[1]))
    n = len(signal)
    prof = jnp.asarray(np.asarray(profile, np.float32))
    if blockwise:
        from ..utils import streaming

        def roundtrip(block):
            bn = len(block)
            pad_b = np.asarray(fourier.fix_length(block, bn + fft_size // 2,
                                                  axis=0))
            xb = jnp.asarray(np.ascontiguousarray(pad_b[:, channels].T))
            yb = jax.vmap(lambda ch: _process_fused(
                ch, prof, float(gain), fft_size, hop, bn))(xb)
            return np.asarray(yb).T

        return streaming.stream_process(signal, roundtrip, hop,
                                        blocksize=int(blockwise)).astype(
                                            signal.dtype)
    padded = np.asarray(fourier.fix_length(signal, n + fft_size // 2, axis=0))
    x = jnp.asarray(np.ascontiguousarray(padded[:, channels].T))  # (C, n+pad)
    y = jax.vmap(lambda ch: _process_fused(ch, prof, float(gain), fft_size,
                                           hop, n))(x)
    return np.asarray(y).T.astype(signal.dtype)


def process_file(file_path, noise_path=None, selection=None, control_curve=(),
                 gain=-40.0, overhead=0.0, fft_size=1024, fft_overlap=4,
                 channels=None, suffix=None, stream="auto",
                 stream_threshold_bytes: int = 1 << 30):
    """One-call renoise/denoise of a file. ``selection``: (t0, t1) noise span
    in the file itself; otherwise ``noise_path`` supplies the floor.

    ``stream``: True forces the blockwise larger-than-memory path (interior
    bit-parity with the in-memory path, utils/streaming.stream_masked_stft);
    "auto" streams when the DECODED size exceeds ``stream_threshold_bytes``.
    """
    import os

    from ..utils import streaming

    hop = fft_size // fft_overlap
    use_stream = streaming.should_stream(file_path, stream, stream_threshold_bytes)
    if use_stream:
        with audio_io.StreamReader(file_path) as r:
            sr, num_channels = r.sample_rate, r.channels
            if noise_path:
                profile = noise_profile_from_file(noise_path, sr, fft_size,
                                                  fft_overlap)
            elif selection:
                # the floor profile needs only the selected frames; read them
                # on the exact global frame grid so the profile (and thus
                # every masked bin) is bit-identical to the in-memory path
                t0, t1 = selection
                pad = fft_size // 2
                n = int(r.frames)
                T_sel = (n + 2 * pad - fft_size) // hop + 1
                f0 = max(0, int(t0 * sr / hop))
                f1 = max(f0 + 1, min(T_sel - 1, int(t1 * sr / hop)))
                a = f0 * hop - pad
                b = (f1 - 1) * hop - pad + fft_size
                span = streaming.virtual_read(r, a, b, 0, [0])[:, 0]
                mag = np.asarray(fourier.get_mag(
                    jnp.asarray(span), fft_size, hop, center=False))
                profile = units.to_dB(np.average(mag[:, :f1 - f0], axis=1))
            else:
                raise ValueError("need noise_path or selection")
        freqs = fourier.fft_freqs(fft_size, sr)
        profile = final_profile(profile, freqs, control_curve, 0.0, overhead)
        prof = jnp.asarray(np.asarray(profile, np.float32))
        chans = list(channels) if channels else list(range(num_channels))

        def make_fac(spec, t_lo):
            return _mask_fac(20.0 * jnp.log10(jnp.abs(spec) + 1e-7), prof,
                             float(gain))

        sfx = suffix if suffix is not None else f" fft={fft_size}"
        base, _ = os.path.splitext(file_path)
        out_path = f"{base}{sfx}.{audio_io.out_ext()}"
        return streaming.stream_masked_stft(file_path, out_path, make_fac,
                                            fft_size, hop, chans)
    signal, sr, num_channels = audio_io.read_file(file_path)
    if noise_path:
        profile = noise_profile_from_file(noise_path, sr, fft_size, fft_overlap)
    elif selection:
        mag = np.asarray(fourier.get_mag(signal[:, 0], fft_size, hop))
        profile = noise_profile_from_selection(mag, sr, hop, *selection)
    else:
        raise ValueError("need noise_path or selection")
    freqs = fourier.fft_freqs(fft_size, sr)
    profile = final_profile(profile, freqs, control_curve, 0.0, overhead)
    out = process(signal, sr, profile, gain, fft_size, fft_overlap, channels)
    return audio_io.write_file(file_path, out, sr, out.shape[1],
                               suffix if suffix is not None else f" fft={fft_size}")


@functools.partial(jax.jit, static_argnames=("fft_size", "lo", "hi", "n_pos", "chunk"))
def _band_gain_positions(xp, fft_size: int, lo: int, hi: int, n_pos: int,
                         chunk: int):
    """Band-mean |FFT| of the frame starting at EVERY sample position — a
    step=1 banded STFT, tiled so HBM holds one (chunk, fft) frame block.
    Frame indices come from runtime iotas (no baked index constants)."""
    window = jnp.asarray(fourier.get_window("blackmanharris", fft_size))
    n_chunks = -(-n_pos // chunk)
    xp2 = jnp.pad(xp, (0, max(0, n_chunks * chunk + fft_size - xp.shape[0])))
    i0 = jax.lax.broadcasted_iota(jnp.int32, (chunk, fft_size), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, fft_size), 1)

    def one(c):
        xs = jax.lax.dynamic_slice(xp2, (c * chunk,), (chunk + fft_size,))
        fr = xs[i0 + i1] * window
        spec = jnp.fft.rfft(fr, axis=-1) / np.sqrt(fft_size)
        return jnp.mean(jnp.abs(spec[:, lo:hi]), axis=-1)

    g = jax.lax.map(one, jnp.arange(n_chunks))
    return g.reshape(-1)[:n_pos]


def sniff_offset(signal, sr, fft_size=1024, fft_overlap=4, f_lo=3000, f_hi=12000):
    """Find the hop phase maximizing band-energy variance
    (renoiser_gui.py:347-380). Returns the optimal pad offset.

    All ``hop`` phases sweep in ONE device call: the step=1 banded STFT
    yields the gain at every sample position, and phase i's frame set is
    every hop-th position starting at -i — the same total FLOPs as the
    reference's sequential hop loop of full STFTs, in a single launch.
    The variance is scored over frames whose windows lie fully inside the
    signal for EVERY phase, so no phase gains or loses boundary frames
    (the reference's per-offset reflect pad gives each phase a slightly
    different boundary-frame set; the ranking is interior-dominated).
    """
    hop = fft_size // fft_overlap
    sig = np.asarray(signal[:, 0] if signal.ndim == 2 else signal, np.float32)
    lo = int(round(f_lo * fft_size / sr))
    hi = int(round(f_hi * fft_size / sr))
    n = len(sig)
    T = (n + fft_size // 2) // hop + 1
    n_pos = T * hop
    # frame at signal position q starts at xp[q + hop - 1] covering
    # [q - fft//2, q + fft//2); front zeros serve every phase shift
    xp = np.pad(sig, (hop - 1 + fft_size // 2, fft_size))
    g = _band_gain_positions(jnp.asarray(xp), fft_size, lo, hi, n_pos, 4096)
    # row t column c is position q = t*hop + c - (hop-1); keep rows whose
    # positions are >= fft//2 and <= n - fft//2 for all c (fully interior)
    t_lo = -(-(fft_size // 2 + hop - 1) // hop)
    t_hi = (n - fft_size // 2) // hop + 1
    rows = g.reshape(T, hop)
    if t_hi - t_lo >= 4:
        rows = rows[t_lo:t_hi]
    stds_by_col = jnp.std(rows, axis=0)
    # phase i reads column hop-1-i
    return int(jnp.argmax(stds_by_col[::-1]))
