"""Blockwise streaming processing for recordings larger than device memory.

Reference: experiments/pyrespeeder_cmd.py:16-49 — stream ``blocksize*hop``
sample blocks with ``overlap*hop`` halos, process each, trim ``overlap//2``
boundary frames so block edges are artifact-free.  This is the host-side
big-file analogue of the on-mesh time sharding in parallel/sharded.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["iter_blocks", "stream_trace", "stream_process",
           "stream_masked_stft", "decoded_bytes", "should_stream",
           "virtual_read"]


def decoded_bytes(path) -> int:
    """Decoded float32 size of an audio file from its HEADER (frames x
    channels x 4) — the honest auto-stream threshold.  Container bytes
    undercount badly for FLAC (a 1 GiB file can decode to >4 GiB).  Uses
    the native header-only probe (no decode, no frame indexing); a FLAC
    without a STREAMINFO total falls back to opening a reader."""
    from . import audio_io

    try:
        sr, ch, frames = audio_io.probe_file(path)
        if frames > 0:
            return frames * ch * 4
    except OSError:
        pass
    with audio_io.StreamReader(path) as r:
        return int(r.frames) * int(r.channels) * 4


def should_stream(path, stream="auto", threshold_bytes: int = 1 << 30) -> bool:
    """Resolve a ``stream`` flag: True/False pass through; "auto" streams
    when the DECODED size exceeds ``threshold_bytes``."""
    if stream is True or stream is False:
        return stream
    return decoded_bytes(path) > threshold_bytes


def virtual_read(reader, a: int, b: int, pad: int, channels):
    """Read samples [a, b) of the VIRTUAL padded signal the in-memory
    spectral tools transform: ``fix_length(x, n + pad)`` (right zero pad)
    followed by the STFT's reflect centering.  Negative / past-end indices
    reflect exactly like ``jnp.pad(mode="reflect")`` so blockwise frames are
    bit-identical to the whole-file ones.  Returns (b - a, C) float32.
    """
    n = int(reader.frames)
    n_pad = n + pad
    idx = np.arange(a, b)
    idx = np.where(idx < 0, -idx, idx)                    # left reflect
    idx = np.where(idx >= n_pad, 2 * (n_pad - 1) - idx, idx)  # right reflect
    # spans can outrun even the reflected range (fixed-shape tail blocks on
    # short files); those frames are zeroed by the caller, so clamp
    idx = np.clip(idx, 0, max(n_pad - 1, 0))
    out = np.zeros((b - a, len(channels)), np.float32)
    real = idx < n
    if real.any():
        lo = int(idx[real].min())
        hi = int(idx[real].max())
        buf = reader.read(lo, hi - lo + 1)
        out[real] = buf[idx[real] - lo][:, channels]
    return out


def stream_masked_stft(in_path, out_path, make_fac, fft_size: int, hop: int,
                       channels=None, block_frames: int = 8192,
                       mask_halo_frames: int = 0, zeropad: int = 1,
                       window_name: str = "blackmanharris", progress=None,
                       mix_down: bool = False):
    """Blockwise STFT -> per-bin gain mask -> iSTFT with halo trim, streamed
    file to file — the big-file path for renoise / heal / hpss (reference
    blocking pattern: util/fourier.py:390-407, experiments/
    pyrespeeder_cmd.py:16-49).

    INTERIOR BIT-PARITY with the in-memory ``stft(fix_length(x, n+pad))`` ->
    mask -> ``istft(length=n)`` round trip: each output sample's frame set,
    window envelope addends, and overlap-add order are identical, so the
    streamed file equals the in-memory file except where the mask itself is
    non-local (``mask_halo_frames`` bounds that reach, e.g. the HPSS median).

    ``make_fac(spec_block, t_lo)``: complex (C, F, T_blk) frames starting at
    global frame ``t_lo`` -> gain factors broadcastable to the same shape —
    or a LIST of factor arrays when ``out_path`` is a list (one output file
    per factor set, e.g. the three HPSS components).  ``mix_down`` sums the
    masked channels into ONE output channel per file (the max/min mono
    folds, dropouts_gui.py:137-163 — iSTFT is linear, so summing after
    inversion equals inverting the summed spectrum).  Memory high-water is
    one block regardless of recording length.
    """
    from ..ops import fourier
    from . import audio_io

    multi = isinstance(out_path, (list, tuple))
    out_paths = list(out_path) if multi else [out_path]
    pad = fft_size // 2
    with audio_io.StreamReader(in_path) as reader:
        sr = reader.sample_rate
        n = int(reader.frames)
        chans = list(channels) if channels is not None else list(range(reader.channels))
        T = (n + pad) // hop + 1  # frames of the centered padded STFT
        win_sq = fourier.pad_center(
            fourier.get_window(window_name, fft_size).astype(np.float64) ** 2,
            fft_size)
        tiny = np.finfo(np.float32).tiny
        import contextlib

        import jax.numpy as jnp

        out_ch = 1 if mix_down else len(chans)
        with contextlib.ExitStack() as stack:
            writers = [stack.enter_context(
                audio_io.open_writer(p, sr, out_ch)) for p in out_paths]
            # fixed per-block frame counts: the tail block READS the same
            # span shape (virtual_read reflects past the end) and pads its
            # masked spec with zero frames, so every device call in the loop
            # compiles once per file regardless of the tail length
            t_span = block_frames + 2 * mask_halo_frames + (fft_size // hop) + 2
            s0 = 0
            while s0 < n:
                s1 = min(n, s0 + block_frames * hop)
                # frames whose windows touch [s0, s1)
                t_lo = max(0, -(-(s0 + pad - fft_size + 1) // hop))
                t_hi = min(T, (s1 - 1 + pad) // hop + 1)
                te_lo = max(0, t_lo - mask_halo_frames)
                te_hi = min(T, t_hi + mask_halo_frames)
                a = te_lo * hop - pad  # span in padded-signal coords
                b = (te_lo + t_span - 1) * hop - pad + fft_size
                span = virtual_read(reader, a, b, pad, chans)  # (len, C)
                spec = fourier.stft(jnp.asarray(span.T), n_fft=fft_size,
                                    step=hop, window_name=window_name,
                                    zeropad=zeropad, center=False)
                # frames beyond te_hi are reflect-padding artifacts; zero
                # them so they never contribute (their OLA windows lie past
                # the emitted range anyway)
                t_keep = te_hi - te_lo
                frame_ok = (np.arange(t_span) < t_keep).astype(np.float32)
                spec = spec * jnp.asarray(frame_ok)
                facs = make_fac(spec, te_lo)
                if not isinstance(facs, (list, tuple)):
                    facs = [facs]
                lo_cut = t_lo - te_lo
                # local window-sumsquare envelope: same f64 addends in the
                # same order as the global one, so interior division is exact
                env = None
                for fac, writer in zip(facs, writers):
                    sp = (spec * fac)[..., lo_cut:]
                    mask2 = (np.arange(sp.shape[-1]) < (t_hi - t_lo)).astype(np.float32)
                    sp = sp * jnp.asarray(mask2)
                    y = np.asarray(fourier.istft_frames_raw(
                        sp, hop, window_name, zeropad))  # (C, span_out)
                    if env is None:
                        span_len = y.shape[-1]
                        env = np.zeros(span_len, np.float64)
                        for t in range(t_lo, t_hi):
                            s = (t - t_lo) * hop
                            env[s:s + fft_size] += win_sq[
                                :max(0, min(fft_size, span_len - s))]
                        env32 = env.astype(np.float32)
                        env = np.where(env32 > tiny, env32, 1.0)
                    y = y / env[None, :]
                    if mix_down:
                        y = y.sum(axis=0, keepdims=True)
                    # final[s] lives at overlap-add coord s + pad - t_lo*hop
                    off = s0 + pad - t_lo * hop
                    writer.write(y[:, off: off + (s1 - s0)].T)
                if progress is not None:
                    progress(int(100 * s1 / n))
                s0 = s1
    return out_path


def iter_blocks(n_samples, hop, blocksize=4096, overlap=32):
    """Yield (start, stop, trim_lo_frames, trim_hi_frames) block spans in
    samples; each block carries an ``overlap*hop`` halo on both sides."""
    block = blocksize * hop
    halo = overlap * hop
    trim = overlap // 2
    start = 0
    while start < n_samples:
        stop = min(n_samples, start + block)
        lo = max(0, start - halo)
        hi = min(n_samples, stop + halo)
        trim_lo = (start - lo) // hop
        trim_hi = (hi - stop) // hop
        yield lo, hi, start, stop, min(trim, trim_lo), min(trim, trim_hi)
        start = stop


def stream_trace(signal, sr, tracker, fft_size, hop, blocksize=4096, overlap=32):
    """Run a frame-rate tracker blockwise over a long signal, trimming halo
    frames at the seams.  ``tracker(block, sr) -> (times, values)`` with
    times relative to the block.  Returns concatenated (times, values)."""
    all_times, all_vals = [], []
    for lo, hi, start, stop, trim_lo, trim_hi in iter_blocks(
            len(signal), hop, blocksize, overlap):
        times, vals = tracker(signal[lo:hi], sr)
        n = len(times)
        sl = slice(trim_lo, n - trim_hi if trim_hi else n)
        all_times.append(np.asarray(times)[sl] + lo / sr)
        all_vals.append(np.asarray(vals)[sl])
    return np.concatenate(all_times), np.concatenate(all_vals)


def stream_process(signal, process, hop, blocksize=4096, overlap=32):
    """Blockwise sample-domain processing with halo trim and concatenation.

    ``process(block) -> block`` must be length-preserving (e.g. a masked
    STFT->iSTFT round trip).  Returns the processed signal.
    """
    pieces = []
    for lo, hi, start, stop, trim_lo, trim_hi in iter_blocks(
            len(signal), hop, blocksize, overlap):
        out = np.asarray(process(signal[lo:hi]))
        pieces.append(out[start - lo: len(out) - (hi - stop) if hi - stop else len(out)])
    return np.concatenate(pieces)
