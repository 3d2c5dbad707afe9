"""Blockwise streaming processing for recordings larger than device memory.

Reference: experiments/pyrespeeder_cmd.py:16-49 — stream ``blocksize*hop``
sample blocks with ``overlap*hop`` halos, process each, trim ``overlap//2``
boundary frames so block edges are artifact-free.  This is the host-side
big-file analogue of the on-mesh time sharding in parallel/sharded.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["iter_blocks", "stream_trace", "stream_process"]


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
