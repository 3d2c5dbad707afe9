"""Data-parallel batch restoration over the ``files`` mesh axis.

The reference loops file lists sequentially (resampling.py:168,
dropouts_gui.py:121-135); here a batch of recordings shards across devices
as the ``files`` axis while each recording's time axis shards over ``time``
(parallel/sharded.restore_step).
"""

from __future__ import annotations

import numpy as np

from ..utils import audio_io
from . import mesh as pmesh
from . import sharded

__all__ = ["load_batch", "restore_batch", "restore_batch_files"]


def load_batch(paths, multiple: int = 1, channel: int = 0):
    """Read files into a zero-padded (files, time) batch.

    All files must share a sample rate; lengths pad to the maximum, rounded
    up to ``multiple`` (the mesh's time-shard granularity).
    Returns (batch, sr, lengths).
    """
    signals, srs = [], []
    for p in paths:
        sig, sr, _ = audio_io.read_file(p)
        signals.append(sig[:, channel])
        srs.append(sr)
    if len(set(srs)) != 1:
        raise ValueError(f"Sample rates differ: {srs}")
    lengths = [len(s) for s in signals]
    n = max(lengths)
    n = -(-n // multiple) * multiple
    batch = np.zeros((len(signals), n), dtype=np.float32)
    for i, s in enumerate(signals):
        batch[i, :len(s)] = s
    return batch, srs[0], lengths


def restore_batch(mesh, batch, f0_hz, sr, **kwargs):
    """Sharded restore step over an already-built (files, time) batch."""
    xs = pmesh.shard_time_batch(mesh, batch)
    return sharded.restore_step(mesh, xs, f0_hz, sr, **kwargs)


def restore_batch_files(paths, f0_hz, n_files_axis=None, out_suffix="_res", **kwargs):
    """End-to-end: read files -> mesh -> sharded restore -> write outputs."""
    import jax

    n_dev = len(jax.devices())
    n_files_axis = n_files_axis or max(1, min(len(paths), n_dev))
    while n_dev % n_files_axis:
        n_files_axis -= 1
    mesh = pmesh.make_mesh(n_files=n_files_axis, n_time=n_dev // n_files_axis)
    n_time = mesh.shape["time"]
    step = kwargs.get("step", 128)
    out_paths = []
    for i in range(0, len(paths), n_files_axis):
        group = paths[i:i + n_files_axis]
        pad_group = list(group) + [group[-1]] * (n_files_axis - len(group))
        batch, sr, lengths = load_batch(pad_group, multiple=n_time * step)
        out = np.asarray(restore_batch(mesh, batch, f0_hz, sr, **kwargs))
        for path, row, length in zip(group, out, lengths):
            out_paths.append(audio_io.write_file(path, row[:length], sr, 1,
                                                 suffix=out_suffix))
    return out_paths
