"""Headless visualization: spectrograms with mel-frequency axes plus marker
overlays, replacing the reference's vispy canvas stack (util/spectrum.py,
util/vispy_ext.py, util/colormaps.py) with matplotlib renderings.

The reference's GUI semantics that matter for review (mel y-transform
vispy_ext.py:148-199, dB colormapping spectrum.py:15-31, marker overlays
markers.py) are reproduced as figure-producing functions for notebooks/CLI.
"""

from __future__ import annotations

import numpy as np

from ..ops import units

__all__ = ["plot_spectrogram", "plot_speed_curves", "save_spectrogram"]


def _mel_extent(sr):
    return units.to_mel(np.array([1.0, sr / 2]))


def plot_spectrogram(mag, sr, hop, ax=None, vmin=-120, vmax=0, cmap="magma",
                     mel=True, markers=()):
    """Render a magnitude spectrogram in dB with a mel-spaced y axis.

    ``markers`` may contain TraceLine / RegLine / box-style markers; they are
    drawn in the reference's colors (markers.py:25-563).
    """
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    db = units.to_dB(np.asarray(mag) + 1e-10)
    n_bins, n_frames = db.shape
    freqs = np.arange(n_bins) / (2 * (n_bins - 1)) * sr
    duration = n_frames * hop / sr
    if mel:
        # resample rows onto a uniform mel grid (the GLSL MelTransform's job)
        mel_grid = np.linspace(units.to_mel(freqs[1]), units.to_mel(freqs[-1]), n_bins)
        hz_grid = units.to_Hz(mel_grid)
        rows = np.clip((hz_grid / (sr / 2) * (n_bins - 1)).astype(int), 0, n_bins - 1)
        img = db[rows]
        extent = (0, duration, mel_grid[0], mel_grid[-1])
        ax.set_ylabel("mel")
    else:
        img = db
        extent = (0, duration, 0, sr / 2)
        ax.set_ylabel("Hz")
    ax.imshow(img, aspect="auto", origin="lower", extent=extent, vmin=vmin,
              vmax=vmax, cmap=cmap, interpolation="nearest")
    ax.set_xlabel("time (s)")
    y = (lambda f: units.to_mel(np.maximum(f, 1.0))) if mel else (lambda f: f)
    for m in markers:
        if hasattr(m, "times") and hasattr(m, "freqs"):      # TraceLine
            ax.plot(m.times, y(m.freqs), color=(1, 0, 0, 0.5), lw=1)
        elif hasattr(m, "speed_at"):                          # RegLine
            tt = np.linspace(m.t0, m.t1, 200)
            ax.plot(tt, y(np.power(2, m.speed_at(tt) + np.log2(2000))),
                    color=(0, 0, 1, 0.5), lw=1)
        elif hasattr(m, "a") and hasattr(m, "b"):             # box markers
            from matplotlib.patches import Rectangle

            t0, t1 = sorted((m.a[0], m.b[0]))
            f0, f1 = sorted((m.a[1], m.b[1]))
            ax.add_patch(Rectangle(
                (t0, y(np.array(f0))), t1 - t0, y(np.array(f1)) - y(np.array(f0)),
                fill=False, edgecolor=(1, 1, 1, 0.6)))
    return ax


def plot_speed_curves(curves, labels=None, ax=None):
    """Plot master speed / lag curves ((n, 2) arrays) like the upper canvas
    view (spectrum.py:290-314)."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    for i, data in enumerate(curves):
        label = labels[i] if labels else None
        ax.plot(data[:, 0], data[:, 1], lw=1.5, alpha=0.8, label=label)
    ax.set_xlabel("time (s)")
    if labels:
        ax.legend(framealpha=0.75)
    return ax


def save_spectrogram(path, mag, sr, hop, **kwargs):
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 6))
    plot_spectrogram(mag, sr, hop, ax=ax, **kwargs)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
