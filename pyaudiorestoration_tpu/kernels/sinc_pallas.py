"""Pallas TPU kernel for the banded varispeed windowed-sinc resampler.

The XLA formulation (pipelines/respeeder_device.sinc_banded_device) streams
the (segments, span) window buffer from HBM once per shift pass — 2*(NT+U)
times.  This kernel keeps each segment tile's buffer resident in VMEM across
all passes, so HBM traffic is one read of the window buffer plus one write
of the output, and the weight evaluation (sinc * hann * cutoff) runs fused
on the VPU.

Grid: one program per tile of segments.  All shapes static; the tap loop is
a `fori_loop` over 2*(NT+U) shift offsets with `pl.ds` dynamic slices of the
VMEM buffer.  Tested in interpreter mode on CPU; compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sinc_banded_pallas"]


def _kernel(buf_ref, bs_ref, rel_ref, mask_ref, out_ref, *, nt, drift, max_n):
    U = nt + drift
    buf = buf_ref[...]          # (tile, L)
    bs = bs_ref[...]            # (tile, max_n)
    rel = rel_ref[...]          # (tile, max_n) local positions incl. base_frac
    in_seg = mask_ref[...]      # (tile, max_n) 1.0 where k < n
    k = jax.lax.broadcasted_iota(jnp.int32, bs.shape, dimension=1).astype(jnp.float32)
    ind_local = jnp.round(rel)
    shift = rel - ind_local
    fc = jnp.minimum(bs, 1.0)
    m = ind_local - k           # bounded by drift

    acc = jnp.zeros(bs.shape, jnp.float32)
    # static unrolled shift loop: Mosaic lowers static rolls to lane shifts
    for v in range(2 * U):
        jf = (float(v) - U) - m
        valid = (jf >= -nt) & (jf < nt)
        x = (jf - shift) * fc
        hann = 0.5 - 0.5 * jnp.cos(np.pi * (jf + nt) / nt)
        w = jnp.where(valid, jnp.sinc(x) * fc * hann, 0.0) * in_seg
        # left-roll by v == right-roll by L - v (pltpu.roll wants shift >= 0);
        # the used region [:max_n] never touches the circular wrap
        L = buf.shape[1]
        seg = (buf if v == 0 else pltpu.roll(buf, L - v, axis=1))[:, :max_n]
        acc = acc + seg * w
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("max_n", "nt", "drift", "tile", "interpret"))
def sinc_banded_pallas(sig, speeds, n, base_int, base_frac, max_n: int,
                       nt: int = 50, drift: int = 32, tile: int = 8,
                       interpret: bool = False):
    """Drop-in replacement for ``sinc_banded_device`` backed by a Pallas
    kernel.  Returns the (T, max_n) padded output."""
    n_in = sig.shape[0]
    T = n.shape[0]
    U = nt + drift
    L = max_n + 2 * U
    # precompute per-segment rows (cheap XLA): window buffer + speed grids
    kf = jnp.arange(max_n, dtype=jnp.float32)[None, :]
    ki = jnp.arange(max_n, dtype=jnp.int32)[None, :]
    denom = jnp.maximum(n[:, None] - 1, 1).astype(jnp.float32)
    bs = speeds[:-1, None] + kf / denom * (speeds[1:, None] - speeds[:-1, None])
    in_seg = (ki < n[:, None]).astype(jnp.float32)
    inv = jnp.where(in_seg > 0, 1.0 / bs, 0.0)
    rel = jnp.cumsum(inv, axis=1) + base_frac[:, None]
    start = base_int - U
    idx = start[:, None] + np.arange(L)[None, :]
    buf = jnp.where((idx >= 0) & (idx < n_in), sig[jnp.clip(idx, 0, n_in - 1)], 0.0)

    pad_t = (-T) % tile
    if pad_t:
        buf = jnp.pad(buf, ((0, pad_t), (0, 0)))
        bs = jnp.pad(bs, ((0, pad_t), (0, 0)), constant_values=1.0)
        rel = jnp.pad(rel, ((0, pad_t), (0, 0)))
        in_seg = jnp.pad(in_seg, ((0, pad_t), (0, 0)))
    Tp = T + pad_t

    kernel = functools.partial(_kernel, nt=nt, drift=drift, max_n=max_n)
    out = pl.pallas_call(
        kernel,
        grid=(Tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, max_n), lambda i: (i, 0)),
            pl.BlockSpec((tile, max_n), lambda i: (i, 0)),
            pl.BlockSpec((tile, max_n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, max_n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, max_n), jnp.float32),
        interpret=interpret,
    )(buf, bs, rel, in_seg)
    return out[:T]
