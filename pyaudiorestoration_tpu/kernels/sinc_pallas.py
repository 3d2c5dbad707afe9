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

__all__ = ["sinc_banded_pallas", "sinc_banded_pallas_dma",
           "sinc_banded_pallas_dma_segments"]


def _recip(d, approx_rcp: bool):
    """1/d — hardware approximate reciprocal refined by one Newton step when
    ``approx_rcp`` (f32 relative error ~1e-7, vs a multi-cycle exact divide
    per lane-pass), plain division otherwise (interpret mode)."""
    if not approx_rcp:
        return 1.0 / d
    r0 = pl.reciprocal(d, approx=True)
    return r0 * (2.0 - d * r0)


def _shift_mac(buf, bs, rel, in_seg, *, nt, drift, max_n, refresh=128,
               approx_rcp=False):
    """Shared shift-MAC loop for both Pallas kernels, with the per-pass
    sin/cos evaluations replaced by closed forms and one recurrence.

    The profiler (docs/BENCHMARKS.md, round 2) shows this loop is VPU-
    transcendental-bound: every pass evaluated ``sin`` for the sinc and
    ``cos`` for the hann taper.  Per lane the sinc argument advances by
    exactly ``fc`` each pass, so sin values come from an ANCHORED plane
    rotation: an (s, c) anchor pair advances once every J=8 passes, and
    intermediate passes expand sin(anchor + j*pifc) by angle addition with
    precomputed per-lane cos/sin(j*pifc) (3 ops).  Anchors re-seed exactly
    every ``refresh`` passes (the anchor chain takes 2U/J rotation steps, so
    drift is ~J x smaller than the old per-pass rotation's measured 8e-7
    over 132 steps; a 2-op Chebyshev three-term recurrence was rejected —
    its error impulse response grows ~linearly for fc near 1 where
    e^{+-i pi fc} coalesce, ~1e-4 worst case over 128 steps).  The
    hann phase advances by the COMPILE-TIME angle pi/nt, so its per-pass
    value needs no recurrence at all: cos(th0 + v*hd) expands over Python-
    float cos/sin(v*hd) into two scalar-muls of per-lane seeds — exact for
    every pass, nothing carried.  The quotient denominator pi*x is likewise
    evaluated drift-free per pass as (v-U)*pifc - b with per-lane
    b = (rel-k)*pifc.  Near x = 0 the quotient sin(pi x)/(pi x) amplifies
    seed drift, so |x| < 0.25 uses the Taylor series instead (max series
    error 4e-7 at the switch point).
    """
    U = nt + drift
    k = jax.lax.broadcasted_iota(jnp.int32, bs.shape, dimension=1).astype(jnp.float32)
    ind_local = jnp.round(rel)
    fc = jnp.minimum(bs, 1.0)
    m = ind_local - k           # bounded by drift
    pif = np.float32(np.pi)
    pifc = pif * fc
    sf = jnp.sin(pifc)
    cf = jnp.cos(pifc)
    # d_v = (v-U)*pifc - b, exact per pass.  Masked (in_seg == 0) lanes get
    # b shifted by 1e6 so |d| stays >= 1e6 - pi*(max_n + 2U) on EVERY pass
    # (masked rel freezes near n while k runs to max_n-1, so the unshifted
    # |d| is bounded by ~pi*(max_n + 2U) — asserted below to keep the margin
    # real for any caller): their quotient s * (1/d) is then 0 * tiny with
    # no per-pass clamp.  Valid lanes never need one either — on series
    # passes the |d| < 0.25*pi select discards the quotient branch near the
    # singularity, and on non-series passes |x| >= 0.25 by the fc_lo bound
    # below, i.e. |d| >= 0.25*pi.
    assert np.pi * (max_n + 2 * U) < 2e5, \
        "masked-lane |d| margin: max_n too large for the 1e6 b-shift"
    b = (rel - k) * pifc + (1.0 - in_seg) * np.float32(1e6)
    hd = np.pi / nt
    L = buf.shape[1]

    # The (nt, drift, max_n) contract statically bounds the per-pass tap
    # offset jf = (v - U) - m to [v-U-drift, v-U+drift] for every VALID lane
    # (|m| <= drift by the caller's drift bound), and the same bound implies
    # fc >= 1/(1 + (drift-2)/max_n).  That lets most passes skip, at compile
    # time, (a) the validity compare+select (interior passes are always
    # fully valid) and (b) the near-zero Taylor-series evaluation + select
    # (|pi x| is provably >= ~2 away from the removable singularity).
    fc_lo = 1.0 / (1.0 + max(drift - 2, 0) / max(max_n, 1))

    # the sinc rotation is LINEAR, so constant per-lane factors fold into the
    # seeds: (s, c) carry sin/cos(pi x) * fc * in_seg (the sinc quotient's
    # numerator scale); the hann factor needs only its two per-lane seeds
    fcm = fc * in_seg
    # hann seeds at v = 0 (th0 = (pi/nt)*(jf0 + nt), jf0 = -U - m); per pass
    # 0.5*cos(th0 + v*hd) = cos(v*hd)*ca - sin(v*hd)*sa with Python-float
    # cos/sin(v*hd) — exact, so no reseed and no carried state
    th0 = (pif / np.float32(nt)) * (np.float32(nt - U) - m)
    ca = 0.5 * jnp.cos(th0)
    sa = 0.5 * jnp.sin(th0)
    # series/quotient switch |x| < 0.25 expressed on d = pi*x: |d| < pi/4
    qthr = np.float32(0.25 * np.pi)
    # Anchor scheme: the (s, c) rotation pair advances only every J passes
    # (one 6-op rotation by the precomputed J*pifc angle); the J-1 passes in
    # between take their sine straight off the anchor via 3-op angle
    # addition with per-lane cos/sin(j*pifc).  Per-pass sinc cost drops from
    # 6 to ~3 + 6/J ops, and the anchor chain takes 2U/J rotation steps
    # instead of 2U — LESS accumulated drift than the per-pass rotation.
    J = 8
    assert refresh % J == 0 or refresh >= 2 * U, "reseeds must land on anchors"
    cfj = [None] * (J + 1)
    sfj = [None] * (J + 1)
    cfj[1], sfj[1] = cf, sf
    for j in range(2, J + 1):
        cfj[j], sfj[j] = (cfj[j - 1] * cf - sfj[j - 1] * sf,
                          sfj[j - 1] * cf + cfj[j - 1] * sf)
    jpifc = [None] + [np.float32(j) * pifc for j in range(1, J)]
    acc = jnp.zeros(bs.shape, jnp.float32)
    sA = cA = dA = None
    # static unrolled shift loop: Mosaic lowers static rolls to lane shifts
    for v in range(2 * U):
        j = v % J
        if j == 0:
            dA = np.float32(v - U) * pifc - b  # exact anchor, drift-free
            d = dA
            if v % refresh == 0:  # exact transcendental re-seed
                sA = jnp.sin(dA) * fcm
                cA = jnp.cos(dA) * fcm
            else:  # advance the anchor by J passes in one rotation
                sA, cA = (sA * cfj[J] + cA * sfj[J],
                          cA * cfj[J] - sA * sfj[J])
            s = sA
        else:
            d = dA + jpifc[j]
            s = sA * cfj[j] + cA * sfj[j]
        cav = np.float32(np.cos(v * hd))
        sav = np.float32(np.sin(v * hd))
        all_valid = (v - U - drift >= -nt) and (v - U + drift <= nt - 1)
        min_abs_jf = max(0, abs(v - U) - drift)
        series_needed = (min_abs_jf - 0.5) * fc_lo < 0.25
        if series_needed:
            px2 = d * d
            series = (1.0 - px2 / 6.0 * (1.0 - px2 / 20.0 * (1.0 - px2 / 42.0))) * fcm
            # a valid lane can land on d == 0 exactly here (q -> NaN), but
            # |d| < qthr always selects the series on those lanes and select
            # does not propagate the unselected branch
            q = s * _recip(d, approx_rcp)
            sincf = jnp.where(jnp.abs(d) < qthr, series, q)
        else:
            sincf = s * _recip(d, approx_rcp)
        # 0.5 - ha, ha = cav*ca - sav*sa (0.5 folded into the per-lane seeds):
        # 2 scalar-muls + 2 adds, no recurrence
        w = sincf * ((np.float32(0.5) - cav * ca) + sav * sa)
        if not all_valid:
            # jf = (v-U) - m in [-nt, nt) rewritten as bounds on m alone
            valid = (m <= np.float32(v - U + nt)) & (m > np.float32(v - U - nt))
            w = jnp.where(valid, w, 0.0)
        # left-roll by v == right-roll by L - v (pltpu.roll wants shift >= 0);
        # the used region [:max_n] never touches the circular wrap.  (A
        # narrower per-128-pass-group sub-slice roll was measured SLOWER —
        # 117.9 vs 114.3 ms on the 4-min take — and 9x slower to compile:
        # Mosaic materializes the sliced operand per pass.  An incremental
        # roll-by-1 of a CARRIED buffer was also slower — 65.2 vs 52.4 ms on
        # the 1-min/192k micro-bench: the carry serializes the rolls into the
        # MAC dependency chain, while independent roll-by-v from the original
        # buffer schedules ahead.)
        seg = (buf if v == 0 else pltpu.roll(buf, L - v, axis=1))[:, :max_n]
        acc = acc + seg * w
    return acc


def _kernel(buf_ref, bs_ref, rel_ref, mask_ref, out_ref, *, nt, drift, max_n,
            approx_rcp=False):
    out_ref[...] = _shift_mac(buf_ref[...], bs_ref[...], rel_ref[...],
                              mask_ref[...], nt=nt, drift=drift, max_n=max_n,
                              approx_rcp=approx_rcp)


def _kernel_dma(starts_ref, sig_ref, bs_ref, rel_ref, mask_ref, offs_ref,
                out_ref, buf_ref, sem, *, nt, drift, max_n, tile, L_pad,
                approx_rcp=False):
    """DMA variant: each segment row copies its contiguous signal window from
    HBM into VMEM (strided row DMAs beat XLA's scalar-rate gather), then the
    shift-MAC loop runs on the VMEM-resident buffer.

    Window starts are 128-aligned for Mosaic; the residual per-row offset
    (0..1023) is removed by a 10-stage binary roll-alignment network.
    """
    U = nt + drift
    i = pl.program_id(0)

    def row_copy(r):
        # sig is a (n/128, 128) view; starts are multiples of 1024 so the row
        # index is a multiple of 8 and the row count L_pad/128 is too
        row0 = pl.multiple_of(starts_ref[i * tile + r], 8)
        return pltpu.make_async_copy(
            sig_ref.at[pl.ds(row0, L_pad // 128), :], buf_ref.at[r], sem.at[r])

    for r in range(tile):
        row_copy(r).start()
    for r in range(tile):
        row_copy(r).wait()

    buf = buf_ref[...].reshape(tile, L_pad)
    # per-row left-roll by offs (0..1023) via 10 conditional power-of-two rolls
    offs = offs_ref[...]  # (tile, 1) int32 VMEM block
    for bit in range(10):
        amount = 1 << bit
        take = ((offs >> bit) & 1).astype(jnp.float32)
        rolled = pltpu.roll(buf, L_pad - amount, axis=1)
        buf = take * rolled + (1.0 - take) * buf

    # the shift-MAC only ever reads lanes [v : v+max_n] for v < 2(nt+drift);
    # drop the alignment margin before the pass loop to keep the rolled
    # working set minimal (device time is compute-bound either way —
    # measured identical — but the smaller span frees VMEM for larger max_n)
    L_use = -(-(max_n + 2 * U) // 128) * 128
    out_ref[...] = _shift_mac(buf[:, :L_use], bs_ref[...], rel_ref[...],
                              mask_ref[...], nt=nt, drift=drift, max_n=max_n,
                              approx_rcp=approx_rcp)


@functools.partial(jax.jit, static_argnames=("max_n", "nt", "drift", "tile",
                                              "interpret", "seg_tile"))
def sinc_banded_pallas_dma(sig, speeds, n, base_int, base_frac, max_n: int,
                           nt: int = 50, drift: int = 32, tile: int = 16,
                           interpret: bool = False, seg_tile: int = 32768):
    """Banded sinc with in-kernel HBM->VMEM row DMA (scalar-prefetched window
    starts).  Replaces the precomputed gather buffer of
    ``sinc_banded_pallas`` — the gather is what scales superlinearly in the
    XLA formulation.

    Window reads go through a (n/128, 128) signal view with 1024-aligned
    sample starts (row slices satisfy Mosaic's (8, 128) tiling); the residual
    0..1023 per-row offset is removed by a 10-stage binary roll network in
    VMEM.  Measured on TPU v5e: ~4.7x the XLA banded kernel at 4-minute
    takes (the XLA version's window gather scales superlinearly)."""
    return sinc_banded_pallas_dma_segments(
        sig, speeds[:-1], speeds[1:], n, base_int, base_frac, max_n, nt,
        drift, tile, interpret, seg_tile)


@functools.partial(jax.jit, static_argnames=("max_n", "nt", "drift", "tile",
                                              "interpret", "seg_tile",
                                              "force_chunk"))
def sinc_banded_pallas_dma_segments(sig, s_lo_a, s_hi_a, n, base_int,
                                    base_frac, max_n: int, nt: int = 50,
                                    drift: int = 32, tile: int = 16,
                                    interpret: bool = False,
                                    seg_tile: int = 32768,
                                    force_chunk: bool = False):
    """Segments-level entry: per-segment endpoint speeds instead of a
    (T+1,) curve, so a BATCH of takes can flatten into the segment axis
    (respeeder_device.restore_fused_takes) with row-guarded anchors.

    ``force_chunk`` always routes through fixed ``seg_tile`` chunks: the
    Mosaic program then depends only on (seg_tile, tile, max_n, nt, drift),
    NOT on the batch size — any B reuses one compiled kernel."""
    T = n.shape[0]
    U = nt + drift
    L = max_n + 2 * U
    # window slices run through a (n/128, 128) view with 1024-aligned sample
    # starts (row index multiple of 8); margin covers the in-window offset
    L_pad = -(-(L + 1024) // 1024) * 1024
    kf = jnp.arange(max_n, dtype=jnp.float32)[None, :]
    ki = jnp.arange(max_n, dtype=jnp.int32)[None, :]
    # zero-pad the signal so every (1024-aligned) window is in range and
    # out-of-signal taps read exact zeros
    total = sig.shape[0] + U + max_n + U + L_pad
    total = -(-total // 1024) * 1024
    sig_p = jnp.pad(sig, (U, total - sig.shape[0] - U))
    sig_2d = sig_p.reshape(-1, 128)
    # every DMA reads L_pad samples from the 1024-ALIGNED-down start, so the
    # only hard bound is aligned + L_pad <= len(sig_p), i.e. starts_raw <=
    # len - L_pad; the padding above guarantees that for every real anchor
    # (total >= flatlen + L + L_pad), making this clip a pure safety net.  An
    # extra -1024 here (pre-round-3 bug) clipped REAL window starts in the
    # last unaligned kilosample and corrupted the final segments whenever the
    # signal length was not 1024-aligned (e.g. the flattened-takes layout).
    max_start = sig_p.shape[0] - L_pad

    kernel = functools.partial(_kernel_dma, nt=nt, drift=drift, max_n=max_n,
                               tile=tile, L_pad=L_pad,
                               approx_rcp=not interpret)

    def run_chunk(s_lo, s_hi, nn, bi, bf):
        Tc = nn.shape[0]
        denom = jnp.maximum(nn[:, None] - 1, 1).astype(jnp.float32)
        bs = s_lo[:, None] + kf / denom * (s_hi[:, None] - s_lo[:, None])
        in_seg_b = ki < nn[:, None]
        inv = jnp.where(in_seg_b, 1.0 / bs, 0.0)
        rel = jnp.cumsum(inv, axis=1) + bf[:, None]
        in_seg = in_seg_b.astype(jnp.float32)
        starts_raw = jnp.clip(bi, 0, max_start)
        aligned = (starts_raw // 1024) * 1024
        starts = aligned // 128  # row index into the (n/128, 128) view
        offs = starts_raw - aligned
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Tc // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # signal stays in HBM
                pl.BlockSpec((tile, max_n), lambda i, *_: (i, 0)),
                pl.BlockSpec((tile, max_n), lambda i, *_: (i, 0)),
                pl.BlockSpec((tile, max_n), lambda i, *_: (i, 0)),
                pl.BlockSpec((tile, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, max_n), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((tile, L_pad // 128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((tile,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tc, max_n), jnp.float32),
            interpret=interpret,
        )(starts, sig_2d, bs, rel, in_seg, offs[:, None])

    if T <= seg_tile and not force_chunk:
        pad_t = (-T) % tile
        args = (jnp.pad(s_lo_a, (0, pad_t), constant_values=1.0),
                jnp.pad(s_hi_a, (0, pad_t), constant_values=1.0),
                jnp.pad(n, (0, pad_t)), jnp.pad(base_int, (0, pad_t)),
                jnp.pad(base_frac, (0, pad_t)))
        return run_chunk(*args)[:T]
    # chunk the segment axis so the per-chunk grids stay HBM-friendly
    assert seg_tile % tile == 0
    pad_t = (-T) % seg_tile
    n_chunks = (T + pad_t) // seg_tile
    out = jax.lax.map(lambda a: run_chunk(*a), (
        jnp.pad(s_lo_a, (0, pad_t), constant_values=1.0).reshape(n_chunks, seg_tile),
        jnp.pad(s_hi_a, (0, pad_t), constant_values=1.0).reshape(n_chunks, seg_tile),
        jnp.pad(n, (0, pad_t)).reshape(n_chunks, seg_tile),
        jnp.pad(base_int, (0, pad_t)).reshape(n_chunks, seg_tile),
        jnp.pad(base_frac, (0, pad_t)).reshape(n_chunks, seg_tile),
    ))
    return out.reshape(-1, max_n)[:T]


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

    kernel = functools.partial(_kernel, nt=nt, drift=drift, max_n=max_n,
                               approx_rcp=not interpret)
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
