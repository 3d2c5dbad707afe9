"""Time-sharded STFT / iSTFT / restoration step with ICI halo exchange.

The reference's answer to long recordings is blockwise streaming with
``overlap*hop`` halos and boundary trimming (experiments/pyrespeeder_cmd.py:
16-49); on TPU the time axis shards across devices instead, and the halos are
``jax.lax.ppermute`` neighbor exchanges inside ``shard_map``:

* STFT: a frame straddling a shard boundary needs ``n_fft - step`` samples
  from the right neighbor -> one left-directed ppermute before framing.
* iSTFT overlap-add: each shard's trailing ``n_fft - step`` samples belong to
  the right neighbor's head -> one right-directed ppermute plus an add.
* The fixed-length varispeed resampler gathers within a bounded drift halo.

All functions are pure and jit/shard_map compiled; they compose into
``restore_step`` — the flagship "training-step equivalent" that the multichip
dry-run compiles over a ('files', 'time') mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fourier import get_window

__all__ = ["stft_sharded", "istft_sharded", "restore_step", "halo_exchange_right",
           "hpss_sharded", "cog_sharded", "renoise_sharded", "heal_sharded"]


def _left_ppermute(x, axis_name, n_shards):
    """Send my leading block to my left neighbor (receive from the right;
    last shard receives zeros)."""
    perm = [(d, d - 1) for d in range(1, n_shards)]
    return jax.lax.ppermute(x, axis_name, perm)


def _right_ppermute(x, axis_name, n_shards):
    """Send my block to my right neighbor (first shard receives zeros)."""
    perm = [(d, d + 1) for d in range(n_shards - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_exchange_right(local, halo: int, axis_name: str, n_shards: int):
    """Append the right neighbor's first ``halo`` samples along the last axis."""
    head = local[..., :halo]
    recv = _left_ppermute(head, axis_name, n_shards)
    return jnp.concatenate([local, recv], axis=-1)


def _stft_local(x_ext, n_fft: int, step: int, window, zeropad: int, n_frames: int):
    if n_fft % step == 0:
        # static shifted views instead of a gather with a baked index constant
        ratio = n_fft // step
        need = (n_frames + ratio - 1) * step
        xb = jnp.pad(x_ext, [(0, 0)] * (x_ext.ndim - 1)
                     + [(0, max(0, need - x_ext.shape[-1]))])[..., :need]
        blocks = xb.reshape(*xb.shape[:-1], -1, step)
        frames = jnp.concatenate(
            [blocks[..., j:j + n_frames, :] for j in range(ratio)], axis=-1)
    else:
        i0 = jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 0) * step
        i1 = jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 1)
        frames = x_ext[..., i0 + i1]
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft * zeropad, axis=-1)
    return jnp.swapaxes(spec, -1, -2) / np.sqrt(n_fft)  # (..., F, T_local)


def stft_sharded(mesh: Mesh, x, n_fft: int = 1024, step: int = 256,
                 window_name: str = "blackmanharris", zeropad: int = 1):
    """STFT of a (files, time) batch sharded over the mesh.

    Left-aligned frames (center=False): global frame t covers samples
    [t*step, t*step + n_fft).  Output (files, n_freqs, n_frames) sharded as
    (files, None, time).  Requires local_len % step == 0.
    """
    n_time = mesh.shape["time"]
    batch, total = x.shape
    local = total // n_time
    assert local % step == 0, "local shard length must be a multiple of step"
    halo = n_fft - step
    window = jnp.asarray(get_window(window_name, n_fft))
    n_frames_local = local // step

    def fn(xb):  # xb: (B_local, local)
        ext = halo_exchange_right(xb, halo, "time", n_time)
        return _stft_local(ext, n_fft, step, window, zeropad, n_frames_local)

    return shard_map(
        fn, mesh=mesh,
        in_specs=P("files", "time"),
        out_specs=P("files", None, "time"),
    )(x)


def istft_sharded(mesh: Mesh, spec, n_fft: int = 1024, step: int = 256,
                  window_name: str = "blackmanharris"):
    """Inverse of ``stft_sharded`` (least-squares OLA, periodic interior
    normalization).  spec: (files, F, T) sharded (files, None, time); returns
    (files, time) samples."""
    n_time = mesh.shape["time"]
    halo = n_fft - step
    window = np.asarray(get_window(window_name, n_fft), dtype=np.float64)
    # periodic interior window-sumsquare envelope (one hop period)
    wss = np.zeros(step)
    for k in range(n_fft // step + 2):
        seg = window[k * step:(k + 1) * step] ** 2
        wss[:len(seg)] += seg
    wss = np.maximum(wss, np.finfo(np.float32).tiny).astype(np.float32)

    assert n_fft % step == 0, "sharded iSTFT requires hop | n_fft"
    ratio = n_fft // step

    def fn(sb):  # (B_local, F, T_local)
        mat = sb * np.sqrt(n_fft)
        ytmp = jnp.fft.irfft(mat, n=n_fft, axis=-2)  # (B, n_fft, T_local)
        ytmp = jnp.swapaxes(ytmp, -1, -2) * jnp.asarray(window, jnp.float32)  # (B,T,n_fft)
        b, t_local, _ = ytmp.shape
        # overlap-add as ratio static shifted adds over hop blocks: frame t's
        # j-th hop chunk lands on output block t + j
        blocks = ytmp.reshape(b, t_local, ratio, step)
        n_blocks = t_local + ratio - 1  # == (t_local*step + halo) / step
        acc = jnp.zeros((b, n_blocks, step), ytmp.dtype)
        for j in range(ratio):
            acc = acc + jnp.pad(blocks[:, :, j, :], ((0, 0), (j, ratio - 1 - j), (0, 0)))
        flat = acc.reshape(b, n_blocks * step)
        local = flat[:, :t_local * step]
        tail = flat[:, t_local * step:]
        recv = _right_ppermute(tail, "time", n_time)
        local = local.at[:, :halo].add(recv)
        env = jnp.tile(jnp.asarray(wss), t_local)
        return local / env

    return shard_map(
        fn, mesh=mesh,
        in_specs=P("files", None, "time"),
        out_specs=P("files", "time"),
    )(spec)


def hpss_sharded(mesh: Mesh, spec_mag, kernel_size: int = 31, power: float = 2.0):
    """Time-sharded HPSS masks with halo exchange for the harmonic median.

    spec_mag: (files, F, T) magnitude sharded (files, None, time).  The
    harmonic median filter runs along time and needs ``kernel_size//2``
    frames from each neighbor; the percussive median runs along frequency
    (shard-local).  Returns (mask_harm, mask_perc) with the same sharding.
    """
    from ..ops.decompose import softmask

    n_time = mesh.shape["time"]
    half = kernel_size // 2

    def fn(sb):  # (B, F, T_local)
        # bidirectional halos along time
        left_recv = _right_ppermute(sb[..., -half:], "time", n_time)
        right_recv = _left_ppermute(sb[..., :half], "time", n_time)
        ext = jnp.concatenate([left_recv, sb, right_recv], axis=-1)
        # shard_map edges (global start/end) fall back to the halo zeros;
        # emulate 'symmetric' there by reflecting the local edge
        first = jax.lax.axis_index("time") == 0
        last = jax.lax.axis_index("time") == n_time - 1
        sym_l = sb[..., :half][..., ::-1]
        sym_r = sb[..., -half:][..., ::-1]
        ext = ext.at[..., :half].set(jnp.where(first, sym_l, ext[..., :half]))
        ext = ext.at[..., -half:].set(jnp.where(last, sym_r, ext[..., -half:]))
        # harmonic: median along time via static shifted stacks
        windows = jnp.stack([ext[..., j:j + sb.shape[-1]]
                             for j in range(kernel_size)], axis=-1)
        harm = jnp.sort(windows, axis=-1)[..., half]
        # percussive: median along frequency (local)
        pad_cfg = [(0, 0)] * (sb.ndim - 2) + [(half, half), (0, 0)]
        fext = jnp.pad(sb, pad_cfg, mode="symmetric")
        fwin = jnp.stack([fext[..., j:j + sb.shape[-2], :]
                          for j in range(kernel_size)], axis=-1)
        perc = jnp.sort(fwin, axis=-1)[..., half]
        mask_h = softmask(harm, perc, power=power, split_zeros=True)
        mask_p = softmask(perc, harm, power=power, split_zeros=True)
        return mask_h, mask_p

    return shard_map(
        fn, mesh=mesh,
        in_specs=P("files", None, "time"),
        out_specs=(P("files", None, "time"), P("files", None, "time")),
        check_vma=False,
    )(spec_mag)


def renoise_sharded(mesh: Mesh, x, profile, gain: float, n_fft: int = 1024,
                    step: int = 256, window_name: str = "blackmanharris"):
    """Time-sharded masked denoise of a (files, time) batch: sharded STFT ->
    per-bin noise-threshold gain mask -> sharded iSTFT.

    The mask itself (renoiser_gui.py:273-278: ``gain`` dB below the profile
    threshold, 0 dB above) is elementwise per (bin, frame), so it runs
    shard-local between the two halo-exchanging transforms; ``profile`` is a
    (n_freqs,) dB threshold curve replicated to every device.
    """
    from ..pipelines.renoiser import _mask_fac

    spec = stft_sharded(mesh, x, n_fft, step, window_name)
    mag_db = 20.0 * jnp.log10(jnp.abs(spec) + 1e-7)
    # the canonical mask (same code as the dense tier, so the tiers cannot
    # drift); _mask_fac's profile[:, None] broadcasts over (files, F, T)
    fac = _mask_fac(mag_db, jnp.asarray(profile, jnp.float32), float(gain))
    return istft_sharded(mesh, spec * fac, n_fft, step, window_name)


def heal_sharded(mesh: Mesh, x, gain_db, n_fft: int = 512, step: int = 128,
                 window_name: str = "blackmanharris"):
    """Time-sharded dropout healing: sharded STFT -> marker-driven dB gain
    mask (computed on the host at frame rate by pipelines/dropouts.py's
    marker logic and passed in as ``gain_db``) -> sharded iSTFT.

    ``x``: (files, time) batch; ``gain_db``: (files, n_freqs, n_frames)
    boost mask in dB (0 = untouched), laid out to match ``stft_sharded``'s
    left-aligned frames.  The multiply is elementwise/shard-local; only the
    two transforms exchange halos.
    """
    spec = stft_sharded(mesh, x, n_fft, step, window_name)
    fac = jnp.power(10.0, jnp.asarray(gain_db, jnp.float32) / 20.0)
    return istft_sharded(mesh, spec * fac, n_fft, step, window_name)


def cog_sharded(mesh: Mesh, spec_mag, NL0, NU0, tolerance, fft_size: int, sr: int):
    """Time-sharded Center-of-Gravity tracking with cross-shard band handoff.

    The CoG tracker is sequential — frame t+1's band depends on frame t's
    result (wow_detection.py:256-291) — so the time shards form a dependency
    chain.  Each shard runs its local ``lax.scan`` exactly once, on its turn,
    starting from the (NL, NU) carry its left neighbor computed; the carry
    rides a right-directed ``ppermute`` each turn (SURVEY §7 step 7's
    "per-shard scans with boundary-state handoff").  Wall-clock stays
    sequential (inherent to the recurrence) but compute and memory are
    distributed, and the result is bit-identical to the dense scan.

    spec_mag: (files, F, T) magnitudes sharded (files, None, time);
    NL0/NU0: (files,) int32 initial band per file.  Returns (files, T) cogs.
    """
    from ..models.trackers import cog_step_core

    n_time = mesh.shape["time"]
    from ..ops.fourier import fft_freqs

    with np.errstate(divide="ignore"):
        lff = jnp.asarray(np.log2(np.maximum(
            fft_freqs(fft_size, sr), 1e-12)).astype(np.float32))

    def local_scan(sb, nl, nu):  # sb (B, F, T_local); nl/nu (B,) int32
        def step(carry, frame):  # frame (B, F)
            cnl, cnu = carry
            nl2, nu2, cog = cog_step_core(frame, cnl, cnu, lff, tolerance,
                                          fft_size, sr)
            return (nl2, nu2), cog

        (nl, nu), cogs = jax.lax.scan(step, (nl, nu), jnp.moveaxis(sb, -1, 0))
        return nl, nu, jnp.moveaxis(cogs, 0, -1)  # (B, T_local)

    def fn(sb, nl0, nu0):
        idx = jax.lax.axis_index("time")
        out0 = jnp.zeros((sb.shape[0], sb.shape[-1]), jnp.float32)

        def body(s, state):
            carry_nl, carry_nu, out = state
            my_turn = idx == s
            nl2, nu2, cogs = jax.lax.cond(
                my_turn,
                lambda args: local_scan(sb, *args),
                lambda args: (args[0], args[1], jnp.zeros_like(out)),
                (carry_nl, carry_nu))
            out = jnp.where(my_turn, cogs, out)
            # hand the carry to the right neighbor for its turn
            nl_recv = _right_ppermute(nl2, "time", n_time)
            nu_recv = _right_ppermute(nu2, "time", n_time)
            return nl_recv, nu_recv, out

        _, _, out = jax.lax.fori_loop(0, n_time, body, (nl0, nu0, out0))
        return out

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P("files", None, "time"), P("files"), P("files")),
        out_specs=P("files", "time"),
        check_vma=False,
    )(spec_mag, NL0, NU0)


def _masked_peak_local(spec_local, nl, nu):
    """Frame-parallel masked peak tracking (device part of the Peak tracker).

    ``nl``/``nu``: per-frame int32 band limits (T_local,) — fixed-f0 callers
    pass constant arrays, trail-driven tracking passes the trail's bands
    (matching pipelines/respeeder_device.track_speed_device).  Delegates to
    the shared core so the sharded tier applies the same is-a-true-local-peak
    gate as the dense trackers (this previously refined unconditionally)."""
    from ..models.trackers import masked_peak_refine

    frames = jnp.swapaxes(spec_local, -1, -2)  # (..., T, F)
    return masked_peak_refine(frames, nl, nu)


def restore_step(mesh: Mesh, x, f0_hz: float, sr: int, n_fft: int = 512,
                 step: int = 128, tolerance_st: float = 2.0, drift_halo: int = 256,
                 interp: str = "linear", nt: int = 8, band=None):
    """Full sharded wow/flutter restoration step — the flagship pipeline.

    (files, time) batch -> sharded STFT -> frame-parallel peak tracking ->
    global speed normalization (psum over time) -> fixed-length varispeed
    linear resample with a bounded drift halo -> restored (files, time).

    ``band``: optional per-frame int32 band arrays (NL, NU) of global length
    ``total // step`` — trail-driven tracking (the multi-chip analogue of
    track_speed_device's NL/NU inputs).  When omitted the band is the fixed
    ``f0_hz +- tolerance_st`` window.

    This is the multichip "training step" the dry-run compiles: it exercises
    STFT halos (ppermute), collectives (psum), and cross-shard gathers.
    """
    n_time = mesh.shape["time"]
    batch, total = x.shape
    local = total // n_time
    assert local % step == 0
    halo = n_fft - step
    window = jnp.asarray(get_window("hann", n_fft))
    n_frames_local = local // step
    n_frames_total = total // step
    if band is None:
        f0_bin = int(round(f0_hz * n_fft / sr))
        tol_bins = max(2, int(round(f0_bin * (2 ** (tolerance_st / 12) - 1))))
        NL = np.full(n_frames_total, f0_bin - tol_bins, np.int32)
        NU = np.full(n_frames_total, f0_bin + tol_bins + 1, np.int32)
    else:
        NL, NU = (np.asarray(b, np.int32) for b in band)
        assert NL.shape == NU.shape == (n_frames_total,)

    def fn(xb, nl, nu):
        ext = halo_exchange_right(xb, halo, "time", n_time)
        spec = _stft_local(ext, n_fft, step, window, 1, n_frames_local)
        mag = jnp.abs(spec)
        peak_bins = _masked_peak_local(mag, nl, nu)  # (B, T_local)
        log_speed = jnp.log2(jnp.maximum(peak_bins, 1.0))
        # center the speed curve globally: mean over ALL time shards (psum)
        local_sum = jnp.sum(log_speed, axis=-1, keepdims=True)
        global_sum = jax.lax.psum(local_sum, "time")
        mean = global_sum / (n_frames_local * n_time)
        speed = jnp.power(2.0, log_speed - mean)  # (B, T_local), mean ~1
        # per-sample speed via frame-rate lerp (frame t covers t*step..)
        up = jnp.repeat(speed, step, axis=-1)  # (B, local)
        # fixed-length linear varispeed: positions = cumsum(1/speed) with the
        # global offset carried via collective prefix sum over shards
        inv = 1.0 / up
        local_total = jnp.sum(inv, axis=-1, keepdims=True)
        all_totals = jax.lax.all_gather(local_total, "time", axis=-1)  # (B,1,D)
        shard_id = jax.lax.axis_index("time")
        offset = jnp.sum(jnp.where(jnp.arange(n_time) < shard_id,
                                   all_totals[:, 0, :], 0.0), axis=-1, keepdims=True)
        pos = jnp.cumsum(inv, axis=-1) - inv + offset  # global positions
        # gather within own shard + drift halo from the right neighbor
        ext_sig = halo_exchange_right(xb, drift_halo, "time", n_time)
        base = shard_id * local
        rel = pos - base
        if interp == "linear":
            rel = jnp.clip(rel, 0.0, local + drift_halo - 2.0)
            i0 = jnp.floor(rel).astype(jnp.int32)
            frac = (rel - i0).astype(xb.dtype)
            g0 = jnp.take_along_axis(ext_sig, i0, axis=-1)
            g1 = jnp.take_along_axis(ext_sig, i0 + 1, axis=-1)
            return g0 * (1 - frac) + g1 * frac
        # windowed-sinc taps (reference convention: 2*nt taps, hann window,
        # adaptive cutoff fc = min(speed, 1)); needs a LEFT halo as well so
        # taps reaching into the previous shard are real samples
        left = _right_ppermute(xb[..., -nt:], "time", n_time)
        ext2 = jnp.concatenate([left, ext_sig], axis=-1)
        rel = jnp.clip(rel, 0.0, local + drift_halo - nt - 1.0) + nt
        ind = jnp.round(rel).astype(jnp.int32)
        shift = (rel - ind).astype(xb.dtype)
        fc = jnp.minimum(up, 1.0)
        offs = np.arange(-nt, nt, dtype=np.int32)
        idx = ind[..., None] + offs  # (B, local, 2nt)
        g = jnp.take_along_axis(ext2, idx.reshape(idx.shape[0], -1),
                                axis=-1).reshape(idx.shape)
        jf = offs.astype(np.float32)[None, None, :] - shift[..., None]
        xw = jf * fc[..., None]
        hann = 0.5 - 0.5 * jnp.cos(np.pi * (offs + nt) / nt)
        w = jnp.sinc(xw) * fc[..., None] * hann[None, None, :]
        return jnp.sum(g * w, axis=-1)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P("files", "time"), P("time"), P("time")),
        out_specs=P("files", "time"),
        check_vma=False,
    )(x, jnp.asarray(NL), jnp.asarray(NU))
