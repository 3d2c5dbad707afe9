"""Multi-device tests on the virtual 8-CPU mesh: sharded STFT/iSTFT must
match the single-device path; the full restore step must run and restore."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiorestoration_tpu.parallel import mesh as pmesh
from pyaudiorestoration_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return pmesh.make_mesh(n_files=2, n_time=4)


def _reference_stft_leftaligned(x, n_fft, step, window_name="blackmanharris", zeropad=1):
    from scipy.signal import get_window
    window = get_window(window_name, n_fft).astype(np.float32)
    n_est = (len(x) - n_fft) // step + 1
    out = np.empty((n_fft * zeropad // 2 + 1, n_est), np.complex64)
    for t in range(n_est):
        out[:, t] = np.fft.rfft(window * x[t * step:t * step + n_fft], n=n_fft * zeropad)
    return out / np.sqrt(n_fft)


def test_stft_sharded_matches_dense(mesh8, rng):
    n_fft, step = 512, 128
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    xs = pmesh.shard_time_batch(mesh8, x)
    spec = np.asarray(sharded.stft_sharded(mesh8, xs, n_fft, step))
    for b in range(2):
        ref = _reference_stft_leftaligned(x[b], n_fft, step)
        t = ref.shape[1]
        np.testing.assert_allclose(spec[b, :, :t], ref, atol=2e-4)
    # trailing frames (zero halo) exist but are finite
    assert np.all(np.isfinite(spec))


def test_istft_sharded_roundtrip(mesh8, rng):
    n_fft, step = 512, 128
    x = rng.standard_normal((2, 8192)).astype(np.float32) * 0.5
    xs = pmesh.shard_time_batch(mesh8, x)
    spec = sharded.stft_sharded(mesh8, xs, n_fft, step, window_name="hann")
    y = np.asarray(sharded.istft_sharded(mesh8, spec, n_fft, step, window_name="hann"))
    # interior parity: OLA normalization assumes full coverage away from ends
    sl = slice(n_fft, 8192 - n_fft)
    err = np.abs(y[:, sl] - x[:, sl]).max()
    assert err < 1e-3, err


def test_hpss_sharded_matches_dense(mesh8, rng):
    """Sharded HPSS masks == single-device decompose.hpss masks (interior)."""
    from pyaudiorestoration_tpu.ops import decompose
    F, T = 65, 256
    S = np.abs(rng.standard_normal((2, F, T))).astype(np.float32)
    S[:, 20, :] += 5.0
    S[:, :, 100] += 5.0
    xs = jax.device_put(S, pmesh.NamedSharding(mesh8, pmesh.P("files", None, "time")))
    mh, mp = sharded.hpss_sharded(mesh8, xs, kernel_size=9)
    ref_h, ref_p = decompose.hpss(S[0], kernel_size=9, mask=True)
    got_h = np.asarray(mh)[0]
    # interior parity (shard boundaries use true halos; global edges symmetric)
    np.testing.assert_allclose(got_h, np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mp)[0], np.asarray(ref_p), atol=1e-5)


def test_restore_step_runs_and_restores(mesh8):
    """Wobbled tone in, steadier tone out — through the fully sharded step."""
    sr = 8192
    n = 4 * sr
    t = np.arange(n) / sr
    f0 = 1024.0
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 2.0 * t)
    phase = 2 * np.pi * f0 * np.cumsum(speed) / sr
    sig = np.sin(phase).astype(np.float32)
    batch = np.stack([sig, sig])
    xs = pmesh.shard_time_batch(mesh8, batch)
    out = np.asarray(sharded.restore_step(mesh8, xs, f0, sr, n_fft=512, step=128))
    assert out.shape == batch.shape
    assert np.all(np.isfinite(out))

    def stability(x):
        idx = np.where(np.bitwise_xor(x[1:] > 0, x[:-1] > 0))[0]
        frac = x[idx] / (x[idx] - x[idx + 1])
        cr = idx + frac
        k = 32
        avg = (cr[2 * k:] - cr[:-2 * k]) / k
        fr = 2 * sr / avg
        core = fr[len(fr) // 8:-len(fr) // 8]
        return np.std(core) / np.mean(core)

    assert stability(out[0].astype(float)) < stability(sig.astype(float)) * 0.5
    # windowed-sinc interpolation mode restores at least as well
    out_s = np.asarray(sharded.restore_step(mesh8, xs, f0, sr, n_fft=512,
                                            step=128, interp="sinc", nt=16))
    assert np.all(np.isfinite(out_s))
    assert stability(out_s[0].astype(float)) < stability(sig.astype(float)) * 0.6


def test_renoise_sharded_matches_dense(mesh8, rng):
    """Sharded masked denoise == dense left-aligned stft -> mask -> istft."""
    n_fft, step = 512, 128
    sr = 8192
    t = np.arange(4 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.01 * rng.standard_normal(4 * sr)).astype(np.float32)
    x2 = np.stack([x, x * 0.7])
    profile = np.linspace(-48.0, -40.0, n_fft // 2 + 1).astype(np.float32)
    gain = -25.0
    xs = pmesh.shard_time_batch(mesh8, x2)
    y = np.asarray(sharded.renoise_sharded(mesh8, xs, profile, gain,
                                           n_fft, step, window_name="hann"))
    assert y.shape == x2.shape and np.all(np.isfinite(y))

    # dense reference: same left-aligned frames + mask + OLA on one device
    for b in range(2):
        ref_spec = _reference_stft_leftaligned(x2[b], n_fft, step, "hann")
        mag_db = 20 * np.log10(np.abs(ref_spec) + 1e-7)
        fac = np.where(mag_db > profile[:, None], 1.0, 10 ** (gain / 20))
        masked = ref_spec * fac
        # reconstruct the interior with the periodic-envelope OLA
        from scipy.signal import get_window
        win = get_window("hann", n_fft).astype(np.float64)
        frames = np.fft.irfft(masked * np.sqrt(n_fft), n=n_fft, axis=0).T * win
        n_out = step * frames.shape[0] + n_fft - step
        acc = np.zeros(n_out)
        for i in range(frames.shape[0]):
            acc[i * step:i * step + n_fft] += frames[i]
        wss = np.zeros(step)
        for k in range(n_fft // step + 2):
            seg = win[k * step:(k + 1) * step] ** 2
            wss[:len(seg)] += seg
        env = np.tile(wss, n_out // step + 1)[:n_out]
        ref_y = acc / np.maximum(env, 1e-12)
        lo, hi = n_fft, len(x2[b]) - n_fft
        np.testing.assert_allclose(y[b, lo:hi], ref_y[lo:hi], atol=5e-4)
        # and the tone survives while the floor is attenuated
        assert np.std(y[b, lo:hi]) > 0.1


def test_heal_sharded_boosts_dropout(mesh8, rng):
    """Sharded dropout heal: a dB gain mask over the dropout's bins/frames
    raises the carved region back while leaving the rest bit-close."""
    n_fft, step = 512, 128
    sr = 8192
    t = np.arange(4 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 640 * t)).astype(np.float32)
    n = len(x)
    d0, d1 = int(1.5 * sr), int(1.5 * sr) + 4096
    x[d0:d1] *= 0.1
    x2 = np.stack([x, x])

    n_frames = (2 * n) // (2 * step)  # matches stft_sharded layout (T = local_total/step)
    T = n // step
    gain = np.zeros((2, n_fft // 2 + 1, T), np.float32)
    bin_c = round(640 * n_fft / sr)
    f0, f1 = d0 // step - 1, d1 // step + 1
    gain[:, bin_c - 3:bin_c + 4, f0:f1] = 20.0  # +20 dB on the tone band

    xs = pmesh.shard_time_batch(mesh8, x2)
    y = np.asarray(sharded.heal_sharded(mesh8, xs, gain, n_fft, step))
    assert y.shape == x2.shape and np.all(np.isfinite(y))
    # healed region is boosted ~10x back toward the original level
    lo, hi = d0 + n_fft, d1 - n_fft  # interior of the healed span
    boost = np.std(y[0, lo:hi]) / np.std(x[lo:hi])
    assert 5.0 < boost < 15.0
    # untouched interior stays put
    q0, q1 = int(0.5 * sr), int(1.0 * sr)
    np.testing.assert_allclose(y[0, q0:q1], x[q0:q1], atol=5e-3)
