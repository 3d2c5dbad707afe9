"""Device-resident pipeline must match the host reference path."""

import jax.numpy as jnp
import numpy as np

from pyaudiorestoration_tpu.ops import resampling
from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev


def test_plan_positions_matches_host_speed_to_pos():
    hop = 512
    T = 200
    rng = np.random.default_rng(5)
    speeds = 1.0 + 0.03 * np.sin(np.arange(T) * 0.1) + 0.001 * rng.standard_normal(T)
    sampletimes = np.arange(T) * hop
    num_input = (T - 1) * hop
    ref = resampling.speed_to_pos(sampletimes, speeds, num_input)
    plan = rdev.plan_positions(speeds, hop, num_input)
    assert abs(plan["n_out"] - len(ref)) <= 1
    # reconstruct positions from the plan the way the device does (but f64)
    k = np.arange(plan["max_n"])[None, :]
    denom = np.maximum(plan["n"][:, None] - 1, 1)
    bs = speeds[:-1, None] + k / denom * (speeds[1:, None] - speeds[:-1, None])
    inv = np.where(k < plan["n"][:, None], 1 / bs, 0)
    rel = np.cumsum(inv, axis=1)
    pos = plan["base_int"][:, None] + plan["base_frac"][:, None] + rel
    flat = pos[k < plan["n"][:, None]][: len(ref)]
    np.testing.assert_allclose(flat, ref[: len(flat)], atol=1e-6)


def test_plan_positions_fast_matches_direct():
    """Digamma closed-form plan == direct-grid plan (incl. falling speeds,
    constant segments and the end trim)."""
    hop = 512
    rng = np.random.default_rng(9)
    for speeds in [
        1.0 + 0.04 * np.sin(np.arange(300) * 0.07),
        np.concatenate([np.full(50, 1.0), np.linspace(1.0, 0.9, 100),
                        np.full(50, 0.9)]),
        1.0 + 0.002 * rng.standard_normal(200),
    ]:
        num_input = (len(speeds) - 1) * hop
        ref = rdev.plan_positions(speeds, hop, num_input)
        fast = rdev.plan_positions_fast(speeds, hop, num_input)
        np.testing.assert_array_equal(fast["n"], ref["n"])
        np.testing.assert_array_equal(fast["base_int"], ref["base_int"])
        np.testing.assert_allclose(fast["base_frac"], ref["base_frac"], atol=1e-5)
        assert abs(fast["n_out"] - ref["n_out"]) <= 1
        assert fast["drift"] >= ref["drift"]


def test_sinc_padded_matches_flat_sinc():
    sr = 8000
    hop = 256
    n = 4 * sr
    sig = (np.sin(2 * np.pi * 440 * np.arange(n) / sr) * 0.5).astype(np.float32)
    T = n // hop
    t = np.arange(T) * hop / sr
    speeds = 1.0 + 0.02 * np.sin(2 * np.pi * 1.0 * t)
    plan = rdev.plan_positions(speeds, hop, n)
    padded = np.asarray(rdev.sinc_padded_device(
        jnp.asarray(sig), jnp.asarray(speeds.astype(np.float32)),
        jnp.asarray(plan["n"]), jnp.asarray(plan["base_int"]),
        jnp.asarray(plan["base_frac"]), int(plan["max_n"]), 50))
    flat = rdev.compact_output(padded, plan)
    # compare against the host-position sinc path
    ref_pos = resampling.speed_to_pos(np.arange(T) * hop, speeds, n)
    ref = resampling.sinc_resample(sig, ref_pos, quality=50)
    m = min(len(flat), len(ref)) - 600
    err = np.abs(flat[600:m] - ref[600:m]).max()
    assert err < 2e-4, err


def test_restore_device_end_to_end():
    sr = 44100
    n = 3 * sr
    t = np.arange(n) / sr
    f0 = 3000.0
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 0.8 * t)
    phase = 2 * np.pi * f0 * np.cumsum(speed) / sr
    sig = (np.sin(phase) * 0.5).astype(np.float32)
    padded, plan = rdev.restore_device(jnp.asarray(sig), sr, f0, fft_size=4096,
                                       fft_overlap=8, zeropad=2, sinc_quality=30)
    out = rdev.compact_output(np.asarray(padded), plan)

    def stability(x):
        idx = np.where(np.bitwise_xor(x[1:] > 0, x[:-1] > 0))[0]
        frac = x[idx] / (x[idx] - x[idx + 1])
        cr = idx + frac
        k = 32
        avg = (cr[2 * k:] - cr[:-2 * k]) / k
        fr = 2 * sr / avg
        core = fr[len(fr) // 8:-len(fr) // 8]
        return np.std(core) / np.mean(core)

    assert stability(out.astype(float)) < stability(sig.astype(float)) * 0.2
