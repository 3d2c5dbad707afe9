"""The banded (gather-free) sinc must match the padded gather version."""

import jax.numpy as jnp
import numpy as np

from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev


def test_banded_matches_padded():
    sr = 8000
    hop = 256
    n = 3 * sr
    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(n) * 0.3).astype(np.float32)
    T = n // hop
    t = np.arange(T) * hop / sr
    speeds = 1.0 + 0.03 * np.sin(2 * np.pi * 1.3 * t)
    plan = rdev.plan_positions(speeds, hop, n)
    args = (jnp.asarray(sig), jnp.asarray(speeds.astype(np.float32)),
            jnp.asarray(plan["n"]), jnp.asarray(plan["base_int"]),
            jnp.asarray(plan["base_frac"]))
    ref = np.asarray(rdev.sinc_padded_device(*args, int(plan["max_n"]), 50))
    drift = 8
    while drift < plan["drift"]:
        drift *= 2
    got = np.asarray(rdev.sinc_banded_device(*args, int(plan["max_n"]), 50, drift))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_banded_edge_masking():
    """Out-of-signal taps contribute zero, same as the padded version."""
    sr = 4000
    hop = 128
    n = sr
    sig = np.ones(n, np.float32)
    T = n // hop
    speeds = np.ones(T)
    plan = rdev.plan_positions(speeds, hop, n)
    args = (jnp.asarray(sig), jnp.asarray(speeds.astype(np.float32)),
            jnp.asarray(plan["n"]), jnp.asarray(plan["base_int"]),
            jnp.asarray(plan["base_frac"]))
    ref = np.asarray(rdev.sinc_padded_device(*args, int(plan["max_n"]), 30))
    got = np.asarray(rdev.sinc_banded_device(*args, int(plan["max_n"]), 30, 8))
    np.testing.assert_allclose(got, ref, atol=2e-5)
