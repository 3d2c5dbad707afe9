"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths (time-axis context parallelism, file-axis data
parallelism) are exercised on host devices, mirroring SURVEY.md §4's test
strategy. Must set flags before jax is imported anywhere.
"""

import os

os.environ["AUDIOIO_NO_IDX"] = "1"  # never write .flacidx sidecars next to the read-only reference samples
os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets axon (TPU); tests run on a virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The session's sitecustomize imports jax before conftest runs, freezing the
# platform default to "axon"; override through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

SAMPLES = pathlib.Path("/root/reference/samples")


@pytest.fixture(scope="session")
def samples_dir():
    if not SAMPLES.is_dir():
        pytest.skip("reference samples not available")
    return SAMPLES


@pytest.fixture(scope="session")
def flutter(samples_dir):
    from pyaudiorestoration_tpu.utils import audio_io

    sig, sr, ch = audio_io.read_file(samples_dir / "flutter.flac")
    return sig, sr


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
