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

# --- memory-map budget guard (full-suite SIGSEGV root cause, round 5) -----
# XLA:CPU JIT-compiles one host function per thunk, each costing ~3 mmap
# entries (code + rodata + rw pages); a single distinct-shape sosfiltfilt
# compile allocates ~2000 maps, and the ~30 distinct shapes across the suite
# pushed the process past the kernel's vm.max_map_count (65530), killing
# pytest with SIGSEGV inside a later compile (verified with a /proc/PID/maps
# monitor: crash at maps=65531, 4/4 runs).  jax.clear_caches() releases the
# executables and their code pages (measured 11366 -> 1059 maps).  Clear
# only when the process nears the limit so compile-cache reuse survives
# everywhere else.  30k leaves ~35k headroom for a single test's compiles
# (the guard runs between tests; the largest observed single-test burst was
# ~15k maps).
_MAP_BUDGET = 30_000


def _map_count():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-procfs platform: the budget guard is a no-op
        return 0


@pytest.fixture(autouse=True)
def _xla_map_budget():
    yield
    if _map_count() > _MAP_BUDGET:
        jax.clear_caches()


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
