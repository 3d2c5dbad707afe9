"""Device selection with graceful degradation.

Mirrors the reference's backend fallback chain (torch-CUDA -> pyfftw ->
numpy, fourier.py:67-75): here TPU -> CPU, plus simple observability helpers
(jax.profiler traces around hot stages, SURVEY.md §5 tracing rebuild note).
"""

from __future__ import annotations

import contextlib
import logging

__all__ = ["best_device", "device_kind", "profile_trace",
           "enable_persistent_compile_cache"]


def enable_persistent_compile_cache(cache_dir=None):
    """Turn on JAX's on-disk compilation cache (idempotent).

    The fused restoration kernels unroll ~130 Pallas passes and take minutes
    to compile cold; the persistent cache makes that a one-time cost per
    machine instead of per process.  Called by the CLI entry point; library
    users can call it themselves.  Failures (read-only filesystems, old jax)
    downgrade to a debug log.  (On relay-style backends that compile on the
    server this is a no-op; on standard PJRT TPU/CPU runtimes cached
    executables reload in seconds.)
    """
    import os

    import jax

    if "PYTEST_CURRENT_TEST" in os.environ and cache_dir is None:
        # Never flip process-global cache config from inside a test process:
        # tests drive cli.main()/doctor in-process, and a crashed run once
        # left a truncated cache entry that SEGFAULTED the next full suite
        # during cache READ (jax compilation_cache.get_executable_and_time —
        # round-4 post-mortem).  Tests that want the cache pass an explicit
        # tmp cache_dir.
        return

    try:
        if cache_dir is None:
            cache_dir = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "pyaudiorestoration_tpu", "xla")
        os.makedirs(cache_dir, exist_ok=True)
        # a process that crashed mid-write can leave truncated entries that
        # crash the NEXT process during cache read (round-4 post-mortem);
        # sweep the obviously-bad ones (empty files, leftover temp files)
        for name in os.listdir(cache_dir):
            p = os.path.join(cache_dir, name)
            try:
                if name.endswith(".tmp") or os.path.getsize(p) == 0:
                    os.unlink(p)
            except OSError:
                pass
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        logging.debug("persistent compile cache unavailable", exc_info=True)


def best_device():
    """The best available accelerator, falling back to CPU with a warning."""
    import jax

    try:
        devs = jax.devices()
        if devs:
            return devs[0]
    except Exception:
        logging.exception("Accelerator backend failed, falling back to CPU")
    return jax.devices("cpu")[0]


def device_kind() -> str:
    try:
        return best_device().platform
    except Exception:
        return "cpu"


@contextlib.contextmanager
def profile_trace(log_dir: str | None = None):
    """jax.profiler trace context; no-op when no log_dir is given."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info(f"Wrote profiler trace to {log_dir}")
