"""Device selection with graceful degradation.

Mirrors the reference's backend fallback chain (torch-CUDA -> pyfftw ->
numpy, fourier.py:67-75): here TPU -> CPU, plus simple observability helpers
(jax.profiler traces around hot stages, SURVEY.md §5 tracing rebuild note).
"""

from __future__ import annotations

import contextlib
import logging

__all__ = ["best_device", "device_kind", "profile_trace"]


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
