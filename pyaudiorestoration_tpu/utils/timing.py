"""Structured stage timers (reference: util/timing.py, util/fourier.py:85-89)."""

from __future__ import annotations

import contextlib
import logging
import time

_records: dict[str, float] = {}


@contextlib.contextmanager
def log_duration(operation: str):
    logging.info(operation)
    start = time.perf_counter()
    yield
    duration = time.perf_counter() - start
    _records[operation] = duration
    logging.debug(f"{operation} took {duration:.2f} seconds")


@contextlib.contextmanager
def timed_log(method_name: str):
    start = time.perf_counter()
    yield
    logging.info(f"{method_name} {time.perf_counter() - start:0.2f}s")


def last_duration(operation: str) -> float | None:
    """Most recent wall time recorded for a stage, in seconds."""
    return _records.get(operation)
