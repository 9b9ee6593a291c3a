"""Profiling and observability hooks.

The reference has no instrumentation at all (SURVEY.md §5: no timers, no
trace hooks).  TPU-native equivalents:

  - :func:`trace` — context manager around ``jax.profiler.trace`` dumping a
    TensorBoard/Perfetto trace directory;
  - :func:`annotate` — ``jax.named_scope`` wrapper so factorize/solve/line-
    search phases are labeled in traces;
  - :func:`enable_nan_debugging` — the race-detector analog for a
    functional runtime: debug_nans catches the poison class JAX code
    actually has (reference relies on downstream NumPy warnings only).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named scope for trace readability: with annotate('kkt-factor'): ..."""
    return jax.named_scope(name)


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
