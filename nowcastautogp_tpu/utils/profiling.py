"""Tracing & per-phase timing.

The reference has no profiler hooks (SURVEY.md §5 — its nearest thing is a
ProgressMeter bar, ``/root/reference/src/forecasting.jl:129,163``); the
TPU-build note there calls for ``jax.profiler`` traces plus per-phase timers
(SMC step / HMC / predict).  Both live here:

* :func:`phase` — a context manager accumulating wall-clock into a global
  registry, used by the SMC loop and forecasters; read with
  :func:`phase_report`, reset with :func:`reset_phases`.
* :func:`device_trace` — wraps ``jax.profiler.trace`` so a whole fit or
  forecast can be captured for TensorBoard/XProf with one ``with`` block.
"""

from __future__ import annotations

import collections
import contextlib
import time

__all__ = ["phase", "phase_report", "reset_phases", "device_trace"]

_TIMES: dict[str, float] = collections.defaultdict(float)
_COUNTS: dict[str, int] = collections.defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall-clock time under ``name``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMES[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def phase_report() -> dict[str, dict[str, float]]:
    """{phase: {seconds, calls}} accumulated since the last reset."""
    return {
        k: {"seconds": round(_TIMES[k], 4), "calls": _COUNTS[k]}
        for k in sorted(_TIMES)
    }


def reset_phases() -> None:
    """Clear all accumulated phase timings."""
    _TIMES.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
