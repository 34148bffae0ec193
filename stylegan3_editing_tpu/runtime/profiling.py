"""Profiler hooks: trace annotations + on-demand jax.profiler captures.

TPU-native analogue of the reference's tracing surface
(/root/reference/torch_utils/misc.py:102-110 `profiled_function` wraps
`torch.autograd.profiler.record_function`; explicit `record_function`
scopes around data_fetch / per-phase opt in setgan/training_loop.py:304-309,
:401, :445):

- ``profiled_scope(name)`` / ``@profiled_function`` emit
  `jax.profiler.TraceAnnotation` scopes, visible in captured traces, and
  accumulate host wall-time per scope into a module-level collector the
  training loops can report into training stats.
- ``maybe_start_trace(dir)`` / ``stop_trace()`` gate a
  ``jax.profiler.trace`` dump on a CLI flag / env var
  (``SG3TPU_TRACE_DIR``) — the capture lands in TensorBoard's profiler
  format under ``<dir>/plugins/profile``.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from typing import Dict, Optional

import jax

# Host wall-time per scope name (seconds, cumulative) — the training loops
# drain this into training_stats each tick (`Timing/<name>`).
_scope_times: Dict[str, float] = {}
_scope_counts: Dict[str, int] = {}


@contextlib.contextmanager
def profiled_scope(name: str):
    """TraceAnnotation + host wall-time accumulation for `name`."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _scope_times[name] = _scope_times.get(name, 0.0) + dt
    _scope_counts[name] = _scope_counts.get(name, 0) + 1


def profiled_function(fn):
    """Decorator form (reference `misc.profiled_function`)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with profiled_scope(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


def drain_scope_times(reset: bool = True) -> Dict[str, float]:
    """Cumulative seconds per scope since the last drain."""
    out = dict(_scope_times)
    if reset:
        _scope_times.clear()
        _scope_counts.clear()
    return out


_active_trace: Optional[str] = None


def maybe_start_trace(trace_dir: Optional[str] = None) -> bool:
    """Start a jax.profiler trace if a dir is given or SG3TPU_TRACE_DIR is
    set. Returns True when tracing started."""
    global _active_trace
    trace_dir = trace_dir or os.environ.get("SG3TPU_TRACE_DIR")
    if not trace_dir or _active_trace is not None:
        return False
    jax.profiler.start_trace(trace_dir)
    _active_trace = trace_dir
    return True


def stop_trace() -> Optional[str]:
    """Stop an active trace; returns its directory (or None)."""
    global _active_trace
    if _active_trace is None:
        return None
    jax.profiler.stop_trace()
    out, _active_trace = _active_trace, None
    return out
