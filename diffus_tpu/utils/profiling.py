"""Profiling / tracing utilities (the reference had only [INFO] prints
and ad-hoc timeit cells — SURVEY section 5).

``profile_trace`` wraps ``jax.profiler`` for TensorBoard-readable traces;
``stage_timer`` / ``block_and_time`` give honest device timings (blocking
on results, since dispatch is async).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace into ``logdir`` (view in TensorBoard
    or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None):
    """Wall-clock a stage, blocking pending device work at both edges."""
    jax.effects_barrier()
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    else:
        print(f"[stage] {name}: {dt * 1e3:.3f} ms")


def block_and_time(fn, *args, iters: int = 10, warmup: int = 1):
    """Steady-state timing of a jitted callable: warm up, then time
    ``iters`` calls with a final ``block_until_ready``.  Returns seconds
    per call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
