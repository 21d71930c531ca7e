"""Relay-proof benchmark timing helpers (shared by bench.py / bench_apps.py).

Two facts about timing through the remote execution relay
(docs/benchmarking.md):

- ``block_until_ready`` is UNRELIABLE — it can return before the work
  ran (observed: a 32-pose sweep "timed" at 983k fps).  Timed loops must
  close with a host readback, which reliably drains the queue.
- A host readback costs ~27 ms round trip, and pulling a whole array
  adds ~12 ms/call of transfer — so readbacks reduce ON DEVICE and pull
  one scalar, and the per-call sync cost is measured once and subtracted.
"""

from __future__ import annotations

import time

import numpy as np


def readback(x) -> float:
    """Drain the dispatch queue: reduce on device, pull one scalar."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0])) if leaves else 0.0


def measure_sync_ms(n: int = 4) -> float:
    """The cost of one trivial dispatch + scalar readback round trip."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda s: jnp.sum(s))
    xs = [jnp.asarray(np.full((8,), float(i), np.float32)) for i in range(n + 1)]
    float(trivial(xs[0]))
    t0 = time.perf_counter()
    for i in range(n):
        float(trivial(xs[i + 1]))
    return (time.perf_counter() - t0) / n * 1e3


def readback_time_ms(fn, args_list, n: int, sync_ms: float = 0.0) -> float:
    """Mean per-call milliseconds of ``fn`` over unique argument tuples.

    All ``n`` dispatches are queued back-to-back and the loop closes with
    ONE scalar readback (drains the queue); ``sync_ms`` (from
    :func:`measure_sync_ms`) is subtracted once.  Amortizing the single
    sync over the loop keeps sub-sync workloads measurable (a per-call
    readback would bury a 1 ms step under the ~27 ms round trip) — the
    number is steady-state throughput per call, not isolated latency.

    Requires ``len(args_list) > n`` (one warm-up tuple + ``n`` unique
    timed tuples): the execution relay CACHES identical-input dispatches,
    so recycling inputs would silently report fantasy throughput — the
    exact failure mode this helper exists to prevent.
    """
    if len(args_list) <= n:
        raise ValueError(
            f"need {n + 1} unique argument tuples (1 warm-up + {n} timed), "
            f"got {len(args_list)}: the relay caches identical-input "
            "dispatches, so reused inputs inflate throughput"
        )
    readback(fn(*args_list[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(*args_list[(i + 1) % len(args_list)])
    readback(out)
    return max((time.perf_counter() - t0) * 1e3 - sync_ms, 1e-6) / n


def robust_readback_time_ms(fn, args_list, n: int, repeats: int = 3) -> float:
    """Median of ``repeats`` independent readback-closed estimates, each
    with its own just-in-time sync sample.

    :func:`readback_time_ms` subtracts ONE up-front ``sync_ms``; the
    relay's sync cost jitters by tens of ms between samples, so for
    sub-millisecond workloads a stale sync sample can swamp the signal
    entirely (r3: a 0.4 ms pose step once "measured" 0.0).  Here each
    group of ``n // repeats`` unique dispatches subtracts a sync cost
    measured IMMEDIATELY before it, and the median across groups rejects
    jitter outliers.  Requires ``len(args_list) > n`` unique tuples.
    """
    if repeats < 1:
        raise ValueError("repeats must be >= 1")
    per = n // repeats
    if per < 1:
        raise ValueError(f"n={n} too small for {repeats} repeats")
    if len(args_list) <= per * repeats:
        raise ValueError(
            f"need {per * repeats + 1} unique argument tuples, got {len(args_list)}"
        )
    readback(fn(*args_list[0]))
    estimates = []
    for r in range(repeats):
        sync = measure_sync_ms(2)
        group = args_list[1 + r * per : 1 + (r + 1) * per]
        t0 = time.perf_counter()
        out = None
        for a in group:
            out = fn(*a)
        readback(out)
        estimates.append(
            max((time.perf_counter() - t0) * 1e3 - sync, 1e-6) / per
        )
    estimates.sort()
    return estimates[len(estimates) // 2]
