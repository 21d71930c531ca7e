"""Pallas row-DMA gather probe: the measurement that settled the
fused-megakernel question (negative).

BASELINE's north star asked whether the whole ray march (coordinate gen
+ volume gather + reflection + scan + attenuation — reference hot path
``src/renderer.py:89-180, 367-436, 741-819``) should fuse into ONE
Pallas kernel.  The decisive sub-question is the gather: inside a Pallas
TPU kernel the only random-access mechanism is a scalar-issued
``make_async_copy`` per row.  This module measures that primitive under
the most favorable conditions a megakernel could arrange — indices known
in advance (computed in-register, no index memory traffic) and N-deep
double buffering so DMAs overlap.

Measured on v5e (round 2, 1M rows/call, 8-deep pipeline, readback-timed
with unique offsets per call):

    pallas per-row DMA : 92.4 ns / 512-byte row
    XLA jnp.take, SAME access pattern : 33.6 ns / row
    XLA jnp.take, the real render's fan pattern : 2-4 ns / row

At 131k rows per frame (256 rays x 512 samples, nearest), a megakernel
doing its own gathers would spend ~12 ms/frame on DMA issue alone vs
~0.4 ms for the entire current XLA pipeline.  Conclusion: XLA's gather
engine is the right tool for the random access; Pallas adds value only
downstream of it (``propagation_pallas.py``).  Full numbers and the ten
rejected gather formulations: docs/benchmarking.md.

Run on a real TPU:  ``PYTHONPATH=/root/repo:/root/.axon_site python -m
diffus_tpu.kernels.gather_dma_probe``
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(off_ref, hbm_ref, out_ref, scratch, sems, *, n_rows, n_buf, m):
    """Gather ``n_rows`` 128-lane rows from ``hbm_ref`` via per-row DMA
    with ``n_buf``-deep double buffering; accumulate so nothing is DCE'd.

    Row indices follow a fixed co-prime stride from a per-call offset —
    the in-register analogue of a megakernel computing sample coordinates
    itself (no index memory traffic, the best case for this design).
    """
    off = off_ref[0]

    def row_id(i):
        return (off + i * 97) % m

    def get(slot, i):
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(row_id(i), 1), :], scratch.at[slot], sems.at[slot]
        )

    for s in range(n_buf):
        get(s, s).start()

    def body(i, acc):
        slot = jax.lax.rem(i, n_buf)
        get(slot, i).wait()
        acc = acc + scratch[slot]

        @pl.when(i + n_buf < n_rows)
        def _():
            get(slot, i + n_buf).start()

        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, n_rows, body, jnp.zeros((1, 128), jnp.float32)
    )


@partial(jax.jit, static_argnames=("n_rows", "n_buf"))
def dma_gather_probe(offset: jax.Array, table: jax.Array, n_rows: int = 1 << 20,
                     n_buf: int = 8) -> jax.Array:
    """Sum of ``n_rows`` strided rows of ``table`` gathered by per-row DMA.

    Args:
      offset: ``(1,)`` int32 starting row (vary per call — the execution
        relay caches identical-input dispatches).
      table: ``(M, 128)`` float32.
    Returns:
      ``(1, 128)`` accumulated rows.
    """
    m = table.shape[0]
    interpret = jax.default_backend() != "tpu"  # Mosaic is TPU-only
    return pl.pallas_call(
        partial(_probe_kernel, n_rows=n_rows, n_buf=n_buf, m=m),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
    )(offset, table)


def xla_take_probe(offset: jax.Array, table: jax.Array, n_rows: int = 1 << 20):
    """The same access pattern through XLA's gather, for comparison."""
    m = table.shape[0]
    idx = (offset[0] + jnp.arange(n_rows, dtype=jnp.int32) * 97) % m
    return jnp.sum(jnp.take(table, idx, axis=0), axis=0)


def main():  # pragma: no cover - requires a real TPU
    import json
    import time

    m, n_rows = 131072, 1 << 20
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(m, 128)).astype(np.float32)
    )
    offs = [jnp.asarray(np.array([i * 1013], np.int32)) for i in range(6)]

    def rb_time(f):
        float(jnp.sum(f(offs[0], table)))
        t0 = time.perf_counter()
        for i in range(5):
            float(jnp.sum(f(offs[i + 1], table)))
        return (time.perf_counter() - t0) / 5

    xla_jit = jax.jit(partial(xla_take_probe, n_rows=n_rows))
    print(json.dumps({
        "pallas_dma_ns_per_row": round(rb_time(dma_gather_probe) / n_rows * 1e9, 2),
        "xla_take_ns_per_row": round(rb_time(xla_jit) / n_rows * 1e9, 2),
    }))


if __name__ == "__main__":  # pragma: no cover
    main()
