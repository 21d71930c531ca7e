"""Round-4 probe 3: the >128 MB take-cost cliff and sharded sub-tables
(VERDICT r3 #3).

r3 measured takes from >~128 MB tables at ~5x the per-transaction cost
(0.28 -> 1.43 ms/frame for nearest at 512^3).  Two questions, measured
directly:

1. The cliff CURVE: per-take cost vs table size (64 MB .. 512 MB) for
   an identical random-row pattern.  Step at ~128 MB, or growing?
2. Sharded-select lookups from a 512 MB table: k row shards, every
   shard gathered with locally clamped indices, range-select — does
   k x sub-cliff beat 1 x cliff?

Method note (v1 of this probe was noise-dominated): each timed dispatch
scans over CH row-chunks inside the jit (unique rows per chunk AND per
call — the relay caches identical-input dispatches), accumulating a
scalar, so per-dispatch device time is O(10 ms) >> the ~26 ms sync
jitter resolution once divided across CH x N chunk queries.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_cliff_r4.py
"""

from __future__ import annotations

import json

import numpy as np

N = 262144          # rows per chunk
CH = 12             # chunks scanned per timed dispatch
ITERS = 4
SIZES_MB = [64, 96, 128, 144, 176, 256, 512]
SHARDS = [1, 2, 4]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax import lax

    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    sync = measure_sync_ms()
    out = {
        "sync_ms": round(sync, 2),
        "queries_per_dispatch": N * CH,
    }

    def row_batches(n_rows, count):
        return [
            jnp.asarray(rng.integers(0, n_rows, (CH, N)).astype(np.int32))
            for _ in range(count)
        ]

    def one_take_fn():
        def fn(t, rows):
            def body(acc, r):
                return acc + jnp.sum(jnp.take(t, r, axis=0)), None

            acc, _ = lax.scan(body, 0.0, rows)
            return acc

        return jax.jit(fn)

    curve = {}
    for mb in SIZES_MB:
        n_rows = mb * 1_000_000 // 512
        table = jnp.asarray(rng.random((n_rows, 128), np.float32))
        fn = one_take_fn()
        args = [(table, rb) for rb in row_batches(n_rows, ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        curve[str(mb)] = round(ms * 1e6 / (N * CH), 2)  # ns per take
        del table, args
    out["ns_per_take_by_mb"] = curve

    n_rows = 512 * 1_000_000 // 512
    big = jnp.asarray(rng.random((n_rows, 128), np.float32))
    shard_res = {}
    for k in SHARDS:
        rk = n_rows // k
        shards = tuple(big[i * rk : (i + 1) * rk] for i in range(k))

        def fn(rows, *tabs):
            def body(acc, r):
                for j, t in enumerate(tabs):
                    lo = j * rk
                    local = jnp.clip(r - lo, 0, rk - 1)
                    hit = ((r >= lo) & (r < lo + rk)).astype(t.dtype)
                    acc = acc + jnp.sum(
                        jnp.take(t, local, axis=0) * hit[:, None]
                    )
                return acc, None

            acc, _ = lax.scan(body, 0.0, rows)
            return acc

        jfn = jax.jit(fn)
        args = [(rb, *shards) for rb in row_batches(n_rows, ITERS + 1)]
        ms = readback_time_ms(jfn, args, n=ITERS, sync_ms=sync)
        shard_res[str(k)] = round(ms * 1e6 / (N * CH), 2)
        del args
    out["ns_per_lookup_512mb_by_shards"] = shard_res

    print(json.dumps(out))


if __name__ == "__main__":
    main()
