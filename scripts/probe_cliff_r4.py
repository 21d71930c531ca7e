"""Round-4 probe 3: the >128 MB take-cost cliff and sharded sub-tables
(VERDICT r3 #3).

r3 measured takes from >~128 MB tables at ~5x the per-transaction cost
(0.28 -> 1.43 ms/frame for nearest at 512^3), killing exact f32 3D
tiles and hurting every 512^3 path.  Two questions, measured directly:

1. The cliff CURVE: per-take cost vs table size (32 MB .. 1 GB) for the
   identical random-row access pattern.  Is it a step at ~128 MB or does
   cost keep growing?  (Decides whether k sub-cliff shards can beat one
   big take: k shards cost k fast takes vs 1 slow take.)
2. Sharded-select lookups at 512^3 (512 MB table): split into k row
   shards, gather EVERY shard with locally clamped indices, select by
   range indicator — k in {1, 2, 4, 6}.  Arithmetic: 6 x 2 ns = 12 ns
   vs the measured ~10.9 ns cliff take — only wins if sub-cliff takes
   stay at ~2 ns AND the cliff is deeper than r3's 5x, or if moderate
   shard counts (2-4, each 128-256 MB) already dodge most of the cliff.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_cliff_r4.py
"""

from __future__ import annotations

import json

import numpy as np

N_QUERIES = 131072        # = 256 rays x 512 samples (one frame's gathers)
ITERS = 6
SIZES_MB = [32, 64, 96, 112, 128, 144, 176, 256, 384, 512, 768]
SHARDS = [1, 2, 4, 6]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2), "queries": N_QUERIES}

    def row_sets(n_rows, count):
        return [
            jnp.asarray(
                rng.integers(0, n_rows, N_QUERIES).astype(np.int32)
            )
            for _ in range(count)
        ]

    # --- 1. cliff curve: one take, growing table -----------------------
    curve = {}
    for mb in SIZES_MB:
        n_rows = mb * 1_000_000 // 512
        table = jnp.asarray(rng.random((n_rows, 128), np.float32))
        fn = jax.jit(lambda t, r: jnp.sum(jnp.take(t, r, axis=0)))
        args = [(table, rs) for rs in row_sets(n_rows, ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        curve[str(mb)] = round(ms * 1e6 / N_QUERIES, 2)  # ns per take
        del table
    out["ns_per_take_by_mb"] = curve

    # --- 2. sharded select at 512 MB ----------------------------------
    n_rows = 512 * 1_000_000 // 512
    big = jnp.asarray(rng.random((n_rows, 128), np.float32))
    shard_res = {}
    for k in SHARDS:
        rk = n_rows // k
        shards = [big[i * rk : (i + 1) * rk] for i in range(k)]

        def fn(rows, *tabs):
            acc = 0.0
            for j, t in enumerate(tabs):
                lo = j * rk
                local = jnp.clip(rows - lo, 0, rk - 1)
                hit = ((rows >= lo) & (rows < lo + rk)).astype(t.dtype)
                acc = acc + jnp.sum(
                    jnp.take(t, local, axis=0) * hit[:, None]
                )
            return acc

        jfn = jax.jit(fn)
        args = [(rs, *shards) for rs in row_sets(n_rows, ITERS + 1)]
        ms = readback_time_ms(jfn, args, n=ITERS, sync_ms=sync)
        shard_res[str(k)] = round(ms * 1e6 / N_QUERIES, 2)
    out["ns_per_lookup_512mb_by_shards"] = shard_res

    print(json.dumps(out))


if __name__ == "__main__":
    main()
