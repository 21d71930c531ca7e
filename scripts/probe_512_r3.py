"""Round-3 probe: sampler behavior at 512^3 (beyond the table-size cliff).

The take-cost cliff sits between ~101 and ~134 MB of table (probe_pairz /
probe_tile).  At 512^3 the raw volume is 512 MB and the tile2d table
~660 MB — every formulation's table is far past the cliff, so which
trilinear path wins, and does nearest itself degrade?

Variants (256 rays x 512 samples, 4-pose vmaps, unique inputs):
  near_512      nearest row-gather from the 512 MB flat table
  tri_rows_512  8-corner row gather (the r2 path)
  tri_tile_512  overlapped 2D tile (660 MB table, prebuilt)
  bf16_tile3d_512  one-gather 3D tile in bf16 (~620 MB table, prebuilt)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_512_r3.py
"""

from __future__ import annotations

import json

import numpy as np

D = 512
N_RAYS = 256
S = 512
P = 4
ITERS = 4


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import (
        ray_points,
        sample_nearest_rows,
        sample_trilinear_rows,
        sample_trilinear_tile,
        sample_trilinear_tile3d_bf16,
        prepare_tile_volume,
        prepare_tile3d_volume,
    )
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    # build on device to avoid a 512 MB host transfer
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (D, D, D), jnp.float32, 0.5, 2.5)
    float(jnp.sum(vol))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(5 * (ITERS + 1))
    ]

    def batched(sampler):
        @jax.jit
        def fn(v, srcs):
            def one(src):
                return jnp.sum(sampler(v, ray_points(src, dirs, S))[1])

            return jnp.sum(jax.vmap(one)(srcs))

        return fn

    tv2 = jax.jit(prepare_tile_volume)(vol)
    float(jnp.sum(tv2.table))
    tv3 = jax.jit(prepare_tile3d_volume)(vol)
    float(jnp.sum(tv3.table.astype(jnp.float32)))

    sync_ms = measure_sync_ms()
    results = {
        "sync_ms": round(sync_ms, 2),
        "device": str(jax.devices()[0]),
        "t2d_mb": round(tv2.table.size * 4 / 1e6, 1),
        "t3d_mb": round(tv3.table.size * 2 / 1e6, 1),
    }
    si = iter(sets)

    def timeit(name, fn, vref):
        args = [(vref, next(si)) for _ in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)
        print(f"{name}: {ms / P:.3f} ms/frame", flush=True)

    timeit("near_512_ms", batched(sample_nearest_rows), vol)
    timeit("tri_rows_512_ms", batched(sample_trilinear_rows), vol)
    timeit("tri_tile_512_ms", batched(sample_trilinear_tile), tv2)
    timeit("bf16_tile3d_512_ms", batched(sample_trilinear_tile3d_bf16), tv3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
