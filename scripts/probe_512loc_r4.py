"""Round-4 probe 6: restore gather locality at 512^3 via ray-chunking.

probe_cliff_r4 established the "cliff" is an access-LOCALITY effect:
random takes cost ~10.4 ns at every table size, local patterns ~2 ns
while the touched working set is small.  A 512^3 frame touches a cone
of ~150-250 MB — past the ~128 MB where r3 saw the 5x degradation — so
processing RAYS IN CHUNKS (sequential lax.map over ray groups) should
shrink each chunk's touched set back into the local regime.

Variants at 512^3, 256 rays x 512 samples, single frame dispatched as a
4-pose batch (matching the production sweep shape):

  nearest_full       one vmap over all rays            (r3: ~1.43 ms/frame)
  nearest_chunk{64,32,16}  lax.map over ray chunks
  tile_full / tile_chunk32 same for exact tile trilinear (table 778 MB)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_512loc_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 512
N_RAYS = 256
S = 512
P = 4
ITERS = 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax import lax

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops import sampling as sp
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(10 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    def make(sampler, table, ray_chunk):
        ray_chunk = min(ray_chunk, N_RAYS)  # toy-scale smoke runs
        n_chunks = N_RAYS // ray_chunk
        dirs_c = dirs.reshape(n_chunks, ray_chunk, 3)

        def fn(t, srcs):
            def pose(src):
                if n_chunks == 1:
                    pts = sp.ray_points(src, dirs, S)
                    return jnp.sum(sampler(t, pts)[1])

                def chunk(dc):
                    pts = sp.ray_points(src, dc, S)
                    return jnp.sum(sampler(t, pts)[1])

                return jnp.sum(lax.map(chunk, dirs_c))

            return jnp.sum(jax.vmap(pose)(srcs))

        return jax.jit(fn), table

    variants = {
        "nearest_full": (sp.sample_nearest_rows, vol, N_RAYS),
        "nearest_chunk64": (sp.sample_nearest_rows, vol, 64),
        "nearest_chunk32": (sp.sample_nearest_rows, vol, 32),
        "nearest_chunk16": (sp.sample_nearest_rows, vol, 16),
    }
    results = {}
    for i, (name, (sampler, table, rc)) in enumerate(variants.items()):
        fn, t = make(sampler, table, rc)
        args = [(t, sets[i * (ITERS + 1) + j]) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        results[name] = round(ms / P, 4)
    out["ms_per_frame"] = results

    # exact trilinear tile at 512^3 (778 MB table): full vs chunk 32
    tv = jax.jit(sp.prepare_tile_volume)(vol)
    tri = {}
    for i, (name, rc) in enumerate(
        (("tile_full", N_RAYS), ("tile_chunk32", 32)), start=6
    ):
        fn, t = make(sp.sample_trilinear_tile, tv, rc)
        args = [(t, sets[i * (ITERS + 1) + j]) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        tri[name] = round(ms / P, 4)
    out["ms_per_frame_trilinear"] = tri

    print(json.dumps(out))


if __name__ == "__main__":
    main()
