"""Round-4 probe 2: depth-amortized K=2 tile gathers (VERDICT r3 #1).

All 17+ r1-r3 formulations issue >=1 take per SAMPLE; but a unit-step
ray moves <=1 voxel/axis/step, so the corner spans of two consecutive
depth samples fit one (8,16) tile with strides (6,14) (overlap 2) and
need only 3 x-planes -> 3 takes per pair = 1.5 takes/sample
(``ops/sampling.py::sample_trilinear_tile_k2``).  Transaction arithmetic:
gather floor 0.52 -> 0.39 ms/frame at the benchmark config, IF the
wider per-pair select doesn't eat the saving.

Sampler-level measurement (prepared tables passed as args, 32 poses in
chunk-4 lax.map exactly like the render sweep, scalar-reduced, unique
inputs, readback-closed):

  tri_tile      per-sample (7,15) table, 2 takes/sample  (r3 adopted)
  tri_tile_k2   pair (6,14) table, 1.5 takes/sample      (new)
  tri_bf16      3D-tile bf16, 1 take/sample              (floor reference)
  nearest       1 take/sample                            (floor reference)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_amort_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 256
N_RAYS = 256
S = 512
P = 32
CHUNK = 4
ITERS = 8


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
        for _ in range(8 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P} chunk {CHUNK}"}

    tv_75 = jax.jit(sp.prepare_tile_volume)(vol)
    tv_k2 = jax.jit(lambda v: sp.prepare_tile_volume(v, 6, 14))(vol)
    tv_3d = jax.jit(sp.prepare_tile3d_volume)(vol)
    out["k2_table_mb"] = round(tv_k2.table.size * 4 / 1e6, 1)

    def make(sampler):
        def fn(table, srcs):
            def chunk(c_srcs):
                pts = jax.vmap(lambda s: sp.ray_points(s, dirs, S))(c_srcs)
                return jnp.sum(jax.vmap(lambda p: sampler(table, p)[1])(pts))

            return jnp.sum(lax.map(chunk, srcs.reshape(P // CHUNK, CHUNK, 3)))

        return jax.jit(fn)

    # correctness on-device first
    pts_c = sp.ray_points(jnp.asarray(base + 0.37), dirs, S)
    _, v_t = sp.sample_trilinear_tile(tv_75, pts_c)
    _, v_k = sp.sample_trilinear_tile_k2(tv_k2, pts_c)
    out["k2_vs_tile_max_err"] = float(
        jnp.max(jnp.abs(v_t - v_k)) / (jnp.max(jnp.abs(v_t)) + 1e-30)
    )

    variants = {
        "tri_tile": (tv_75, sp.sample_trilinear_tile),
        "tri_tile_k2": (tv_k2, sp.sample_trilinear_tile_k2),
        "tri_bf16": (tv_3d, sp.sample_trilinear_tile3d_bf16),
        "nearest": (vol, sp.sample_nearest_rows),
    }
    for i, (name, (table, sampler)) in enumerate(variants.items()):
        fn = make(sampler)
        args = [(table, sets[i * (ITERS + 1) + j]) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
