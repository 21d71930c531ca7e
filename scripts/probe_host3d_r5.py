"""Round-5 probe: host-built one-take f32 3D tile at 512^3 (VERDICT r4 #2).

The r4 refutation of the exact f32 3D tile (probe_tile3df32[b]_r4)
covered only SUB-capacity sizes, where the 2.04x table costs more
on-chip bandwidth than the saved take.  ABOVE the ~128 MB placement
capacity the economics invert: every table is HBM-resident at the flat
~10.4 ns/take argument rate (probe_arg_r4), so takes/sample is the
whole bill and one take should beat the (y, z) tile's two.  The in-XLA
f32 table build OOMs at 512^3 (19 GB transpose intermediate,
docs/benchmarking.md r3) — this probe uses the HOST build
(``prepare_tile3d_volume_host``: numpy sliding-window view, one copy).

Measures, at 512^3 f32 x 256 rays x 512 samples, P=4 pose sweeps,
all tables PREPARED and staged as dispatch arguments (the correct
above-capacity regime, probe_crop_r4):
  - tile2d_prep:   (8,16)/(7,15) 2-take tile (the current 512^3 route)
  - host3d_f32:    host-built f32 3D tile, 1 take, EXACT
  - tile3d_bf16:   in-jit-built bf16 3D tile, 1 take, lossy (r3 number)
plus nearest for scale, and the exactness delta host3d vs tile2d.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_host3d_r5.py
"""

from __future__ import annotations

import json
import time

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

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import (
        prepare_tile_volume,
        prepare_tile3d_volume,
        prepare_tile3d_volume_host,
        tile3d_table_bytes,
    )
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol_np = rng.random((D, D, D), np.float32) * 2.0 + 0.5
    vol = jnp.asarray(vol_np)
    out = {
        "config": f"{N_RAYS}x{S}x{D}^3 f32, P={P}, all tables prepared",
        "table3d_f32_mb": round(tile3d_table_bytes((D, D, D), itemsize=4) / 1e6, 1),
    }

    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 8.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-6, 6, (P, 3)).astype(np.float32))
        for _ in range(8 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    out["sync_ms"] = round(sync, 2)

    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    near = RenderConfig(attenuation_coeff=1e-4)

    t0 = time.perf_counter()
    host3d = prepare_tile3d_volume_host(vol_np)
    host3d.table.block_until_ready()
    out["host_build_s"] = round(time.perf_counter() - t0, 2)

    tile2d = jax.jit(lambda v: prepare_tile_volume(v, 7, 15))(vol)
    tile3db = jax.jit(prepare_tile3d_volume)(vol)

    # exactness: host-built one-take f32 vs the 2-take exact tile
    f_2d = render_sweep(tile2d, sets[0], dirs, S, tri)[3]
    f_3d = render_sweep(host3d, sets[0], dirs, S, tri)[3]
    err = float(jnp.max(jnp.abs(f_2d - f_3d)))
    ref = float(jnp.max(jnp.abs(f_2d)))
    out["host3d_vs_tile2d_max_abs_err"] = err
    out["frame_max_abs"] = ref

    variants = {
        "nearest": (near, vol),
        "tile2d_prep": (tri, tile2d),
        "host3d_f32": (tri, host3d),
        "tile3d_bf16": (tri, tile3db),
    }
    for i, (name, (cfg, v)) in enumerate(variants.items()):
        fn = jax.jit(lambda vv, s_, d, c=cfg: render_sweep(vv, s_, d, S, c)[3])
        args = [(v, sets[i * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
