"""Round-3 probe 5: the INTEGRATED trilinear path (render_sweep) on TPU.

Measures the end-to-end trilinear sweep with the new tile sampler at
pose-chunk sizes 8/16/32 (the r2 chunk-8 optimum was calibrated for the
8-gather path whose per-pose temps were 4x larger), the bf16 3D-tile
mode, and the nearest headline for regression reference.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_integrated_r3.py
"""

from __future__ import annotations

import json

import numpy as np

N_RAYS = 256
S = 512
D = 256
P = 32
ITERS = 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    volume = jnp.asarray(brain_phantom_3d((D, D, D)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    source_sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(6 * (ITERS + 1))
    ]

    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms, 2), "device": str(jax.devices()[0])}
    si = iter(source_sets)

    def timeit(name, cfg, chunk):
        fn = jax.jit(
            lambda v, s, d: render_sweep(v, s, d, S, cfg, chunk=chunk)[3]
        )
        args = [(volume, next(si), dirs) for _ in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)
        print(f"{name}: {ms / P:.3f} ms/frame = {1e3 / (ms / P):.0f} fps", flush=True)

    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    bf = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16")
    near = RenderConfig(attenuation_coeff=1e-4)

    timeit("tri_chunk8_ms", tri, 8)
    timeit("tri_chunk16_ms", tri, 16)
    timeit("tri_chunk32_ms", tri, 32)
    timeit("bf16_chunk8_ms", bf, 8)
    timeit("bf16_chunk32_ms", bf, 32)
    timeit("nearest_ms", near, 32)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
