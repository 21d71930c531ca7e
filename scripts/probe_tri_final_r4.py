"""Round-4 probe 5: last margin hunt for the exact-trilinear bar —
Pallas propagation on the trilinear path (never measured separately from
the losing select kernel) and pose-chunk 2.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tri_final_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 256
N_RAYS = 256
S = 512
P = 32
ITERS = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.types import RenderConfig
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
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    tri_p = RenderConfig(attenuation_coeff=1e-4, interp="trilinear", use_pallas=True)

    # correctness: pallas-prop trilinear vs XLA
    probe_src = sets[0][:4] + 0.123
    fa = render_sweep(vol, probe_src, dirs, S, tri)[3]
    fb = render_sweep(vol, probe_src + 0.0, dirs, S, tri_p)[3]
    out["pallas_prop_max_rel_err"] = float(
        jnp.max(jnp.abs(fa - fb)) / (jnp.max(jnp.abs(fa)) + 1e-30)
    )

    i = 0
    for name, cfg, chunk in (
        ("xla_chunk4", tri, 4),
        ("xla_chunk2", tri, 2),
        ("pallasprop_chunk4", tri_p, 4),
    ):
        fn = jax.jit(
            lambda v, s, d, c=cfg, ch=chunk: render_sweep(v, s, d, S, c, chunk=ch)[3]
        )
        args = [(vol, sets[i * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[f"{name}_ms_per_frame"] = round(ms / P, 4)
        out[f"{name}_fps"] = round(P / ms * 1e3, 1)
        i += 1

    print(json.dumps(out))


if __name__ == "__main__":
    main()
