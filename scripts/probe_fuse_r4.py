"""Round-4 probe 1: Pallas-fused tile-select stage (VERDICT r3 #2).

r3 left exact trilinear at 1.01 ms/frame = 0.52 ms gather floor (2 takes
x 131k samples x ~2 ns) + ~0.49 ms of select/weight-build passes over
the (n, 128) row intermediates.  The select stage is dense vectorized
work: this probe measures the tile sampler with that stage fused into
ONE Pallas pass (``kernels/tile_select_pallas.py``) against the XLA
formulation, end-to-end through ``render_sweep`` at the benchmark config
(256 rays x 512 samples, 256^3, 32-pose sweeps, chunk 4).

Also probes the full render path (fused select + fused propagation
kernel = ``RenderConfig(use_pallas=True)``), re-evidencing the Mosaic-
compiled propagation kernel this round (VERDICT r3 #5).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fuse_r4.py
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
        for _ in range(4 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    variants = {
        "tile_xla_select": RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        "tile_fused_select": RenderConfig(
            attenuation_coeff=1e-4, interp="trilinear", use_pallas=True
        ),
        "nearest_pallas_prop": RenderConfig(attenuation_coeff=1e-4, use_pallas=True),
    }

    # correctness first: fused vs XLA select on-device, unique input
    cfg_a = variants["tile_xla_select"]
    cfg_b = variants["tile_fused_select"]
    probe_src = sets[0][:4]
    fa = render_sweep(vol, probe_src, dirs, S, cfg_a)[3]
    fb = render_sweep(vol, probe_src, dirs, S, cfg_b)[3]
    scale = float(jnp.max(jnp.abs(fa)))
    err = float(jnp.max(jnp.abs(fa - fb))) / (scale + 1e-30)
    out["fused_vs_xla_max_rel_err"] = err

    for name, cfg in variants.items():
        fn = jax.jit(lambda v, s, d, c=cfg: render_sweep(v, s, d, S, c)[3])
        k = list(variants).index(name)
        args = [
            (vol, sets[k * (ITERS + 1) + i], dirs) for i in range(ITERS + 1)
        ]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)
        out[name + "_fps"] = round(P / ms * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
