"""Round-4 probe 10: EXACT f32 one-take 3D tile for sub-capacity volumes.

The r4 placement model says in-jit tables up to ~128 MB place on-chip at
~2.3 ns/take regardless of pattern.  The f32 3D tile table (2.04x the
volume) was rejected at 256^3 (137 MB, over capacity) — but a
content-cropped clinical scan (<= ~240^3) fits, and there ONE f32 take
per sample should beat the two takes of the exact (8,16) (y,z) tile, at
full f32 precision (unlike the bf16 3D tile).

Measures, at 224^3 and 160^3 (typical crop_to_content outputs):
  - trilinear routed onto the exact f32 one-take 3D tile
  - trilinear on the default 2-gather (y,z) tile
  - trilinear_bf16 (bf16 one-take mode, lossy)
  - nearest (one-take floor)
plus max-abs parity of the f32 3D-tile path vs the (y,z) tile path.

RESULT (v5e, P=4 single-vmap dispatches): the f32 one-take tile LOSES —
224^3: 2.37 vs 1.32 ms/frame; 160^3: 1.58 vs 1.11.  At P=4 even the
bf16 3D tile loses to (y,z) (224^3: 1.69), the opposite of the P=32
headline ordering, so probe_tile3df32b_r4 re-ran the comparison at the
headline sweep structure — same verdict (1.064 vs 0.978 ms/frame).
The sampler is therefore NOT auto-selected (explicit/prepared only).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tile3df32_r4.py
"""

from __future__ import annotations

import json

import numpy as np

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
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(7)
    sync = measure_sync_ms()
    out = {"config": f"{N_RAYS}x{S}, P={P}", "sync_ms": round(sync, 2)}

    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    trib = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16")
    near = RenderConfig(attenuation_coeff=1e-4)

    for D in (224, 160):
        vol = jnp.asarray(rng.random((D,) * 3).astype(np.float32) * 2.0 + 0.5)
        tag = f"{D}"
        out[tag + "_table_mb"] = round(D**3 * 4 * 2.04 / 1e6, 1)
        dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
        base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
        sets = [
            jnp.asarray(
                base[None, :] + rng.uniform(-3, 3, (P, 3)).astype(np.float32)
            )
            for _ in range(5 * (ITERS + 1))
        ]

        orig_route = rmod._route_tile_family

        def force_3df32(resolved, volume):
            if resolved == "trilinear_tile":
                return "trilinear_tile3d_f32"
            return orig_route(resolved, volume)

        # parity: one-take f32 tile vs the default (y,z) tile
        rmod._route_tile_family = force_3df32
        f_3d = rmod.render_sweep(vol, sets[0], dirs, S, tri)[3]
        rmod._route_tile_family = orig_route
        f_yz = rmod.render_sweep(vol, sets[0], dirs, S, tri)[3]
        scale = float(jnp.max(jnp.abs(f_yz)))
        out[tag + "_max_rel_err"] = float(jnp.max(jnp.abs(f_3d - f_yz))) / scale

        variants = {
            "tri_3df32": (tri, force_3df32),
            "tri_yz": (tri, orig_route),
            "tri_bf16": (trib, orig_route),
            "nearest": (near, orig_route),
        }
        for i, (name, (cfg, route)) in enumerate(variants.items()):
            rmod._route_tile_family = route
            fn = jax.jit(
                lambda vv, s_, d, c=cfg: rmod.render_sweep(vv, s_, d, S, c)[3]
            )
            args = [
                (vol, sets[i * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)
            ]
            ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
            out[f"{tag}_{name}_ms_per_frame"] = round(ms / P, 4)
        rmod._route_tile_family = orig_route

    print(json.dumps(out))


if __name__ == "__main__":
    main()
