"""Round-4 probe 10b: f32 one-take 3D tile at the HEADLINE sweep structure.

probe_tile3df32_r4 (P=4, single vmap dispatch) showed the f32 3D tile
losing to the (y,z) tile — but at P=4 even the bf16 3D tile loses to
(y,z), the OPPOSITE of the P=32 headline ordering (1129 vs 992 fps), so
small-batch dispatches don't predict the chunked-sweep regime.  This
probe re-runs the comparison with the bench methodology: P=32 poses,
default chunk-4 lax.map, brain phantom, unique inputs, readback-closed.

RESULT (v5e, 224^3): tri_3df32 1.0637 ms/frame (940 fps) vs tri_yz
0.9777 (1023 fps) vs tri_bf16 0.7798 (1282 fps) — the EXACT one-take
f32 tile loses 8.8% end-to-end despite issuing half the takes: the
2.04x f32 table costs more build/read bandwidth than the second take
saves.  Consistent with the r4 lesson that transaction counts don't
predict compiled-program time.  tile3d_f32 is therefore explicit-only.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tile3df32b_r4.py
"""

from __future__ import annotations

import json

import numpy as np

N_RAYS = 256
S = 512
P = 32
ITERS = 8
D = 224


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(11)
    sync = measure_sync_ms()
    out = {"config": f"{N_RAYS}x{S}x{D}^3, P={P}", "sync_ms": round(sync, 2)}

    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    trib = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16")

    vol = jnp.asarray(brain_phantom_3d((D,) * 3))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(4 * (ITERS + 1))
    ]

    orig_route = rmod._route_tile_family

    def force_3df32(resolved, volume):
        if resolved == "trilinear_tile":
            return "trilinear_tile3d_f32"
        return orig_route(resolved, volume)

    variants = {
        "tri_3df32": (tri, force_3df32),
        "tri_yz": (tri, orig_route),
        "tri_bf16": (trib, orig_route),
    }
    for i, (name, (cfg, route)) in enumerate(variants.items()):
        rmod._route_tile_family = route
        fn = jax.jit(
            lambda vv, s_, d, c=cfg: rmod.render_sweep(vv, s_, d, S, c)[3]
        )
        args = [(vol, sets[i * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[f"{name}_ms_per_frame"] = round(ms / P, 4)
        out[f"{name}_fps"] = round(P / ms * 1e3, 1)
    rmod._route_tile_family = orig_route

    print(json.dumps(out))


if __name__ == "__main__":
    main()
