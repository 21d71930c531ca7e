"""Round-4 probe 2b: K=2 depth-amortized sampler END-TO-END through
render_sweep at the benchmark config (sampler-level A/B in
probe_amort_r4.py showed 1.41x; adoption needs the full-render number).

The baseline variant monkeypatches the trace-time resolver to force the
r3 per-sample tile path; the K2 variant is the natural r4 resolution.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_k2_render_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 256
N_RAYS = 256
S = 512
P = 32
ITERS = 10


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.render import renderer as rmod
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
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    orig_resolve = rmod._resolve_sampler

    def forced_tile(interp, num_samples=0, step=1.0):
        r = orig_resolve(interp, num_samples, step)
        return "trilinear_tile" if r == "trilinear_tile_k2" else r

    # correctness: k2 render vs tile render on-device
    probe_src = sets[0][:4]
    f_k2 = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
    rmod._resolve_sampler = forced_tile
    f_tile = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
    rmod._resolve_sampler = orig_resolve
    scale = float(jnp.max(jnp.abs(f_tile)))
    out["k2_vs_tile_render_max_rel_err"] = float(
        jnp.max(jnp.abs(f_k2 - f_tile))
    ) / (scale + 1e-30)
    out["k2_frames_finite"] = bool(jnp.all(jnp.isfinite(f_k2)))

    for name, patch in (("render_tile", forced_tile), ("render_k2", None)):
        rmod._resolve_sampler = patch or orig_resolve
        fn = jax.jit(lambda v, s, d: rmod.render_sweep(v, s, d, S, cfg)[3])
        k = 0 if name == "render_tile" else 1
        args = [(vol, sets[k * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)
        out[name + "_fps"] = round(P / ms * 1e3, 1)
    rmod._resolve_sampler = orig_resolve

    print(json.dumps(out))


if __name__ == "__main__":
    main()
