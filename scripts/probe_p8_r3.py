"""(archived r3 probe; see docs/benchmarking.md Round 3 for results)"""
import json
import numpy as np

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

    N_RAYS, S, D, P, ITERS = 256, 512, 256, 8, 6
    rng = np.random.default_rng(0)
    volume = jnp.asarray(brain_phantom_3d((D, D, D)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    sets = [jnp.asarray(base[None,:]+rng.uniform(-8,8,(P,3)).astype(np.float32))
            for _ in range(4*(ITERS+1))]
    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms,2)}
    si = iter(sets)
    def timeit(name, cfg):
        fn = jax.jit(lambda v,s,d: render_sweep(v,s,d,S,cfg,chunk=P)[3])
        args = [(volume, next(si), dirs) for _ in range(ITERS+1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms/P,3)
        print(f"{name}: {ms/P:.3f} ms/frame", flush=True)
    timeit("tri_p8_ms", RenderConfig(attenuation_coeff=1e-4, interp="trilinear"))
    timeit("bf16_p8_ms", RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16"))
    timeit("near_p8_ms", RenderConfig(attenuation_coeff=1e-4))
    print(json.dumps(results))

if __name__ == "__main__":
    main()
