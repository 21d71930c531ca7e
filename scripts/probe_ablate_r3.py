"""Ablate the integrated trilinear path: where did 0.7 ms/frame go?"""
import json
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.ops.sampling import (
        ray_points, sample_trilinear_tile, sample_trilinear_tile3d_bf16,
        _tile2d_table)
    from diffus_tpu.ops.propagation import (
        reflection_coeff, echo_amplitudes, depth_attenuation)
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    N_RAYS, S, D, P, ITERS = 256, 512, 256, 32, 6
    CH = 8
    rng = np.random.default_rng(0)
    volume = jnp.asarray(brain_phantom_3d((D, D, D)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    sets = [jnp.asarray(base[None,:]+rng.uniform(-8,8,(P,3)).astype(np.float32))
            for _ in range(8*(ITERS+1))]
    table, na, nb = jax.jit(_tile2d_table)(volume)
    float(jnp.sum(table))
    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms,2)}
    si = iter(sets)

    def chunked(inner, srcs):
        return jax.lax.map(jax.vmap(inner), srcs.reshape(P//CH, CH, 3))

    # a) sampler only, in-jit table build, chunked like render_sweep
    @jax.jit
    def samp_only(v, srcs):
        def one(src):
            return jnp.sum(sample_trilinear_tile(v, ray_points(src, dirs, S))[1])
        return jnp.sum(chunked(one, srcs))

    # b) sampler only, PREBUILT table (wrap into the same call shape)
    from diffus_tpu.ops import sampling as sp
    @jax.jit
    def samp_pre(tab, srcs):
        def lookup(points):
            dims = jnp.asarray((D,D,D), dtype=points.dtype)
            p = jnp.clip(points, 0.0, dims - 1.0)
            p0 = jnp.floor(p); frac = p - p0
            i0 = p0.astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, jnp.asarray((D,D,D), jnp.int32) - 1)
            y0, z0 = i0[..., 1], i0[..., 2]
            dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
            a, b = y0 // sp._TILE_SY, z0 // sp._TILE_SZ
            ly, lz = y0 - a * sp._TILE_SY, z0 - b * sp._TILE_SZ
            fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
            lanes = jnp.arange(128, dtype=jnp.int32)
            l00 = ly * 16 + lz
            l10 = (ly + dy) * 16 + lz
            wz0 = (l00[...,None]==lanes)*(1-fz)[...,None] + ((l00+dz)[...,None]==lanes)*fz[...,None]
            wz1 = (l10[...,None]==lanes)*(1-fz)[...,None] + ((l10+dz)[...,None]==lanes)*fz[...,None]
            vals = []
            for xv in (i0[..., 0], i1[..., 0]):
                rows = jnp.take(tab, (xv * na + a) * nb + b, axis=0)
                cy0 = jnp.sum(rows * wz0, axis=-1)
                cy1 = jnp.sum(rows * wz1, axis=-1)
                vals.append(cy0 * (1 - fy) + cy1 * fy)
            return vals[0] * (1 - fx) + vals[1] * fx
        def one(src):
            return jnp.sum(lookup(ray_points(src, dirs, S)))
        return jnp.sum(chunked(one, srcs))

    # c) sampler + reflection + scan + attenuation (no outputs, no median)
    @jax.jit
    def samp_scan(v, srcs):
        def one(src):
            z = sample_trilinear_tile(v, ray_points(src, dirs, S))[1]
            r = reflection_coeff(z[:, :-1], z[:, 1:])
            echo = echo_amplitudes(r)
            return jnp.sum(depth_attenuation(echo, 1e-4))
        return jnp.sum(chunked(one, srcs))

    # d) full render_sweep [3] (the bench shape)
    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    full = jax.jit(lambda v,s,d: render_sweep(v,s,d,S,tri,chunk=CH)[3])
    # e) bf16 one-gather mode, full pipeline
    bf = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16")
    fullbf = jax.jit(lambda v,s,d: render_sweep(v,s,d,S,bf,chunk=CH)[3])
    # f) bf16 full, chunk 32
    fullbf32 = jax.jit(lambda v,s,d: render_sweep(v,s,d,S,bf,chunk=32)[3])

    def timeit(name, fn, nargs):
        args = [tuple(nargs()) for _ in range(ITERS+1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms/P,3)
        print(f"{name}: {ms/P:.3f} ms/frame", flush=True)

    timeit("a_samp_only", samp_only, lambda: (volume, next(si)))
    timeit("b_samp_prebuilt", samp_pre, lambda: (table, next(si)))
    timeit("c_samp_scan", samp_scan, lambda: (volume, next(si)))
    timeit("d_full", full, lambda: (volume, next(si), dirs))
    timeit("e_full_bf16", fullbf, lambda: (volume, next(si), dirs))
    timeit("f_full_bf16_c32", fullbf32, lambda: (volume, next(si), dirs))
    print(json.dumps(results))

if __name__ == "__main__":
    main()
