"""Round-3 probe 7: tile-gather select variants for the exact trilinear.

The adopted tile2d path (2 takes + 4 z-fused selects) measures ~1.06
ms/frame integrated.  Candidates to shave select/weight bandwidth:

  sel4       adopted baseline (wz0, wz1 built; 2 selects per take)
  sel2       merge the y blend into the select: w_yz = (1-fy)*wz0 +
             fy*wz1, ONE select per take (5 passes over (n,128) vs 6;
             y-blend association moves inside the sum -> ULP-level)
  chunk4     sel4 at pose-chunk 4 (temps halve again)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sel_r3.py
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

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops import sampling as sp
    from diffus_tpu.ops.sampling import ray_points, prepare_tile_volume
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    volume = jnp.asarray(brain_phantom_3d((D, D, D)))
    tv = jax.jit(prepare_tile_volume)(volume)
    float(jnp.sum(tv.table))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(4 * (ITERS + 1))
    ]
    lanes = jnp.arange(128, dtype=jnp.int32)
    TY, TZ, SY, SZ = sp._TILE_TY, sp._TILE_TZ, sp._TILE_SY, sp._TILE_SZ

    def corners(points):
        dims = jnp.asarray(tv.shape, dtype=points.dtype)
        p = jnp.clip(points, 0.0, dims - 1.0)
        p0 = jnp.floor(p)
        frac = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)
        return i0, i1, frac

    def weights(i0, i1, frac):
        y0, z0 = i0[..., 1], i0[..., 2]
        dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
        a, b = y0 // SY, z0 // SZ
        ly, lz = y0 - a * SY, z0 - b * SZ
        fz = frac[..., 2]
        l00 = ly * TZ + lz
        l10 = (ly + dy) * TZ + lz
        wz0 = (l00[..., None] == lanes) * (1 - fz)[..., None] + (
            (l00 + dz)[..., None] == lanes) * fz[..., None]
        wz1 = (l10[..., None] == lanes) * (1 - fz)[..., None] + (
            (l10 + dz)[..., None] == lanes) * fz[..., None]
        return a, b, wz0, wz1

    def chunked(inner, srcs, ch):
        out = jax.lax.map(jax.vmap(inner), srcs.reshape(P // ch, ch, 3))
        return jnp.sum(out)

    def sel4_one(src):
        i0, i1, frac = corners(ray_points(src, dirs, S))
        a, b, wz0, wz1 = weights(i0, i1, frac)
        fy, fx = frac[..., 1], frac[..., 0]
        vals = []
        for xv in (i0[..., 0], i1[..., 0]):
            rows = jnp.take(tv.table, (xv * tv.na + a) * tv.nb + b, axis=0)
            cy0 = jnp.sum(rows * wz0, axis=-1)
            cy1 = jnp.sum(rows * wz1, axis=-1)
            vals.append(cy0 * (1 - fy) + cy1 * fy)
        return jnp.sum(vals[0] * (1 - fx) + vals[1] * fx)

    def sel2_one(src):
        i0, i1, frac = corners(ray_points(src, dirs, S))
        a, b, wz0, wz1 = weights(i0, i1, frac)
        fy, fx = frac[..., 1], frac[..., 0]
        w_yz = (1 - fy)[..., None] * wz0 + fy[..., None] * wz1
        vals = []
        for xv in (i0[..., 0], i1[..., 0]):
            rows = jnp.take(tv.table, (xv * tv.na + a) * tv.nb + b, axis=0)
            vals.append(jnp.sum(rows * w_yz, axis=-1))
        return jnp.sum(vals[0] * (1 - fx) + vals[1] * fx)

    sel4_8 = jax.jit(lambda srcs: chunked(sel4_one, srcs, 8))
    sel2_8 = jax.jit(lambda srcs: chunked(sel2_one, srcs, 8))
    sel4_4 = jax.jit(lambda srcs: chunked(sel4_one, srcs, 4))
    sel2_4 = jax.jit(lambda srcs: chunked(sel2_one, srcs, 4))

    a = float(sel4_8(sets[0]))
    b = float(sel2_8(sets[0]))
    assert abs(a - b) / abs(a) < 1e-5, (a, b)

    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms, 2), "device": str(jax.devices()[0])}
    si = iter(sets)

    def timeit(name, fn):
        args = [(next(si),) for _ in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)
        print(f"{name}: {ms / P:.3f} ms/frame", flush=True)

    timeit("sel4_c8_ms", sel4_8)
    timeit("sel2_c8_ms", sel2_8)
    timeit("sel4_c4_ms", sel4_4)
    timeit("sel2_c4_ms", sel2_4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
