"""Round-3 probe 2: why was the 4-gather paired-corner trilinear 2.3x SLOWER?

probe_layout_r3 measured tri_pair (4 row-gathers from a 64-shift
overlapped table + 8 lane selects) at 6.5 ms/frame vs 2.8 for the plain
8-gather — even though it issues half the transactions.  Isolate the
cause:

  tri_pair_plain   4 takes from the PLAIN (M,128) table, lanes l0/l0+dz
                   (INCORRECT at the 1/128 row boundary — timing only).
                   If fast -> the overlapped table itself is the problem.
  near_t64         nearest (1 take/sample) from the 2x-row overlapped
                   table -> isolates table-size/row-count effect.
  near_sel2        nearest gather + TWO lane selects per row (pair
                   select cost at fixed gather count).
  take_only_8      8 corner takes, NO lane select (gather floor).
  take_only_4      4 pair takes from t64, NO select (gather floor, 2x table).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pair_r3.py
"""

from __future__ import annotations

import json

import numpy as np

D = 256
N_RAYS = 256
S = 512
P = 8
ITERS = 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import ray_points
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    source_sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(ITERS + 1)
    ]
    lanes128 = jnp.arange(128, dtype=jnp.int32)

    def table64(v):
        fv = jnp.concatenate([v.reshape(-1), jnp.zeros((64,), v.dtype)])
        b = fv.reshape(-1, 64)
        return jnp.concatenate([b[:-1], b[1:]], axis=1)

    def tri_corners(points):
        p = jnp.clip(points, 0.0, D - 1.0)
        p0 = jnp.floor(p)
        frac = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, D - 1)
        return i0, i1, frac

    def pair_corner_rows(src):
        """(flat0, dz, frac) for the 4 (x,y) corner combos; z pairs."""
        points = ray_points(src, dirs, S)
        i0, i1, frac = tri_corners(points)
        x0, x1 = i0[..., 0], i1[..., 0]
        y0, y1 = i0[..., 1], i1[..., 1]
        z0, z1 = i0[..., 2], i1[..., 2]
        flats = [
            ((xv * D + yv) * D + z0) for xv in (x0, x1) for yv in (y0, y1)
        ]
        return flats, z1 - z0, frac

    def blend(c, frac):
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        c00 = c[0][0] * (1 - fz) + c[0][1] * fz
        c01 = c[1][0] * (1 - fz) + c[1][1] * fz
        c10 = c[2][0] * (1 - fz) + c[2][1] * fz
        c11 = c[3][0] * (1 - fz) + c[3][1] * fz
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        return c0 * (1 - fx) + c1 * fx

    # 4 takes from the PLAIN table; boundary-incorrect pair select
    @jax.jit
    def tri_pair_plain(v, srcs):
        tab = v.reshape(-1, 128)

        def one(src):
            flats, dz, frac = pair_corner_rows(src)
            c = []
            for flat in flats:
                rows = jnp.take(tab, flat >> 7, axis=0)
                l0 = flat & 127
                l1 = jnp.minimum(l0 + dz, 127)  # WRONG at boundary: timing only
                v0 = jnp.sum(rows * (l0[..., None] == lanes128).astype(rows.dtype), axis=-1)
                v1 = jnp.sum(rows * (l1[..., None] == lanes128).astype(rows.dtype), axis=-1)
                c.append((v0, v1))
            return blend(c, frac)

        return jnp.sum(jax.vmap(one)(srcs))

    # nearest from the overlapped table (table-size effect, 1 take/sample)
    @jax.jit
    def near_t64(t64, srcs):
        def one(src):
            points = ray_points(src, dirs, S)
            i = jnp.clip(jnp.round(points).astype(jnp.int32), 0, D - 1)
            flat = (i[..., 0] * D + i[..., 1]) * D + i[..., 2]
            rows = jnp.take(t64, flat >> 6, axis=0)
            oh = ((flat & 63)[..., None] == lanes128).astype(t64.dtype)
            return jnp.sum(rows * oh, axis=-1)

        return jnp.sum(jax.vmap(one)(srcs))

    # nearest + two lane selects per gathered row (select-cost scaling)
    @jax.jit
    def near_sel2(v, srcs):
        tab = v.reshape(-1, 128)

        def one(src):
            points = ray_points(src, dirs, S)
            i = jnp.clip(jnp.round(points).astype(jnp.int32), 0, D - 1)
            flat = (i[..., 0] * D + i[..., 1]) * D + i[..., 2]
            rows = jnp.take(tab, flat >> 7, axis=0)
            l0 = flat & 127
            v0 = jnp.sum(rows * (l0[..., None] == lanes128).astype(rows.dtype), axis=-1)
            v1 = jnp.sum(rows * (jnp.minimum(l0 + 1, 127)[..., None] == lanes128).astype(rows.dtype), axis=-1)
            return v0 + 0.5 * v1

        return jnp.sum(jax.vmap(one)(srcs))

    # gather floor: 8 corner takes, rows summed (no per-lane select)
    @jax.jit
    def take_only_8(v, srcs):
        tab = v.reshape(-1, 128)

        def one(src):
            points = ray_points(src, dirs, S)
            i0, i1, _ = tri_corners(points)
            acc = 0.0
            for xv in (i0[..., 0], i1[..., 0]):
                for yv in (i0[..., 1], i1[..., 1]):
                    for zv in (i0[..., 2], i1[..., 2]):
                        flat = (xv * D + yv) * D + zv
                        acc = acc + jnp.sum(jnp.take(tab, flat >> 7, axis=0), axis=-1)
            return acc

        return jnp.sum(jax.vmap(one)(srcs))

    # gather floor: 4 pair takes from t64 (no select)
    @jax.jit
    def take_only_4(t64, srcs):
        def one(src):
            flats, _, _ = pair_corner_rows(src)
            acc = 0.0
            for flat in flats:
                acc = acc + jnp.sum(jnp.take(t64, flat >> 6, axis=0), axis=-1)
            return acc

        return jnp.sum(jax.vmap(one)(srcs))

    t64 = jax.jit(table64)(vol)
    float(jnp.sum(t64))

    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms, 2), "device": str(jax.devices()[0])}

    def timeit(name, fn, argsets):
        ms = readback_time_ms(fn, argsets, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)
        print(f"{name}: {ms / P:.3f} ms/frame", flush=True)

    timeit("tri_pair_plain_ms", tri_pair_plain, [(vol, s) for s in source_sets])
    timeit("near_t64_ms", near_t64, [(t64, s) for s in source_sets])
    timeit("near_sel2_ms", near_sel2, [(vol, s) for s in source_sets])
    timeit("take_only_8_ms", take_only_8, [(vol, s) for s in source_sets])
    timeit("take_only_4_ms", take_only_4, [(t64, s) for s in source_sets])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
