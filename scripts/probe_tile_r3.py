"""Round-3 probe 4: overlapped TILE tables — one row holds 4 or 8 corners.

probe_pairz_r3: a stride-127 z-pair table costs nothing extra per take
(0.248 vs 0.282 ms/frame) — the earlier t64 slowness was its 134 MB size
(the 64 MB bf16 t64 was fine).  Generalize: a row can be an overlapping
(y,z) TILE (8x16, strides 7x15) so ALL FOUR (y,z) corners of a trilinear
sample sit in one 512 B row -> 2 takes/sample (x0/x1), ~87 MB f32 table.
Or a 3D (4,8,4)-tile (strides 3,7,3) holding all EIGHT corners ->
1 take/sample (~70 MB bf16 / 136 MB f32 — the f32 one probes the size
cliff).

Variants (8-pose batches, unique inputs, readback-closed):
  tri_tile2d_sel4   2 takes + 4 z-fused selects (exact blend order)
  tri_tile2d_fused  2 takes + 2 fully-(y,z)-fused selects (assoc. differs
                    by ULPs from the canonical z->y->x blend)
  tri_pairz_fused   4 takes + 4 z-fused selects from the stride-127 table
  tri_tile3d_bf16   1 take + 1 fused select, bf16 corners + f32 weights
  tri_tile3d_f32    same, f32 (136 MB table: where is the size cliff?)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tile_r3.py
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
    from jax import lax

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import ray_points, sample_trilinear
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    source_sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(ITERS + 1)
    ]
    lanes128 = jnp.arange(128, dtype=jnp.int32)

    # ---- tile geometry ----
    TY2, TZ2, SY2, SZ2 = 8, 16, 7, 15         # 2D tile: lane = ly*16 + lz
    NA2 = (D - 1) // SY2 + 1                  # y-tile count
    NB2 = (D - 1) // SZ2 + 1                  # z-tile count
    TX3, TY3, TZ3 = 4, 8, 4                   # 3D tile: lane = (lx*8+ly)*4+lz
    SX3, SY3, SZ3 = 3, 7, 3
    NA3 = (D - 1) // SX3 + 1
    NB3 = (D - 1) // SY3 + 1
    NC3 = (D - 1) // SZ3 + 1

    def tile2d_table(v):
        """(D*NA2*NB2, 128): row (x*NA2+a)*NB2+b = v[x, 7a:7a+8, 15b:15b+16]."""
        vp = jnp.pad(v, ((0, 0), (0, SY2 * (NA2 - 1) + TY2 - D),
                         (0, SZ2 * (NB2 - 1) + TZ2 - D)))
        patches = lax.conv_general_dilated_patches(
            vp[:, None, :, :], (TY2, TZ2), (SY2, SZ2), "VALID"
        )  # (D, 128, NA2, NB2), channels in (ly, lz) C-order
        return patches.transpose(0, 2, 3, 1).reshape(D * NA2 * NB2, TY2 * TZ2)

    def tile3d_table(v):
        """((NA3*NB3*NC3), 128): row (a*NB3+b)*NC3+c = v[3a:3a+4,7b:7b+8,3c:3c+4]."""
        vp = jnp.pad(v, ((0, SX3 * (NA3 - 1) + TX3 - D),
                         (0, SY3 * (NB3 - 1) + TY3 - D),
                         (0, SZ3 * (NC3 - 1) + TZ3 - D)))
        patches = lax.conv_general_dilated_patches(
            vp[None, None], (TX3, TY3, TZ3), (SX3, SY3, SZ3), "VALID"
        )  # (1, 128, NA3, NB3, NC3), channels (lx, ly, lz) C-order
        return patches[0].transpose(1, 2, 3, 0).reshape(
            NA3 * NB3 * NC3, TX3 * TY3 * TZ3
        )

    def tri_corners(points):
        p = jnp.clip(points, 0.0, D - 1.0)
        p0 = jnp.floor(p)
        frac = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, D - 1)
        return i0, i1, frac

    ZROWS = (D - 1) // 127 + 1

    def table127(v):
        cols = v.reshape(D * D, D)
        rows = [
            jnp.pad(cols[:, 127 * k : 127 * k + 128],
                    ((0, 0), (0, max(0, 127 * k + 128 - D))))
            for k in range(ZROWS)
        ]
        return jnp.stack(rows, axis=1).reshape(D * D * ZROWS, 128)

    # ---- variants ----
    @jax.jit
    def tri_tile2d_sel4(tab, srcs):
        def one(src):
            i0, i1, frac = tri_corners(ray_points(src, dirs, S))
            y0, z0 = i0[..., 1], i0[..., 2]
            dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
            a, b = y0 // SY2, z0 // SZ2
            ly, lz = y0 - SY2 * a, z0 - SZ2 * b
            fz = frac[..., 2]
            l00 = ly * TZ2 + lz
            # z-fused select weights: exact two-term z blend inside the sum
            wz0 = ((l00[..., None] == lanes128) * (1 - fz)[..., None]
                   + ((l00 + dz)[..., None] == lanes128) * fz[..., None])
            l10 = (ly + dy) * TZ2 + lz
            wz1 = ((l10[..., None] == lanes128) * (1 - fz)[..., None]
                   + ((l10 + dz)[..., None] == lanes128) * fz[..., None])
            fy, fx = frac[..., 1], frac[..., 0]
            vals = []
            for xv in (i0[..., 0], i1[..., 0]):
                rows = jnp.take(tab, (xv * NA2 + a) * NB2 + b, axis=0)
                cy0 = jnp.sum(rows * wz0, axis=-1)
                cy1 = jnp.sum(rows * wz1, axis=-1)
                vals.append(cy0 * (1 - fy) + cy1 * fy)
            return vals[0] * (1 - fx) + vals[1] * fx

        return jnp.sum(jax.vmap(one)(srcs))

    @jax.jit
    def tri_tile2d_fused(tab, srcs):
        def one(src):
            i0, i1, frac = tri_corners(ray_points(src, dirs, S))
            y0, z0 = i0[..., 1], i0[..., 2]
            dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
            a, b = y0 // SY2, z0 // SZ2
            ly, lz = y0 - SY2 * a, z0 - SZ2 * b
            fy, fz, fx = frac[..., 1], frac[..., 2], frac[..., 0]
            # outer-product weights: wy (.., 8) x wz (.., 16) -> (.., 128)
            wy = ((ly[..., None] == jnp.arange(TY2)) * (1 - fy)[..., None]
                  + ((ly + dy)[..., None] == jnp.arange(TY2)) * fy[..., None])
            wz = ((lz[..., None] == jnp.arange(TZ2)) * (1 - fz)[..., None]
                  + ((lz + dz)[..., None] == jnp.arange(TZ2)) * fz[..., None])
            w = (wy[..., :, None] * wz[..., None, :]).reshape(wy.shape[:-1] + (128,))
            vals = []
            for xv in (i0[..., 0], i1[..., 0]):
                rows = jnp.take(tab, (xv * NA2 + a) * NB2 + b, axis=0)
                vals.append(jnp.sum(rows * w, axis=-1))
            return vals[0] * (1 - fx) + vals[1] * fx

        return jnp.sum(jax.vmap(one)(srcs))

    @jax.jit
    def tri_pairz_fused(t127, srcs):
        def one(src):
            i0, i1, frac = tri_corners(ray_points(src, dirs, S))
            z0 = i0[..., 2]
            dz = i1[..., 2] - z0
            k = jnp.minimum(z0 // 127, ZROWS - 1)
            lane = z0 - 127 * k
            fz = frac[..., 2]
            w = ((lane[..., None] == lanes128) * (1 - fz)[..., None]
                 + ((lane + dz)[..., None] == lanes128) * fz[..., None])
            fy, fx = frac[..., 1], frac[..., 0]
            c = []
            for xv in (i0[..., 0], i1[..., 0]):
                for yv in (i0[..., 1], i1[..., 1]):
                    rows = jnp.take(t127, (xv * D + yv) * ZROWS + k, axis=0)
                    c.append(jnp.sum(rows * w, axis=-1))
            c0 = c[0] * (1 - fy) + c[1] * fy
            c1 = c[2] * (1 - fy) + c[3] * fy
            return c0 * (1 - fx) + c1 * fx

        return jnp.sum(jax.vmap(one)(srcs))

    def _tile3d(tab, srcs, in_dtype):
        def one(src):
            i0, i1, frac = tri_corners(ray_points(src, dirs, S))
            x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
            dx, dy, dz = i1[..., 0] - x0, i1[..., 1] - y0, i1[..., 2] - z0
            a, b, cix = x0 // SX3, y0 // SY3, z0 // SZ3
            lx, ly, lz = x0 - SX3 * a, y0 - SY3 * b, z0 - SZ3 * cix
            fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
            wx = ((lx[..., None] == jnp.arange(TX3)) * (1 - fx)[..., None]
                  + ((lx + dx)[..., None] == jnp.arange(TX3)) * fx[..., None])
            wy = ((ly[..., None] == jnp.arange(TY3)) * (1 - fy)[..., None]
                  + ((ly + dy)[..., None] == jnp.arange(TY3)) * fy[..., None])
            wz = ((lz[..., None] == jnp.arange(TZ3)) * (1 - fz)[..., None]
                  + ((lz + dz)[..., None] == jnp.arange(TZ3)) * fz[..., None])
            w = (wx[..., :, None, None] * wy[..., None, :, None]
                 * wz[..., None, None, :]).reshape(wx.shape[:-1] + (128,))
            rows = jnp.take(tab, (a * NB3 + b) * NC3 + cix, axis=0)
            return jnp.sum(rows.astype(jnp.float32) * w, axis=-1)

        return jnp.sum(jax.vmap(one)(srcs))

    @jax.jit
    def tri_tile3d_bf16(tab, srcs):
        return _tile3d(tab, srcs, jnp.bfloat16)

    @jax.jit
    def tri_tile3d_f32(tab, srcs):
        return _tile3d(tab, srcs, jnp.float32)

    # ---- build tables (one-time, outside timing) ----
    t2d = jax.jit(tile2d_table)(vol)
    t127 = jax.jit(table127)(vol)
    t3f = jax.jit(tile3d_table)(vol)
    t3b = jax.jit(lambda v: tile3d_table(v.astype(jnp.bfloat16)))(vol)
    for t in (t2d, t127, t3f):
        float(jnp.sum(t))
    float(jnp.sum(t3b.astype(jnp.float32)))

    sync_ms = measure_sync_ms()
    results = {
        "sync_ms": round(sync_ms, 2),
        "device": str(jax.devices()[0]),
        "t2d_mb": round(t2d.size * 4 / 1e6, 1),
        "t127_mb": round(t127.size * 4 / 1e6, 1),
        "t3f_mb": round(t3f.size * 4 / 1e6, 1),
        "t3b_mb": round(t3b.size * 2 / 1e6, 1),
    }

    # exactness vs canonical trilinear
    @jax.jit
    def tri_ref(v, srcs):
        def one(src):
            return sample_trilinear(v, ray_points(src, dirs, S))[1]

        return jnp.sum(jax.vmap(one)(srcs))

    want = float(tri_ref(vol, source_sets[0]))
    for name, fn, arg in (
        ("sel4", tri_tile2d_sel4, t2d),
        ("fused", tri_tile2d_fused, t2d),
        ("pairz", tri_pairz_fused, t127),
        ("t3f", tri_tile3d_f32, t3f),
        ("t3b", tri_tile3d_bf16, t3b),
    ):
        got = float(fn(arg, source_sets[0]))
        results[f"relerr_{name}"] = abs(got - want) / abs(want)
        assert results[f"relerr_{name}"] < (1e-2 if name == "t3b" else 1e-4), (
            name, want, got
        )

    def timeit(name, fn, argsets):
        ms = readback_time_ms(fn, argsets, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)
        print(f"{name}: {ms / P:.3f} ms/frame", flush=True)

    timeit("tri_tile2d_sel4_ms", tri_tile2d_sel4, [(t2d, s) for s in source_sets])
    timeit("tri_tile2d_fused_ms", tri_tile2d_fused, [(t2d, s) for s in source_sets])
    timeit("tri_pairz_fused_ms", tri_pairz_fused, [(t127, s) for s in source_sets])
    timeit("tri_tile3d_bf16_ms", tri_tile3d_bf16, [(t3b, s) for s in source_sets])
    timeit("tri_tile3d_f32_ms", tri_tile3d_f32, [(t3f, s) for s in source_sets])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
