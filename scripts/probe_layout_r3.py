"""Round-3 probe: dominant-axis volume layout vs gather-transaction count.

Hypothesis (VERDICT.md r2 item 1): under the flat layout (x*H+y)*W+z the
benchmark fan (median +y, z constant) lands EVERY depth sample in a
different 512 B row -> 131k transactions/frame.  Transposing the staged
volume so the fan's dominant march axis (y) is the innermost/lane axis
makes consecutive samples fall in the SAME row (runs of ~1/|dir_x|
samples), so if the gather engine serves duplicate/nearby row indices
faster than unique ones, nearest gets cheaper for free; and the trilinear
y0/y1 corner pairs become lane-adjacent, enabling a 4-gather formulation
from a 64-shift overlapped table whose rows STAY 128 lanes wide (the
measured 512 B sweet spot — distinct from the rejected 256-wide rows2).

Variants timed (8-pose vmapped batches, unique inputs per call, one
readback closes each loop, sync subtracted — docs/benchmarking.md):

  near_l0    nearest row-gather, current layout (baseline re-measure)
  near_l1    nearest row-gather, y-innermost transposed layout
  tri_l0     trilinear 8-corner row-gather, current layout (baseline)
  tri_l1     trilinear 8-corner row-gather, transposed layout
  tri_pair   trilinear 4-gather paired-y from 64-shift overlapped table
  tri_bf16   trilinear 8-corner row-gather from a bf16 table (256 B rows),
             f32 weights (VERDICT item 2: transactions vs bytes for the
             8-corner pattern specifically)
  transpose  cost of materializing the (0,2,1) transpose of the volume

Run ON TPU from /root/repo:  python scripts/probe_layout_r3.py
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
    vol_t = jnp.transpose(vol, (0, 2, 1))  # (x, z, y): y innermost
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([128.0, 4.0, 128.0], np.float32)
    source_sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(ITERS + 1)
    ]

    lanes128 = jnp.arange(128, dtype=jnp.int32)

    def row_table(v):
        return v.reshape(-1, 128)  # D^3 divisible by 128: no pad needed

    def table64(v):
        """64-shift overlapped table: row r covers flat [r*64, r*64+128)."""
        fv = jnp.concatenate([v.reshape(-1), jnp.zeros((64,), v.dtype)])
        b = fv.reshape(-1, 64)
        return jnp.concatenate([b[:-1], b[1:]], axis=1)  # (total/64, 128)

    def lookup(tab, flat):
        rows = jnp.take(tab, flat >> 7, axis=0)
        oh = ((flat & 127)[..., None] == lanes128).astype(tab.dtype)
        return jnp.sum(rows * oh, axis=-1)

    def nearest_idx(points):
        return jnp.clip(jnp.round(points).astype(jnp.int32), 0, D - 1)

    # ---- nearest, current layout: flat = (x*D + y)*D + z ----
    @jax.jit
    def near_l0(v, srcs):
        tab = row_table(v)

        def one(src):
            i = nearest_idx(ray_points(src, dirs, S))
            flat = (i[..., 0] * D + i[..., 1]) * D + i[..., 2]
            return lookup(tab, flat)

        return jnp.sum(jax.vmap(one)(srcs))

    # ---- nearest, transposed layout: flat = (x*D + z)*D + y ----
    @jax.jit
    def near_l1(vt, srcs):
        tab = row_table(vt)

        def one(src):
            i = nearest_idx(ray_points(src, dirs, S))
            flat = (i[..., 0] * D + i[..., 2]) * D + i[..., 1]
            return lookup(tab, flat)

        return jnp.sum(jax.vmap(one)(srcs))

    def tri_corners(points):
        p = jnp.clip(points, 0.0, D - 1.0)
        p0 = jnp.floor(p)
        frac = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, D - 1)
        return i0, i1, frac

    def tri_blend(c, frac):
        """c[(ix,iy,iz)] corner values -> trilinear interpolation."""
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        c00 = c[(0, 0, 0)] * (1 - fz) + c[(0, 0, 1)] * fz
        c01 = c[(0, 1, 0)] * (1 - fz) + c[(0, 1, 1)] * fz
        c10 = c[(1, 0, 0)] * (1 - fz) + c[(1, 0, 1)] * fz
        c11 = c[(1, 1, 0)] * (1 - fz) + c[(1, 1, 1)] * fz
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        return c0 * (1 - fx) + c1 * fx

    def tri8(tab, points, perm_flat, out_dtype=jnp.float32):
        i0, i1, frac = tri_corners(points)
        xs = (i0[..., 0], i1[..., 0])
        ys = (i0[..., 1], i1[..., 1])
        zs = (i0[..., 2], i1[..., 2])
        c = {}
        for a in (0, 1):
            for b in (0, 1):
                for d in (0, 1):
                    c[(a, b, d)] = lookup(
                        tab, perm_flat(xs[a], ys[b], zs[d])
                    ).astype(out_dtype)
        return tri_blend(c, frac)

    flat_l0 = lambda x, y, z: (x * D + y) * D + z
    flat_l1 = lambda x, y, z: (x * D + z) * D + y

    @jax.jit
    def tri_l0(v, srcs):
        tab = row_table(v)

        def one(src):
            return tri8(tab, ray_points(src, dirs, S), flat_l0)

        return jnp.sum(jax.vmap(one)(srcs))

    @jax.jit
    def tri_l1(vt, srcs):
        tab = row_table(vt)

        def one(src):
            return tri8(tab, ray_points(src, dirs, S), flat_l1)

        return jnp.sum(jax.vmap(one)(srcs))

    # ---- trilinear, 4 gathers: y-pairs from the 64-shift table ----
    @jax.jit
    def tri_pair(t64, srcs):
        def one(src):
            points = ray_points(src, dirs, S)
            i0, i1, frac = tri_corners(points)
            x0, x1 = i0[..., 0], i1[..., 0]
            y0, y1 = i0[..., 1], i1[..., 1]
            z0, z1 = i0[..., 2], i1[..., 2]
            dy = y1 - y0  # 0 or 1; lane l0 in [0,64), l0+dy < 128 always
            c = {}
            for a, xv in ((0, x0), (1, x1)):
                for d, zv in ((0, z0), (1, z1)):
                    flat = (xv * D + zv) * D + y0
                    r = flat >> 6
                    l0 = flat & 63
                    rows = jnp.take(t64, r, axis=0)
                    oh0 = (l0[..., None] == lanes128).astype(t64.dtype)
                    oh1 = ((l0 + dy)[..., None] == lanes128).astype(t64.dtype)
                    c[(a, 0, d)] = jnp.sum(rows * oh0, axis=-1)
                    c[(a, 1, d)] = jnp.sum(rows * oh1, axis=-1)
            return tri_blend(c, frac)

        return jnp.sum(jax.vmap(one)(srcs))

    # ---- trilinear, bf16 corner table (256 B rows), f32 weights ----
    @jax.jit
    def tri_bf16(vbf, srcs):
        tab = row_table(vbf)

        def one(src):
            return tri8(tab, ray_points(src, dirs, S), flat_l0)

        return jnp.sum(jax.vmap(one)(srcs))

    @jax.jit
    def do_transpose(v):
        return jnp.sum(jnp.transpose(v, (0, 2, 1)) * 1.0000001)

    vol_bf = vol.astype(jnp.bfloat16)
    t64 = jax.jit(table64)(vol_t)
    float(jnp.sum(t64))

    sync_ms = measure_sync_ms()
    results = {"sync_ms": round(sync_ms, 2), "device": str(jax.devices()[0])}

    # correctness cross-checks on one batch before timing.  Values are
    # elementwise bit-identical (verified on CPU) but the timed programs
    # reduce to a scalar and XLA fuses that sum into the lane select, so
    # accumulation order differs per layout -> allow a few ULPs.
    a = float(near_l0(vol, source_sets[0]))
    b = float(near_l1(vol_t, source_sets[0]))
    assert abs(a - b) / abs(a) < 1e-4, (a, b)
    ta = float(tri_l0(vol, source_sets[0]))
    tb = float(tri_l1(vol_t, source_sets[0]))
    tc = float(tri_pair(t64, source_sets[0]))
    assert abs(ta - tb) / abs(ta) < 1e-4, (ta, tb)
    assert abs(ta - tc) / abs(ta) < 1e-4, (ta, tc)

    def timeit(name, fn, argsets):
        ms = readback_time_ms(fn, argsets, n=ITERS, sync_ms=sync_ms)
        results[name] = round(ms / P, 3)  # ms per frame
        print(f"{name}: {ms / P:.3f} ms/frame", flush=True)

    timeit("near_l0_ms", near_l0, [(vol, s) for s in source_sets])
    timeit("near_l1_ms", near_l1, [(vol_t, s) for s in source_sets])
    timeit("tri_l0_ms", tri_l0, [(vol, s) for s in source_sets])
    timeit("tri_l1_ms", tri_l1, [(vol_t, s) for s in source_sets])
    timeit("tri_pair_ms", tri_pair, [(t64, s) for s in source_sets])
    timeit("tri_bf16_ms", tri_bf16, [(vol_bf, s) for s in source_sets])

    tr_ms = readback_time_ms(
        do_transpose, [(vol * (1.0 + i * 1e-6),) for i in range(4)], n=3,
        sync_ms=sync_ms,
    )
    results["transpose_ms"] = round(tr_ms, 3)
    print(f"transpose: {tr_ms:.3f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
