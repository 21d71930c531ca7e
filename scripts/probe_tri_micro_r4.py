"""Round-4 probe 4: micro-variants of the exact-trilinear path, hunting
the margin that makes the >=1000 fps bar robust (VERDICT r3 #2).

Grid: pose-chunk size {4, 8} x lane-weight formulation {r3 merged-y
("5-pass"), direct 4-term}.  The direct 4-term builds the combined
(y,z) lane weight as four one-hot FMAs with precomputed scalar corner
weights instead of two z-blended selects merged by y — one less wide
combine if XLA schedules it that way.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tri_micro_r4.py
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
    from diffus_tpu.ops import sampling as sp
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    def sample_trilinear_tile_d4(volume, points):
        """Direct 4-term lane-weight variant of sample_trilinear_tile."""
        tv = sp.prepare_tile_volume(volume)
        table, na, nb = tv.table, tv.na, tv.nb
        dims = jnp.asarray(tv.shape, dtype=points.dtype)
        p = jnp.clip(points, 0.0, dims - 1.0)
        p0 = jnp.floor(p)
        frac = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)
        y0, z0 = i0[..., 1], i0[..., 2]
        dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
        a, b = y0 // tv.sy, z0 // tv.sz
        ly, lz = y0 - a * tv.sy, z0 - b * tv.sz
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        lanes = jnp.arange(128, dtype=jnp.int32)
        l00 = ly * 16 + lz
        l10 = (ly + dy) * 16 + lz
        w00 = (1 - fy) * (1 - fz)
        w01 = (1 - fy) * fz
        w10 = fy * (1 - fz)
        w11 = fy * fz
        w = (
            (l00[..., None] == lanes) * w00[..., None]
            + ((l00 + dz)[..., None] == lanes) * w01[..., None]
            + (l10[..., None] == lanes) * w10[..., None]
            + ((l10 + dz)[..., None] == lanes) * w11[..., None]
        )
        vals = []
        for xv in (i0[..., 0], i1[..., 0]):
            rows = jnp.take(table, (xv * na + a) * nb + b, axis=0)
            vals.append(jnp.sum(rows * w, axis=-1))
        values = vals[0] * (1 - fx) + vals[1] * fx
        dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
        idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
        return idx, values

    sp.SAMPLERS["trilinear_tile_d4"] = sample_trilinear_tile_d4

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(8 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    # d4 correctness vs the adopted path
    pts = sp.ray_points(jnp.asarray(base + 0.41), dirs, S)
    _, v_t = sp.sample_trilinear_tile(vol, pts)
    _, v_d = sample_trilinear_tile_d4(vol, pts)
    out["d4_max_rel_err"] = float(
        jnp.max(jnp.abs(v_t - v_d)) / (jnp.max(jnp.abs(v_t)) + 1e-30)
    )

    orig_resolve = rmod._resolve_sampler

    def make_resolver(name):
        def r(interp, num_samples=0, step=1.0):
            got = orig_resolve(interp, num_samples, step)
            return name if got == "trilinear_tile" else got

        return r

    i = 0
    for variant, resolver in (
        ("sel5", orig_resolve),
        ("d4", make_resolver("trilinear_tile_d4")),
    ):
        for chunk in (4, 8):
            rmod._resolve_sampler = resolver
            fn = jax.jit(
                lambda v, s, d, c=chunk: rmod.render_sweep(
                    v, s, d, S, cfg, chunk=c
                )[3]
            )
            args = [
                (vol, sets[i * (ITERS + 1) + j], dirs)
                for j in range(ITERS + 1)
            ]
            ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
            out[f"{variant}_chunk{chunk}_ms_per_frame"] = round(ms / P, 4)
            out[f"{variant}_chunk{chunk}_fps"] = round(P / ms * 1e3, 1)
            i += 1
    rmod._resolve_sampler = orig_resolve

    print(json.dumps(out))


if __name__ == "__main__":
    main()
