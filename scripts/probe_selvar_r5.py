"""Round-5 probe 1b: select/weight-build micro-variants of the winning
(y, z)-tile sampler, END-TO-END through render_sweep.

The exact-trilinear frame time is ~0.60 ms gather floor + ~0.4 ms fused
weight-build/select compute (VPU).  Three reformulations that change the
number of wide (..., 128) ops or how often XLA must duplicate the weight
build across the two take-consumer fusions:

  base     : adopted r3 sampler (wz0/wz1 one-hots, y-blend in select,
             narrow x blend after two reduces)
  combined : blend the two gathered row arrays FIRST
             (rows0*(1-fx) + rows1*fx), then ONE w_yz reduce — w_yz is
             consumed once, so XLA cannot need to rebuild it per take
  w4       : build w_yz directly from 4 one-hot compares (no wz0/wz1
             intermediates): 11 wide ops instead of 13
  comb4    : combined + w4

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_selvar_r5.py
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
    from diffus_tpu.ops import sampling as smod
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    TY, TZ = smod._TILE_TY, smod._TILE_TZ

    def _common(volume, points):
        tv = smod.prepare_tile_volume(volume)
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
        l00 = ly * TZ + lz
        l10 = (ly + dy) * TZ + lz
        idx = jnp.clip(
            jnp.round(points).astype(jnp.int32),
            0,
            jnp.asarray(tv.shape, jnp.int32) - 1,
        )
        rows = [
            jnp.take(tv.table, (xv * tv.na + a) * tv.nb + b, axis=0)
            for xv in (i0[..., 0], i1[..., 0])
        ]
        return rows, l00, l10, dz, fx, fy, fz, idx

    lanes = None  # built lazily with the right size

    def _lanes():
        return jnp.arange(TY * TZ, dtype=jnp.int32)

    def w_yz_base(l00, l10, dz, fy, fz):
        ln = _lanes()
        wz0 = (l00[..., None] == ln) * (1 - fz)[..., None] + (
            (l00 + dz)[..., None] == ln
        ) * fz[..., None]
        wz1 = (l10[..., None] == ln) * (1 - fz)[..., None] + (
            (l10 + dz)[..., None] == ln
        ) * fz[..., None]
        return (1 - fy)[..., None] * wz0 + fy[..., None] * wz1

    def w_yz_4cmp(l00, l10, dz, fy, fz):
        ln = _lanes()
        w00 = ((1 - fy) * (1 - fz))[..., None]
        w01 = ((1 - fy) * fz)[..., None]
        w10 = (fy * (1 - fz))[..., None]
        w11 = (fy * fz)[..., None]
        return (
            (l00[..., None] == ln) * w00
            + ((l00 + dz)[..., None] == ln) * w01
            + (l10[..., None] == ln) * w10
            + ((l10 + dz)[..., None] == ln) * w11
        )

    def make_sampler(combined: bool, w4: bool):
        wfn = w_yz_4cmp if w4 else w_yz_base

        def sampler(volume, points):
            rows, l00, l10, dz, fx, fy, fz, idx = _common(volume, points)
            w = wfn(l00, l10, dz, fy, fz)
            if combined:
                mix = rows[0] * (1 - fx)[..., None] + rows[1] * fx[..., None]
                values = jnp.sum(mix * w, axis=-1)
            else:
                v0 = jnp.sum(rows[0] * w, axis=-1)
                v1 = jnp.sum(rows[1] * w, axis=-1)
                values = v0 * (1 - fx) + v1 * fx
            return idx, values

        return sampler

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    variants = [
        ("base", None),
        ("combined", make_sampler(True, False)),
        ("w4", make_sampler(False, True)),
        ("comb4", make_sampler(True, True)),
    ]
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(len(variants) * (ITERS + 1) + 1)
    ]
    sync = measure_sync_ms()
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    orig = smod.SAMPLERS["trilinear_tile"]
    probe_src = sets[-1][:4]
    want = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
    scale = float(jnp.max(jnp.abs(want)))

    try:
        for vi, (name, sampler) in enumerate(variants):
            smod.SAMPLERS["trilinear_tile"] = sampler or orig
            if sampler is not None:
                got = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
                out[name + "_err"] = float(jnp.max(jnp.abs(got - want))) / scale
            fn = jax.jit(lambda v, s, d: rmod.render_sweep(v, s, d, S, cfg)[3])
            args = [
                (vol, sets[vi * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)
            ]
            ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
            out[name + "_ms_per_frame"] = round(ms / P, 4)
            out[name + "_fps"] = round(P / ms * 1e3, 1)
    finally:
        smod.SAMPLERS["trilinear_tile"] = orig

    print(json.dumps(out))


if __name__ == "__main__":
    main()
