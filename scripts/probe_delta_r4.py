"""Round-4 probe 7: the address-DELTA model of gather cost, tested at
512^3 with a dominant-axis-innermost transpose.

Unified model from probe_cliff_r4 + probe_512loc_r4 + the r3 layout
probes: per-take cost depends on the ADDRESS DELTA between consecutive
takes — deltas up to ~1 KB stream at ~2 ns, larger ones pay the
~10.4 ns random rate.  It explains every observation so far:
256^3 renders (y-step = 1 KB) are fast; 512^3 (y-step = 2 KB) runs at
the random rate; the "cliff" correlated with table size because bigger
tables mean bigger strides; ray-chunking shrank the touched set but not
the deltas (-14% only); random rows cost the same at every size.

Decisive test: at 512^3, transpose the volume so the fan's dominant
march axis (y) is INNERMOST — consecutive takes then step ~4 B.  If the
model holds, 512^3 nearest drops from ~1.4-1.8 ms/frame toward 256^3
rates (~0.3-0.4 ms); if it's ~10% like the r3 256^3 transpose, the
model is wrong.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_delta_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 512
N_RAYS = 256
S = 512
P = 4
ITERS = 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops import sampling as sp
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    # y-innermost layout: (x, z, y); fan marches y so consecutive takes
    # step 4 B instead of 4*D B
    vol_t = jnp.transpose(vol, (0, 2, 1))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(8 * (ITERS + 1))
    ]
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2), "config": f"{N_RAYS}x{S}x{D}^3, P={P}"}

    swap_yz = jnp.asarray([0, 2, 1])

    def nearest_plain(t, pts):
        return sp.sample_nearest_rows(t, pts)[1]

    def nearest_transposed(t, pts):
        return sp.sample_nearest_rows(t, pts[..., swap_yz])[1]

    # correctness of the transposed path
    pts_c = sp.ray_points(jnp.asarray(base + 0.37), dirs, 64)
    va = nearest_plain(vol, pts_c)
    vb = nearest_transposed(vol_t, pts_c)
    out["transpose_max_abs_err"] = float(jnp.max(jnp.abs(va - vb)))

    def make(sampler, table):
        def fn(t, srcs):
            def pose(src):
                pts = sp.ray_points(src, dirs, S)
                return jnp.sum(sampler(t, pts))

            return jnp.sum(jax.vmap(pose)(srcs))

        return jax.jit(fn), table

    variants = {
        "nearest_zinner": (nearest_plain, vol),        # standard layout
        "nearest_yinner": (nearest_transposed, vol_t),  # dominant-axis inner
    }
    for i, (name, (sampler, table)) in enumerate(variants.items()):
        fn, t = make(sampler, table)
        args = [(t, sets[i * (ITERS + 1) + j]) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
