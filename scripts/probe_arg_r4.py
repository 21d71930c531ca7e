"""Round-4 probe 8: the ARG-vs-TEMP gather table hypothesis.

Unifying every r3/r4 gather observation: the fast ~2 ns/take regime is
gathering from a table XLA BUILT INSIDE the jit (a temp it can place in
on-chip memory — the ~128 MB "cliff" matches an on-chip capacity);
tables passed as jit ARGUMENTS arrive HBM-resident and pay ~10 ns/take
at every size and pattern.  Predictions tested here:

1. random-row takes from a 64 MB table: as-arg ~10.4 ns (probe_cliff)
   vs in-jit temp (table = arg * 1.000001 forces a real materialized
   copy) — should drop toward ~2-3 ns if the hypothesis holds.
2. the real trilinear sweep at the bench config: raw volume arg (tile
   table built in-jit, the bench path, ~1.0 ms/frame) vs PREPARED
   TileVolume arg (the RendererService staging path!) — if prepared-arg
   is ~2.7 ms/frame, r3's "prepare once at init" serving optimization
   is actually a device-time pessimization hidden by tunnel latency.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_arg_r4.py
"""

from __future__ import annotations

import json

import numpy as np

N = 262144
CH = 12
ITERS = 5
D = 256
N_RAYS = 256
S = 512
P = 32
SWEEP_ITERS = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax import lax

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops import sampling as sp
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    sync = measure_sync_ms()
    out = {"sync_ms": round(sync, 2)}

    # --- 1. random rows, 64 MB: arg vs in-jit temp ---------------------
    n_rows = 64 * 1_000_000 // 512
    table = jnp.asarray(rng.random((n_rows, 128), np.float32))

    def rows_batches(count):
        return [
            jnp.asarray(rng.integers(0, n_rows, (CH, N)).astype(np.int32))
            for _ in range(count)
        ]

    def scan_takes(t, rows):
        def body(acc, r):
            return acc + jnp.sum(jnp.take(t, r, axis=0)), None

        return lax.scan(body, 0.0, rows)[0]

    fn_arg = jax.jit(scan_takes)
    fn_temp = jax.jit(lambda t, rows: scan_takes(t * 1.000001, rows))

    for name, fn in (("random64mb_arg", fn_arg), ("random64mb_temp", fn_temp)):
        args = [(table, rb) for rb in rows_batches(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ns_per_take"] = round(ms * 1e6 / (N * CH), 2)

    # --- 2. trilinear sweep: raw-volume arg vs prepared-table arg ------
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    tv = jax.jit(sp.prepare_tile_volume)(vol)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(4 * (SWEEP_ITERS + 1))
    ]
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    # force the tile resolution explicitly so the probe also smokes on
    # CPU (on TPU this is what interp='trilinear' resolves to anyway)
    from diffus_tpu.render import renderer as rmod

    orig_resolve = rmod._resolve_sampler
    rmod._resolve_sampler = lambda interp, num_samples=0, step=1.0: (
        "trilinear_tile" if interp == "trilinear"
        else orig_resolve(interp, num_samples, step)
    )
    for i, (name, table) in enumerate(
        (("sweep_rawvol_arg", vol), ("sweep_prepared_arg", tv))
    ):
        fn = jax.jit(lambda v, s, d: render_sweep(v, s, d, S, cfg)[3])
        args = [
            (table, sets[i * (SWEEP_ITERS + 1) + j], dirs)
            for j in range(SWEEP_ITERS + 1)
        ]
        ms = readback_time_ms(fn, args, n=SWEEP_ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
