"""Round-4 probe 9: content cropping as the 512^3 recovery lever.

The placement model (probe_arg_r4) says 512^3 renders pay the HBM
argument gather rate because every table exceeds the ~128 MB on-chip
placement capacity.  Clinical volumes are mostly air: cropping a 512^3
scan to a ~288^3 content box (scene.crop_to_content) brings the volume
to 95 MB / the trilinear tile table to ~130->under, restoring the fast
regime.  Measures the same physical scene rendered from the full volume
vs the crop (identical rays, offset-shifted source).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_crop_r4.py
"""

from __future__ import annotations

import json

import numpy as np

D = 512
CONTENT = 288          # content cube side (centered)
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
    from diffus_tpu.render.renderer import render_sweep
    from diffus_tpu.scene import crop_to_content
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    lo = (D - CONTENT) // 2
    vol_np = np.zeros((D, D, D), np.float32)
    vol_np[lo : lo + CONTENT, lo : lo + CONTENT, lo : lo + CONTENT] = (
        rng.random((CONTENT,) * 3).astype(np.float32) * 2.0 + 0.5
    )
    cropped, offset = crop_to_content(vol_np, threshold=0.0, margin=4)
    vol = jnp.asarray(vol_np)
    out = {
        "config": f"{N_RAYS}x{S}x{D}^3, content {CONTENT}^3, P={P}",
        "crop_shape": list(np.asarray(cropped).shape),
        "crop_vol_mb": round(np.asarray(cropped).size * 4 / 1e6, 1),
    }

    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, lo + 4.0, D / 2.0], np.float32)
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(8 * (ITERS + 1))
    ]
    off = jnp.asarray(offset, jnp.float32)
    sync = measure_sync_ms()
    out["sync_ms"] = round(sync, 2)

    # correctness: same frame from full and cropped volumes (rays inside)
    tri = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    near = RenderConfig(attenuation_coeff=1e-4)
    f_full = render_sweep(vol, sets[0], dirs, S, near)[3]
    f_crop = render_sweep(cropped, sets[0] - off[None], dirs, S, near)[3]
    out["crop_max_abs_err"] = float(jnp.max(jnp.abs(f_full - f_crop)))

    variants = {
        "nearest_full": (near, vol, None),
        "nearest_crop": (near, cropped, off),
        "tri_full": (tri, vol, None),
        "tri_crop": (tri, cropped, off),
    }
    for i, (name, (cfg, v, o)) in enumerate(variants.items()):
        fn = jax.jit(
            lambda vv, s_, d, c=cfg: render_sweep(vv, s_, d, S, c)[3]
        )
        args = [
            (v, sets[i * (ITERS + 1) + j] - (o[None] if o is not None else 0.0), dirs)
            for j in range(ITERS + 1)
        ]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
