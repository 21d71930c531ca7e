"""Round-3 serving latency re-measurement (prepared tile tables, r3 samplers).

Replays the r2 methodology (docs/benchmarking.md "Serving latency") on the
current RendererService: padded-tier dispatch, median of 6 unique-input
round trips per batch size, host readback included (tunnel-dominated —
the number a remote caller actually experiences), for both the nearest
parity config and the trilinear training config.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_serve_r3.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffus_tpu.types import RenderConfig, BeamGeometry
    from diffus_tpu.serve import RendererService
    from diffus_tpu.phantoms import brain_phantom_3d

    rng = np.random.default_rng(0)
    vol = brain_phantom_3d((256, 256, 256))
    geom = BeamGeometry(n_rays=256, num_samples=512)
    results = {"device": str(jax.devices()[0])}

    for name, cfg in (
        ("nearest", RenderConfig(attenuation_coeff=1e-4)),
        ("trilinear", RenderConfig(attenuation_coeff=1e-4, interp="trilinear")),
    ):
        svc = RendererService(vol, geom, cfg, batch_tiers=(1, 8, 32))
        warm = svc.warmup()
        results[f"{name}_warmup_s"] = round(warm, 2)
        for p in (1, 5, 8, 32):
            lat = []
            for _ in range(6):
                srcs = np.array([[128.0, 4.0, 128.0]] * p, np.float32)
                srcs += rng.uniform(-8, 8, (p, 3)).astype(np.float32)
                t0 = time.perf_counter()
                frames = svc.render(srcs)
                # scalar readback: drains the queue without pulling the
                # 16 MB frame stack through the tunnel (r2 methodology)
                import jax.numpy as jnp

                float(jnp.sum(frames))
                lat.append((time.perf_counter() - t0) * 1e3)
            results[f"{name}_p{p}_ms"] = round(sorted(lat)[len(lat) // 2], 1)
            print(f"{name} p={p}: {results[f'{name}_p{p}_ms']} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
