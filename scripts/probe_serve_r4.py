"""Round-4 serving probe: request coalescing under concurrent clients
(VERDICT r3 weak #5 re-measurement).

8 concurrent single-pose clients against a warm RendererService:
r3's design dispatched each request alone under the global lock
(8 x ~40 ms tunnel round trips, serialized); the r4 leader/queue design
should coalesce them into ~2 padded tier dispatches.  Also re-measures
the single-client tier latencies and that /stats (snapshot_stats)
returns while a render is in flight.

Unique sources per request (the execution relay caches identical-input
dispatches).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_serve_r4.py
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

D = 256
RAYS = 256
S = 512


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.serve import RendererService
    from diffus_tpu.types import BeamGeometry, RenderConfig

    rng = np.random.default_rng(0)
    vol = brain_phantom_3d((D, D, D))
    svc = RendererService(
        vol,
        BeamGeometry(n_rays=RAYS, num_samples=S),
        RenderConfig(attenuation_coeff=1e-4),
        batch_tiers=(1, 8, 32),
    )
    out = {"config": f"{RAYS}x{S}x{D}^3, tiers (1,8,32)"}
    out["warmup_s"] = round(svc.warmup(), 2)

    base = np.array([D / 2, 4.0, D / 2], np.float32)

    def srcs(n, seed):
        r = np.random.default_rng(seed)
        return base[None] + r.uniform(-8, 8, (n, 3)).astype(np.float32)

    # single-client tier latencies (median of 5 unique calls)
    for n in (1, 8, 32):
        lat = []
        for it in range(5):
            t0 = time.perf_counter()
            np.asarray(svc.render(srcs(n, 100 + 10 * n + it)))
            lat.append((time.perf_counter() - t0) * 1e3)
        out[f"latency_ms_batch{n}"] = round(float(np.median(lat)), 1)

    # 8 concurrent singleton clients: wall time + dispatch count
    for rep in range(3):
        before = svc.snapshot_stats()["batches"]
        pool = ThreadPoolExecutor(max_workers=8)
        t0 = time.perf_counter()
        futs = [
            pool.submit(lambda i=i: np.asarray(svc.render(srcs(1, 900 + 8 * rep + i))))
            for i in range(8)
        ]
        for f in futs:
            f.result()
        wall = (time.perf_counter() - t0) * 1e3
        pool.shutdown()
        batches = svc.snapshot_stats()["batches"] - before
        out[f"concurrent8_rep{rep}"] = {
            "wall_ms": round(wall, 1),
            "dispatched_batches": batches,
        }

    # /stats while a render is in flight
    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(lambda: np.asarray(svc.render(srcs(32, 4242))))
    time.sleep(0.005)
    t0 = time.perf_counter()
    svc.snapshot_stats()
    out["stats_during_render_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    fut.result()
    pool.shutdown()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
