"""Round-4b probe: adaptive coalescing window + in-service pose recovery
on real hardware.

Measures, on a 128^3 scene service (64 rays x 128 samples, tiers (1, 8)):
  1. lone-request latency, fixed 3 ms window vs adaptive (decays to the
     0.5 ms floor after a few lone rounds — the saving should appear as
     a ~2.5 ms median delta on top of the ~30 ms tunnel round trip);
  2. burst coalescing with the adaptive window grown under load
     (8 concurrent singletons -> <=2 dispatched batches per round);
  3. warmup_recovery + one /recover-equivalent call wall time and
     recovered-pose error (the endpoint's first hardware evidence).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_serve_r4b.py

RESULT (v5e): lone median 32.93 ms adaptive vs 38.79 fixed (window
decayed to the 0.5 ms floor — the full predicted saving and then some,
on a ~33 ms tunnel-dominated round trip); 8-client bursts dispatched as
ONE batch in both rounds (wall 73.3 / 56.7 ms) with the window grown
0.5 -> 1.125 ms; warmup_recovery 14.11 s one-time compile, then a
4-start recover call runs 0.40 s wall and recovers to 0.88 voxels from
a 1.5-voxel/0.03-rad perturbation; stats accounting correct
(recoveries=1 after exactly one client call).
"""

from __future__ import annotations

import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.serve import RendererService
    from diffus_tpu.types import BeamGeometry, RenderConfig

    dim = 128
    vol = brain_phantom_3d((dim,) * 3)
    geom = BeamGeometry(n_rays=64, num_samples=128)
    cfg = RenderConfig(attenuation_coeff=1e-4)
    rng = np.random.default_rng(3)
    base = np.array([dim / 2, 4.0, dim / 2], np.float32)

    def srcs(n):
        return [
            (base + rng.uniform(-4, 4, 3).astype(np.float32)) for _ in range(n)
        ]

    out = {}
    fixed = RendererService(vol, geom, cfg, batch_tiers=(1, 8))
    adaptive = RendererService(
        vol, geom, cfg, batch_tiers=(1, 8), adaptive_window=True
    )
    out["warmup_s"] = round(fixed.warmup() + adaptive.warmup(), 2)

    # 1. lone-request latency (unique inputs; median of 16 after the
    # adaptive window has decayed)
    for name, svc in (("fixed", fixed), ("adaptive", adaptive)):
        for s in srcs(6):  # decay / steady-state entry
            np.asarray(svc.render(s))
        lat = []
        for s in srcs(16):
            t0 = time.perf_counter()
            np.asarray(svc.render(s))
            lat.append((time.perf_counter() - t0) * 1e3)
        out[f"lone_ms_{name}"] = round(float(np.median(lat)), 2)
    out["adaptive_window_after_lone_ms"] = adaptive.snapshot_stats()["window_ms"]

    # 2. burst coalescing under the adaptive window
    for round_i in range(2):
        before = adaptive.snapshot_stats()["batches"]
        barrier = threading.Barrier(8)
        inputs = srcs(8)

        def one(s):
            barrier.wait()
            return np.asarray(adaptive.render(s))

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(one, inputs))
        out[f"burst{round_i}_wall_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        out[f"burst{round_i}_batches"] = (
            adaptive.snapshot_stats()["batches"] - before
        )
    out["adaptive_window_after_burst_ms"] = adaptive.snapshot_stats()["window_ms"]

    # 3. in-service pose recovery on hardware
    phases = ((2.0, 0.2, 0.01, 60), (0.0, 0.08, 0.004, 140))
    t0 = time.perf_counter()
    out["warmup_recovery_s"] = round(
        adaptive.warmup_recovery(count=4, phases=phases), 2
    )
    from diffus_tpu.train.pose_recovery import render_pose
    from diffus_tpu.types import TransducerPose

    true = base + np.array([1.0, 0.0, -2.0], np.float32)
    target = render_pose(
        adaptive.volume, TransducerPose.create(true),
        adaptive._recovery_config(phases).as_base(),
    )
    t0 = time.perf_counter()
    res = adaptive.recover_pose(
        np.asarray(target), true + np.array([1.2, -0.8, 0.9], np.float32),
        count=4, radius=1.5, rot_scale=0.03, phases=phases,
    )
    out["recover_wall_s"] = round(time.perf_counter() - t0, 2)
    out["recover_best_pos_err"] = round(
        float(np.linalg.norm(np.array(res["position"]) - true)), 4
    )
    out["recoveries_stat"] = adaptive.snapshot_stats()["recoveries"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
