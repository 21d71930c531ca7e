"""Headline benchmark: B-mode frames/sec at 256 rays x 512 samples, 256^3 volume.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline context (BASELINE.md): the reference renders 128 rays x 100
samples at ~0.28 fps on its authors' laptop (the only measured full-frame
number; ``[DEPR] fxiafixing_voxel_plot.ipynb`` cell 11).  vs_baseline is
measured fps / 0.28 — at a config with 10.2x more ray-samples per frame.
Target (BASELINE.json): > 1000 fps on a single TPU chip.

Method: steady-state throughput of the jitted render over a batch of
poses (the multi-pose sweep workload, vmapped), plus single-frame
latency as a secondary number.  A quick parity check against the numpy
dense-solve oracle guards against benchmarking a wrong kernel.
"""

from __future__ import annotations

import json
import time

import numpy as np


N_RAYS = 256
NUM_SAMPLES = 512
VOLUME_DIM = 256
POSE_BATCH = 32
SWEEP_ITERS = 24   # every timed call gets UNIQUE inputs: the execution relay
                   # caches identical-input dispatches and reports fantasy fps
REFERENCE_FPS = 0.28
TARGET_FPS = 1000.0


def main():
    import jax

    # Persistent compilation cache: remote (Mosaic/XLA) compiles through the
    # tunnel can take minutes and the service is intermittently degraded —
    # cache executables on disk so repeat runs skip compilation entirely.
    try:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame, render_sweep
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.ops.reference_oracle import render_frame_dense

    config = RenderConfig(attenuation_coeff=1e-4, use_pallas=True)
    volume_np = brain_phantom_3d((VOLUME_DIM, VOLUME_DIM, VOLUME_DIM))
    volume = jnp.asarray(volume_np)
    directions = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    source = jnp.asarray(np.array([128.0, 4.0, 128.0], np.float32))

    rng = np.random.default_rng(0)
    source_sets = [
        jnp.asarray(
            np.array([128.0, 4.0, 128.0], np.float32)[None, :]
            + rng.uniform(-8, 8, (POSE_BATCH, 3)).astype(np.float32)
        )
        for _ in range(SWEEP_ITERS + 1)
    ]
    singles = [
        jnp.asarray(
            np.array([128.0, 4.0, 128.0], np.float32)
            + rng.uniform(-8, 8, 3).astype(np.float32)
        )
        for _ in range(21)
    ]
    sources = source_sets[0]

    # --- correctness guard: small-scene parity vs the dense oracle ---
    small = jnp.asarray(volume_np[::8, ::8, ::8].copy())
    s_src = jnp.asarray(np.array([16.0, 1.0, 16.0], np.float32))
    s_dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), 8)
    # use the non-pallas config here: saves one slow Mosaic remote-compile;
    # pallas-vs-scan equivalence is pinned by tests/test_pallas_kernel.py
    guard_config = RenderConfig(attenuation_coeff=1e-4)
    _, _, _, got = render_frame(small, s_src, s_dirs, 24, guard_config)
    _, _, _, want = render_frame_dense(
        np.asarray(small), np.asarray(s_src), np.asarray(s_dirs), 24, 1e-4, 0
    )
    parity_err = float(
        np.max(np.abs(np.asarray(got) - want)) / (np.max(np.abs(want)) + 1e-12)
    )
    assert parity_err < 1e-3, f"parity check failed: {parity_err}"

    # --- single-frame latency (unique inputs per call) ---
    _, _, _, f = render_frame(volume, singles[0], directions, NUM_SAMPLES, config)
    f.block_until_ready()
    t0 = time.perf_counter()
    n_single = 20
    for i in range(n_single):
        _, _, _, f = render_frame(
            volume, singles[i + 1], directions, NUM_SAMPLES, config
        )
    f.block_until_ready()
    single_ms = (time.perf_counter() - t0) / n_single * 1e3

    # --- batched throughput (multi-pose sweep, the serving workload) ---
    sweep = jax.jit(
        lambda v, s, d: render_sweep(v, s, d, NUM_SAMPLES, config)[3]
    )
    frames = sweep(volume, sources, directions)
    frames.block_until_ready()
    t0 = time.perf_counter()
    for i in range(SWEEP_ITERS):
        frames = sweep(volume, source_sets[i + 1], directions)
    frames.block_until_ready()
    dt = time.perf_counter() - t0
    fps = POSE_BATCH * SWEEP_ITERS / dt

    print(
        json.dumps(
            {
                "metric": "bmode_frames_per_sec_256rays_512samples_256cube",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 1),
                "single_frame_latency_ms": round(single_ms, 3),
                "pose_batch": POSE_BATCH,
                "parity_max_rel_err": parity_err,
                "target_fps": TARGET_FPS,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
