"""Round-3 evidence run: the multi-case production driver on real TPU.

Writes 8 synthetic 128^3 T1 cases as gzipped NIfTI, then drives
``train_impedance_cases`` end to end on the device: C++ batch decode ->
prefetch thread -> (1,1) mesh step -> orbax checkpoints -> JSONL
metrics, two epochs, then a resume epoch.  Reports wall/step timings.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_driver_r3.py
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.io.native import save_nifti_fast, native_available
    from diffus_tpu.phantoms import t1_phantom_3d
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.train import ImpedanceTrainConfig
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases

    dim, rays, samples = 128, 256, 256
    n_cases, batch = 8, 4
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="diffus_driver_")
    rcfg = RenderConfig(attenuation_coeff=1e-4)  # nearest: training-correct
    dirs = np.asarray(fan_directions_2d([0.0, 1.0], np.radians(45.0), rays))

    t0 = time.perf_counter()
    cases = []
    base_t1 = t1_phantom_3d((dim,) * 3)
    for i in range(n_cases):
        t1 = base_t1 * (1.0 + 0.03 * rng.standard_normal(base_t1.shape)).astype(
            np.float32
        )
        path = os.path.join(tmp, f"case{i}.nii.gz")
        save_nifti_fast(path, t1)
        src = np.array([dim / 2, 4.0, dim / 2], np.float32) + rng.uniform(
            -4, 4, 3
        ).astype(np.float32)
        _, _, _, frame = render_frame(
            jnp.asarray(t1), jnp.asarray(src), jnp.asarray(dirs), samples, rcfg
        )
        cases.append(
            CaseSpec(
                t1=path,
                target=np.asarray(frame),
                mask=np.ones(frame.shape, bool),
                source=src,
                directions=dirs,
            )
        )
    prep_s = time.perf_counter() - t0

    cfg = ImpedanceTrainConfig(
        num_samples=samples, slice_index=dim // 2, lr=0.01,
        loss="masked_mse_edge", render=rcfg,
    )
    ckpt = os.path.join(tmp, "ckpt")
    metrics = os.path.join(tmp, "metrics.jsonl")
    t0 = time.perf_counter()
    params, hist = train_impedance_cases(
        jax.random.PRNGKey(0), cases, cfg, epochs=2, batch_size=batch,
        checkpoint_dir=ckpt, metrics_path=metrics, loader_threads=8,
    )
    train_s = time.perf_counter() - t0
    steps = len(hist)

    # resume one more epoch from the checkpoint
    t0 = time.perf_counter()
    _, hist2 = train_impedance_cases(
        jax.random.PRNGKey(0), cases, cfg, epochs=3, batch_size=batch,
        checkpoint_dir=ckpt, resume=True,
    )
    resume_s = time.perf_counter() - t0

    out = {
        "native_decoder": native_available(),
        "cases": n_cases,
        "prep_s": round(prep_s, 2),
        "train_2epochs_s": round(train_s, 2),
        "ms_per_step": round(train_s / max(steps, 1) * 1e3, 1),
        "steps": steps,
        "resume_steps": len(hist2),
        "resume_s": round(resume_s, 2),
        "loss_first": round(float(hist[0]), 6),
        "loss_last": round(float(hist[-1]), 6),
        "metrics_lines": sum(1 for _ in open(metrics)),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
