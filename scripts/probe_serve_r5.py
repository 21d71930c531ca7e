"""Round-5 probe: multi-scene serving on real hardware (VERDICT r4 #6).

Drives a RendererService with THREE resident cases (two 128^3 scenes
sharing compiled tier programs + one content-cropped 192^3 scene) and
measures:
  1. per-scene routing correctness (frames match per-case functional
     renders) and warmup cost with the shared jit cache (the second
     same-shape scene must add ~zero compile);
  2. steady-state per-scene request latency interleaved across scenes
     (the jit cache must not thrash between resident cases);
  3. burst isolation: 8 concurrent singletons split 4/4 across two
     scenes must dispatch as >=2 and <=4 batches (never one mixed
     batch, still coalesced within each scene), with every frame
     matching its scene;
  4. add_scene/update_volume(allow_reshape)/remove_scene lifecycle on
     hardware.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_serve_r5.py
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

    import jax.numpy as jnp
    import numpy as np

    from diffus_tpu.phantoms import brain_phantom_3d, t1_phantom_3d
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.serve import RendererService
    from diffus_tpu.types import BeamGeometry, RenderConfig

    dim = 128
    vol_a = brain_phantom_3d((dim,) * 3)
    vol_b = np.roll(np.asarray(vol_a), dim // 4, axis=1)
    big = np.zeros((192,) * 3, np.float32)
    big[32:160, 32:160, 32:160] = np.asarray(vol_a)
    geom = BeamGeometry(n_rays=64, num_samples=128)
    cfg = RenderConfig(attenuation_coeff=1e-4)
    rng = np.random.default_rng(5)
    base = np.array([dim / 2, 4.0, dim / 2], np.float32)

    def srcs(n):
        return [base + rng.uniform(-4, 4, 3).astype(np.float32) for _ in range(n)]

    out = {}
    svc = RendererService(vol_a, geom, cfg, batch_tiers=(1, 8))
    t0 = time.perf_counter()
    out["warmup_default_s"] = round(svc.warmup(), 2)
    svc.add_scene("case_b", vol_b)
    t0 = time.perf_counter()
    out["warmup_after_same_shape_scene_s"] = round(svc.warmup(), 2)  # ~0: dedup
    svc.add_scene("big_crop", big, crop=True, crop_margin=4)
    out["warmup_after_crop_scene_s"] = round(svc.warmup(), 2)  # compiles new shape
    out["scenes"] = svc.scenes()

    # 1. routing correctness per scene
    s0 = srcs(1)[0]
    f_a = np.asarray(svc.render(s0)[0])
    f_b = np.asarray(svc.render(s0, scene="case_b")[0])
    f_c = np.asarray(svc.render(s0 + np.float32(32.0), scene="big_crop")[0])
    want_a = np.asarray(render_frame(jnp.asarray(vol_a), jnp.asarray(s0),
                                     svc.directions, 128, cfg)[3])
    out["route_a_err"] = float(np.max(np.abs(f_a - want_a)))
    out["scenes_differ"] = bool(not np.allclose(f_a, f_b))
    # crop contract: the service's cropped render in ORIGINAL 192^3
    # coordinates must match the uncropped functional render
    want_c = np.asarray(render_frame(jnp.asarray(big),
                                     jnp.asarray(s0 + np.float32(32.0)),
                                     svc.directions, 128, cfg)[3])
    out["crop_scene_err"] = float(np.max(np.abs(f_c - want_c)))

    # 2. steady-state latency interleaved across scenes (jit cache must
    # not thrash between resident cases)
    lat = {"default": [], "case_b": []}
    for s in srcs(24):
        for name in ("default", "case_b"):
            t0 = time.perf_counter()
            np.asarray(svc.render(s + (0.0 if name == "default" else 0.25),
                                  scene=name))
            lat[name].append((time.perf_counter() - t0) * 1e3)
    for name, ls in lat.items():
        out[f"interleaved_ms_{name}"] = round(float(np.median(ls[4:])), 2)

    # 3. burst isolation: 8 singletons, 4 per scene, concurrent
    for round_i in range(2):
        before = svc.snapshot_stats()["batches"]
        barrier = threading.Barrier(8)
        inputs = [(s, "default" if i % 2 == 0 else "case_b")
                  for i, s in enumerate(srcs(8))]

        def one(arg):
            s, scene = arg
            barrier.wait()
            return scene, np.asarray(svc.render(s, scene=scene)), s

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(one, inputs))
        out[f"burst{round_i}_wall_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        out[f"burst{round_i}_batches"] = svc.snapshot_stats()["batches"] - before
        if round_i == 0:
            worst = 0.0
            for scene, got, s in results:
                v = vol_a if scene == "default" else vol_b
                want = np.asarray(render_frame(jnp.asarray(v), jnp.asarray(s),
                                               svc.directions, 128, cfg)[3])
                worst = max(worst, float(np.max(np.abs(got[0] - want))))
            out["burst_cross_scene_max_err"] = worst

    # 4. lifecycle: reshape update + removal
    t0 = time.perf_counter()
    svc.update_volume(t1_phantom_3d((96, 96, 96)), scene="case_b",
                      allow_reshape=True)
    svc.warmup(scene="case_b")
    out["reshape_update_and_rewarm_s"] = round(time.perf_counter() - t0, 2)
    out["case_b_shape_after"] = svc.scenes()["case_b"]["shape"]
    f = np.asarray(svc.render(np.array([48.0, 4.0, 48.0], np.float32),
                              scene="case_b"))
    out["reshaped_render_finite"] = bool(np.all(np.isfinite(f)))
    svc.remove_scene("big_crop")
    out["scenes_after_remove"] = sorted(svc.scenes())
    out["per_scene_stats"] = svc.snapshot_stats()["scenes"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
