"""Round-5 probe 1: the SINGLE-CONSUMER K=2 sampler (VERDICT r4 next #1).

The r4 K=2 variants lost 1.6-2x end-to-end because each gathered x-plane
row fed two consumers (even + odd sample reductions), forcing XLA to
materialize the row arrays its gather fusion otherwise never writes.
``sample_trilinear_tile_k2i`` rebuilds the pair sampler so each gathered
row has exactly ONE weighted-sum consumer (per-sample weights with the
x-plane weight folded in; pair rows broadcast to sample rank).

Measures END-TO-END through render_sweep at the headline config
(sampler-level A/B harnesses mislead — docs/benchmarking.md r4), plus:
  - compiled temp bytes (memory_analysis) per variant — the
    materialization signature;
  - HLO-level evidence: counts of gather instructions that appear in the
    ENTRY computation (materialized result) vs inside fused computations.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_k2i_r5.py
"""

from __future__ import annotations

import json

import numpy as np

D = 256
N_RAYS = 256
S = 512
P = 32
ITERS = 10


def _hlo_gather_placement(text: str):
    """Count gather ops per computation kind in compiled HLO text.

    Fused gathers live inside ``%fused_computation``-style blocks; a
    gather in the ENTRY block materializes its full result to memory.
    """
    entry = 0
    fused = 0
    in_entry = False
    for line in text.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            in_entry = True
        elif ls.startswith("}"):
            in_entry = False
        if " gather(" in ls or ls.startswith("gather("):
            if in_entry:
                entry += 1
            else:
                fused += 1
    return {"entry_gathers": entry, "fused_gathers": fused}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, readback_time_ms

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, D, D), np.float32) * 2.0 + 0.5)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), N_RAYS)
    base = np.array([D / 2.0, 4.0, D / 2.0], np.float32)
    variants = ("trilinear_tile", "trilinear_tile_k2i")
    sets = [
        jnp.asarray(base[None, :] + rng.uniform(-8, 8, (P, 3)).astype(np.float32))
        for _ in range(len(variants) * (ITERS + 1) + 1)
    ]
    sync = measure_sync_ms()
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    out = {
        "sync_ms": round(sync, 2),
        "config": f"{N_RAYS}x{S}x{D}^3, P={P}",
        "jax_version": jax.__version__,
    }

    orig_resolve = rmod._resolve_sampler

    def force(variant):
        def f(interp, num_samples=0, step=1.0):
            r = orig_resolve(interp, num_samples, step)
            return variant if r in (
                "trilinear_tile", "trilinear_tile_k2", "trilinear_tile_k2i"
            ) else r
        return f

    # correctness on device: k2i render vs tile render
    probe_src = sets[-1][:4]
    rmod._resolve_sampler = force("trilinear_tile_k2i")
    f_k2i = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
    rmod._resolve_sampler = force("trilinear_tile")
    f_tile = rmod.render_sweep(vol, probe_src, dirs, S, cfg)[3]
    rmod._resolve_sampler = orig_resolve
    scale = float(jnp.max(jnp.abs(f_tile)))
    out["k2i_vs_tile_render_max_rel_err"] = float(
        jnp.max(jnp.abs(f_k2i - f_tile))
    ) / (scale + 1e-30)
    out["k2i_frames_finite"] = bool(jnp.all(jnp.isfinite(f_k2i)))

    for vi, variant in enumerate(variants):
        rmod._resolve_sampler = force(variant)
        fn = jax.jit(lambda v, s, d: rmod.render_sweep(v, s, d, S, cfg)[3])
        name = variant.replace("trilinear_", "")
        # compile once; collect memory + HLO placement evidence
        lowered = fn.lower(vol, sets[0], dirs)
        compiled = lowered.compile()
        try:
            mem = compiled.memory_analysis()
            out[name + "_temp_mb"] = round(mem.temp_size_in_bytes / 1e6, 1)
        except Exception as e:
            out[name + "_temp_mb"] = f"unavailable: {e}"
        try:
            out[name + "_hlo"] = _hlo_gather_placement(compiled.as_text())
        except Exception as e:
            out[name + "_hlo"] = f"unavailable: {e}"
        args = [(vol, sets[vi * (ITERS + 1) + j], dirs) for j in range(ITERS + 1)]
        ms = readback_time_ms(fn, args, n=ITERS, sync_ms=sync)
        out[name + "_ms_per_frame"] = round(ms / P, 4)
        out[name + "_fps"] = round(P / ms * 1e3, 1)
    rmod._resolve_sampler = orig_resolve

    print(json.dumps(out))


if __name__ == "__main__":
    main()
