"""Round-5 probe (part 2): training-step backward levers.

probe_train_r5 attributed the 4.3 ms step as ~2.1 forward / ~2.7
backward / ~0 Adam, with nearest mode saving ~1.1 ms (the
trilinear-tile gather chain's share of the backward).  This probe
measures the remaining lever candidates at the same config:
  - step_mse_bf16: interp='trilinear_bf16' (ONE gather/sample instead
    of two; corner values bf16 — gradients w.r.t. gather VALUES keep
    f32 weights, so parameter gradients stay usable)
  - step_mse at chunk-irrelevant single frame with use_pallas (the
    fused propagation kernel's custom_vjp in the training backward)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_train2_r5.py
"""

from __future__ import annotations

import json

import numpy as np

DIM = 128
RAYS = 256
SAMPLES = 256
IMG = (128, 128)
ITERS = 24


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import optax

    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.impedance.mlp import init_params
    from diffus_tpu.ops.splat import splat_frame
    from diffus_tpu.phantoms import brain_phantom_3d, t1_phantom_3d
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.train.impedance_train import ImpedanceTrainConfig, train_step
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, robust_readback_time_ms

    rng = np.random.default_rng(0)
    out = {
        "config": f"{RAYS}x{SAMPLES}x{DIM}^3, image {IMG[0]}^2",
        "sync_ms": round(measure_sync_ms(), 2),
    }
    vol = jnp.asarray(brain_phantom_3d((DIM,) * 3))
    t1 = jnp.asarray(t1_phantom_3d((DIM,) * 3))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), RAYS)
    base = np.array([DIM / 2, 4.0, DIM / 2], np.float32)
    srcs = [
        jnp.asarray(base + rng.uniform(-4, 4, 3).astype(np.float32))
        for _ in range(6 * (ITERS + 2))
    ]
    params = init_params(jax.random.PRNGKey(0))
    mask = jnp.ones(IMG, bool)

    def mk_cfg(interp, use_pallas=False):
        return ImpedanceTrainConfig(
            num_samples=SAMPLES, slice_index=DIM // 2, lr=0.01,
            loss="masked_mse_edge", image_shape=IMG, splat_axes=(0, 1),
            render=RenderConfig(
                attenuation_coeff=1e-4, interp=interp, use_pallas=use_pallas
            ),
        )

    tcfg = mk_cfg("trilinear")
    x, y, _, frame = render_frame(vol, srcs[0], dirs, SAMPLES, tcfg.render)
    target = splat_frame((x, y, None), frame, (0, 1), IMG)
    opt_state = optax.adam(tcfg.lr).init(params)

    variants = {
        "step_mse_trilinear": tcfg,               # within-session baseline
        "step_mse_bf16tile": mk_cfg("trilinear_bf16"),
        "step_mse_tri_pallas": mk_cfg("trilinear", use_pallas=True),
    }
    for i, (name, cfg) in enumerate(variants.items()):
        fn = lambda src, c=cfg: train_step(
            params, opt_state, t1, target, mask, src, dirs, c
        )[2]
        args = [(srcs[i * (ITERS + 2) + j],) for j in range(ITERS + 2)]
        ms = robust_readback_time_ms(fn, args, n=ITERS, repeats=4)
        out[name + "_ms"] = round(ms, 3)
        # training usefulness: the loss must actually decrease over a few
        # steps in each mode (5 steps, fresh params)
        p, s = params, opt_state
        losses = []
        for k in range(5):
            p, s, loss = train_step(p, s, t1, target, mask, srcs[0], dirs, cfg)
            losses.append(float(loss))
        out[name + "_loss_first_last"] = [round(losses[0], 5), round(losses[-1], 5)]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
