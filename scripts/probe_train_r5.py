"""Round-5 probe: training-step attribution (VERDICT r4 #4).

The render got four probes and a placement model; the train step was a
single number.  This probe decomposes the headline training step
(bench.py config 3: 128^3 volume, 256 rays x 256 samples, trilinear,
128^2 splat image, masked-MSE+edge and SSIM losses) into
forward render / forward splat / loss / backward segments, measures the
``remat`` flag's actual time + compiled-memory tradeoff, and times the
documented nearest-mode fast path at the same config.

Attribution method: time nested jitted programs and difference them —
  render_fwd      = MLP + substitute + render (sum)
  synth_fwd       = ... + splat
  loss_fwd        = ... + loss (the full forward)
  grad_render     = value_and_grad of render_fwd  (backward through
                    gather/scan only)
  grad_full       = value_and_grad of the full loss
  step            = grad_full + Adam (the shipped train_step)
Backward-only costs are (grad_X - X_fwd); the splat's forward+backward
is (grad_full - grad_render) - (loss - render_fwd-ish); exact algebra in
the output keys.  CAVEATS measured the hard way: (1) grads must be
CONSUMED in the returned scalar or the outer jit DCEs the whole
backward; (2) grad of a plain sum(render) degenerates (constant
cotangents let XLA collapse the gather transpose) — the honest backward
number is grad_full - fwd_loss; (3) memory_analysis() through the axon
relay reports a ~1.5 MB local stub, not device HBM, so remat is judged
by time + analytic residual sizes; (4) relay variance swings absolute
numbers ~2x BETWEEN runs (sync 25-38 ms) — only within-run differences
are meaningful.

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_train_r5.py
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
    from diffus_tpu.train.impedance_train import (
        ImpedanceTrainConfig,
        synth_forward,
        train_step,
        _loss_value,
    )
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.utils.timing import measure_sync_ms, robust_readback_time_ms

    rng = np.random.default_rng(0)
    sync = measure_sync_ms()
    out = {
        "config": f"{RAYS}x{SAMPLES}x{DIM}^3, image {IMG[0]}^2 (bench.py config 3)",
        "sync_ms": round(sync, 2),
    }

    vol = jnp.asarray(brain_phantom_3d((DIM,) * 3))
    t1 = jnp.asarray(t1_phantom_3d((DIM,) * 3))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), RAYS)
    base = np.array([DIM / 2, 4.0, DIM / 2], np.float32)
    srcs = [
        jnp.asarray(base + rng.uniform(-4, 4, 3).astype(np.float32))
        for _ in range(12 * (ITERS + 2))
    ]
    params = init_params(jax.random.PRNGKey(0))
    mask = jnp.ones(IMG, bool)

    def mk_cfg(loss, interp, remat=False):
        return ImpedanceTrainConfig(
            num_samples=SAMPLES, slice_index=DIM // 2, lr=0.01,
            loss=loss, image_shape=IMG, splat_axes=(0, 1), remat=remat,
            render=RenderConfig(attenuation_coeff=1e-4, interp=interp),
        )

    tcfg = mk_cfg("masked_mse_edge", "trilinear")
    x, y, _, frame = render_frame(vol, srcs[0], dirs, SAMPLES, tcfg.render)
    target = splat_frame((x, y, None), frame, (0, 1), IMG)
    opt_state = optax.adam(tcfg.lr).init(params)

    def render_part(p, src, cfg):
        """MLP + substitute + render (no splat/loss)."""
        x_slice = t1[:, :, cfg.slice_index]
        from diffus_tpu.impedance.mlp import impedance_slice_zscore

        z_slice = impedance_slice_zscore(p, x_slice, hidden=tuple(cfg.hidden))
        z_vol = t1.at[:, :, cfg.slice_index].set(z_slice)
        return render_frame(z_vol, src, dirs, cfg.num_samples, cfg.render)[3]

    def full_loss(p, src, cfg, tgt):
        image = synth_forward(p, t1, src, dirs, cfg)
        return _loss_value(image, tgt, mask, cfg)

    def consume(val, grads):
        """Fold the gradient pytree into the returned scalar so the
        backward pass cannot be dead-code-eliminated (returning only the
        loss from an OUTER jit silently DCEs value_and_grad's backward —
        the first version of this probe 'measured' grad == fwd time)."""
        return val + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))

    variants = {}
    # forward segments (outer jit is fine: everything feeds the output)
    variants["fwd_render"] = jax.jit(
        lambda src: jnp.sum(render_part(params, src, tcfg))
    )
    variants["fwd_synth"] = jax.jit(
        lambda src: jnp.sum(synth_forward(params, t1, src, dirs, tcfg))
    )
    variants["fwd_loss"] = jax.jit(
        lambda src: full_loss(params, src, tcfg, target)
    )
    # backward segments: consume the grads
    variants["grad_render"] = jax.jit(
        lambda src: consume(
            *jax.value_and_grad(lambda p: jnp.sum(render_part(p, src, tcfg)))(
                params
            )
        )
    )
    variants["grad_full"] = jax.jit(
        lambda src: consume(
            *jax.value_and_grad(lambda p: full_loss(p, src, tcfg, target))(
                params
            )
        )
    )
    # shipped steps: train_step is ITSELF the jit boundary — indexing [2]
    # happens on the host after execution, so nothing is DCE'd
    variants["step_mse"] = lambda src: train_step(
        params, opt_state, t1, target, mask, src, dirs, tcfg
    )[2]
    scfg = mk_cfg("ssim", "trilinear")
    variants["step_ssim"] = lambda src: train_step(
        params, opt_state, t1, target, mask, src, dirs, scfg
    )[2]
    rcfg = mk_cfg("masked_mse_edge", "trilinear", remat=True)
    variants["step_mse_remat"] = lambda src: train_step(
        params, opt_state, t1, target, mask, src, dirs, rcfg
    )[2]
    # nearest-mode fast path (gradients flow through gather VALUES)
    ncfg = mk_cfg("masked_mse_edge", "nearest")
    variants["step_mse_nearest"] = lambda src: train_step(
        params, opt_state, t1, target, mask, src, dirs, ncfg
    )[2]

    for i, (name, fn) in enumerate(variants.items()):
        args = [(srcs[i * (ITERS + 2) + j],) for j in range(ITERS + 2)]
        ms = robust_readback_time_ms(fn, args, n=ITERS, repeats=4)
        out[name + "_ms"] = round(ms, 3)

    # derived attribution (masked-MSE config)
    out["attr_splat_loss_fwd_ms"] = round(
        out["fwd_loss_ms"] - out["fwd_render_ms"], 3
    )
    out["attr_render_bwd_ms"] = round(
        out["grad_render_ms"] - out["fwd_render_ms"], 3
    )
    out["attr_splat_loss_bwd_ms"] = round(
        (out["grad_full_ms"] - out["grad_render_ms"])
        - (out["fwd_loss_ms"] - out["fwd_render_ms"]),
        3,
    )
    out["attr_adam_ms"] = round(out["step_mse_ms"] - out["grad_full_ms"], 3)

    # NOTE: compiled memory_analysis() through the axon relay reports the
    # local stub (~1.5 MB temp), not device HBM — remat is therefore
    # assessed by measured TIME above plus the analytic residual sizes
    # (tile gather residuals: 2 x (rays x samples x 128) f32 rows =
    # 67 MB/frame at this config, 134 MB at the 512-sample headline).

    print(json.dumps(out))


if __name__ == "__main__":
    main()
