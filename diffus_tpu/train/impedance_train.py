"""Renderer-in-the-loop impedance training (the reference's flagship app).

TPU-native rebuild of ``ImpedanceLearner`` + ``UltrasoundSynthesisModel``
(``[DEMO] Train MRI to Impedance MLP - GPU.ipynb`` cell 16, ``[DEMO]
REUBEN DATA 46.ipynb`` cell 11): an MLP maps a T1 slice to impedance, the
slice is substituted into the volume, the differentiable renderer + splat
produce a synthetic B-mode image, and an image loss (SSIM or masked
MSE+edge) backpropagates through the *entire* render — scan solver
included — into the MLP weights.

Everything (forward render, loss, grad, Adam update) is one jitted
``train_step``; epochs run as ``lax.scan`` for zero Python overhead, and
the step is shardable over a device mesh (see ``diffus_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_frame
from diffus_tpu.impedance.mlp import impedance_slice_zscore, init_params
from diffus_tpu.ops.splat import splat_frame
from diffus_tpu.train.losses import ssim_loss, masked_mse_edge_loss


@dataclasses.dataclass(frozen=True)
class ImpedanceTrainConfig:
    """Static training configuration.

    Defaults follow the GPU notebook: Adam lr 0.01, 50 epochs, start=110
    absolute sample skip, SSIM loss (cells 16-18).
    """

    hidden: tuple = (32, 32)
    lr: float = 0.01
    epochs: int = 50
    num_samples: int = 512
    slice_index: int = 128
    loss: str = "ssim"  # "ssim" | "masked_mse_edge"
    edge_weight: float = 0.5
    remat: bool = False  # jax.checkpoint the render: recompute instead of
                         # storing sampler residuals in the backward pass
                         # (8 gathered corner arrays can reach ~0.5 GB/frame
                         # at the 256-ray x 512-sample config)
    image_shape: tuple = (256, 256)
    splat_sigma: float = 2.0
    splat_axes: tuple = (0, 1)
    render: RenderConfig = RenderConfig(attenuation_coeff=1e-4, start=110)


def synth_forward(params, t1_volume, source, directions, cfg: ImpedanceTrainConfig):
    """Differentiable forward: T1 slice -> Z slice -> substituted volume ->
    render -> splat image.

    Mirrors ``ImpedanceLearner.training_forward`` (GPU nb cell 16): the MLP
    maps the z-scored slice ``x[:, :, k]``, the prediction (scaled 1e6) is
    substituted into a copy of the volume, and the frame is rendered.
    """
    x_slice = t1_volume[:, :, cfg.slice_index]
    z_slice = impedance_slice_zscore(params, x_slice, hidden=tuple(cfg.hidden))
    z_vol = t1_volume.at[:, :, cfg.slice_index].set(z_slice)

    render = render_frame
    if cfg.remat:
        render = jax.checkpoint(
            render_frame, static_argnums=(3, 4)
        )
    x, y, z, intensities = render(
        z_vol, source, directions, cfg.num_samples, cfg.render
    )
    return splat_frame(
        (x, y, z), intensities, cfg.splat_axes, cfg.image_shape, cfg.splat_sigma
    )


def _loss_value(image, us_real_norm, mask, cfg: ImpedanceTrainConfig):
    if cfg.loss == "ssim":
        return ssim_loss(image, us_real_norm)
    if cfg.loss == "masked_mse_edge":
        return masked_mse_edge_loss(image, us_real_norm, mask, cfg.edge_weight)
    raise ValueError(f"unknown loss {cfg.loss!r}")


@partial(jax.jit, static_argnames=("cfg",))
def train_step(
    params,
    opt_state,
    t1_volume,
    us_real_norm,
    mask,
    source,
    directions,
    cfg: ImpedanceTrainConfig,
):
    """One Adam step through the full differentiable render."""
    tx = optax.adam(cfg.lr)

    def loss_fn(p):
        image = synth_forward(p, t1_volume, source, directions, cfg)
        return _loss_value(image, us_real_norm, mask, cfg)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@partial(jax.jit, static_argnames=("cfg",))
def train_impedance_scan(
    params, t1_volume, us_real_norm, mask, source, directions, cfg: ImpedanceTrainConfig
):
    """Full training run as one compiled ``lax.scan`` over epochs.

    Returns ``(params, losses)``; the reference's 50-epoch Python loop
    with CUDA-memory prints becomes a single XLA program.
    """
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        image = synth_forward(p, t1_volume, source, directions, cfg)
        return _loss_value(image, us_real_norm, mask, cfg)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=cfg.epochs)
    return params, losses


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _train_chunk(params, opt_state, t1_volume, us_norm, mask, source, directions,
                 cfg: ImpedanceTrainConfig, n_steps: int):
    """Jitted n-step training chunk carrying the optimizer state — cached
    across chunks and resumes (the closure-per-chunk version recompiled
    every chunk)."""
    tx = optax.adam(cfg.lr)

    def loss_fn(p):
        image = synth_forward(p, t1_volume, source, directions, cfg)
        return _loss_value(image, us_norm, mask, cfg)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), None, length=n_steps
    )
    return params, opt_state, losses


def train_impedance_checkpointed(
    key,
    t1_volume,
    us_real,
    source,
    directions,
    cfg: ImpedanceTrainConfig,
    checkpoint_dir: str,
    chunk: int = 10,
    mask: Optional[jax.Array] = None,
    metrics_path: Optional[str] = None,
):
    """Training with periodic orbax checkpoints and JSONL metrics.

    The fully-scanned loop can't checkpoint mid-program, so epochs run in
    compiled chunks of ``chunk`` steps with a checkpoint + metrics record
    between chunks.  Restarting with the same ``checkpoint_dir`` resumes
    from the last saved state (checkpoint/resume subsystem the reference
    lacks, SURVEY section 5).

    Returns ``(params, losses)``.
    """
    import os

    import numpy as np

    from diffus_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    from diffus_tpu.train.metrics import MetricsLogger

    import optax

    tx = optax.adam(cfg.lr)
    us_real = jnp.asarray(us_real, jnp.float32)
    us_norm = (us_real - jnp.min(us_real)) / (jnp.max(us_real) - jnp.min(us_real) + 1e-8)
    if mask is None:
        mask = jnp.ones_like(us_norm, dtype=bool)

    from diffus_tpu.impedance.mlp import init_params

    ckpt_path = os.path.join(checkpoint_dir, "latest")
    params = init_params(key, cfg.hidden)
    opt_state = tx.init(params)
    done = 0
    if os.path.exists(ckpt_path):
        # restore with a structure template: orbax alone would return the
        # optax state as plain dicts and break tx.update
        template = {"params": params, "opt_state": opt_state, "step": np.int32(0)}
        state = load_checkpoint(ckpt_path, template)
        params, opt_state, done = state["params"], state["opt_state"], int(state["step"])

    losses = []
    log = MetricsLogger(metrics_path)
    try:
        while done < cfg.epochs:
            n = min(chunk, cfg.epochs - done)
            params, opt_state, chunk_losses = _train_chunk(
                params, opt_state, t1_volume, us_norm, mask, source, directions,
                cfg, n,
            )
            losses.append(np.asarray(chunk_losses))
            done += n
            save_checkpoint(
                ckpt_path,
                {"params": params, "opt_state": opt_state, "step": np.int32(done)},
            )
            log.log(done, loss=float(chunk_losses[-1]))
    finally:
        log.close()
    return params, jnp.asarray(np.concatenate(losses)) if losses else jnp.zeros((0,))


def train_impedance(
    key,
    t1_volume,
    us_real,
    source,
    directions,
    cfg: ImpedanceTrainConfig = ImpedanceTrainConfig(),
    mask: Optional[jax.Array] = None,
    pretrain_table: bool = False,
):
    """Convenience entry: init params (optionally table-pretrained),
    normalize the target like the reference (min-max, GPU nb cell 16),
    run the scan-compiled fit."""
    if pretrain_table:
        # warm-start from the tissue table (REUBEN cell 1's pretraining):
        # the renderer-in-the-loop loss landscape is rough; starting from
        # a physically-plausible intensity->Z curve stabilizes it
        from diffus_tpu.impedance.table import table_arrays
        from diffus_tpu.impedance.mlp import fit_table_mlp

        tx_, ty_, _ = table_arrays()
        params, _ = fit_table_mlp(key, tx_, ty_, hidden=cfg.hidden, epochs=1000, lr=0.01)
    else:
        params = init_params(key, cfg.hidden)
    us_real = jnp.asarray(us_real, jnp.float32)
    us_norm = (us_real - jnp.min(us_real)) / (jnp.max(us_real) - jnp.min(us_real) + 1e-8)
    if mask is None:
        mask = jnp.ones_like(us_norm, dtype=bool)
    params, losses = train_impedance_scan(
        params,
        jnp.asarray(t1_volume, jnp.float32),
        us_norm,
        mask,
        jnp.asarray(source, jnp.float32),
        jnp.asarray(directions, jnp.float32),
        cfg,
    )
    return params, losses
