"""Sharded workloads: multi-pose sweep rendering and data-parallel training.

GSPMD/pjit versions of the two multi-chip workloads the framework needs
(SURVEY section 2.3 / 5): (a) pose-sharded sweep renders (the
animation.gif workload at fleet scale), (b) pose-data-parallel +
ray-sharded impedance training with the renderer in the loop.  Sharding
is declared with ``NamedSharding`` and XLA inserts the collectives
(grad psum over ``pose``; loss reduction over ``ray``) on ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_frame, render_sweep
from diffus_tpu.impedance.mlp import impedance_slice_zscore
from diffus_tpu.train.losses import masked_mse_edge_loss


def sharded_render_sweep(
    mesh: Mesh,
    volume: jax.Array,
    sources: jax.Array,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = RenderConfig(),
):
    """Multi-pose sweep with poses sharded over the ``pose`` axis and rays
    over ``ray``; the volume is replicated (a 256^3 f32 volume is 64 MB —
    comfortably replicable in HBM).

    Returns device-sharded ``(x, y, z, frames)`` with a leading pose axis.
    """
    if directions.ndim == 2:
        directions = jnp.broadcast_to(
            directions[None], (sources.shape[0],) + directions.shape
        )
    vol_s = jax.device_put(volume, NamedSharding(mesh, P()))
    src_s = jax.device_put(sources, NamedSharding(mesh, P("pose")))
    dir_s = jax.device_put(directions, NamedSharding(mesh, P("pose", "ray")))

    fn = jax.jit(
        lambda v, s, d: render_sweep(v, s, d, num_samples, config),
        static_argnames=(),
    )
    return fn(vol_s, src_s, dir_s)


def make_sharded_train_step(mesh: Mesh, cfg, hidden=(32, 32), lr: float = 0.01):
    """Data-parallel renderer-in-the-loop training step over the mesh.

    The batch axis (scenes: volume/targets/pose per element) shards over
    ``pose``; within each scene, fan rays shard over ``ray``.  Params are
    replicated; ``jax.grad`` of the pose-mean loss makes GSPMD emit the
    gradient all-reduce over ``pose`` and the loss reduction over ``ray``
    — both ICI collectives, no manual psum.

    ``cfg`` is an :class:`~diffus_tpu.train.impedance_train.ImpedanceTrainConfig`
    (frame-level ``masked_mse_edge`` loss: the ``[DEMO] Z with aligned
    MRI US.ipynb`` cell 25 objective, which operates on (rays, depth)
    maps and therefore shards cleanly over rays).

    Returns ``(step_fn, init_opt_state)``; ``step_fn(params, opt_state,
    batch)`` -> ``(params, opt_state, loss)`` with
    ``batch = (t1_volumes[B,...], targets[B,R,S'], masks[B,R,S'],
    sources[B,3], directions[B,R,3])``.
    """
    tx = optax.adam(lr)

    def scene_loss(params, t1_volume, target, mask, source, directions):
        x_slice = t1_volume[:, :, cfg.slice_index]
        z_slice = impedance_slice_zscore(params, x_slice, hidden=tuple(hidden))
        z_vol = t1_volume.at[:, :, cfg.slice_index].set(z_slice)
        _, _, _, frame = render_frame(
            z_vol, source, directions, cfg.num_samples, cfg.render
        )
        return masked_mse_edge_loss(frame, target, mask, cfg.edge_weight)

    def batch_loss(params, batch):
        t1, targets, masks, sources, directions = batch
        losses = jax.vmap(scene_loss, in_axes=(None, 0, 0, 0, 0, 0))(
            params, t1, targets, masks, sources, directions
        )
        return jnp.mean(losses)

    replicated = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        out_shardings=(replicated, replicated, replicated),
    )
    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(batch_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, tx.init


def shard_batch(mesh: Mesh, batch):
    """Place a training batch on the mesh: scene axis over ``pose``, ray
    axis (where present) over ``ray``."""
    t1, targets, masks, sources, directions = batch
    put = jax.device_put
    return (
        put(t1, NamedSharding(mesh, P("pose"))),
        put(targets, NamedSharding(mesh, P("pose", "ray"))),
        put(masks, NamedSharding(mesh, P("pose", "ray"))),
        put(sources, NamedSharding(mesh, P("pose"))),
        put(directions, NamedSharding(mesh, P("pose", "ray"))),
    )
