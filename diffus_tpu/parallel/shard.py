"""Sharded workloads: multi-pose sweep rendering and data-parallel training.

GSPMD/pjit versions of the two multi-chip workloads the framework needs
(SURVEY section 2.3 / 5): (a) pose-sharded sweep renders (the
animation.gif workload at fleet scale), (b) pose-data-parallel +
ray-sharded impedance training with the renderer in the loop.  Sharding
is declared with ``NamedSharding`` and XLA inserts the collectives
(grad psum over ``pose``; loss reduction over ``ray``) on ICI.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffus_tpu.types import RenderConfig, TransducerPose
from diffus_tpu.render.renderer import render_frame, render_sweep
from diffus_tpu.impedance.mlp import impedance_slice_zscore
from diffus_tpu.train.losses import masked_mse_edge_loss, ssim_loss


def _pad_axis(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Pad ``axis`` up to the next multiple by repeating the last slice
    (rendering a duplicated pose/ray is wasted-but-valid work, unlike
    zeros, which would produce degenerate zero-direction rays)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if not pad:
        return x
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    reps = [1] * x.ndim
    reps[axis] = pad
    return jnp.concatenate([x, jnp.tile(last, reps)], axis=axis)


@lru_cache(maxsize=64)
def _sweep_jit(num_samples: int, config: RenderConfig, step: float):
    """Compile-once jitted sweep shared across calls/services.

    A fresh ``jax.jit(lambda ...)`` per call (the r3 code) started with an
    empty trace cache, so every serving request retraced the whole sweep
    (ADVICE r3, medium).  The jit cache itself keys on input shapes AND
    shardings, so one cached wrapper per static config serves every mesh.
    """
    return jax.jit(
        lambda v, s, d: render_sweep(v, s, d, num_samples, config, step=step)
    )


def sharded_render_sweep(
    mesh: Mesh,
    volume: jax.Array,
    sources: jax.Array,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = RenderConfig(),
    step: float = 1.0,
):
    """Multi-pose sweep with poses sharded over the ``pose`` axis and rays
    over ``ray``; the volume is replicated (a 256^3 f32 volume is 64 MB —
    comfortably replicable in HBM).

    Non-divisible sizes (the documented contract — PARITY.md, "sharding
    contract"): POSE counts that don't divide the mesh axis are padded
    (repeating the last pose), rendered sharded, and sliced back — poses
    are independent, so callers never see the padding.  RAY counts are
    padded only when the render has no cross-ray coupling; with
    ``config.start > 0`` (the start patch takes a median ACROSS rays,
    reference ``renderer.py:243``) or ``config.artifacts`` (lateral blur
    and sharpen mix neighboring rays) padded rays would contaminate real
    ones, so those configurations raise instead.  The training step
    refuses all non-divisible batches (padding would change the mean
    loss).

    ``step`` is the voxel length of one depth sample
    (``BeamGeometry.step``), passed through to the render.

    Returns device-sharded ``(x, y, z, frames)`` with a leading pose axis.
    """
    n_pose, n_ray = sources.shape[0], directions.shape[-2]
    if directions.ndim == 2:
        directions = jnp.broadcast_to(
            directions[None], (n_pose,) + directions.shape
        )
    pose_m, ray_m = mesh.shape["pose"], mesh.shape["ray"]
    if n_ray % ray_m and (config.start_index(num_samples) > 0 or config.artifacts):
        raise ValueError(
            f"n_rays={n_ray} does not divide the mesh ray axis ({ray_m}) and "
            "the config couples rays (start>0 median patch / artifacts): ray "
            "padding would corrupt real rays — use a divisible ray count"
        )
    sources = _pad_axis(sources, 0, pose_m)
    directions = _pad_axis(_pad_axis(directions, 0, pose_m), 1, ray_m)

    vol_s = jax.device_put(volume, NamedSharding(mesh, P()))
    src_s = jax.device_put(sources, NamedSharding(mesh, P("pose")))
    dir_s = jax.device_put(directions, NamedSharding(mesh, P("pose", "ray")))

    out = _sweep_jit(num_samples, config, step)(vol_s, src_s, dir_s)
    if sources.shape[0] != n_pose or directions.shape[1] != n_ray:
        out = tuple(o[:n_pose, :n_ray] for o in out)
    return out


def make_sharded_train_step(mesh: Mesh, cfg, lr: float = 0.01):
    """Data-parallel renderer-in-the-loop training step over the mesh.

    The batch axis (scenes: volume/targets/pose per element) shards over
    ``pose``.  Params are replicated; ``jax.grad`` of the pose-mean loss
    makes GSPMD emit the gradient all-reduce over ``pose`` — an ICI
    collective, no manual psum.  The within-scene sharding depends on
    the objective (``cfg.loss``):

    - ``"masked_mse_edge"`` (the ``[DEMO] Z with aligned MRI US.ipynb``
      cell 25 objective): frame-level loss on (rays, depth) maps — rays
      additionally shard over ``ray`` and the loss reduction becomes a
      second ICI collective.  ``batch`` targets/masks are frame-shaped
      ``(B, R, S')``.
    - ``"ssim"`` (the flagship GPU-notebook objective, cell 16:
      ``1 - ssim`` on the splatted image): the splat couples rays, so
      rays are replicated per device and the mesh parallelism is
      pose-DP-only.  ``batch`` targets are image-shaped
      ``(B, *cfg.image_shape)``; masks ride along unused (keeps one
      batch pytree for both objectives).

    ``cfg`` is an
    :class:`~diffus_tpu.train.impedance_train.ImpedanceTrainConfig`.
    Returns ``(step_fn, init_opt_state)``; ``step_fn(params, opt_state,
    batch)`` -> ``(params, opt_state, loss)`` with
    ``batch = (t1_volumes[B,...], targets, masks, sources[B,3],
    directions[B,R,3])``.
    """
    tx = optax.adam(lr)

    if cfg.loss == "ssim":
        from diffus_tpu.train.impedance_train import synth_forward

        def scene_loss(params, t1_volume, target, mask, source, directions):
            image = synth_forward(params, t1_volume, source, directions, cfg)
            return ssim_loss(image, target)

    elif cfg.loss == "masked_mse_edge":

        def scene_loss(params, t1_volume, target, mask, source, directions):
            x_slice = t1_volume[:, :, cfg.slice_index]
            z_slice = impedance_slice_zscore(params, x_slice, hidden=tuple(cfg.hidden))
            z_vol = t1_volume.at[:, :, cfg.slice_index].set(z_slice)
            _, _, _, frame = render_frame(
                z_vol, source, directions, cfg.num_samples, cfg.render
            )
            return masked_mse_edge_loss(frame, target, mask, cfg.edge_weight)

    else:
        raise ValueError(
            f"unknown sharded objective cfg.loss={cfg.loss!r} "
            "(use 'ssim' or 'masked_mse_edge')"
        )

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


def shard_batch(mesh: Mesh, batch, shard_rays: bool = True):
    """Place a training batch on the mesh: scene axis over ``pose``, ray
    axis (where present) over ``ray``.

    ``shard_rays=False`` (the SSIM objective: image-shaped targets, rays
    coupled by the splat) shards the scene axis only and replicates
    within-scene data over the ``ray`` axis.

    Non-divisible batch/ray counts are an ERROR here (unlike the sweep's
    padding contract): padding scenes would silently change the mean
    loss and the gradient.  Resize the batch or the mesh.
    """
    t1, targets, masks, sources, directions = batch
    b, r = t1.shape[0], directions.shape[1]
    pose_m, ray_m = mesh.shape["pose"], mesh.shape["ray"]
    if b % pose_m or (shard_rays and r % ray_m):
        raise ValueError(
            f"training batch (scenes={b}, rays={r}) must divide the mesh "
            f"(pose={pose_m}, ray={ray_m}); padding is not applied to "
            "training batches because it would change the mean loss"
        )
    put = jax.device_put
    inner = P("pose", "ray") if shard_rays else P("pose")
    return (
        put(t1, NamedSharding(mesh, P("pose"))),
        put(targets, NamedSharding(mesh, inner)),
        put(masks, NamedSharding(mesh, inner)),
        put(sources, NamedSharding(mesh, P("pose"))),
        put(directions, NamedSharding(mesh, inner)),
    )


def sharded_recover_pose_multistart(
    mesh: Mesh, volume, target_frame, init_poses: TransducerPose, cfg
):
    """Multistart pose recovery with the initializations sharded over
    EVERY mesh device (``pose`` x ``ray`` flattened): independent Adam
    descents are embarrassingly parallel, so the most parallel workload
    in the repo finally rides the mesh (VERDICT r2 weak #4).

    Init counts that don't divide the device count are padded by
    repeating the last init (duplicate descents are wasted-but-valid
    work); results are sliced back and ``best`` recomputed, so callers
    never see padding.

    Args:
      cfg: a :class:`~diffus_tpu.train.pose_recovery.PoseRecoveryConfig`.
    Returns:
      ``(poses, losses, best)`` as
      :func:`~diffus_tpu.train.pose_recovery.recover_pose_multistart`.
    """
    from diffus_tpu.train.pose_recovery import recover_pose_multistart

    batch = init_poses.position.shape[0]
    total = mesh.devices.size
    pos = _pad_axis(jnp.asarray(init_poses.position), 0, total)
    rot = _pad_axis(jnp.asarray(init_poses.rotvec), 0, total)
    shard = NamedSharding(mesh, P(("pose", "ray")))
    init = TransducerPose(
        position=jax.device_put(pos, shard),
        rotvec=jax.device_put(rot, shard),
    )
    vol_s = jax.device_put(volume, NamedSharding(mesh, P()))
    tgt_s = jax.device_put(target_frame, NamedSharding(mesh, P()))
    poses, losses, _ = recover_pose_multistart(vol_s, tgt_s, init, cfg)
    poses = TransducerPose(
        position=poses.position[:batch], rotvec=poses.rotvec[:batch]
    )
    losses = losses[:batch]
    return poses, losses, jnp.argmin(losses[:, -1])
