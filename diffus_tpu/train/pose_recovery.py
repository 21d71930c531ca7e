"""6-DoF transducer pose recovery by gradient descent through the render.

Rebuild of the reference's alignment loop (``[NW] alignement.ipynb``
cells 13-14: ``source`` and ``directions`` as autograd leaves, MSE to a
target frame, Adam lr=1, 100 steps).  Two modes:

  - ``recover_pose``: the TPU-native 6-DoF chart — optimize
    ``TransducerPose`` (position + rotation vector); the fan is
    regenerated differentiably each step (Rodrigues), so the search
    stays on the manifold of valid fans.
  - ``recover_free``: reference-parity mode — optimize the raw
    ``(source, directions)`` leaves exactly like the notebook.

Both REQUIRE ``interp='trilinear'``: the reference's nearest-neighbor
rounding kills pose gradients (``src/renderer.py:754-756``), which is
why BASELINE specifies trilinear sampling for the rebuild.  The whole
optimization runs as one jitted ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
from diffus_tpu.geometry.fan import pose_fan_directions
from diffus_tpu.render.renderer import render_frame


@dataclasses.dataclass(frozen=True)
class PoseRecoveryConfig:
    geometry: BeamGeometry = BeamGeometry(n_rays=64, num_samples=128)
    render: RenderConfig = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    lr: float = 1.0      # reference notebook uses Adam lr=1
    steps: int = 100


def render_pose(volume, pose: TransducerPose, cfg: PoseRecoveryConfig):
    """Differentiable frame from a 6-DoF pose."""
    directions = pose_fan_directions(pose, cfg.geometry)
    _, _, _, frame = render_frame(
        volume, pose.position, directions, cfg.geometry.num_samples, cfg.render
    )
    return frame


@partial(jax.jit, static_argnames=("cfg",))
def recover_pose(
    volume, target_frame, init_pose: TransducerPose, cfg: PoseRecoveryConfig
):
    """Recover a 6-DoF pose whose render matches ``target_frame`` (MSE).

    Returns ``(pose, losses)`` — the full Adam trajectory compiled into
    one ``lax.scan``.
    """
    tx = optax.adam(cfg.lr)

    def loss_fn(pose):
        frame = render_pose(volume, pose, cfg)
        return jnp.mean((frame - target_frame) ** 2)

    opt_state = tx.init(init_pose)

    def step(carry, _):
        pose, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(pose)
        updates, s = tx.update(grads, s, pose)
        pose = optax.apply_updates(pose, updates)
        return (pose, s), loss

    (pose, _), losses = jax.lax.scan(step, (init_pose, opt_state), None, length=cfg.steps)
    return pose, losses


@partial(jax.jit, static_argnames=("cfg",))
def recover_pose_multistart(
    volume, target_frame, init_poses: TransducerPose, cfg: PoseRecoveryConfig
):
    """Pose recovery from a batch of initializations, vmapped.

    The render-MSE landscape is multi-modal (echoes are sparse spikes);
    a single gradient descent converges to the nearest basin.  This runs
    :func:`recover_pose` from ``B`` inits in parallel — one compiled
    program, all descents batched on-device — and returns every
    trajectory plus the index of the best final loss.

    Args:
      init_poses: a ``TransducerPose`` pytree with leading batch axis
        ``B`` on both leaves (e.g. built with ``jax.vmap(
        TransducerPose.create)`` or stacked).
    Returns:
      ``(poses, losses, best)``: batched final poses, ``(B, steps)``
      loss trajectories, and the argmin index of the final losses.
    """
    poses, losses = jax.vmap(lambda p: recover_pose(volume, target_frame, p, cfg))(
        init_poses
    )
    best = jnp.argmin(losses[:, -1])
    return poses, losses, best


def sample_init_poses(key, center, radius: float, rot_scale: float, count: int):
    """Random pose inits around a center position: uniform position ball
    + small random rotations — the standard multistart seeding."""
    kp, kr = jax.random.split(key)
    center = jnp.asarray(center, jnp.float32)
    offsets = jax.random.uniform(kp, (count, 3), minval=-radius, maxval=radius)
    rots = rot_scale * jax.random.normal(kr, (count, 3))
    return TransducerPose(position=center[None] + offsets, rotvec=rots)


@partial(jax.jit, static_argnames=("num_samples", "render", "lr", "steps"))
def recover_free(
    volume,
    target_frame,
    source0,
    directions0,
    num_samples: int,
    render: RenderConfig = RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    lr: float = 1.0,
    steps: int = 100,
):
    """Reference-parity recovery: free ``(source, directions)`` leaves.

    Mirrors ``[NW] alignement.ipynb`` cell 14 (Adam over the raw tensors),
    with trilinear sampling so the gradients are nonzero.
    Returns ``(source, directions, losses)``.
    """
    tx = optax.adam(lr)

    def loss_fn(leaves):
        src, dirs = leaves
        _, _, _, frame = render_frame(volume, src, dirs, num_samples, render)
        return jnp.mean((frame - target_frame) ** 2)

    opt_state = tx.init((source0, directions0))

    def step(carry, _):
        leaves, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(leaves)
        updates, s = tx.update(grads, s, leaves)
        leaves = optax.apply_updates(leaves, updates)
        return (leaves, s), loss

    ((src, dirs), _), losses = jax.lax.scan(
        step, ((source0, directions0), opt_state), None, length=steps
    )
    return src, dirs, losses
