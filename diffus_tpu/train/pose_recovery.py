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
import math
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


# --- annealed (coarse-to-fine) recovery: the robust production recipe ------
#
# Measured (round 4, CPU probes at the BASELINE config-4 workload): plain
# Adam at the notebook's lr=1 DIVERGES on the 6-DoF chart (echo frames
# are sparse ~1-voxel spikes; rotation axes with near-zero gradient
# random-walk at lr per step under Adam's per-parameter normalization —
# final rot error ~15 rad).  Three ingredients fix it: (a) separate
# position/rotation learning rates (rotation gradients are ~100x weaker
# and noisier), (b) cosine decay (bounds the late-phase walk), and
# (c) a coarse-to-fine blur schedule on the frames (widens the MSE basin
# from ~1 voxel to several).  The loss landscape itself is benign:
# monotonic over +-3 voxels in-plane, ~100-1000x shallower along the fan
# plane normal — the shallow axis is why the fine phase needs many steps.


@dataclasses.dataclass(frozen=True)
class AnnealedPoseConfig:
    """Coarse-to-fine pose recovery schedule.

    ``phases`` is a tuple of ``(blur_sigma, lr_pos, lr_rot, steps)``:
    each phase optimizes MSE between Gaussian-blurred frames (sigma in
    pixels; 0 = exact frames) with per-group cosine-decayed Adam.
    """

    geometry: BeamGeometry = BeamGeometry(n_rays=64, num_samples=128)
    render: RenderConfig = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    phases: tuple = (
        (4.0, 0.3, 0.02, 100),
        (1.0, 0.15, 0.01, 150),
        (0.0, 0.1, 0.005, 350),
    )

    def as_base(self) -> "PoseRecoveryConfig":
        return PoseRecoveryConfig(geometry=self.geometry, render=self.render)


def gaussian_blur_frame(frame: jax.Array, sigma: float) -> jax.Array:
    """Separable 2D Gaussian blur of a (rays, depth) frame with edge
    padding (static sigma; jittable)."""
    sigma = float(sigma)  # static: the kernel width shapes the trace
    if sigma <= 0:
        return frame
    r = int(math.ceil(3 * sigma))
    k = jnp.exp(-0.5 * (jnp.arange(-r, r + 1, dtype=jnp.float32) / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv_last(x):
        pad = jnp.pad(x, [(0, 0), (r, r)], mode="edge")
        return jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(pad)

    return conv_last(conv_last(frame).T).T


@partial(jax.jit, static_argnames=("cfg",))
def recover_pose_annealed(
    volume, target_frame, init_pose: TransducerPose, cfg: AnnealedPoseConfig
):
    """Coarse-to-fine 6-DoF recovery (see :class:`AnnealedPoseConfig`).

    Returns ``(pose, losses)`` with ``losses`` the concatenated loss
    trajectory over all phases (blurred-frame MSE per phase).
    """
    base = cfg.as_base()
    pose = init_pose
    all_losses = []
    for sigma, lr_pos, lr_rot, steps in cfg.phases:
        tx = optax.multi_transform(
            {
                "pos": optax.adam(optax.cosine_decay_schedule(lr_pos, steps)),
                "rot": optax.adam(optax.cosine_decay_schedule(lr_rot, steps)),
            },
            TransducerPose(position="pos", rotvec="rot"),
        )
        target_b = gaussian_blur_frame(target_frame, sigma)

        def loss_fn(p):
            frame = gaussian_blur_frame(render_pose(volume, p, base), sigma)
            return jnp.mean((frame - target_b) ** 2)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (pose, _), losses = jax.lax.scan(
            step, (pose, tx.init(pose)), None, length=steps
        )
        all_losses.append(losses)
    return pose, jnp.concatenate(all_losses)


@partial(jax.jit, static_argnames=("cfg",))
def recover_pose_multistart_annealed(
    volume, target_frame, init_poses: TransducerPose, cfg: AnnealedPoseConfig
):
    """Annealed recovery from a batch of inits (cf.
    :func:`recover_pose_multistart`); returns ``(poses, losses, best)``."""
    poses, losses = jax.vmap(
        lambda p: recover_pose_annealed(volume, target_frame, p, cfg)
    )(init_poses)
    best = jnp.argmin(losses[:, -1])
    return poses, losses, best


def pose_recovery_benchmark(
    volume,
    true_pose: TransducerPose,
    cfg: AnnealedPoseConfig,
    key,
    count: int = 8,
    radius: float = 3.0,
    rot_scale: float = 0.05,
    pos_tol: float = 1.0,
    rot_tol: float = 0.1,
) -> dict:
    """End-to-end acceptance metric for pose recovery (VERDICT r3 weak
    #6): render the target at ``true_pose``, run ``count`` multistart
    annealed descents from the fixed perturbation distribution
    (position uniform in a ``radius`` ball, rotvec ``rot_scale`` normal),
    and report the fraction that recover the truth within tolerance plus
    whether the BEST-loss start does (the multistart workflow's real
    acceptance question).
    """
    import numpy as np

    target = render_pose(volume, true_pose, cfg.as_base())
    init = sample_init_poses(
        key, true_pose.position, radius, rot_scale, count
    )
    poses, losses, best = recover_pose_multistart_annealed(
        volume, target, init, cfg
    )
    pos_err = np.linalg.norm(
        np.asarray(poses.position) - np.asarray(true_pose.position), axis=1
    )
    rot_err = np.linalg.norm(
        np.asarray(poses.rotvec) - np.asarray(true_pose.rotvec), axis=1
    )
    ok = (pos_err < pos_tol) & (rot_err < rot_tol)
    b = int(best)
    return {
        "success_rate": float(np.mean(ok)),
        "count": int(count),
        "best_pos_err": float(pos_err[b]),
        "best_rot_err": float(rot_err[b]),
        "best_recovered": bool(ok[b]),
        "pos_tol": float(pos_tol),
        "rot_tol": float(rot_tol),
    }


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
