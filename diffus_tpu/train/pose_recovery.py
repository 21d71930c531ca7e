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
import numpy as np
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


# --- global stage: coarse candidate scoring for large initial errors -------
#
# The annealed descent is LOCAL: its coarsest blur widens the MSE basin
# to several voxels, but a start 6-10 voxels out (a realistic
# registration prior) lands outside every basin and the descent fails.
# Gradient-free seeding fixes this at near-zero cost: forward renders
# are ~3 orders of magnitude cheaper than a full descent (one render vs
# ~600 render+grad steps), so scoring dozens of random candidates at the
# coarsest blur and descending only from the best few extends the
# capture radius without a second optimizer.


@partial(jax.jit, static_argnames=("cfg",))
def score_poses(volume, target_frame, poses: TransducerPose, cfg: AnnealedPoseConfig):
    """Coarse-blur MSE score of a batch of candidate poses (forward
    renders only, no gradients).  Blur sigma is the annealed schedule's
    coarsest phase — the widest basin the descent itself will see, so a
    candidate that scores well here is inside the descent's capture
    range.

    Chunked ``lax.map`` over 8-pose vmaps, NOT one flat vmap: the grid
    stage scores up to ~770 candidates, and wide trilinear pose vmaps
    materialize their gather intermediates (the measured ~2.5x
    cliff behind ``render_sweep``'s chunking — docs/benchmarking.md;
    a 700-wide vmap at 64x128 rays/samples would stage ~6 GB of
    gathered rows)."""
    base = cfg.as_base()
    sigma = cfg.phases[0][0]
    target_b = gaussian_blur_frame(target_frame, sigma)

    def one(p):
        frame = gaussian_blur_frame(render_pose(volume, p, base), sigma)
        return jnp.mean((frame - target_b) ** 2)

    n = poses.position.shape[0]
    chunk = 8
    pad = (-n) % chunk
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]
        )
        if pad
        else x,
        poses,
    )
    chunks = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, chunk, *x.shape[1:]), padded
    )
    scores = jax.lax.map(lambda c: jax.vmap(one)(c), chunks)
    return scores.reshape(-1)[:n]


def recover_pose_global(
    volume,
    target_frame,
    center,
    cfg: AnnealedPoseConfig,
    key,
    candidates: int = 256,
    radius: float = 8.0,
    rot_scale: float = 0.05,
    keep: int = 6,
    spacing: float = None,
):
    """Global-then-local 6-DoF recovery for LARGE initial errors
    (5-10+ voxels, where the annealed descent alone fails — the
    registration regime of ``[NW] alignement.ipynb``'s workflow).

    Stage 1 scores a cubic GRID of candidate positions (``spacing``
    voxels apart, covering the ``radius`` ball around ``center``, the
    prior — auto-coarsened if the grid would exceed ``candidates``
    points) with :func:`score_poses` and keeps the best ``keep``.
    Stage 2 runs the annealed multistart descent from those seeds (the
    best seed keeps the prior's rotation; the others get ``rot_scale``
    rotation diversity).  Returns ``(poses, losses, best)`` over the
    ``keep`` refined starts (cf. :func:`recover_pose_multistart_annealed`).

    Why a 2-voxel grid and not sparse random sampling: the local
    descent's reliable capture region is only ~1-2 voxels in EVERY
    direction (the fan-plane-normal axis is 100-1000x shallower than
    in-plane, and even in-plane errors >2 voxels detour through the
    shallow axis and strand off-plane — measured r5, per-axis probe in
    docs/benchmarking.md).  The grid guarantees a candidate within
    ``spacing*sqrt(3)/2`` of the truth, and the coarse-blur score ranks
    it reliably (measured: nearest grid point scores in the top 2 of
    179 at radius 6).  Cost is forward renders only — ~3 orders of
    magnitude cheaper per candidate than a descent.
    """
    center = np.asarray(center, np.float32)
    # radius-scaled default spacing: a fixed 2-voxel grid is
    # proportionally too coarse for small priors (radius 2: nearest
    # candidate up to ~1.7 voxels away — measured best refined start
    # 2.9 voxels vs 1.2 at spacing 1; r5)
    s = float(spacing) if spacing is not None else max(
        1.0, min(2.0, float(radius) / 3.0)
    )
    while True:
        ax = np.arange(-float(radius), float(radius) + 1e-6, s, dtype=np.float32)
        ax = ax - (ax[0] + ax[-1]) / 2.0  # symmetric about the prior
        grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= float(radius) + s / 2]
        if len(grid) <= int(candidates):
            break
        s *= 1.26
    pts = np.concatenate([np.zeros((1, 3), np.float32), grid]) + center[None]
    init = TransducerPose(
        position=jnp.asarray(pts),
        rotvec=jnp.zeros((len(pts), 3), jnp.float32),
    )
    scores = np.asarray(score_poses(volume, target_frame, init, cfg))
    order = np.argsort(scores)[: int(keep)]
    rots = rot_scale * jax.random.normal(key, (len(order), 3))
    rots = rots.at[0].set(0.0)  # best-scored seed keeps the prior rotation
    seeds = TransducerPose(
        position=jnp.asarray(pts[order]), rotvec=rots
    )
    return recover_pose_multistart_annealed(volume, target_frame, seeds, cfg)


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
    global_stage: bool = False,
    candidates: int = 48,
) -> dict:
    """End-to-end acceptance metric for pose recovery (VERDICT r3 weak
    #6): render the target at ``true_pose``, run ``count`` multistart
    annealed descents from the fixed perturbation distribution
    (position uniform in a ``radius`` ball, rotvec ``rot_scale`` normal),
    and report the fraction that recover the truth within tolerance plus
    whether the BEST-loss start does (the multistart workflow's real
    acceptance question).

    ``global_stage=True`` routes through :func:`recover_pose_global`
    (coarse scoring of ``candidates`` random poses seeds the ``count``
    descents) — required for radii beyond the annealed descent's
    ~4-voxel capture radius; ``success_rate`` is then over the refined
    seeds.  The prior handed to the global stage is a pose ``radius``
    away from the truth (worst-case initial error, not the truth
    itself).
    """
    import numpy as np

    target = render_pose(volume, true_pose, cfg.as_base())
    if global_stage:
        kp, kc = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
        # worst-case prior: a point ON the radius sphere around truth
        d = jax.random.normal(kp, (3,))
        prior = true_pose.position + radius * d / (jnp.linalg.norm(d) + 1e-12)
        poses, losses, best = recover_pose_global(
            volume, target, prior, cfg, kc, candidates=candidates,
            radius=radius, rot_scale=rot_scale, keep=count,
        )
    else:
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
        "global_stage": bool(global_stage),
        "radius": float(radius),
    }


def pose_recovery_envelope(
    volume,
    true_pose: TransducerPose,
    cfg: AnnealedPoseConfig,
    key,
    radii=(2.0, 4.0, 6.0, 10.0),
    count: int = 8,
    rot_scale: float = 0.05,
    pos_tol: float = 1.0,
    rot_tol: float = 0.1,
    global_threshold: float = 4.0,
    candidates: int = 768,
) -> dict:
    """Success-rate vs initial-error radius — the capability envelope
    (VERDICT r4 #5).  One :func:`pose_recovery_benchmark` per radius
    with a fixed per-radius seed; radii at or beyond
    ``global_threshold`` voxels route through the global
    candidate-scoring stage (the local annealed descent's measured
    capture radius is ~3-4 voxels).  Returns ``{radius: benchmark
    dict}`` keyed by the radius as a string (JSON-friendly)."""
    out = {}
    for i, r in enumerate(radii):
        out[str(float(r))] = pose_recovery_benchmark(
            volume, true_pose, cfg, jax.random.fold_in(key, i),
            count=count, radius=float(r), rot_scale=rot_scale,
            pos_tol=pos_tol, rot_tol=rot_tol,
            global_stage=float(r) >= global_threshold,
            candidates=candidates,
        )
    return out


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
