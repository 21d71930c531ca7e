"""Applications: SSIM loss, impedance training, pose recovery, checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
from diffus_tpu.train import (
    ssim,
    ssim_loss,
    masked_mse,
    gradient_loss,
    ImpedanceTrainConfig,
    train_impedance,
    PoseRecoveryConfig,
    render_pose,
    recover_pose,
    recover_free,
    save_checkpoint,
    load_checkpoint,
    MetricsLogger,
)
from diffus_tpu.geometry.fan import fan_directions_2d
from diffus_tpu.phantoms import t1_phantom_3d, brain_phantom_3d


def _ssim_oracle(x, y, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent numpy SSIM (Wang et al., gaussian window, valid mode)."""
    from scipy.signal import correlate2d

    t = np.arange(size) - (size - 1) / 2
    g = np.exp(-0.5 * (t / sigma) ** 2)
    g = g / g.sum()
    w = np.outer(g, g)

    def f(a):
        return correlate2d(a, w, mode="valid")

    mx, my = f(x), f(y)
    sx = f(x * x) - mx**2
    sy = f(y * y) - my**2
    sxy = f(x * y) - mx * my
    c1, c2 = k1**2, k2**2
    return np.mean(((2 * mx * my + c1) * (2 * sxy + c2)) /
                   ((mx**2 + my**2 + c1) * (sx + sy + c2)))


def test_ssim_matches_oracle(rng):
    x = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, (32, 32)), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = _ssim_oracle(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    np.testing.assert_allclose(float(ssim(jnp.asarray(x), jnp.asarray(x))), 1.0, atol=1e-5)


def test_masked_losses(rng):
    a = jnp.asarray(rng.uniform(0, 1, (8, 10)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (8, 10)).astype(np.float32))
    full = jnp.ones((8, 10), bool)
    np.testing.assert_allclose(
        float(masked_mse(a, b, full)), float(jnp.mean((a - b) ** 2)), rtol=1e-6
    )
    assert float(gradient_loss(a, a, full)) == 0.0
    half = full.at[:4].set(False)
    assert np.isfinite(float(masked_mse(a, b, half)))


def _tiny_scene():
    t1 = jnp.asarray(t1_phantom_3d((24, 24, 24)))
    z = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 8)
    src = jnp.array([12.0, 1.0, 12.0])
    return t1, z, src, dirs


def test_train_impedance_loss_decreases():
    t1, z_true, src, dirs = _tiny_scene()
    cfg = ImpedanceTrainConfig(
        num_samples=20,
        slice_index=12,
        epochs=20,
        lr=0.01,
        loss="masked_mse_edge",
        image_shape=(32, 32),
        splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    # target: the frame rendered from the TRUE impedance volume
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.ops.splat import differentiable_splat

    x, y, _, frame = render_frame(z_true, src, dirs, 20, cfg.render)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 32, 32, 2.0
    )
    params, losses = train_impedance(
        jax.random.PRNGKey(0), t1, target, src, dirs, cfg,
        mask=jnp.ones((32, 32), bool),
    )
    l = np.asarray(losses)
    assert np.all(np.isfinite(l))
    assert l[-1] < l[0]  # gradients flow through the whole render


def test_pose_recovery_improves():
    _, z_true, src, dirs = _tiny_scene()
    geom = BeamGeometry(n_rays=8, num_samples=20, opening_angle=np.radians(40))
    cfg = PoseRecoveryConfig(
        geometry=geom,
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        lr=0.05,
        steps=100,
    )
    true_pose = TransducerPose.create([12.0, 1.0, 12.0])
    target = render_pose(z_true, true_pose, cfg)
    init = TransducerPose.create([13.5, 2.5, 11.0], rotvec=[0.0, 0.0, 0.05])
    pose, losses = recover_pose(z_true, target, init, cfg)
    l = np.asarray(losses)
    assert np.all(np.isfinite(l))
    assert l[-1] < l[0]
    # recovered position moves toward the truth
    d0 = np.linalg.norm(np.asarray(init.position) - np.asarray(true_pose.position))
    d1 = np.linalg.norm(np.asarray(pose.position) - np.asarray(true_pose.position))
    assert d1 < d0


def test_recover_free_reference_mode():
    _, z_true, src, dirs = _tiny_scene()
    render = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    from diffus_tpu.render.renderer import render_frame

    target = render_frame(z_true, src, dirs, 16, render)[3]
    src0 = src + jnp.array([1.0, 1.0, -0.5])
    s, d, losses = recover_free(z_true, target, src0, dirs, 16, render, lr=0.05, steps=60)
    l = np.asarray(losses)
    assert l[-1] < l[0]


def test_checkpoint_roundtrip(tmp_path):
    from diffus_tpu.impedance.mlp import init_params

    params = init_params(jax.random.PRNGKey(0))
    state = {"params": params, "step": np.int32(7)}
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path)
    leaves0 = jax.tree_util.tree_leaves(params)
    leaves1 = jax.tree_util.tree_leaves(restored["params"])
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 7


def test_metrics_logger(tmp_path):
    import json

    path = os.path.join(str(tmp_path), "m.jsonl")
    with MetricsLogger(path) as log:
        log.log(0, loss=1.5, ssim=0.3)
        log.log(1, loss=1.2)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1


def test_train_impedance_checkpointed_resume(tmp_path):
    from diffus_tpu.train import train_impedance_checkpointed

    t1, z_true, src, dirs = _tiny_scene()
    cfg = ImpedanceTrainConfig(
        num_samples=16, slice_index=12, epochs=6, lr=0.01,
        loss="masked_mse_edge", image_shape=(24, 24), splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.ops.splat import differentiable_splat

    x, y, _, frame = render_frame(z_true, src, dirs, 16, cfg.render)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 24, 24, 2.0
    )
    ckdir = str(tmp_path / "ck")
    params, losses = train_impedance_checkpointed(
        jax.random.PRNGKey(0), t1, target, src, dirs, cfg, ckdir, chunk=2,
        metrics_path=str(tmp_path / "m.jsonl"),
    )
    assert losses.shape == (6,)
    # resume: raising the epoch budget continues from the checkpoint
    import dataclasses as dc

    cfg2 = dc.replace(cfg, epochs=8)
    params2, losses2 = train_impedance_checkpointed(
        jax.random.PRNGKey(0), t1, target, src, dirs, cfg2, ckdir, chunk=2,
    )
    assert losses2.shape == (2,)  # only the remaining 2 epochs ran


def test_train_impedance_pretrained_start():
    from diffus_tpu.train import train_impedance

    t1, z_true, src, dirs = _tiny_scene()
    cfg = ImpedanceTrainConfig(
        num_samples=16, slice_index=12, epochs=6, lr=0.005,
        loss="masked_mse_edge", image_shape=(24, 24), splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.ops.splat import differentiable_splat

    x, y, _, frame = render_frame(z_true, src, dirs, 16, cfg.render)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 24, 24, 2.0
    )
    _, losses = train_impedance(
        jax.random.PRNGKey(0), t1, target, src, dirs, cfg,
        mask=jnp.ones((24, 24), bool), pretrain_table=True,
    )
    l = np.asarray(losses)
    assert np.all(np.isfinite(l))


def test_train_impedance_remat_matches():
    from diffus_tpu.train import train_impedance
    import dataclasses as dc

    t1, z_true, src, dirs = _tiny_scene()
    base = ImpedanceTrainConfig(
        num_samples=16, slice_index=12, epochs=3, lr=0.01,
        loss="masked_mse_edge", image_shape=(24, 24), splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.ops.splat import differentiable_splat

    x, y, _, frame = render_frame(z_true, src, dirs, 16, base.render)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 24, 24, 2.0
    )
    _, l0 = train_impedance(jax.random.PRNGKey(0), t1, target, src, dirs, base,
                            mask=jnp.ones((24, 24), bool))
    _, l1 = train_impedance(jax.random.PRNGKey(0), t1, target, src, dirs,
                            dc.replace(base, remat=True),
                            mask=jnp.ones((24, 24), bool))
    # identical forward => identical first loss; later steps may drift
    # (recompute reorders f32 reductions, gradients differ in the last ulp
    # and the render loss landscape amplifies)
    np.testing.assert_allclose(float(l0[0]), float(l1[0]), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(l1)))


def test_pose_gradient_direction_matches_finite_differences():
    """BASELINE acceptance criterion: pose-gradient directions through the
    full render match central finite differences (cosine similarity)."""
    _, z_true, src, dirs = _tiny_scene()
    cfg = PoseRecoveryConfig(
        geometry=BeamGeometry(n_rays=8, num_samples=20, opening_angle=np.radians(40)),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    target = render_pose(z_true, TransducerPose.create([12.0, 1.0, 12.0]), cfg)

    def loss_at(pos, rot):
        pose = TransducerPose(position=jnp.asarray(pos, jnp.float32),
                              rotvec=jnp.asarray(rot, jnp.float32))
        return float(jnp.mean((render_pose(z_true, pose, cfg) - target) ** 2))

    pos0 = np.array([13.0, 2.0, 11.5], np.float64)
    rot0 = np.array([0.02, -0.01, 0.04], np.float64)

    g = jax.grad(
        lambda p: jnp.mean(
            (render_pose(z_true, TransducerPose(position=p[:3], rotvec=p[3:]), cfg)
             - target) ** 2
        )
    )(jnp.asarray(np.concatenate([pos0, rot0]), jnp.float32))
    g = np.asarray(g, np.float64)

    eps = 1e-3
    fd = np.zeros(6)
    x0 = np.concatenate([pos0, rot0])
    for i in range(6):
        xp, xm = x0.copy(), x0.copy()
        xp[i] += eps
        xm[i] -= eps
        fd[i] = (loss_at(xp[:3], xp[3:]) - loss_at(xm[:3], xm[3:])) / (2 * eps)

    cos = float(np.dot(g, fd) / (np.linalg.norm(g) * np.linalg.norm(fd) + 1e-30))
    assert cos > 0.95, f"gradient direction mismatch: cos={cos}, ad={g}, fd={fd}"


def test_multistart_pose_recovery_beats_single():
    from diffus_tpu.train import recover_pose_multistart, sample_init_poses

    _, z_true, src, dirs = _tiny_scene()
    cfg = PoseRecoveryConfig(
        geometry=BeamGeometry(n_rays=8, num_samples=20, opening_angle=np.radians(40)),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        lr=0.05, steps=40,
    )
    true_pose = TransducerPose.create([12.0, 1.0, 12.0])
    target = render_pose(z_true, true_pose, cfg)
    inits = sample_init_poses(jax.random.PRNGKey(3), [13.0, 2.0, 11.0],
                              radius=2.0, rot_scale=0.05, count=4)
    poses, losses, best = recover_pose_multistart(z_true, target, inits, cfg)
    assert losses.shape == (4, 40)
    assert np.all(np.isfinite(np.asarray(losses)))
    b = int(best)
    # the selected start is at least as good as every other final loss
    assert float(losses[b, -1]) == float(jnp.min(losses[:, -1]))
    # and improves on its own initial loss
    assert float(losses[b, -1]) < float(losses[b, 0])
    best_pose = jax.tree_util.tree_map(lambda x: x[b], poses)
    assert np.all(np.isfinite(np.asarray(best_pose.position)))


def test_train_impedance_nearest_mode_loss_decreases():
    """Impedance training needs gradients w.r.t. VALUES only (the gather
    is linear in the volume), so nearest-mode sampling — the reference's
    own training configuration (its sampler rounds, renderer.py:754) —
    trains correctly and is ~3x cheaper than trilinear on TPU.  Pose
    recovery still requires trilinear (coordinate gradients)."""
    t1, z_true, src, dirs = _tiny_scene()
    cfg = ImpedanceTrainConfig(
        num_samples=20,
        slice_index=12,
        epochs=20,
        lr=0.01,
        loss="masked_mse_edge",
        image_shape=(32, 32),
        splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="nearest"),
    )
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.ops.splat import differentiable_splat

    x, y, _, frame = render_frame(z_true, src, dirs, 20, cfg.render)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 32, 32, 2.0
    )
    params, losses = train_impedance(
        jax.random.PRNGKey(0), t1, target, src, dirs, cfg,
        mask=jnp.ones((32, 32), bool),
    )
    l = np.asarray(losses)
    assert np.all(np.isfinite(l))
    assert l[-1] < l[0]
