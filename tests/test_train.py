"""Applications: SSIM loss, impedance training, pose recovery, checkpointing."""

import dataclasses
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
from diffus_tpu.train import (
    ssim,
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


def test_train_driver_multi_case(tmp_path):
    """The multi-case driver: path-backed T1 volumes streamed through the
    native prefetcher, scenes sharded over a 2x4 mesh, loss finite and
    decreasing across epochs; checkpoint + resume continues the epoch
    count; JSONL metrics written per step."""
    import json
    from diffus_tpu.io.nifti import save_nifti
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases
    from diffus_tpu.parallel import make_mesh
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d

    dim, rays, samples = 16, 8, 12
    rng = np.random.default_rng(0)
    dirs = np.asarray(fan_directions_2d([0.0, 1.0], np.radians(40), rays))
    rcfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    cfg = ImpedanceTrainConfig(
        num_samples=samples, slice_index=dim // 2, lr=0.01,
        loss="masked_mse_edge", render=rcfg,
    )
    cases = []
    for i in range(4):
        t1 = rng.uniform(100, 2000, (dim,) * 3).astype(np.float32)
        src = np.array([dim / 2, 1.0, dim / 2], np.float32) + rng.uniform(-1, 1, 3).astype(np.float32)
        _, _, _, frame = render_frame(jnp.asarray(t1), jnp.asarray(src), jnp.asarray(dirs), samples, rcfg)
        p = str(tmp_path / f"t1_{i}.nii.gz")
        save_nifti(p, t1)
        cases.append(CaseSpec(
            t1=p, target=np.asarray(frame), mask=np.ones((rays, samples), bool),
            source=src, directions=dirs,
        ))

    mesh = make_mesh(2, 4)
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics.jsonl")
    params, hist = train_impedance_cases(
        jax.random.PRNGKey(0), cases, cfg, epochs=2, batch_size=2, mesh=mesh,
        checkpoint_dir=ckpt, metrics_path=metrics,
    )
    assert len(hist) == 4  # 2 epochs x 2 batches
    assert all(np.isfinite(hist))
    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) == 4 and lines[-1]["epoch"] == 1

    # resume: restored epoch=2 means no further epochs run for epochs=2
    params2, hist2 = train_impedance_cases(
        jax.random.PRNGKey(0), cases, cfg, epochs=2, batch_size=2, mesh=mesh,
        checkpoint_dir=ckpt, resume=True,
    )
    assert hist2 == []
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # ...and training onward from the checkpoint works
    params3, hist3 = train_impedance_cases(
        jax.random.PRNGKey(0), cases, cfg, epochs=3, batch_size=2, mesh=mesh,
        checkpoint_dir=ckpt, resume=True,
    )
    assert len(hist3) == 2


def test_train_driver_in_memory_single_device():
    """In-memory cases on the default 1x1 mesh: loss decreases on a
    learnable self-consistent scene."""
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.impedance.mlp import init_params

    t1, z_true, src, dirs = _tiny_scene()
    rcfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    cfg = ImpedanceTrainConfig(
        num_samples=20, slice_index=12, lr=0.01, loss="masked_mse_edge", render=rcfg,
    )
    _, _, _, target = render_frame(z_true, src, dirs, 20, rcfg)
    case = CaseSpec(
        t1=np.asarray(t1), target=np.asarray(target),
        mask=np.ones(target.shape, bool), source=np.asarray(src),
        directions=np.asarray(dirs),
    )
    params, hist = train_impedance_cases(
        jax.random.PRNGKey(0), [case], cfg, epochs=25, batch_size=1,
    )
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_train_driver_validates_up_front():
    """Config and batch mismatches fail BEFORE any compute: non-divisible
    case counts, non-mse loss; cfg.hidden/lr are honored (not silently
    defaulted)."""
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases
    from diffus_tpu.render.renderer import render_frame

    t1, z_true, src, dirs = _tiny_scene()
    rcfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    _, _, _, target = render_frame(z_true, src, dirs, 20, rcfg)
    case = CaseSpec(
        t1=np.asarray(t1), target=np.asarray(target),
        mask=np.ones(target.shape, bool), source=np.asarray(src),
        directions=np.asarray(dirs),
    )
    cfg = ImpedanceTrainConfig(num_samples=20, slice_index=12,
                               loss="masked_mse_edge", render=rcfg)
    with pytest.raises(ValueError, match="batch_size"):
        train_impedance_cases(jax.random.PRNGKey(0), [case] * 3, cfg, batch_size=2)
    # an unknown objective still fails fast inside make_sharded_train_step
    # (ssim itself is supported since r3 — see test_train_driver_ssim_loss)
    with pytest.raises(ValueError, match="objective"):
        train_impedance_cases(
            jax.random.PRNGKey(0), [case],
            dataclasses.replace(cfg, loss="nope"), batch_size=1,
        )
    # a non-default MLP width must actually be used (it changes param shapes)
    wide = ImpedanceTrainConfig(num_samples=20, slice_index=12, hidden=(16,),
                                loss="masked_mse_edge", render=rcfg)
    params, hist = train_impedance_cases(
        jax.random.PRNGKey(0), [case], wide, epochs=2, batch_size=1,
    )
    shapes = [tuple(a.shape) for a in jax.tree_util.tree_leaves(params)]
    assert (1, 16) in shapes  # first layer of the (16,) MLP
    assert len(hist) == 2


def test_train_driver_ssim_loss():
    """The flagship SSIM objective runs through the multi-case driver
    (image-shaped targets, rays replicated on the mesh) — r3."""
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases

    t1, z_true, src, dirs = _tiny_scene()
    img = (20, 20)
    rng = np.random.default_rng(0)
    case = CaseSpec(
        t1=np.asarray(t1),
        target=rng.uniform(0, 1, img).astype(np.float32),
        mask=np.ones(img, bool),
        source=np.asarray(src),
        directions=np.asarray(dirs),
    )
    cfg = ImpedanceTrainConfig(
        num_samples=20, slice_index=12, loss="ssim", image_shape=img,
        splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    params, hist = train_impedance_cases(
        jax.random.PRNGKey(0), [case, case], cfg, epochs=2, batch_size=2,
    )
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist)


def test_annealed_pose_recovery_success_floor():
    """End-to-end pose-recovery acceptance (VERDICT r3 weak #6): from a
    fixed 1.5-voxel/0.03-rad perturbation distribution at a reduced
    config-4 workload, the annealed multistart recovery must (a) recover
    the true pose from at least half the starts and (b) have its
    best-loss start within tolerance.  Calibrated r4: this seed measures
    3/4 recovered, best 0.51 voxel / 0.012 rad on CPU.

    Plain Adam at the notebook's lr=1 diverges here (rotation axes
    random-walk under per-parameter normalization) — the annealed
    schedule is what makes the flagship differentiable-rendering claim
    an actual capability rather than a gradient-direction check.
    """
    from diffus_tpu.train.pose_recovery import (
        AnnealedPoseConfig,
        pose_recovery_benchmark,
    )

    dim = 128
    cfg = AnnealedPoseConfig(
        geometry=BeamGeometry(n_rays=64, num_samples=128),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        phases=((2.0, 0.2, 0.01, 60), (0.0, 0.08, 0.004, 140)),
    )
    vol = jnp.asarray(brain_phantom_3d((dim,) * 3))
    true = TransducerPose.create([dim / 2, 4.0, dim / 2])
    out = pose_recovery_benchmark(
        vol, true, cfg, jax.random.PRNGKey(3), count=4,
        radius=1.5, rot_scale=0.03,
    )
    assert out["success_rate"] >= 0.5, out
    assert out["best_recovered"], out
    assert out["best_pos_err"] < 1.0, out


def test_global_stage_pose_recovery_floor_radius6():
    """Capability-envelope floor BEYOND the local descent's ~3-4-voxel
    capture radius (VERDICT r4 #5): from a worst-case 6-voxel prior (on
    the sphere, not inside the ball), the grid-scored global stage
    (recover_pose_global via pose_recovery_benchmark(global_stage=True))
    must put the best-loss start within tolerance.  Calibrated r5 on
    CPU: seeds 0/5/11 recover best 0.79/0.37/0.68 voxel with 2/6 starts
    in tolerance; the LOCAL descent from the same radius strands at
    4-12 voxels (the fan-plane-normal axis captures only ~1-2 voxels and
    frame blur cannot widen it — docs/benchmarking.md r5)."""
    from diffus_tpu.train.pose_recovery import (
        AnnealedPoseConfig,
        pose_recovery_benchmark,
    )

    dim = 128
    cfg = AnnealedPoseConfig(
        geometry=BeamGeometry(n_rays=64, num_samples=128),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        phases=((3.0, 0.25, 0.012, 80), (1.0, 0.12, 0.006, 80),
                (0.0, 0.08, 0.004, 120)),
    )
    vol = jnp.asarray(brain_phantom_3d((dim,) * 3))
    true = TransducerPose.create([dim / 2, 4.0, dim / 2])
    out = pose_recovery_benchmark(
        vol, true, cfg, jax.random.PRNGKey(0), count=6,
        radius=6.0, rot_scale=0.03, global_stage=True, candidates=256,
    )
    assert out["global_stage"] and out["radius"] == 6.0
    assert out["best_recovered"], out
    assert out["best_pos_err"] < 1.0, out
    assert out["success_rate"] >= 1.0 / 6.0, out
