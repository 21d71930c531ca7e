"""Multi-device sharding on the virtual 8-device CPU mesh.

Validates that sharded execution is numerically identical to
single-device execution (sweep) and that the data-parallel training step
compiles + runs with real (pose, ray) shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_sweep
from diffus_tpu.parallel import make_mesh, default_mesh, sharded_render_sweep
from diffus_tpu.geometry.fan import fan_directions_2d
from diffus_tpu.phantoms import brain_phantom_3d

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_construction():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"pose": 2, "ray": 4}
    mesh = default_mesh(8)
    assert mesh.shape["pose"] * mesh.shape["ray"] == 8


@pytest.mark.parametrize("pose_m,ray_m", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_sweep_matches_single_device(pose_m, ray_m):
    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    rng = np.random.default_rng(0)
    sources = jnp.asarray(
        np.array([12.0, 1.0, 12.0], np.float32)[None]
        + rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    )
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 8)
    cfg = RenderConfig(attenuation_coeff=1e-4)

    mesh = make_mesh(pose_m, ray_m)
    _, _, _, sharded = sharded_render_sweep(mesh, vol, sources, dirs, 16, cfg)
    _, _, _, single = render_sweep(vol, sources, dirs, 16, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("n_pose,n_rays", [(5, 8), (4, 6), (3, 5)])
def test_sharded_sweep_pads_non_divisible(n_pose, n_rays):
    """Pose/ray counts that don't divide the mesh axes are padded and
    sliced back — the result must equal the single-device render of the
    ORIGINAL (unpadded) inputs (PARITY.md sharding contract)."""
    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    rng = np.random.default_rng(1)
    sources = jnp.asarray(
        np.array([12.0, 1.0, 12.0], np.float32)[None]
        + rng.uniform(-1, 1, (n_pose, 3)).astype(np.float32)
    )
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), n_rays)
    cfg = RenderConfig(attenuation_coeff=1e-4)

    mesh = make_mesh(2, 4)
    xs, ys, zs, sharded = sharded_render_sweep(mesh, vol, sources, dirs, 16, cfg)
    x1, y1, z1, single = render_sweep(vol, sources, dirs, 16, cfg)
    assert sharded.shape == single.shape == (n_pose, n_rays, 16)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x1))


def test_sharded_sweep_padding_start_contract():
    """Pose padding is safe under start>0 (poses are independent); RAY
    padding is NOT (the start patch medians across rays, renderer.py:243)
    and must raise rather than contaminate real rays."""
    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    rng = np.random.default_rng(2)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 8)  # divides ray=4
    sources = jnp.asarray(
        np.array([12.0, 1.0, 12.0], np.float32)[None]
        + rng.uniform(-1, 1, (5, 3)).astype(np.float32)  # pads to pose mult.
    )
    cfg = RenderConfig(attenuation_coeff=1e-4, start=4)
    mesh = make_mesh(2, 4)
    _, _, _, sharded = sharded_render_sweep(mesh, vol, sources, dirs, 16, cfg)
    _, _, _, single = render_sweep(vol, sources, dirs, 16, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
    )

    bad_dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="ray padding would corrupt"):
        sharded_render_sweep(mesh, vol, sources, bad_dirs, 16, cfg)
    acfg = RenderConfig(attenuation_coeff=1e-4, artifacts=True)
    with pytest.raises(ValueError, match="ray padding would corrupt"):
        sharded_render_sweep(mesh, vol, sources, bad_dirs, 16, acfg)


def test_shard_batch_rejects_non_divisible(rng):
    """Training batches must divide the mesh exactly — padding scenes
    would change the mean loss, so it's an error, not a silent pad."""
    from diffus_tpu.parallel import shard_batch

    mesh = make_mesh(2, 4)
    dim, rays, samples, B = 8, 8, 6, 3  # B=3 does not divide pose=2
    batch = (
        jnp.zeros((B, dim, dim, dim)),
        jnp.zeros((B, rays, samples)),
        jnp.ones((B, rays, samples), bool),
        jnp.zeros((B, 3)),
        jnp.zeros((B, rays, 3)),
    )
    with pytest.raises(ValueError, match="divide the mesh"):
        shard_batch(mesh, batch)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # compile-check on tiny shapes instead of the 256^3 bench volume
    import jax.numpy as jnp
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d

    vol = jnp.asarray(brain_phantom_3d((16, 16, 16)))
    src = jnp.array([8.0, 1.0, 8.0])
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45), 8)
    out = jax.jit(
        lambda v, s, d: render_frame(v, s, d, 12, RenderConfig(attenuation_coeff=1e-4))[3]
    )(vol, src, dirs)
    assert out.shape == (8, 12)


def test_depth_sharded_scan_matches_single_device(rng):
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.ops.propagation import echo_amplitudes

    mesh = make_mesh(1, 8)
    r = jnp.asarray(rng.uniform(-0.7, 0.7, (6, 64)).astype(np.float32))
    got = np.asarray(echo_amplitudes_depth_sharded(r, mesh, axis="ray"))
    want = np.asarray(echo_amplitudes(r))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_depth_sharded_scan_strong_reflectors(rng):
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.ops.propagation import echo_amplitudes

    mesh = make_mesh(1, 4)
    r = rng.uniform(-0.2, 0.2, (2, 32)).astype(np.float32)
    r[:, ::7] = 0.995
    got = np.asarray(echo_amplitudes_depth_sharded(jnp.asarray(r), mesh, axis="ray"))
    want = np.asarray(echo_amplitudes(jnp.asarray(r)))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("pose_m,ray_m", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_train_step_matches_single_device(rng, pose_m, ray_m):
    """The GSPMD-sharded training step must produce the same loss and
    parameter update as an unsharded evaluation of the same batch, on
    every 8-device mesh factorization."""
    import optax
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.train.impedance_train import ImpedanceTrainConfig
    from diffus_tpu.impedance.mlp import init_params, impedance_slice_zscore
    from diffus_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.train.losses import masked_mse_edge_loss

    dim, rays, samples, B = 16, 8, 12, 8
    cfg = ImpedanceTrainConfig(
        num_samples=samples, slice_index=dim // 2, loss="masked_mse_edge",
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    t1 = jnp.asarray(rng.uniform(100, 2000, (B, dim, dim, dim)).astype(np.float32))
    targets = jnp.asarray(rng.uniform(0, 1, (B, rays, samples)).astype(np.float32))
    masks = jnp.ones((B, rays, samples), bool)
    sources = jnp.asarray(np.tile([dim / 2, 1.0, dim / 2], (B, 1)).astype(np.float32))
    dirs = jnp.broadcast_to(
        fan_directions_2d([0.0, 1.0], np.radians(40), rays)[None], (B, rays, 3)
    )

    params = init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)

    # unsharded reference step
    def scene_loss(p, t1v, target, mask, src, d):
        z_slice = impedance_slice_zscore(p, t1v[:, :, cfg.slice_index])
        z_vol = t1v.at[:, :, cfg.slice_index].set(z_slice)
        _, _, _, frame = render_frame(z_vol, src, d, samples, cfg.render)
        return masked_mse_edge_loss(frame, target, mask, cfg.edge_weight)

    def batch_loss(p):
        return jnp.mean(jax.vmap(scene_loss, in_axes=(None, 0, 0, 0, 0, 0))(
            p, t1, targets, masks, sources, dirs))

    loss_ref, grads_ref = jax.value_and_grad(batch_loss)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    mesh = make_mesh(pose_m, ray_m)
    with mesh:
        step_fn, init_opt = make_sharded_train_step(mesh, cfg)
        batch = shard_batch(mesh, (t1, targets, masks, sources, dirs))
        params_sh, _, loss_sh = step_fn(params, init_opt(params), batch)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_sh),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("pose_m,ray_m", [(1, 8), (2, 4), (8, 1)])
def test_sharded_ssim_train_step_matches_single_device(rng, pose_m, ray_m):
    """The flagship SSIM objective (splatted-image loss) rides the mesh
    pose-DP (rays replicated: the splat couples them) — VERDICT r2 weak
    #4.  Loss and update must match the unsharded step on every
    factorization."""
    import optax
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.train.impedance_train import (
        ImpedanceTrainConfig, synth_forward,
    )
    from diffus_tpu.impedance.mlp import init_params
    from diffus_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
    from diffus_tpu.train.losses import ssim_loss

    dim, rays, samples, B, img = 16, 8, 12, 8, (24, 24)
    cfg = ImpedanceTrainConfig(
        num_samples=samples, slice_index=dim // 2, loss="ssim",
        image_shape=img, splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    t1 = jnp.asarray(rng.uniform(100, 2000, (B, dim, dim, dim)).astype(np.float32))
    targets = jnp.asarray(rng.uniform(0, 1, (B,) + img).astype(np.float32))
    masks = jnp.ones((B,) + img, bool)
    sources = jnp.asarray(np.tile([dim / 2, 1.0, dim / 2], (B, 1)).astype(np.float32))
    dirs = jnp.broadcast_to(
        fan_directions_2d([0.0, 1.0], np.radians(40), rays)[None], (B, rays, 3)
    )

    params = init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)

    def batch_loss(p):
        def one(t1v, target, src, d):
            return ssim_loss(synth_forward(p, t1v, src, d, cfg), target)

        return jnp.mean(jax.vmap(one)(t1, targets, sources, dirs))

    loss_ref, grads_ref = jax.value_and_grad(batch_loss)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    mesh = make_mesh(pose_m, ray_m)
    with mesh:
        step_fn, init_opt = make_sharded_train_step(mesh, cfg)
        batch = shard_batch(mesh, (t1, targets, masks, sources, dirs),
                            shard_rays=False)
        params_sh, _, loss_sh = step_fn(params, init_opt(params), batch)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_sh),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("pose_m,ray_m,count", [(2, 4, 8), (8, 1, 5), (4, 2, 3)])
def test_sharded_multistart_matches_single_device(rng, pose_m, ray_m, count):
    """Multistart pose recovery sharded over all mesh devices (with
    repeat-padding for non-divisible init counts) must match the
    unsharded vmap run init-for-init."""
    from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
    from diffus_tpu.train.pose_recovery import (
        PoseRecoveryConfig, recover_pose_multistart, render_pose,
        sample_init_poses,
    )
    from diffus_tpu.parallel import make_mesh, sharded_recover_pose_multistart

    dim = 16
    vol = jnp.asarray(rng.uniform(0.5, 2.5, (dim, dim, dim)).astype(np.float32))
    cfg = PoseRecoveryConfig(
        geometry=BeamGeometry(n_rays=6, num_samples=10),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        lr=0.1, steps=8,
    )
    target = render_pose(vol, TransducerPose.create([dim / 2, 1.0, dim / 2]), cfg)
    inits = sample_init_poses(
        jax.random.PRNGKey(3), [dim / 2, 2.0, dim / 2], 1.5, 0.05, count
    )

    poses_ref, losses_ref, best_ref = recover_pose_multistart(vol, target, inits, cfg)

    mesh = make_mesh(pose_m, ray_m)
    with mesh:
        poses_sh, losses_sh, best_sh = sharded_recover_pose_multistart(
            mesh, vol, target, inits, cfg
        )
    assert losses_sh.shape == (count, cfg.steps)
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(losses_ref), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(poses_sh.position), np.asarray(poses_ref.position),
        rtol=1e-4, atol=1e-5,
    )
    assert int(best_sh) == int(best_ref)


def test_depth_sharded_scan_headline_depth(rng):
    """SP/CP analogue at the headline 512-sample depth on the 8-way axis."""
    from diffus_tpu.parallel import make_mesh
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.ops.propagation import echo_amplitudes

    mesh = make_mesh(1, 8)
    r = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 512)).astype(np.float32))
    got = echo_amplitudes_depth_sharded(r, mesh, axis="ray")
    want = echo_amplitudes(r)
    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-12))
    assert err < 5e-3, err


def test_sharded_sweep_forced_k2_matches_single_device(monkeypatch):
    """The K=2 pair sampler (TPU auto-path, round 4) must ride the mesh
    like the per-sample tile sampler: forced on CPU, the (2,4)-mesh
    sharded sweep must match the unsharded render."""
    from diffus_tpu.render import renderer as rmod

    orig = rmod._resolve_sampler

    def force_k2(interp, num_samples=0, step=1.0):
        if interp == "trilinear" and num_samples % 2 == 0 and step <= 1.0:
            return "trilinear_tile_k2"
        return orig(interp, num_samples, step)

    monkeypatch.setattr(rmod, "_resolve_sampler", force_k2)
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.uniform(0.5, 2.5, (20, 20, 20)).astype(np.float32))
    dirs = fan_directions_2d([0.1, 1.0], np.radians(45.0), 8)
    sources = jnp.asarray(
        np.array([10.0, 1.0, 10.0], np.float32)[None]
        + rng.uniform(-2, 2, (4, 3)).astype(np.float32)
    )
    # distinct sample count (18) so no cached no-k2 jit entry is reused
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    _, _, _, sharded = sharded_render_sweep(mesh, vol, sources, dirs, 18, cfg)
    _, _, _, local = render_sweep(vol, sources, dirs, 18, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local), rtol=2e-5, atol=1e-7
    )


# --- tensor parallelism for scaled-width impedance MLPs (round 4b) ----------


def test_tp_table_fit_matches_single_device():
    """Megatron-style column/row GSPMD sharding of a 64-wide impedance
    MLP: the TP fit's loss trajectory and final params match the
    unsharded fit to f32 reassociation tolerance, and the kernels are
    genuinely distributed (not silently replicated)."""
    from diffus_tpu.impedance.mlp import init_params, train_on_table
    from diffus_tpu.impedance.table import table_arrays
    from diffus_tpu.parallel import make_mesh, tp_train_on_table

    x, y, _ = table_arrays()
    hidden = (64, 64)
    params = init_params(jax.random.PRNGKey(0), hidden)
    mesh = make_mesh(2, 4)
    p_tp, loss_tp = tp_train_on_table(
        mesh, params, x, y, hidden=hidden, epochs=50, lr=1e-3
    )
    p_ref, loss_ref = train_on_table(
        params, jnp.asarray(x).reshape(-1, 1), jnp.asarray(y).reshape(-1, 1),
        hidden=hidden, epochs=50, lr=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(loss_tp), np.asarray(loss_ref), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    for layer in ("Dense_0", "Dense_1"):
        assert not p_tp["params"][layer]["kernel"].sharding.is_fully_replicated
    # column layer: features sharded over `ray`
    assert (
        p_tp["params"]["Dense_0"]["kernel"].sharding.spec[1] == "ray"
    )


def test_tp_rejects_nondivisible_width():
    from diffus_tpu.impedance.mlp import init_params
    from diffus_tpu.parallel import make_mesh
    from diffus_tpu.parallel.tp import tp_shard_params

    params = init_params(jax.random.PRNGKey(0), (30, 30))
    with pytest.raises(ValueError, match="does not divide"):
        tp_shard_params(make_mesh(2, 4), params)


def test_tp_accepts_replicated_nondivisible_dims():
    """Only dims the layout actually shards must divide the axis: hidden
    (8, 12, 8) on an 8-way axis is valid (the 12-wide row-layer bias is
    replicated) — the old max(shape) guard spuriously rejected it."""
    from diffus_tpu.impedance.mlp import init_params
    from diffus_tpu.parallel import make_mesh
    from diffus_tpu.parallel.tp import tp_shard_params

    params = init_params(jax.random.PRNGKey(0), (8, 12, 8))
    sharded = tp_shard_params(make_mesh(1, 8), params)
    assert not (
        sharded["params"]["Dense_0"]["kernel"].sharding.is_fully_replicated
    )
