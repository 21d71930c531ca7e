"""End-to-end walkthrough: the reference's whole study on one phantom.

Chains every workflow the reference spreads across notebooks
(SURVEY sections 3.2-3.5) into one script:

  1. scene calibration from fan edge lines (REUBEN notebooks)
  2. tissue-table impedance + MLP pretraining (REUBEN cell 1)
  3. B-mode render + differentiable splat (plot_beam_frame ->
     differentiable_splat)
  4. renderer-in-the-loop impedance training ([DEMO] Train MRI to
     Impedance MLP)
  5. 6-DoF pose recovery by gradient descent ([NW] alignement)

Runs in ~a minute on CPU:

    JAX_PLATFORMS=cpu python examples/full_pipeline.py --size 48
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
from diffus_tpu.scene import build_scene_from_edges
from diffus_tpu.impedance import default_table_points, tabular_impedance_volume
from diffus_tpu.ops.splat import differentiable_splat
from diffus_tpu.phantoms import t1_phantom_3d
from diffus_tpu.train.impedance_train import ImpedanceTrainConfig, train_impedance
from diffus_tpu.train.pose_recovery import (
    PoseRecoveryConfig,
    recover_pose_multistart,
    render_pose,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--rays", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--pose-steps", type=int, default=100)
    args = ap.parse_args()
    n = args.size

    # 1. scene from hand-fit fan edge lines (identity affines: phantom space)
    t0 = time.time()
    scene = build_scene_from_edges(
        m_left=1.0, b_left=0.0, m_right=-1.0, b_right=2.0 * (n / 2.0),
        us_affine=np.eye(4, dtype=np.float32), t1_affine=np.eye(4, dtype=np.float32),
        slice_idx=n // 2, n_rays=args.rays, d1=0.0, d2=float(n // 2),
    )
    print(f"[1] scene: apex={np.asarray(scene.source)}, "
          f"angle={np.degrees(scene.calibration.opening_angle):.1f} deg, "
          f"samples={scene.geometry.num_samples}")

    # 2. impedance: tissue table applied to a synthetic T1 volume
    t1 = jnp.asarray(t1_phantom_3d((n,) * 3))
    tx, ty = default_table_points()
    z_true = tabular_impedance_volume(t1, tx, ty)
    print(f"[2] impedance volume: Z in [{float(z_true.min()):.2e}, "
          f"{float(z_true.max()):.2e}] Rayl")

    # 3. render the "real" frame from the true impedance + splat target
    rcfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    x, y, _, frame = scene.render(z_true, rcfg)
    target = differentiable_splat(
        x.astype(jnp.float32), y.astype(jnp.float32), frame, 32, 32, 2.0
    )
    print(f"[3] rendered {frame.shape} frame; splat {target.shape}, "
          f"max={float(target.max()):.2e}")

    # 4. train the MRI->Z MLP against the splatted target through the render
    tcfg = ImpedanceTrainConfig(
        num_samples=scene.geometry.num_samples, slice_index=n // 2,
        epochs=args.epochs, lr=0.01, loss="masked_mse_edge",
        image_shape=(32, 32), splat_axes=(0, 1), render=rcfg,
    )
    params, losses = train_impedance(
        jax.random.PRNGKey(0), t1, target, scene.source, scene.directions,
        tcfg, mask=jnp.ones((32, 32), bool),
    )
    l = np.asarray(losses)
    print(f"[4] impedance training: loss {l[0]:.5f} -> {l[-1]:.5f} "
          f"({args.epochs} epochs)")
    assert l[-1] < l[0]

    # 5. recover a perturbed pose by gradient descent through the render
    # a narrower fan than the calibration's 90 deg keeps more rays inside
    # the tiny phantom, giving the pose loss usable structure
    geom = BeamGeometry(n_rays=args.rays, num_samples=scene.geometry.num_samples,
                        opening_angle=np.radians(40.0))
    pcfg = PoseRecoveryConfig(geometry=geom, render=rcfg,
                              steps=args.pose_steps, lr=0.05)
    true_pose = TransducerPose.create(scene.source)
    offset = np.array([1.5, -1.0, 0.0], np.float32)
    # the render-MSE landscape is multi-modal (sparse echo spikes) —
    # descend from a batch of initializations and keep the best basin
    rng = np.random.default_rng(0)
    inits = TransducerPose.create(
        np.asarray(scene.source)[None, :] + offset[None, :]
        + rng.uniform(-1.0, 1.0, (6, 3)).astype(np.float32),
        rotvec=np.zeros((6, 3), np.float32),
    )
    target_p = render_pose(z_true, true_pose, pcfg)
    recovered, losses, best = recover_pose_multistart(z_true, target_p, inits, pcfg)
    best_pos = jax.tree_util.tree_map(lambda a: a[best], recovered).position
    err0 = float(jnp.linalg.norm(jnp.asarray(offset)))
    err1 = float(jnp.linalg.norm(best_pos - true_pose.position))
    print(f"[5] pose recovery (6 starts x {args.pose_steps} steps): "
          f"position error {err0:.3f} -> {err1:.3f} voxels")
    assert err1 < err0

    print(f"full pipeline OK in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
