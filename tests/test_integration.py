"""End-to-end integration: the complete user journey on a synthetic case.

Save a ReMIND-layout case to disk -> discover it -> load (native decoder
when available) -> calibrate a scene from a preset -> map impedance ->
render -> form the B-mode image -> train the impedance MLP a few epochs
-> recover a perturbed pose.  One test, the whole pipeline.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
from diffus_tpu.io import save_nifti, find_remind_cases, scene_from_preset
from diffus_tpu.impedance import default_table_points, tabular_impedance_volume
from diffus_tpu.ops.splat import splat_frame
from diffus_tpu.train import (
    ImpedanceTrainConfig,
    train_impedance,
    PoseRecoveryConfig,
    render_pose,
    recover_pose,
)
from diffus_tpu.phantoms import t1_phantom_3d, brain_phantom_3d


def test_full_pipeline(tmp_path, rng):
    dim = 32
    # 1. write a ReMIND-layout case (ceT1 + iUS) and discover it
    t1 = t1_phantom_3d((dim,) * 3)
    ius = rng.uniform(0, 255, (dim,) * 3).astype(np.float32)
    affine = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
    save_nifti(os.path.join(str(tmp_path), "ReMIND2Reg_0046_0001.nii.gz"), t1, affine)
    save_nifti(os.path.join(str(tmp_path), "ReMIND2Reg_0046_0000.nii.gz"), ius, affine)
    cases = find_remind_cases(str(tmp_path))
    assert 46 in cases
    vol = cases[46].load("cet1")
    np.testing.assert_allclose(np.asarray(vol.spacing), [0.5] * 3, rtol=1e-5)

    # 2. scene from the stored preset (scaled into the small test volume)
    import dataclasses

    scene = scene_from_preset(46, np.asarray(vol.affine), np.asarray(vol.affine),
                              n_rays=16)
    scene = dataclasses.replace(
        scene,
        source=jnp.array([dim / 2.0, 2.0, dim / 2.0]),
        geometry=BeamGeometry(n_rays=16, num_samples=24,
                              opening_angle=scene.geometry.opening_angle),
    )

    # 3. impedance map + render + image formation
    tx, ty = default_table_points()
    z_vol = tabular_impedance_volume(vol.data, tx, ty)
    cfg = RenderConfig(attenuation_coeff=1e-4)
    x, y, z, frame = scene.render(z_vol, cfg)
    assert frame.shape == (16, 24)
    assert np.all(np.isfinite(np.asarray(frame)))
    image = splat_frame((x, y, z), frame, (0, 1), (32, 32))
    assert image.shape == (32, 32)

    # 4. train the impedance MLP against the rendered target a few epochs
    tcfg = ImpedanceTrainConfig(
        num_samples=24, slice_index=dim // 2, epochs=4, lr=0.01,
        loss="masked_mse_edge", image_shape=(32, 32), splat_axes=(0, 1),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
    )
    params, losses = train_impedance(
        jax.random.PRNGKey(0), vol.data, image, scene.source, scene.directions,
        tcfg, mask=jnp.ones((32, 32), bool), pretrain_table=True,
    )
    assert np.all(np.isfinite(np.asarray(losses)))

    # 5. pose recovery from a perturbed init on the true impedance volume
    z_true = jnp.asarray(brain_phantom_3d((dim,) * 3))
    pcfg = PoseRecoveryConfig(
        geometry=BeamGeometry(n_rays=8, num_samples=20,
                              opening_angle=np.radians(40)),
        render=RenderConfig(attenuation_coeff=1e-4, interp="trilinear"),
        lr=0.05, steps=40,
    )
    true_pose = TransducerPose.create([dim / 2.0, 1.0, dim / 2.0])
    target = render_pose(z_true, true_pose, pcfg)
    init = TransducerPose.create([dim / 2.0 + 1.5, 2.0, dim / 2.0 - 1.0])
    pose, plosses = recover_pose(z_true, target, init, pcfg)
    assert float(plosses[-1]) < float(plosses[0])
