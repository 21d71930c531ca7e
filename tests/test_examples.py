"""Smoke tests for the stored example configs (CT view presets etc.)."""

import importlib.util
import os

import numpy as np
import jax
import jax.numpy as jnp


def _load_ct_render():
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "ct_render.py")
    spec = importlib.util.spec_from_file_location("ct_render_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ct_view_presets_match_notebook_composition():
    """The stored ``perm``/``flip`` must equal the notebook's literal
    permutation chains (``[DEMO] CT Render Lung.ipynb`` cells 20, 25-27):
    side = fan[:, [2,1,0]] with column 1 negated; third =
    fan[:, [2,1,0]][:, [1,2,0]][:, [0,2,1]]."""
    mod = _load_ct_render()
    from diffus_tpu.geometry.fan import fan_directions_2d

    n = 16
    for view, chain in {
        "side": lambda f: np.asarray(f)[:, [2, 1, 0]] * np.array([1, -1, 1]),
        "third": lambda f: np.asarray(f)[:, [2, 1, 0]][:, [1, 2, 0]][:, [0, 2, 1]],
        "front": lambda f: np.asarray(f),
    }.items():
        p = mod.CT_VIEW_PRESETS[view]
        fan = fan_directions_2d(
            p["direction"], p["opening_scale"] * mod.CT_OPENING_ANGLE, n
        )
        got = np.asarray(mod.view_directions(view, n))
        np.testing.assert_allclose(got, chain(fan), atol=1e-7)
        # unit vectors, as generate_cone_directions produces
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-6)


def test_ct_view_preset_renders():
    """Each stored view renders finite frames on the lung phantom with its
    own samples/start/artifact settings (cells 17, 21, 28)."""
    mod = _load_ct_render()
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.phantoms import ct_lung_phantom_3d
    from diffus_tpu.impedance import schneider_webb_impedance

    vol = schneider_webb_impedance(jnp.asarray(ct_lung_phantom_3d((32, 32, 32))))
    src = jnp.array([16.0, 6.0, 16.0])
    for view, p in mod.CT_VIEW_PRESETS.items():
        dirs = mod.view_directions(view, 8)
        cfg = RenderConfig(
            attenuation_coeff=1e-4, start=p["start"], artifacts=p["artifacts"]
        )
        key = jax.random.PRNGKey(0) if p["artifacts"] else None
        _, _, _, frame = render_frame(vol, src, dirs, p["num_samples"], cfg, key)
        assert frame.shape == (8, p["num_samples"] - p["start"])
        assert np.all(np.isfinite(np.asarray(frame))), view


def test_plot_voxels_cuboids(rng):
    """plot_voxels: cuboid view of supra-threshold voxels with the
    reference's (z, y, x) display order (``src/datatype.py:153-172``)."""
    import matplotlib

    matplotlib.use("Agg")
    from diffus_tpu.viz import plot_voxels

    vol = rng.uniform(0, 1, (6, 8, 10))
    ax = plot_voxels(vol, threshold=0.8)
    assert ax.name == "3d"
    # (z, y, x) ordering: the box aspect mirrors the transposed shape
    np.testing.assert_allclose(
        np.asarray(ax._box_aspect) / np.max(ax._box_aspect),
        np.array([10, 8, 6]) / 10.0,
    )
    # striding bounds the mesh for big volumes
    big = np.zeros((80, 80, 80))
    big[:40] = 1.0
    ax2 = plot_voxels(big, max_dim=16)
    assert ax2.name == "3d"


def test_mridataset_plot_voxels(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from diffus_tpu.io.nifti import save_nifti
    from diffus_tpu.io.datasets import MRIDataset

    path = str(tmp_path / "v.nii.gz")
    save_nifti(path, np.random.default_rng(0).uniform(0, 1, (8, 8, 8)).astype(np.float32),
               np.eye(4))
    ds = MRIDataset([path])
    ax = ds.plot_voxels(0, threshold=0.9)
    assert ax.name == "3d"
