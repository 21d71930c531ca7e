"""Scene-setup API and host-side visualization smoke tests."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np

from diffus_tpu.scene import build_scene_from_edges
from diffus_tpu.types import RenderConfig
from diffus_tpu.ops.propagation import propagate_boundary
from diffus_tpu.render.renderer import trace_multi_source
from diffus_tpu.viz import (
    plot_frame,
    sector_points,
    plot_sector,
    plot_histogram,
    plot_edge_lines,
    plot_cone_overlay,
    plot_median_line,
    render_video,
    render_video_frame,
)
from diffus_tpu.phantoms import brain_phantom_3d
from diffus_tpu.geometry.fan import fan_directions_2d


def test_build_scene_from_edges_identity_affines():
    scene = build_scene_from_edges(
        m_left=1.0, b_left=10.0, m_right=-1.0, b_right=110.0,
        us_affine=np.eye(4), t1_affine=np.eye(4),
        slice_idx=5, n_rays=16, d1=10, d2=40, us_slice_shape=(64, 64),
    )
    assert scene.directions.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(scene.source), [50.0, 60.0, 5.0], atol=1e-4)
    np.testing.assert_allclose(scene.geometry.opening_angle, np.pi / 2, rtol=1e-5)
    assert scene.geometry.num_samples == 40
    assert scene.us_mask is not None and scene.us_mask.shape == (64, 64)
    # the scene renders end-to-end
    vol = jnp.asarray(brain_phantom_3d((64, 64, 64)))
    x, y, z, frame = scene.render(vol, RenderConfig(attenuation_coeff=1e-4))
    assert frame.shape == (16, 40)
    assert np.all(np.isfinite(np.asarray(frame)))


def test_propagate_boundary_example():
    # r = 1/3 between Z=1 and Z=2 (forward_physics worked example)
    g_r, d_l = propagate_boundary(jnp.array(1.0), jnp.array(0.0), jnp.array(1.0 / 3.0))
    np.testing.assert_allclose(float(g_r), 4.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(d_l), 1.0 / 3.0, rtol=1e-6)
    _, d_l_sym = propagate_boundary(
        jnp.array(1.0), jnp.array(0.0), jnp.array(1.0 / 3.0), mode="symmetric"
    )
    np.testing.assert_allclose(float(d_l_sym), -1.0 / 3.0, rtol=1e-6)


def test_trace_multi_source(rng):
    vol = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32))
    sources = jnp.asarray(rng.uniform(2, 14, (3, 3)).astype(np.float32))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(30), 4)
    idx, vals = trace_multi_source(vol, sources, dirs, 8)
    assert idx.shape == (3, 4, 8, 3)
    assert vals.shape == (3, 4, 8)


def test_viz_smoke(rng):
    frame = rng.uniform(0, 1, (8, 16)).astype(np.float32)
    angles = np.linspace(-0.4, 0.4, 8)
    plot_frame(frame)
    xs, zs, vals = sector_points(frame, angles, spacing=0.5)
    assert xs.shape == (8 * 16,)
    # vectorized sector geometry: depth 0 at origin, median ray on +z
    np.testing.assert_allclose(zs[:16], np.cos(angles[0]) * np.arange(16) * 0.5)
    plot_sector(frame, angles)
    plot_histogram(rng.normal(size=(4, 4, 4)))
    us = rng.uniform(0, 1, (32, 32))
    plot_edge_lines(us, 1.0, 2.0, -1.0, 30.0)
    plot_cone_overlay(us, us > 0.5)
    plot_median_line(us, (16, 0), (0, 1), 5, 20)


def test_video_smoke(rng):
    triplets = [
        (rng.uniform(0, 1, 20), rng.uniform(0, 1, 20), rng.uniform(0, 1, 20))
        for _ in range(3)
    ]
    anim = render_video(triplets)
    assert anim is not None
    frames = [rng.uniform(0, 1, (8, 8)) for _ in range(3)]
    anim2 = render_video_frame(frames)
    assert anim2 is not None


def test_scene_from_preset():
    from diffus_tpu.io import scene_from_preset, CASE_PRESETS

    assert set(CASE_PRESETS) == {46, 50, 55, 63}
    scene = scene_from_preset(46, np.eye(4), np.eye(4), n_rays=32)
    # apex = intersection of y=-0.7x+80 and y=0.6x+95: x=(95-80)/(-0.7-0.6)
    x0 = (95.0 - 80.0) / (-0.7 - 0.6)
    y0 = -0.7 * x0 + 80.0
    np.testing.assert_allclose(np.asarray(scene.source)[:2], [x0, y0], rtol=1e-4)
    assert scene.geometry.num_samples == 230
    assert scene.d1 == 110.0
    assert scene.directions.shape == (32, 3)


def test_viz_aligned_and_3d(rng):
    from diffus_tpu.viz import plot_aligned_pair, plot_volume_3d

    a = rng.uniform(0, 1, (16, 16))
    b = rng.uniform(0, 1, (16, 16))
    axes = plot_aligned_pair(a, (4, 5), b, (6, 7))
    assert len(axes) == 2
    ax = plot_volume_3d(rng.uniform(0, 1, (8, 8, 8)), threshold=0.7)
    assert ax is not None


def test_scene_step_wired_from_affines():
    """One depth step spans one US pixel, converted to MRI voxels via the
    affines: 0.5mm US pixels / 1mm MRI voxels -> step 0.5."""
    from diffus_tpu.scene import build_scene_from_edges

    us_affine = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
    t1_affine = np.eye(4, dtype=np.float32)
    scene = build_scene_from_edges(
        m_left=1.0, b_left=0.0, m_right=-1.0, b_right=200.0,
        us_affine=us_affine, t1_affine=t1_affine, slice_idx=10,
        n_rays=8, d1=0.0, d2=32.0,
    )
    assert abs(scene.geometry.step - 0.5) < 1e-5
    # identity-to-identity stays at the reference's implicit step of 1
    scene1 = build_scene_from_edges(
        m_left=1.0, b_left=0.0, m_right=-1.0, b_right=200.0,
        us_affine=np.eye(4, dtype=np.float32), t1_affine=np.eye(4, dtype=np.float32),
        slice_idx=10, n_rays=8, d1=0.0, d2=32.0,
    )
    assert abs(scene1.geometry.step - 1.0) < 1e-5


def test_scene_render_volume_and_delays():
    """Scene.render accepts a Volume and can return mm-true echo delays
    (reference src/renderer.py:455-457 returns delays_us; here per-ray,
    anisotropy-aware)."""
    from diffus_tpu.scene import build_scene_from_edges
    from diffus_tpu.types import Volume
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.phantoms import brain_phantom_3d

    vol_arr = brain_phantom_3d((24, 24, 24))
    spacing = np.array([0.5, 0.5, 2.0], np.float32)
    volume = Volume.from_array(vol_arr, spacing=spacing)
    scene = build_scene_from_edges(
        m_left=1.0, b_left=0.0, m_right=-1.0, b_right=20.0,
        us_affine=np.eye(4, dtype=np.float32), t1_affine=np.eye(4, dtype=np.float32),
        slice_idx=12, n_rays=6, d1=0.0, d2=16.0,
    )
    cfg = RenderConfig(attenuation_coeff=1e-4)
    x, y, z, frame, delays = scene.render(volume, cfg, return_delays=True)
    assert delays.shape == frame.shape

    # Volume and raw-array renders agree
    _, _, _, frame_raw = render_frame(
        jnp.asarray(vol_arr), scene.source, scene.directions,
        scene.geometry.num_samples, cfg, step=scene.geometry.step,
    )
    np.testing.assert_allclose(np.asarray(frame), np.asarray(frame_raw), rtol=1e-6)

    # delays: 2 * i * step * ||dir * spacing|| / c, per ray
    dirs = np.asarray(scene.directions)
    mm = scene.geometry.step * np.linalg.norm(dirs * spacing[None, :], axis=-1)
    want = 2.0 * mm[:, None] * np.arange(frame.shape[1])[None, :] / 1.54e3
    np.testing.assert_allclose(np.asarray(delays), want, rtol=1e-5)


def test_frame_time_delays_reference_scalar_parity():
    """Isotropic spacing + unit directions reduce to the reference's
    delays_us = 2 * spacing * arange(n) / c (src/renderer.py:455)."""
    from diffus_tpu.render.renderer import frame_time_delays
    from diffus_tpu.ops.propagation import echo_time_delays

    dirs = jnp.asarray(np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], np.float32))
    got = frame_time_delays(0.7, dirs, 12, RenderConfig(attenuation_coeff=0.1))
    want = np.asarray(echo_time_delays(12, spacing=0.7))
    for r in range(2):
        np.testing.assert_allclose(np.asarray(got[r]), want, rtol=1e-6)


def test_scene_parity_step_escape_hatch():
    """parity_step=True forces the reference's implicit step of 1.0 even
    for non-identity affine pairs (ADVICE r2)."""
    us_affine = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
    t1_affine = np.eye(4, dtype=np.float32)
    kw = dict(
        m_left=1.0, b_left=0.0, m_right=-1.0, b_right=200.0,
        us_affine=us_affine, t1_affine=t1_affine, slice_idx=10,
        n_rays=8, d1=0.0, d2=32.0,
    )
    assert abs(build_scene_from_edges(**kw).geometry.step - 0.5) < 1e-5
    assert build_scene_from_edges(**kw, parity_step=True).geometry.step == 1.0


class TestIsosurface:
    def test_sphere_isosurface_vertices_on_radius(self):
        from diffus_tpu.viz import marching_tetrahedra

        n, r = 24, 8.0
        g = np.arange(n) - (n - 1) / 2.0
        xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
        dist = np.sqrt(xs**2 + ys**2 + zs**2)
        verts, faces = marching_tetrahedra(dist, level=r)
        assert len(faces) > 100
        assert faces.max() < len(verts)
        center = (n - 1) / 2.0
        vr = np.linalg.norm(verts - center, axis=1)
        # linear interpolation of a radial field: vertices within a voxel
        assert np.all(np.abs(vr - r) < 0.75), (vr.min(), vr.max())

    def test_empty_when_level_outside_range(self):
        from diffus_tpu.viz import marching_tetrahedra

        vol = np.zeros((5, 5, 5))
        verts, faces = marching_tetrahedra(vol, level=1.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_step_decimation_consistent(self):
        from diffus_tpu.viz import marching_tetrahedra

        n = 20
        g = np.arange(n) - (n - 1) / 2.0
        xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
        dist = np.sqrt(xs**2 + ys**2 + zs**2)
        verts, faces = marching_tetrahedra(dist, level=6.0, step=2)
        assert len(faces) > 20
        vr = np.linalg.norm(verts - (n - 1) / 2.0, axis=1)
        assert np.all(np.abs(vr - 6.0) < 1.6)  # coarser grid, looser band

    def test_plot_volume_isosurface_smoke(self):
        from diffus_tpu.viz import plot_volume_isosurface

        vol = brain_phantom_3d((24, 24, 24))
        ax = plot_volume_isosurface(vol)
        assert ax is not None

    def test_plot_slices_grid(self):
        from diffus_tpu.viz import plot_slices, plot_slice

        vol = brain_phantom_3d((16, 16, 16))
        fig = plot_slices(vol, n=3, axis=2)
        assert len([a for a in fig.axes if a.images]) >= 9
        img = plot_slice(vol, slice_id=8, axis=1)
        assert img.shape == (16, 16)


class TestCropToContent:
    def _scene(self, rng):
        vol = np.zeros((40, 48, 44), np.float32)
        vol[10:30, 12:36, 8:32] = rng.uniform(1.0, 2.0, (20, 24, 24)).astype(np.float32)
        return vol

    def test_crop_preserves_render(self, rng):
        """Rendering the cropped volume with the shifted source must equal
        the full-volume render while the rays stay inside the crop."""
        from diffus_tpu.scene import crop_to_content
        from diffus_tpu.render.renderer import render_frame
        from diffus_tpu.geometry.fan import fan_directions_2d
        from diffus_tpu.types import RenderConfig

        vol = self._scene(rng)
        cropped, offset = crop_to_content(vol, margin=6)
        assert cropped.shape <= vol.shape
        src = jnp.asarray(np.array([20.0, 14.0, 20.0], np.float32))
        dirs = fan_directions_2d([0.0, 1.0], np.radians(30.0), 6)
        cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
        # 18 samples from y=14: stays within the padded crop box
        _, _, _, full = render_frame(jnp.asarray(vol), src, dirs, 18, cfg)
        x, y, z, crop_frame = render_frame(
            cropped, src - jnp.asarray(offset, jnp.float32), dirs, 18, cfg
        )
        np.testing.assert_allclose(
            np.asarray(crop_frame), np.asarray(full), rtol=1e-5, atol=1e-7
        )

    def test_crop_volume_affine_world_preserved(self, rng):
        from diffus_tpu.scene import crop_to_content
        from diffus_tpu.types import Volume
        from diffus_tpu.geometry.affine import voxel_to_world

        affine = np.eye(4, dtype=np.float32)
        affine[:3, :3] = np.diag([0.5, 0.7, 0.9]).astype(np.float32)
        affine[:3, 3] = [5.0, -3.0, 2.0]
        v = Volume.from_array(self._scene(rng), affine=affine)
        cv, offset = crop_to_content(v, margin=2, multiple=1)
        # the same physical voxel maps to the same world point
        p_crop = np.array([3.0, 4.0, 5.0], np.float32)
        w_crop = np.asarray(voxel_to_world(jnp.asarray(p_crop), cv.affine))
        w_full = np.asarray(
            voxel_to_world(jnp.asarray(p_crop + offset), v.affine)
        )
        np.testing.assert_allclose(w_crop, w_full, rtol=1e-6, atol=1e-5)

    def test_crop_mask_margin_multiple(self, rng):
        from diffus_tpu.scene import crop_to_content

        vol = self._scene(rng)
        mask = np.zeros_like(vol, bool)
        mask[15:20, 20:25, 18:22] = True
        cropped, offset = crop_to_content(vol, mask=mask, margin=0, multiple=8)
        assert all(s % 8 == 0 or s == f for s, f in zip(cropped.shape, vol.shape))
        # the masked region survives in the crop (per-axis bounds)
        mask_lo, mask_hi = (15, 20, 18), (20, 25, 22)
        for o, s, ml, mh in zip(offset, cropped.shape, mask_lo, mask_hi):
            assert o <= ml and o + s >= mh
        import pytest

        with pytest.raises(ValueError, match="empty"):
            crop_to_content(np.zeros((8, 8, 8), np.float32) + 1.0,
                            mask=np.zeros((8, 8, 8), bool))
