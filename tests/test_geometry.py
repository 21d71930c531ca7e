"""Geometry: affines, fan generation, calibration, pose rotations."""

import jax.numpy as jnp
import numpy as np

from diffus_tpu.geometry import (
    voxel_to_world,
    world_to_voxel,
    transform_point,
    fan_directions_2d,
    canonical_fan,
    pose_fan_directions,
    apex_and_direction_from_edges,
    cone_us_to_mri,
    cone_mask,
    cone_segment_mask,
)
from diffus_tpu.types import TransducerPose, BeamGeometry, rotvec_to_matrix


def _ref_fan(direction, opening_angle, n_rays):
    # independent numpy transcription of cone.py:242-258 semantics
    d = np.asarray(direction[:2], dtype=np.float64)
    d = d / np.linalg.norm(d)
    ortho = np.array([-d[1], d[0]])
    angles = np.linspace(-opening_angle / 2, opening_angle / 2, n_rays)
    return np.stack(
        [np.concatenate([np.cos(a) * d + np.sin(a) * ortho, [0.0]]) for a in angles]
    )


def test_fan_directions_parity():
    dirs = np.asarray(fan_directions_2d([0.3, 0.9], np.radians(50), 33))
    want = _ref_fan([0.3, 0.9], np.radians(50), 33)
    np.testing.assert_allclose(dirs, want, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, rtol=1e-6)


def test_fan_planes():
    d = fan_directions_2d([0.0, 1.0], np.radians(30), 5, plane="yz")
    assert np.allclose(np.asarray(d)[:, 0], 0.0)
    d = fan_directions_2d([0.0, 1.0], np.radians(30), 5, plane="xz")
    assert np.allclose(np.asarray(d)[:, 1], 0.0)


def test_affine_roundtrip(rng):
    affine = np.eye(4)
    affine[:3, :3] = rng.normal(size=(3, 3)) + 3 * np.eye(3)
    affine[:3, 3] = rng.normal(size=3) * 10
    idx = np.array([10.0, 20.0, 30.0])
    world = voxel_to_world(jnp.asarray(idx), jnp.asarray(affine, jnp.float32))
    back = world_to_voxel(world, jnp.asarray(affine, jnp.float32))
    np.testing.assert_allclose(np.asarray(back), idx, rtol=1e-4)


def test_transform_point_identity():
    eye = jnp.eye(4)
    p = transform_point(jnp.array([1.0, 2.0, 3.0]), eye, eye)
    np.testing.assert_allclose(np.asarray(p), [1, 2, 3], atol=1e-6)


def test_apex_from_edges_symmetric():
    # symmetric edges y = x and y = -x: apex at origin-ish intersection
    cal = apex_and_direction_from_edges(m_left=1.0, b_left=10.0, m_right=-1.0, b_right=110.0)
    x0, y0 = cal.apex
    np.testing.assert_allclose(x0, 50.0, rtol=1e-6)
    np.testing.assert_allclose(y0, 60.0, rtol=1e-6)
    # edge directions [-1,-1]/sqrt2 and [1,-1]/sqrt2 -> opening angle 90 deg
    np.testing.assert_allclose(cal.opening_angle, np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(cal.direction, [0.0, -1.0], atol=1e-6)


def test_cone_us_to_mri_identity_affines():
    apex, d2 = cone_us_to_mri([10.0, 20.0, 5.0], [0.6, 0.8], np.eye(4), np.eye(4))
    np.testing.assert_allclose(np.asarray(apex), [10, 20, 5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), [0.6, 0.8], atol=1e-6)


def test_cone_mask_and_segment():
    mask = cone_mask((64, 64), apex=(32.0, 0.0), direction_2d=(0.0, 1.0),
                     opening_angle=np.radians(60))
    m = np.asarray(mask)
    assert m[40, 32]           # straight ahead of apex: inside
    assert not m[5, 2]         # far off-axis: outside
    seg = cone_segment_mask(mask, (32.0, 0.0), (0.0, 1.0), d1=10, d2=30)
    s = np.asarray(seg)
    assert not s[5, 32]        # closer than d1
    assert s[20, 32]           # inside band
    assert not s[50, 32]       # beyond d2


def test_rotvec_matrix_properties(rng):
    v = rng.normal(size=3)
    R = np.asarray(rotvec_to_matrix(jnp.asarray(v, jnp.float32)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-5)
    # zero rotation = identity
    np.testing.assert_allclose(
        np.asarray(rotvec_to_matrix(jnp.zeros(3))), np.eye(3), atol=1e-7
    )
    # 90 deg about z: x -> y
    Rz = np.asarray(rotvec_to_matrix(jnp.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(Rz @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_pose_fan_identity_matches_canonical():
    geom = BeamGeometry(n_rays=9, num_samples=8, opening_angle=np.radians(40))
    pose = TransducerPose.create([0, 0, 0])
    d = np.asarray(pose_fan_directions(pose, geom))
    want = np.asarray(canonical_fan(geom.opening_angle, 9))
    np.testing.assert_allclose(d, want, atol=1e-6)
    # canonical median ray is +y
    np.testing.assert_allclose(d[4], [0.0, 1.0, 0.0], atol=1e-6)


def test_pose_fan_rotation():
    geom = BeamGeometry(n_rays=5, num_samples=8, opening_angle=np.radians(30))
    # rotate fan 90 deg about z: median +y -> -x
    pose = TransducerPose.create([0, 0, 0], rotvec=[0.0, 0.0, np.pi / 2])
    d = np.asarray(pose_fan_directions(pose, geom))
    np.testing.assert_allclose(d[2], [-1.0, 0.0, 0.0], atol=1e-6)


def test_point_to_slice_mappings(rng):
    from diffus_tpu.geometry import mri_to_us_slice, us_to_mri_slice

    us_vol = jnp.asarray(rng.normal(size=(6, 7, 8)).astype(np.float32))
    t1_vol = jnp.asarray(rng.normal(size=(6, 7, 8)).astype(np.float32))
    eye = jnp.eye(4)
    us_slice, us_idx = mri_to_us_slice(2, 3, 4, eye, us_vol, eye)
    np.testing.assert_array_equal(np.asarray(us_idx), [2, 3, 4])
    np.testing.assert_allclose(np.asarray(us_slice), np.asarray(us_vol[:, :, 4]))
    mri_slice, mri_idx = us_to_mri_slice(3, 4, 2, eye, t1_vol, eye)
    np.testing.assert_array_equal(np.asarray(mri_idx), [2, 3, 4])
    np.testing.assert_allclose(np.asarray(mri_slice), np.asarray(t1_vol[2, :, :]))


def test_pose_and_coordinate_matmuls_are_full_precision():
    """Every matmul that produces COORDINATES or ROTATIONS must carry
    precision=HIGHEST: the TPU default bf16-rounds dot_general inputs,
    which put ~1e-3 relative noise on ray directions and plateaued TPU
    pose descents 5-10x short of the CPU result from identical seeds
    (r5 — the envelope run failed at radius 6 until this).  CPU tests
    cannot observe the rounding, so pin the lowered-HLO attribute."""
    import jax

    from diffus_tpu.geometry.fan import pose_fan_directions
    from diffus_tpu.geometry.affine import transform_point, transform_direction
    from diffus_tpu.types import TransducerPose, BeamGeometry

    def dots(fn, *args):
        txt = jax.jit(fn).lower(*args).as_text()
        return [l for l in txt.splitlines() if "dot_general" in l]

    geom = BeamGeometry(n_rays=8, num_samples=4)
    for fn, args in [
        (lambda p: pose_fan_directions(p, geom),
         (TransducerPose.create(jnp.zeros(3)),)),
        (transform_point, (jnp.ones(3), jnp.eye(4), jnp.eye(4) * 1.0)),
        (transform_direction, (jnp.ones(3), jnp.eye(4), jnp.eye(4) * 1.0)),
    ]:
        lines = dots(fn, *args)
        assert lines, "expected at least one dot_general"
        for l in lines:
            assert "precision = [HIGHEST, HIGHEST]" in l, l
