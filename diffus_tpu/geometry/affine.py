"""Voxel <-> world coordinate transforms via 4x4 affines.

jnp rebuild of the reference's homogeneous-coordinate helpers
(``src/cone.py:10-59``): voxel/world round-trips and cross-modality
point mapping (MRI <-> US) used by the calibration workflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mv(m: jax.Array, v: jax.Array) -> jax.Array:
    """3x3 matrix-vector product at HIGHEST precision: the TPU default
    bf16-rounds matmuls, which puts ~1e-3 relative noise on COORDINATES
    (fractional-voxel positions feed samplers directly).  Tiny product;
    full precision is free (r5, cf. geometry/fan.py)."""
    return jnp.matmul(m, v, precision=jax.lax.Precision.HIGHEST)


def voxel_to_world(idx_ijk: jax.Array, affine: jax.Array) -> jax.Array:
    """Homogeneous voxel index -> world point (``cone.py:10-13``)."""
    idx_ijk = jnp.asarray(idx_ijk, dtype=jnp.float32)
    return _mv(affine[:3, :3], idx_ijk) + affine[:3, 3]

def world_to_voxel(xyz: jax.Array, affine: jax.Array) -> jax.Array:
    """World point -> fractional voxel index (``cone.py:15-19``)."""
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    inv = jnp.linalg.inv(affine)
    return _mv(inv[:3, :3], xyz) + inv[:3, 3]


def transform_point(idx: jax.Array, src_affine: jax.Array, dst_affine: jax.Array) -> jax.Array:
    """Voxel index in ``src`` space -> fractional voxel index in ``dst`` space."""
    return world_to_voxel(voxel_to_world(idx, src_affine), dst_affine)


def transform_direction(
    vec: jax.Array, src_affine: jax.Array, dst_affine: jax.Array
) -> jax.Array:
    """Map a direction vector between voxel spaces (rotation parts only).

    Mirrors ``cone_us_to_mri_world``'s direction handling
    (``src/cone.py:199-206``): ``R_dst @ inv(R_src) @ v`` — note the
    reference applies ``inv(R_us)`` then ``R_t1`` in exactly this order.
    """
    vec = jnp.asarray(vec, dtype=jnp.float32)
    r_src = src_affine[:3, :3]
    r_dst = dst_affine[:3, :3]
    return _mv(r_dst, _mv(jnp.linalg.inv(r_src), vec))


def mri_to_us_point(i_mri, j_mri, slice_idx, t1_affine, us_affine):
    """Map an MRI voxel (i, j, k=slice) to a (rounded) US voxel index.

    Mirrors ``mri_to_us_point`` (``src/cone.py:21-38``) minus the slice
    extraction (callers slice the volume with the returned index).
    """
    idx = jnp.asarray([i_mri, j_mri, slice_idx], dtype=jnp.float32)
    us_f = transform_point(idx, t1_affine, us_affine)
    return jnp.round(us_f).astype(jnp.int32)


def us_to_mri_point(i_us, j_us, slice_idx, us_affine, t1_affine):
    """Map a US voxel (k=slice, i, j) to a (rounded) MRI voxel index.

    Mirrors ``us_to_mri_point`` (``src/cone.py:40-59``) — note the
    reference packs the US index as ``[slice_idx, i, j]``.
    """
    idx = jnp.asarray([slice_idx, i_us, j_us], dtype=jnp.float32)
    mri_f = transform_point(idx, us_affine, t1_affine)
    return jnp.round(mri_f).astype(jnp.int32)


def mri_to_us_slice(i_mri, j_mri, slice_idx, t1_affine, us_vol, us_affine):
    """Point mapping plus the corresponding US axial slice — the full
    return shape of the reference's ``mri_to_us_point``
    (``src/cone.py:21-38``: ``(us_slice, us_idx)`` with
    ``us_slice = US_vol[:, :, k_us]``)."""
    us_idx = mri_to_us_point(i_mri, j_mri, slice_idx, t1_affine, us_affine)
    return us_vol[:, :, us_idx[2]], us_idx


def us_to_mri_slice(i_us, j_us, slice_idx, us_affine, t1_vol, t1_affine):
    """Point mapping plus the corresponding MRI slice
    (``src/cone.py:40-59``: ``(mri_slice, mri_idx)`` with
    ``mri_slice = T1_vol[k_mri, :, :]``)."""
    mri_idx = us_to_mri_point(i_us, j_us, slice_idx, us_affine, t1_affine)
    return t1_vol[mri_idx[0], :, :], mri_idx
