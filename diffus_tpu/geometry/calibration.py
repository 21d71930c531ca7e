"""Transducer calibration from hand-fit fan edge lines, and cone masks.

Rebuild of the reference's per-case calibration math
(``src/cone.py:98-209`` + the ``mask_cone_segment`` helper living in the
REUBEN notebooks): apex = intersection of the two edge lines, opening
angle and bisector from the edge directions, transform into MRI voxel
space, and pixel masks for the fan region.  This is the "pose init"
module: its output seeds :class:`~diffus_tpu.types.TransducerPose` for
rendering / pose refinement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.geometry.affine import voxel_to_world, world_to_voxel


@dataclasses.dataclass(frozen=True)
class ConeCalibration:
    apex: tuple          # (x0, y0) in US pixel coordinates
    opening_angle: float  # radians
    direction: tuple      # 2D unit bisector


def apex_and_direction_from_edges(
    m_left: float, b_left: float, m_right: float, b_right: float
) -> ConeCalibration:
    """Apex, opening angle, and bisector from two hand-fit edge lines.

    Parity with ``compute_us_apex_and_direction`` (``src/cone.py:98-126``):
    apex = line intersection; edge directions ``[-1, -m_left]`` and
    ``[1, m_right]`` (into the cone); angle from their dot product;
    bisector = normalized mean.
    """
    if np.isclose(m_left, m_right):
        raise RuntimeError("The slopes are nearly equal; no defined intersection.")
    x0 = (b_right - b_left) / (m_left - m_right)
    y0 = m_left * x0 + b_left

    v_left = np.array([-1.0, -m_left])
    v_right = np.array([1.0, m_right])
    u_left = v_left / np.linalg.norm(v_left)
    u_right = v_right / np.linalg.norm(v_right)
    dot = float(np.clip(np.dot(u_left, u_right), -1.0, 1.0))
    opening_angle = float(np.arccos(dot))
    bisector = u_left + u_right
    bisector = bisector / np.linalg.norm(bisector)
    return ConeCalibration(
        apex=(float(x0), float(y0)),
        opening_angle=opening_angle,
        direction=(float(bisector[0]), float(bisector[1])),
    )


def cone_us_to_mri(apex_us_vox, direction_2d, us_affine, t1_affine):
    """Transform a calibrated apex + 2D direction from US to MRI voxel space.

    Parity with ``cone_us_to_mri_world`` (``src/cone.py:187-209``):
    apex via world round-trip; direction via
    ``R_t1 @ inv(R_us) @ [dx, dy, 0]`` then 2D re-normalization.
    """
    apex_us_vox = jnp.asarray(apex_us_vox, dtype=jnp.float32)
    apex_world = voxel_to_world(apex_us_vox, jnp.asarray(us_affine, jnp.float32))
    apex_t1 = world_to_voxel(apex_world, jnp.asarray(t1_affine, jnp.float32))

    d3 = jnp.concatenate(
        [jnp.asarray(direction_2d, jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    r_us = jnp.asarray(us_affine, jnp.float32)[:3, :3]
    r_t1 = jnp.asarray(t1_affine, jnp.float32)[:3, :3]
    rotated = jnp.matmul(
        r_t1, jnp.matmul(jnp.linalg.inv(r_us), d3,
                         precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    )  # full precision: coordinates (r5, cf. geometry/fan.py)
    d2 = rotated[:2] / jnp.linalg.norm(rotated[:2])
    return apex_t1, d2


def us_to_mri_beam_scale(direction_2d, us_affine, t1_affine) -> jax.Array:
    """MRI voxels traversed per US pixel along the beam direction.

    Physically correct mapping (unlike ``cone_us_to_mri``'s direction
    formula, which preserves the reference's ``R_t1 @ inv(R_us)`` quirk,
    ``src/cone.py:187-209``): one US pixel along ``direction_2d`` is
    ``R_us @ d`` millimetres in world space, i.e.
    ``inv(R_t1) @ R_us @ d`` MRI voxels.  Used to wire
    ``BeamGeometry.step`` so a ``d1..d2`` US-pixel depth window marches
    the correct physical distance through the MRI volume.
    """
    d3 = jnp.concatenate(
        [jnp.asarray(direction_2d, jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    r_us = jnp.asarray(us_affine, jnp.float32)[:3, :3]
    r_t1 = jnp.asarray(t1_affine, jnp.float32)[:3, :3]
    return jnp.linalg.norm(jnp.matmul(
        jnp.linalg.inv(r_t1),
        jnp.matmul(r_us, d3, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    ))


def cone_mask(shape, apex, direction_2d, opening_angle: float) -> jax.Array:
    """Boolean mask of pixels inside the fan cone.

    Parity with ``overlay_cone`` (``src/cone.py:145-172``): pixels whose
    apex-relative unit vector dots the bisector above cos(half-angle).
    """
    h, w = shape
    x0, y0 = apex
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    vx = xx - x0
    vy = yy - y0
    norm = jnp.sqrt(vx * vx + vy * vy) + 1e-8
    dx, dy = direction_2d
    dot = (vx * dx + vy * dy) / norm
    return dot >= jnp.cos(opening_angle / 2.0)


def cone_segment_mask(mask: jax.Array, apex, direction_2d, d1: float, d2: float):
    """Restrict a cone mask to the radial band ``d1 <= r <= d2``.

    Parity with the notebook-resident ``mask_cone_segment``
    (``[DEMO] REUBEN DATA 46.ipynb`` cell 10).
    """
    h, w = mask.shape
    x0, y0 = apex
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    dist = jnp.sqrt((xx - x0) ** 2 + (yy - y0) ** 2)
    return mask & (dist >= d1) & (dist <= d2)
