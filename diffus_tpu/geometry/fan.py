"""Fan-beam direction generation: parity helper + differentiable 6-DoF pose fans.

Rebuild of ``generate_cone_directions`` (``src/cone.py:242-258``) plus a
TPU-first generalization: the reference hardcodes the fan into the
world (x, y) plane (z = 0) and notebooks permute components ad hoc
(SURVEY section 7.4.2); here the fan lives in the transducer's local
frame and a differentiable pose rotation places it — so 6-DoF pose
gradients flow through direction generation into the render.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffus_tpu.types import TransducerPose, BeamGeometry, rotvec_to_matrix


def fan_directions_2d(
    direction_2d, opening_angle: float, n_rays: int, plane: str = "xy"
) -> jax.Array:
    """Fan of unit vectors around a 2D median direction, in a fixed plane.

    Parity with ``generate_cone_directions`` (``src/cone.py:242-258``):
    angles = linspace(-half, +half, n_rays), each direction
    ``cos(a) * d + sin(a) * ortho`` with ``ortho = [-d1, d0]``; the third
    component is zero.  ``plane`` selects which components carry the fan
    (the reference default emits ``[v0, v1, 0]``; notebook variants emit
    ``[0, v0, v1]`` e.g. ``[DEMO] Z with aligned MRI US.ipynb`` cell 16).

    Returns: ``(n_rays, 3)`` float32.
    """
    d = jnp.asarray(direction_2d, dtype=jnp.float32)[:2]
    d = d / jnp.linalg.norm(d)
    ortho = jnp.stack([-d[1], d[0]])
    angles = jnp.linspace(-opening_angle / 2.0, opening_angle / 2.0, n_rays)
    v = jnp.cos(angles)[:, None] * d[None, :] + jnp.sin(angles)[:, None] * ortho[None, :]
    zeros = jnp.zeros((n_rays, 1), dtype=v.dtype)
    if plane == "xy":
        return jnp.concatenate([v, zeros], axis=1)
    if plane == "yz":
        return jnp.concatenate([zeros, v], axis=1)
    if plane == "xz":
        return jnp.concatenate([v[:, :1], zeros, v[:, 1:]], axis=1)
    raise ValueError(f"unknown plane {plane!r}")


def canonical_fan(opening_angle: float, n_rays: int) -> jax.Array:
    """Canonical fan in the transducer local frame.

    Directions ``[sin a, cos a, 0]`` for a in linspace(-half, half) —
    the convention of the reference's pose-recovery fan
    (``[NW] alignement.ipynb`` cell 14); the median ray is local +y.
    """
    angles = jnp.linspace(-opening_angle / 2.0, opening_angle / 2.0, n_rays)
    return jnp.stack(
        [jnp.sin(angles), jnp.cos(angles), jnp.zeros_like(angles)], axis=1
    )


def pose_fan_directions(pose: TransducerPose, geometry: BeamGeometry) -> jax.Array:
    """Differentiable fan for a 6-DoF pose: rotate the canonical fan.

    ``rotvec = 0`` reproduces :func:`canonical_fan` exactly; gradients
    w.r.t. ``pose.rotvec`` flow through Rodrigues' formula (the
    differentiable replacement for the reference's free-floating
    direction tensor leaves, ``[NW] alignement.ipynb`` cell 13).
    """
    fan = canonical_fan(geometry.opening_angle, geometry.n_rays)
    rot = rotvec_to_matrix(pose.rotvec)
    # HIGHEST precision: the TPU default bf16-rounds this (n_rays, 3) x
    # (3, 3) product, putting ~1e-3 relative noise on every ray
    # direction — ~0.1-0.3 voxel of position noise at depth 128, which
    # plateaus fine pose descents around a voxel (r5: the TPU envelope
    # run converged 5-10x worse than CPU from identical seeds until
    # this).  The matmul is tiny; full precision is free.
    return jnp.matmul(fan, rot.T, precision=jax.lax.Precision.HIGHEST)


def fan_angles(geometry: BeamGeometry) -> jax.Array:
    """Per-ray angles (radians) across the fan, for sector display."""
    return jnp.linspace(
        -geometry.opening_angle / 2.0, geometry.opening_angle / 2.0, geometry.n_rays
    )
