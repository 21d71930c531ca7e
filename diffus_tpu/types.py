"""Core pytree datatypes: volumes, poses, beam geometry, render config.

TPU-native re-design of the reference's scene/state surface
(reference ``src/datatype.py:22-176`` volume containers, the implicit
``(source, directions)`` pose of ``src/renderer.py:201`` and the fan
parameters of ``src/cone.py:242-258``), as JAX pytrees so everything can be
jitted / vmapped / sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Volume:
    """A 3D scalar volume with world-space metadata.

    Mirrors the reference's per-item dict ``{image, affine, spacing, path}``
    (reference ``src/datatype.py:89-94``) as a pytree.

    Attributes:
      data: ``(D, H, W)`` array — intensity or acoustic impedance.  Point
        coordinate component ``i`` indexes volume axis ``i`` (the
        convention of the reference's sampler, ``src/renderer.py:754-759``).
      affine: ``(4, 4)`` voxel->world homogeneous transform.
      spacing: ``(3,)`` voxel spacing in mm.
    """

    data: jax.Array
    affine: jax.Array
    spacing: jax.Array

    @property
    def shape(self):
        return self.data.shape

    @classmethod
    def from_array(cls, data, affine=None, spacing=None) -> "Volume":
        data = jnp.asarray(data, dtype=jnp.float32)
        if affine is None:
            affine = jnp.eye(4, dtype=jnp.float32)
        else:
            affine = jnp.asarray(affine, dtype=jnp.float32)
        if spacing is None:
            spacing = jnp.abs(jnp.diagonal(affine)[:3])
        else:
            spacing = jnp.asarray(spacing, dtype=jnp.float32)
        return cls(data=data, affine=affine, spacing=spacing)


@struct.dataclass
class TransducerPose:
    """6-DoF virtual transducer pose: apex position + orientation.

    The reference carries pose implicitly as a free ``source`` point plus a
    pre-built ``(n_rays, 3)`` direction bundle (``src/renderer.py:201-234``,
    pose-recovery leaves in ``[NW] alignement.ipynb`` cells 13-14).  Here the
    pose is an explicit differentiable 6-DoF chart — position ``(3,)`` and a
    rotation vector ``(3,)`` (axis-angle; Rodrigues) — so gradients w.r.t.
    pose flow through fan generation into the render.

    With ``rotvec = 0`` the fan reproduces the reference convention of
    in-plane ``[sin a, cos a, 0]`` directions ([NW] alignement cell 14,
    ``cone.py:242-258``).
    """

    position: jax.Array  # (3,) apex in voxel coordinates
    rotvec: jax.Array    # (3,) axis-angle rotation of the canonical fan frame

    @classmethod
    def create(cls, position, rotvec=None) -> "TransducerPose":
        position = jnp.asarray(position, dtype=jnp.float32)
        if rotvec is None:
            rotvec = jnp.zeros(3, dtype=jnp.float32)
        else:
            rotvec = jnp.asarray(rotvec, dtype=jnp.float32)
        return cls(position=position, rotvec=rotvec)

    def rotation_matrix(self) -> jax.Array:
        """Rodrigues formula, differentiable at the identity."""
        return rotvec_to_matrix(self.rotvec)


def rotvec_to_matrix(rotvec: jax.Array) -> jax.Array:
    """Axis-angle -> 3x3 rotation matrix (Rodrigues), smooth at 0.

    Uses a Taylor-safe parameterization: sin(t)/t and (1-cos t)/t^2 are
    evaluated via their series near t=0 so pose-recovery gradients stay
    finite at the identity.
    """
    rotvec = jnp.asarray(rotvec)
    theta2 = jnp.sum(rotvec * rotvec)
    small = theta2 < 1e-8
    # double-where: the untaken sin(t)/t branch must never see t=0 or its
    # gradient is NaN * 0 = NaN (this exactly breaks pose recovery from
    # an identity-rotation init)
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    wx, wy, wz = rotvec[0], rotvec[1], rotvec[2]
    K = jnp.array(
        [[0.0, -wz, wy],
         [wz, 0.0, -wx],
         [-wy, wx, 0.0]], dtype=rotvec.dtype
    )
    eye = jnp.eye(3, dtype=rotvec.dtype)
    # HIGHEST precision: the TPU default matmul bf16-rounds K @ K, which
    # rounds the ROTATION MATRIX itself and (with the fan product, see
    # geometry/fan.py) plateaued TPU pose descents ~5-10x short of the
    # CPU result (r5).  A 3x3 product; full precision is free.
    return eye + sinc * K + cosc * jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)


@dataclasses.dataclass(frozen=True)
class BeamGeometry:
    """Static fan-beam geometry (shapes are derived from this => static).

    Mirrors the reference's constructor args and notebook constants:
    ``UltrasoundRenderer(num_samples, attenuation_coeff)``
    (``src/renderer.py:19-25``) plus ``n_rays`` / ``opening_angle`` from
    ``cone.py:242`` call sites.  Typical reference values: num_samples
    60-512, n_rays 64-256, attenuation 1e-4 (real data) to 0.5 (default).
    """

    n_rays: int = 256
    num_samples: int = 512
    opening_angle: float = float(np.radians(45.0))
    step: float = 1.0  # voxel units per depth step (reference uses 1.0)

    def __post_init__(self):
        if self.n_rays < 1 or self.num_samples < 2:
            raise ValueError("BeamGeometry needs n_rays >= 1, num_samples >= 2")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (passed as a static argument to jit).

    ``start`` reproduces the reference's start-index skip: a float is
    interpreted as a fraction of ``num_samples`` (``src/renderer.py:237-245``).
    ``interp='nearest'`` is the parity mode (``src/renderer.py:754-759``);
    ``'trilinear'`` makes the render differentiable w.r.t. pose;
    ``'trilinear_bf16'`` opts into the one-gather overlapped-3D-tile
    sampler (bf16 corner values, f32 weights — ~4e-3 relative value
    error, ~3x the trilinear throughput; still pose-differentiable).
    ``reflection_mode`` selects the r_RL convention in the propagation
    solver: ``'parity'`` matches the shipped code's ``refRL = +refLR``
    (``src/renderer.py:382``), ``'symmetric'`` the ``refRL = -refLR`` of
    the older notebook (``[DEPR] fix_propagation...`` cell 8), and
    ``'physical'`` the impedance-weighted convention of the physics doc,
    ``R_{i+1,i} = -R_{i,i+1} Z_i/Z_{i+1}`` (``forward_physics.md:66``).

    Beyond the three canonical modes, any registered explicit sampler
    name (``diffus_tpu.ops.sampling.SAMPLERS``) is accepted as an
    advanced opt-in — e.g. ``'trilinear_tile3d_f32'`` (the exact
    one-take 3D-tile mode; above the placement capacity the sweep and
    serving layers stage its table host-built, probe_host3d_r5) or
    ``'trilinear_tile_k2'`` (the measured-refuted K=2 family, kept
    reachable for evidence).  The canonical modes remain the measured
    defaults — the explicit names skip the backend auto-selection.
    """

    attenuation_coeff: float = 0.5
    start: float | int = 0
    interp: str = "nearest"  # canonical: nearest | trilinear | trilinear_bf16;
                             # plus the explicit sampler names (docstring)
    reflection_mode: Literal["parity", "symmetric", "physical"] = "parity"
    use_pallas: bool = False
    pulse_length: int = 0   # >0 enables Gaussian transducer-pulse convolution
    pulse_sigma: float = 1.0  # of the echo train (the optional stage the
                              # reference keeps commented at renderer.py:250;
                              # compute_gaussian_pulse, renderer.py:459-479)
    envelope: bool = False  # Hilbert envelope + log1p compression of the
                            # echo train (the alt B-mode chain,
                            # [DEMO] Renderer Alternatives.ipynb cell 14)
    artifacts: bool = False
    std_radial: float = 0.01
    std_local: float = 0.15
    max_sigma: float = 4.0
    sharpen_alpha: float = 5.0
    dtype: str = "float32"

    # mirrors diffus_tpu.ops.sampling.SAMPLERS (rot-guarded by test) —
    # hardcoded here so the leaf types module never imports the ops layer
    _EXPLICIT_SAMPLERS = (
        "nearest_rows", "trilinear_rows", "trilinear_rows2",
        "trilinear_tile", "trilinear_tile_k2", "trilinear_tile_k2i",
        "trilinear_tile_fused", "trilinear_tile3d_bf16",
        "trilinear_tile3d_f32", "trilinear_fused",
    )

    def __post_init__(self):
        if self.interp not in (
            ("nearest", "trilinear", "trilinear_bf16") + self._EXPLICIT_SAMPLERS
        ):
            raise ValueError(f"unknown interp {self.interp!r}")
        if self.reflection_mode not in ("parity", "symmetric", "physical"):
            raise ValueError(f"unknown reflection_mode {self.reflection_mode!r}")
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown dtype {self.dtype!r}")

    def start_index(self, num_samples: int) -> int:
        """Resolve the start skip exactly like plot_beam_frame
        (``src/renderer.py:237-241``): float -> int(start*num_samples),
        then clamp to >= 0."""
        start = self.start
        if isinstance(start, float):
            start = int(start * num_samples)
        return max(0, int(start))
