"""DiffUS-TPU: a TPU-native differentiable ultrasound rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the DiffUS
reference (gduguey/DiffUS): synthesis of 2D B-mode ultrasound images from
3D MRI/CT volumes by differentiable ray tracing through an acoustic
impedance volume, with gradient-based applications (impedance learning,
6-DoF transducer pose recovery).

Architecture (TPU-first, not a port):
  - The reference's per-depth growing dense solves
    (reference src/renderer.py:412-436) are replaced by a single
    ``jax.lax.associative_scan`` over 2x2 interface transfer matrices
    (O(log N) depth), fully vmappable over rays and poses and
    differentiable by construction.  See ``diffus_tpu.ops.propagation``.
  - Sampling, reflection, scan, and attenuation fuse under ``jax.jit``;
    a Pallas kernel covers the hot path (``diffus_tpu.kernels``).
  - Multi-chip scaling uses ``jax.sharding`` meshes with axes
    ("pose", "ray"); see ``diffus_tpu.parallel``.

Layer map (mirrors the reference's implicit layering, SURVEY.md section 1):
  L0 types/io       -> diffus_tpu.types, diffus_tpu.io
  L1 geometry       -> diffus_tpu.geometry
  L2 impedance      -> diffus_tpu.impedance
  L3 renderer core  -> diffus_tpu.ops, diffus_tpu.render, diffus_tpu.kernels
  L4 image formation-> diffus_tpu.ops.splat / artifacts / pulse / bmode
  L5 applications   -> diffus_tpu.train
"""

from diffus_tpu.types import Volume, TransducerPose, BeamGeometry, RenderConfig
from diffus_tpu.render.renderer import (
    render_frame,
    render_bmode,
    render_sweep,
    simulate_rays,
    trace_rays,
)

__version__ = "0.1.0"

__all__ = [
    "Volume",
    "TransducerPose",
    "BeamGeometry",
    "RenderConfig",
    "render_frame",
    "render_bmode",
    "render_sweep",
    "simulate_rays",
    "trace_rays",
]
