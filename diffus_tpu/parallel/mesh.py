"""Device-mesh construction for multi-chip scaling.

The reference is strictly single-process/single-GPU (SURVEY section 2.3:
no DP/TP/PP/SP/EP, no communication backend).  The TPU-native scaling
model uses a 2D ``jax.sharding.Mesh`` with axes:

  - ``"pose"`` — data parallelism over transducer poses / cases (the
    sweep & training batch axis); gradient psum rides ICI.
  - ``"ray"``  — intra-frame parallelism over fan rays (rays are
    independent through sampling + scan; the only cross-ray collectives
    are the frame-level loss reduction and image splat).

Collectives are inserted by GSPMD from sharding annotations — no
hand-written communication (the honest equivalent of "no NCCL to port").
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_pose: int, n_ray: int, devices=None) -> Mesh:
    """Build a (pose, ray) mesh from the first ``n_pose * n_ray`` devices."""
    if devices is None:
        devices = jax.devices()
    need = n_pose * n_ray
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_pose, n_ray)
    return Mesh(arr, axis_names=("pose", "ray"))


def default_mesh(n_devices=None) -> Mesh:
    """Squarish (pose, ray) mesh over all (or n) devices: ray axis gets
    the larger factor (rays usually outnumber poses per frame)."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    n_pose = 1
    for f in range(int(np.sqrt(n)), 0, -1):
        if n % f == 0:
            n_pose = f
            break
    return make_mesh(n_pose, n // n_pose, devices[:n])


def pose_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over poses."""
    return NamedSharding(mesh, P("pose"))


def pose_ray_sharding(mesh: Mesh) -> NamedSharding:
    """(pose, ray, ...) arrays: first two axes sharded."""
    return NamedSharding(mesh, P("pose", "ray"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
