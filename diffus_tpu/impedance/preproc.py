"""Volume preprocessing for impedance mapping: masks and normalization.

jnp rebuild of reference ``src/utils.py:12-39`` (brain mask, z-score)
and the per-slice min-max normalization of ``src/datatype.py:39-50``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffus_tpu.ops.morphology import binary_dilation, binary_erosion


def brain_mask(volume: jax.Array, threshold: float = 50.0) -> jax.Array:
    """Threshold > t, dilate x2, erode x2 (``src/utils.py:12-21``)."""
    mask = volume > threshold
    mask = binary_dilation(mask, iterations=2)
    mask = binary_erosion(mask, iterations=2)
    return mask


def zscore_normalize(volume: jax.Array, mask: jax.Array) -> jax.Array:
    """Z-score the whole volume by in-mask mean/std (``src/utils.py:23-39``).

    Note the reference uses torch's *unbiased* std (ddof=1) — matched here.
    """
    volume = volume.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    mean = jnp.sum(volume * m) / n
    var = jnp.sum(((volume - mean) * m) ** 2) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    return (volume - mean) / (std + 1e-8)


def minmax_normalize(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-array min-max to [0, 1] (``src/datatype.py:49``)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)
