"""Binary morphology (dilation/erosion) in jnp, scipy-compatible.

Supports the brain-mask preprocessing (reference ``src/utils.py:12-21``:
threshold, ``binary_dilation(iterations=2)``, ``binary_erosion(iterations=2)``
with scipy's default connectivity-1 cross structuring element).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _cross_shifts(ndim: int):
    """Offsets of the connectivity-1 structuring element (center + faces)."""
    shifts = [tuple(0 for _ in range(ndim))]
    for axis in range(ndim):
        for delta in (-1, 1):
            s = [0] * ndim
            s[axis] = delta
            shifts.append(tuple(s))
    return shifts


def _shifted(x: jax.Array, shift, fill):
    """Shift with constant fill (scipy pads with border-value semantics:
    dilation treats outside as False, erosion as False too by default)."""
    for axis, s in enumerate(shift):
        if s == 0:
            continue
        x = jnp.roll(x, s, axis=axis)
        idx = [slice(None)] * x.ndim
        if s > 0:
            idx[axis] = slice(0, s)
        else:
            idx[axis] = slice(x.shape[axis] + s, x.shape[axis])
        x = x.at[tuple(idx)].set(fill)
    return x


@partial(jax.jit, static_argnames=("iterations",))
def binary_dilation(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """Iterated dilation with the cross element (scipy default)."""
    mask = mask.astype(bool)
    shifts = _cross_shifts(mask.ndim)
    for _ in range(iterations):
        acc = jnp.zeros_like(mask)
        for s in shifts:
            acc = acc | _shifted(mask, s, False)
        mask = acc
    return mask


@partial(jax.jit, static_argnames=("iterations",))
def binary_erosion(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """Iterated erosion with the cross element.  Matches scipy's default
    ``border_value=0``: voxels at the array border erode away."""
    mask = mask.astype(bool)
    shifts = _cross_shifts(mask.ndim)
    for _ in range(iterations):
        acc = jnp.ones_like(mask)
        for s in shifts:
            acc = acc & _shifted(mask, s, False)
        mask = acc
    return mask
