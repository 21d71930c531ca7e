"""Shared filtering primitives: Gaussian kernels and reflect-mode convolutions.

jnp equivalents of the scipy.ndimage filters the reference leans on
(``gaussian_filter`` / ``gaussian_filter1d`` in ``src/renderer.py:535-601``),
implemented as static-shape convolutions so they fuse under jit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage-compatible normalized Gaussian taps over [-radius, radius]."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    if sigma <= 0:
        k = (x == 0).astype(np.float64)
    else:
        k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def default_radius(sigma: float, truncate: float = 4.0) -> int:
    """scipy.ndimage's kernel radius: int(truncate * sigma + 0.5)."""
    return int(truncate * float(sigma) + 0.5)


def correlate1d(x: jax.Array, kernel, axis: int, mode: str = "reflect") -> jax.Array:
    """1D correlation along ``axis`` with a static kernel.

    ``mode``: ``'reflect'`` (scipy.ndimage boundary: edge value repeated),
    ``'zero'`` (torch conv padding), or ``'valid'`` (no padding; output
    shrinks by ``len(kernel) - 1`` — the standard SSIM windowing).
    """
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    size = kernel.shape[0]
    radius = (size - 1) // 2
    if mode == "valid":
        xp = x
        n = x.shape[axis] - size + 1
    else:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="symmetric" if mode == "reflect" else "constant")
        n = x.shape[axis]
    shape = list(x.shape)
    shape[axis] = n
    out = jnp.zeros(shape, dtype=x.dtype)
    for j in range(size):
        out = out + kernel[j] * jax.lax.slice_in_dim(xp, j, j + n, axis=axis)
    return out


def gaussian_blur(x: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """N-D separable Gaussian blur matching ``scipy.ndimage.gaussian_filter``
    defaults (reflect mode, truncate=4.0).  Used by the sharpen artifact
    (``src/renderer.py:540``) and the splat image blur."""
    radius = default_radius(sigma, truncate)
    k = gaussian_kernel1d(sigma, radius)
    for axis in range(x.ndim):
        x = correlate1d(x, k, axis)
    return x


def gaussian_pulse(length: int, sigma: float) -> np.ndarray:
    """1D Gaussian transducer pulse, peak-normalized.

    Mirrors ``gaussian_pulse`` (``src/renderer.py:481-496``):
    ``t = linspace(-length // 2, length // 2, length)`` — note Python's
    floor division makes the grid ASYMMETRIC for odd lengths
    ((-11)//2 = -6, so length 11 spans -6..5); parity keeps that quirk.
    Reference defaults are even lengths, where both readings coincide.
    """
    t = np.linspace((-length) // 2, length // 2, length)
    pulse = np.exp(-0.5 * (t / sigma) ** 2)
    return (pulse / pulse.max()).astype(np.float32)


def convolve_pulse(echo: jax.Array, pulse) -> jax.Array:
    """Convolve echo trains with a transducer pulse along depth.

    Mirrors ``compute_gaussian_pulse``'s ``F.conv1d(..., padding=length//2)``
    (``src/renderer.py:459-479``): torch conv1d is *correlation* with
    zero padding; output length is ``N + 2*(length//2) - length + 1``
    (= N for odd lengths, N+1 for even — parity keeps that quirk).

    Args:
      echo: ``(..., N)``; pulse: ``(length,)``.
    """
    pulse = jnp.asarray(pulse, dtype=echo.dtype)
    length = pulse.shape[0]
    pad = length // 2
    lead = echo.shape[:-1]
    x = echo.reshape((-1, 1, echo.shape[-1]))
    out = jax.lax.conv_general_dilated(
        x,
        pulse[None, None, :],
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(lead + (out.shape[-1],))
