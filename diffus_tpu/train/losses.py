"""Training losses: SSIM, masked MSE, and edge (gradient-L1) loss — pure jnp.

Rebuild of the loss surface of the reference's renderer-in-the-loop
trainers: ``1 - piq.ssim`` (``[DEMO] Train MRI to Impedance MLP -
GPU.ipynb`` cell 16) and ``masked MSE + 0.5 * gradient-L1``
(``[DEMO] Z with aligned MRI US.ipynb`` cell 25 / ``REUBEN 46`` cell 11).
SSIM follows Wang et al. with the piq/standard defaults: 11x11 Gaussian
window, sigma 1.5, K1=0.01, K2=0.03.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_valid(img: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable 'valid' correlation with an outer-product window (the
    standard SSIM windowing: no padding)."""
    from diffus_tpu.ops.filters import correlate1d

    return correlate1d(correlate1d(img, k1d, axis=0, mode="valid"),
                       k1d, axis=1, mode="valid")


@partial(jax.jit, static_argnames=("kernel_size", "kernel_sigma", "data_range", "k1", "k2"))
def ssim(
    x: jax.Array,
    y: jax.Array,
    kernel_size: int = 11,
    kernel_sigma: float = 1.5,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean structural similarity of two 2D images in [0, data_range]."""
    x = x.astype(jnp.float32) / data_range
    y = y.astype(jnp.float32) / data_range
    window = jnp.asarray(_gaussian_window(kernel_size, kernel_sigma))

    mu_x = _filter2d_valid(x, window)
    mu_y = _filter2d_valid(y, window)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _filter2d_valid(x * x, window) - mu_x2
    sigma_y2 = _filter2d_valid(y * y, window) - mu_y2
    sigma_xy = _filter2d_valid(x * y, window) - mu_xy

    c1, c2 = k1 * k1, k2 * k2
    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    return jnp.mean(num / den)


def ssim_loss(synth: jax.Array, real: jax.Array) -> jax.Array:
    """``1 - ssim`` on min-max-normalized images — the GPU-notebook loss
    (cell 16: normalize synth, then ``1 - piq.ssim``)."""
    synth_n = (synth - jnp.min(synth)) / (jnp.max(synth) - jnp.min(synth) + 1e-8)
    return 1.0 - ssim(synth_n, real)


def masked_mse(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """MSE over the masked region (boolean mask, static shapes)."""
    m = mask.astype(a.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(((a - b) * m) ** 2) / n


def gradient_loss(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """L1 of depth-gradient magnitudes inside the mask.

    Parity with ``gradient_loss`` (``REUBEN 46`` cell 11):
    ``l1(|diff(a)|[mask[:,1:]], |diff(b)|[mask[:,1:]])``.
    """
    a_grad = jnp.abs(a[:, 1:] - a[:, :-1])
    b_grad = jnp.abs(b[:, 1:] - b[:, :-1])
    m = mask[:, 1:].astype(a.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.abs(a_grad - b_grad) * m) / n


def masked_mse_edge_loss(
    synth: jax.Array, real_norm: jax.Array, mask: jax.Array, edge_weight: float = 0.5
) -> jax.Array:
    """``masked MSE + w * edge loss`` on min-max-normalized synth — the
    Z-aligned notebook loss (cell 25) / REUBEN trainer (cell 11)."""
    synth_n = (synth - jnp.min(synth)) / (jnp.max(synth) - jnp.min(synth) + 1e-8)
    return masked_mse(synth_n, real_norm, mask) + edge_weight * gradient_loss(
        synth_n, real_norm, mask
    )
