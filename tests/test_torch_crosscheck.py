"""Cross-validation against torch (CPU) — an independent external oracle.

The reference's alternative tracer samples with ``F.grid_sample``
bilinear + align_corners=True (``[DEMO] Renderer Alternatives.ipynb``
cell 6); for in-bounds points that is exactly trilinear interpolation,
so it independently validates our sampler.  Reflection/propagation get a
torch-autograd gradient cross-check.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffus_tpu.ops.sampling import sample_trilinear
from diffus_tpu.ops.propagation import echo_amplitudes
from diffus_tpu.train.losses import ssim


def test_trilinear_matches_torch_grid_sample(rng):
    vol = rng.normal(size=(9, 10, 11)).astype(np.float32)
    pts = rng.uniform(0.6, 7.4, size=(40, 3)).astype(np.float32)  # in-bounds

    _, ours = sample_trilinear(jnp.asarray(vol), jnp.asarray(pts))

    # torch grid_sample: volume (1,1,D,H,W); grid coords normalized to
    # [-1,1] with align_corners=True, ordered (x=W, y=H, z=D)
    v = torch.from_numpy(vol)[None, None]
    d, h, w = vol.shape
    grid = np.empty((1, pts.shape[0], 1, 1, 3), np.float32)
    grid[0, :, 0, 0, 0] = 2 * pts[:, 2] / (w - 1) - 1
    grid[0, :, 0, 0, 1] = 2 * pts[:, 1] / (h - 1) - 1
    grid[0, :, 0, 0, 2] = 2 * pts[:, 0] / (d - 1) - 1
    want = torch.nn.functional.grid_sample(
        v, torch.from_numpy(grid), mode="bilinear", align_corners=True
    ).reshape(-1).numpy()

    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5, atol=1e-6)


def test_scan_gradient_matches_torch_autograd(rng):
    """d(sum d0^2)/dr via our scan vs torch autograd through the dense solve."""
    r0 = rng.uniform(-0.5, 0.5, size=(1, 10)).astype(np.float64)

    def jax_loss(r):
        return jnp.sum(echo_amplitudes(r) ** 2)

    with jax.enable_x64():
        g_jax = np.asarray(jax.grad(jax_loss)(jnp.asarray(r0)))

    # torch: assemble the truncated systems densely like the reference
    r_t = torch.tensor(r0, dtype=torch.float64, requires_grad=True)
    total = torch.zeros((), dtype=torch.float64)
    B, N = r0.shape
    for i in range(1, N + 1):
        ri = r_t[:, :i]
        size = 2 * (i + 1)
        A = torch.zeros((B, size, size), dtype=torch.float64)
        b = torch.zeros((B, size), dtype=torch.float64)
        b[:, 0] = 1.0
        A[:, 0, 0] = 1.0
        A[:, -1, -1] = 1.0
        for k in range(i):
            gk, dk = 2 * k, 2 * k + 1
            gk1, dk1 = 2 * (k + 1), 2 * (k + 1) + 1
            A[:, gk1, gk] = -(1.0 + ri[:, k])
            A[:, gk1, dk1] = -ri[:, k]
            A[:, gk1, gk1] = 1.0
            A[:, dk, gk] = -ri[:, k]
            A[:, dk, dk1] = -(1.0 - ri[:, k])
            A[:, dk, dk] = 1.0
        w = torch.linalg.solve(A, b.unsqueeze(-1)).squeeze(-1)
        total = total + (w[:, 1] ** 2).sum()
    total.backward()
    g_torch = r_t.grad.numpy()

    np.testing.assert_allclose(g_jax, g_torch, rtol=1e-8, atol=1e-10)


def _torch_ssim(x, y, kernel_size=11, sigma=1.5, data_range=1.0, k1=0.01, k2=0.03):
    """Independent torch re-implementation of the Wang et al. SSIM with the
    piq defaults (11x11 Gaussian, sigma 1.5, K1=0.01, K2=0.03, 'valid'
    windowing, biased covariance) — piq itself is not installed in this
    environment, so the constant conventions get confirmed against a
    second implementation built on torch.conv2d rather than our jnp ops
    (SURVEY section 7.4-6)."""
    import torch.nn.functional as F

    coords = torch.arange(kernel_size, dtype=torch.float64) - (kernel_size - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel = torch.outer(g, g)[None, None]

    x = (x / data_range)[None, None].double()
    y = (y / data_range)[None, None].double()
    mu_x = F.conv2d(x, kernel)
    mu_y = F.conv2d(y, kernel)
    sigma_x2 = F.conv2d(x * x, kernel) - mu_x**2
    sigma_y2 = F.conv2d(y * y, kernel) - mu_y**2
    sigma_xy = F.conv2d(x * y, kernel) - mu_x * mu_y
    c1, c2 = k1 * k1, k2 * k2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return float(ssim_map.mean())


@pytest.mark.parametrize("noise", [0.0, 0.05, 0.4])
def test_ssim_matches_torch_implementation(rng, noise):
    base = rng.uniform(0, 1, size=(48, 64)).astype(np.float32)
    # smooth it a bit so SSIM is not trivially ~0
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    other = np.clip(base + noise * rng.normal(size=base.shape), 0, 1).astype(np.float32)

    ours = float(ssim(jnp.asarray(base), jnp.asarray(other)))
    want = _torch_ssim(torch.from_numpy(base), torch.from_numpy(other))
    assert abs(ours - want) < 1e-5, f"ssim {ours} vs torch {want} (noise={noise})"
    if noise == 0.0:
        assert abs(ours - 1.0) < 1e-6
