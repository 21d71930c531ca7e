"""Image formation: splat parity, apex rotation, artifacts, pulse conv."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter, gaussian_filter1d

from diffus_tpu.ops.splat import (
    differentiable_splat,
    rotate_around_apex,
    highest_variance_axes,
)
from diffus_tpu.ops.artifacts import (
    add_speckle_arcs,
    depth_dependent_lateral_blur,
    sharpen,
    radial_falloff,
    add_speckle_noise,
    add_shadow,
    depth_dependent_axial_blur,
)
from diffus_tpu.ops.filters import gaussian_pulse, convolve_pulse, gaussian_blur


def _splat_oracle(c0, c1, vals, H, W, sigma):
    """Independent numpy transcription of differentiable_splat
    (renderer.py:709-737): scatter-add, outer-product gaussian conv2d
    (zero padding), normalize, transpose."""
    idx0 = np.clip(np.round(c0).astype(int), 0, W - 1).ravel()
    idx1 = np.clip(np.round(c1).astype(int), 0, H - 1).ravel()
    img = np.zeros((H, W))
    wgt = np.zeros((H, W))
    np.add.at(img, (idx1, idx0), vals.ravel())
    np.add.at(wgt, (idx1, idx0), 1.0)
    size = int(6 * sigma) | 1
    half = size // 2
    t = np.arange(size) - half
    k1 = np.exp(-0.5 * (t / sigma) ** 2)
    k1 = k1 / k1.sum()
    k2 = np.outer(k1, k1)

    def conv(a):
        ap = np.pad(a, half)
        out = np.zeros_like(a)
        for i in range(a.shape[0]):
            for j in range(a.shape[1]):
                out[i, j] = np.sum(ap[i : i + size, j : j + size] * k2)
        return out

    return (conv(img) / (conv(wgt) + 1e-8)).T


def test_splat_parity(rng):
    c0 = rng.uniform(0, 31, size=60)
    c1 = rng.uniform(0, 31, size=60)
    vals = rng.normal(size=60).astype(np.float32)
    got = np.asarray(
        differentiable_splat(
            jnp.asarray(c0, jnp.float32), jnp.asarray(c1, jnp.float32),
            jnp.asarray(vals), height=32, width=32, sigma=2.0,
        )
    )
    want = _splat_oracle(c0.astype(np.float32), c1.astype(np.float32), vals, 32, 32, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_splat_differentiable_wrt_intensities(rng):
    c0 = jnp.asarray(rng.uniform(0, 15, 20), jnp.float32)
    c1 = jnp.asarray(rng.uniform(0, 15, 20), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=20), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(differentiable_splat(c0, c1, v, 16, 16) ** 2))(v0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_highest_variance_axes():
    x = np.arange(100.0)          # large variance
    y = np.zeros(100)             # none
    z = np.arange(100.0) * 0.1    # small
    assert highest_variance_axes(x, y, z) == (0, 2)


def test_rotate_around_apex_parity():
    # independent check of renderer.py:655-692 semantics: shift x by -128,
    # rotate by atan2(m0, m1), shift to apex
    x = jnp.array([128.0, 130.0])
    z = jnp.array([0.0, 10.0])
    # median along +z (median=[0,1]): angle 0 -> pure translation by apex
    xr, zr = rotate_around_apex(x, z, apex=(5.0, 7.0), median=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(xr), [5.0, 7.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(zr), [7.0, 17.0], atol=1e-5)
    # median=[1,0]: angle pi/2 -> (x-128, z) -> (-z, x-128) + apex
    xr, zr = rotate_around_apex(x, z, apex=(0.0, 0.0), median=(1.0, 0.0))
    np.testing.assert_allclose(np.asarray(xr), [0.0, -10.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(zr), [0.0, 2.0], atol=1e-4)


def test_speckle_arcs_statistics():
    key = jax.random.PRNGKey(0)
    img = jnp.ones((64, 128))
    out = np.asarray(add_speckle_arcs(img, key, std_radial=0.1, std_local=0.02))
    assert out.shape == (64, 128)
    assert np.all(out >= 0.0)  # negatives clipped
    # deeper columns noisier (reference: std grows with depth)
    shallow = out[:, :16].std()
    deep = out[:, -16:].std()
    assert deep > shallow
    # reproducible
    out2 = np.asarray(add_speckle_arcs(img, key, std_radial=0.1, std_local=0.02))
    np.testing.assert_allclose(out, out2)


def test_lateral_blur_matches_scipy_loop(rng):
    img = rng.normal(size=(32, 20)).astype(np.float32)
    got = np.asarray(depth_dependent_lateral_blur(jnp.asarray(img), max_sigma=2.0))
    want = img.copy()
    n = img.shape[1]
    for z in range(n):
        sigma = 2.0 * (z / (n - 1)) if z > 0 else 1e-8
        want[:, z] = gaussian_filter1d(img[:, z], sigma)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharpen_matches_scipy(rng):
    img = rng.normal(size=(24, 24)).astype(np.float32)
    got = np.asarray(sharpen(jnp.asarray(img), alpha=1.5))
    blurred = gaussian_filter(img, sigma=1)
    want = np.clip(img + 1.5 * (img - blurred), img.min(), img.max())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_matches_scipy(rng):
    img = rng.normal(size=(17, 23)).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(img), sigma=1.0))
    want = gaussian_filter(img, sigma=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_radial_falloff_and_speckle_and_shadow(rng):
    img = jnp.asarray(rng.uniform(0.1, 1, (8, 10)).astype(np.float32))
    out = np.asarray(radial_falloff(img, attenuation_min=0.5, power=2.0))
    scale = np.linspace(1.0, 0.5, 10) ** 2
    np.testing.assert_allclose(out, np.asarray(img) * scale[None, :], rtol=1e-5)

    noisy = np.asarray(add_speckle_noise(img, jax.random.PRNGKey(1), std=0.3))
    assert noisy.min() >= float(img.min()) - 1e-6
    assert noisy.max() <= float(img.max()) + 1e-6

    sh = np.asarray(add_shadow(img, center_ray=4, width=1, strength=0.5))
    np.testing.assert_allclose(sh[4], np.asarray(img)[4] * 0.5, rtol=1e-6)
    np.testing.assert_allclose(sh[0], np.asarray(img)[0], rtol=1e-6)


def test_axial_blur_reference_semantics(rng):
    img = rng.normal(size=(4, 12)).astype(np.float32)
    got = np.asarray(depth_dependent_axial_blur(jnp.asarray(img), max_kernel=7))
    want = img.copy()
    n = img.shape[1]
    for z in range(n):
        half = int((7 * (z / (n - 1))) // 2)
        if half < 1:
            continue
        lo, hi = max(0, z - half), min(n, z + half + 1)
        want[:, z] = img[:, lo:hi].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_pulse_and_conv(rng):
    p = gaussian_pulse(15, 2.0)
    assert p.shape == (15,) and p.max() == 1.0
    # reference semantics (renderer.py:494): linspace(-length // 2, length // 2)
    # with Python floor division — ASYMMETRIC -8..7 for odd length 15
    t = np.linspace(-8, 7, 15)
    want = np.exp(-0.5 * (t / 2.0) ** 2)
    np.testing.assert_allclose(p, want / want.max(), rtol=1e-5)

    echo = rng.normal(size=(3, 40)).astype(np.float32)
    out = np.asarray(convolve_pulse(jnp.asarray(echo), p))
    # torch F.conv1d = correlation with zero padding length//2
    want = np.stack([
        np.correlate(np.pad(e, 7), p, mode="valid") for e in echo
    ])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_rasterize_fan_host_output_shape(rng):
    """The usable variant honors output_shape on a regular grid; the
    parity_grid quirk reproduces the reference's meshgrid-over-points
    (renderer.py:643) with its N^2 size."""
    from diffus_tpu.ops.splat import rasterize_fan_host

    n = 24
    x = rng.uniform(0, 30, n).astype(np.float32)
    z = rng.uniform(0, 50, n).astype(np.float32)
    v = rng.uniform(0, 1, n).astype(np.float32)

    img = rasterize_fan_host(x, z, v, output_shape=(40, 32))
    assert img.shape == (40, 32)
    assert np.isfinite(img).all()
    assert img.max() > 0

    quirk = rasterize_fan_host(x, z, v, parity_grid=True)
    assert quirk.shape == (n, n)
