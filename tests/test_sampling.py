"""Sampler parity and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.ops.sampling import (
    ray_points,
    sample_nearest,
    sample_trilinear,
)


def test_ray_points_formula():
    src = jnp.array([1.0, 2.0, 3.0])
    dirs = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]])
    pts = np.asarray(ray_points(src, dirs, 4))
    assert pts.shape == (2, 4, 3)
    np.testing.assert_allclose(pts[0, 3], [4.0, 2.0, 3.0], rtol=1e-6)
    np.testing.assert_allclose(pts[1, 2], [1.0, 3.0, 4.0], rtol=1e-6)


def test_nearest_round_half_even_and_clamp(rng):
    vol = jnp.asarray(rng.normal(size=(4, 5, 6)).astype(np.float32))
    # .5 coordinates: round-half-to-even (torch/numpy convention)
    pts = jnp.array([
        [0.5, 1.5, 2.5],    # -> (0, 2, 2)
        [2.5, 3.5, 4.5],    # -> (2, 4, 4)
        [-3.0, 99.0, 2.0],  # clamped -> (0, 4, 2)
    ])
    idx, vals = sample_nearest(vol, pts)
    want_idx = np.array([[0, 2, 2], [2, 4, 4], [0, 4, 2]])
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    v = np.asarray(vol)
    np.testing.assert_allclose(
        np.asarray(vals), v[want_idx[:, 0], want_idx[:, 1], want_idx[:, 2]]
    )


def test_trilinear_equals_nearest_at_integers(rng):
    vol = jnp.asarray(rng.normal(size=(5, 5, 5)).astype(np.float32))
    pts = jnp.asarray(rng.integers(0, 5, size=(10, 3)).astype(np.float32))
    _, v_near = sample_nearest(vol, pts)
    _, v_tri = sample_trilinear(vol, pts)
    np.testing.assert_allclose(np.asarray(v_near), np.asarray(v_tri), rtol=1e-5)


def test_trilinear_midpoint_value():
    vol = jnp.zeros((2, 2, 2)).at[1, 1, 1].set(8.0)
    _, v = sample_trilinear(vol, jnp.array([[0.5, 0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(v), [1.0], rtol=1e-6)


def test_trilinear_gradient_wrt_points(rng):
    vol = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))

    def f(p):
        _, v = sample_trilinear(vol, p)
        return jnp.sum(v)

    p0 = jnp.asarray(rng.uniform(1.2, 5.8, size=(6, 3)).astype(np.float32))
    g = jax.grad(f)(p0)
    assert np.any(np.abs(np.asarray(g)) > 0)  # gradients survive (unlike nearest)
    # finite-difference check on one coordinate
    eps = 1e-3
    pp = p0.at[2, 1].add(eps)
    pm = p0.at[2, 1].add(-eps)
    fd = (f(pp) - f(pm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[2, 1], np.asarray(fd), rtol=1e-2, atol=1e-3)
