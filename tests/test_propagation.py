"""Correctness of the transfer-matrix scan vs the dense-solve oracle.

Covers the analytic 3-media example from the reference physics doc
(``forward_physics.md:52-89``), random batches, extreme impedance ratios
(bone/air), NaN semantics, both reflection-sign modes, and
differentiability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.ops.propagation import (
    reflection_coeff,
    echo_amplitudes,
    depth_attenuation,
    echo_time_delays,
)
from diffus_tpu.ops.reference_oracle import (
    solve_truncated_system,
    echo_amplitudes_dense,
)


def test_reflection_coeff_analytic():
    # forward_physics.md:72-76: Z=[1,2] -> +1/3 ; Z=[2,1.5] -> -1/7
    z1 = jnp.array([1.0, 2.0])
    z2 = jnp.array([2.0, 1.5])
    r = reflection_coeff(z1, z2)
    np.testing.assert_allclose(r, [1.0 / 3.0, -1.0 / 7.0], rtol=1e-6)


def test_dense_oracle_matches_analytic_example():
    # Z = [1, 2, 1.5]: forward_physics.md:78-89 (full physical convention
    # R_{i+1,i} = -R_{i,i+1} Z_i/Z_{i+1}, forward_physics.md:66) gives
    # x = [g0=1, d0=0.0141, g1=1.424, d1=0.271, g2=1.220, d2=0].
    # NB the doc's coefficient table misprints R21 as 2/21; its own
    # formula (and its solved x) use 4/21 = -(-1/7) * 2/1.5.
    r = np.array([[1.0 / 3.0, -1.0 / 7.0]])
    rho = np.array([[-1.0 / 6.0, 4.0 / 21.0]])
    w = solve_truncated_system(r, rho=rho)
    np.testing.assert_allclose(
        w[0], [1.0, 0.0141, 1.424, 0.271, 1.220, 0.0], atol=2e-3
    )


def test_scan_matches_dense_physical_rho(rng):
    z = rng.uniform(0.5, 5.0, size=(3, 25))
    r = (z[:, 1:] - z[:, :-1]) / (z[:, 1:] + z[:, :-1])
    rho = -r * z[:, :-1] / z[:, 1:]
    with jax.enable_x64():
        got = np.asarray(
            echo_amplitudes(
                jnp.asarray(r, jnp.float64), rho=jnp.asarray(rho, jnp.float64)
            )
        )
    want = echo_amplitudes_dense(r, rho=rho)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("mode", ["parity", "symmetric"])
def test_scan_matches_dense_random(mode, rng):
    r = rng.uniform(-0.6, 0.6, size=(4, 24))
    with jax.enable_x64():
        got = np.asarray(echo_amplitudes(jnp.asarray(r, dtype=jnp.float64), mode=mode))
    want = echo_amplitudes_dense(r, mode=mode)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("mode", ["parity", "symmetric"])
def test_scan_matches_dense_f32(mode, rng):
    r = rng.uniform(-0.8, 0.8, size=(3, 48)).astype(np.float32)
    got = np.asarray(echo_amplitudes(jnp.asarray(r), mode=mode))
    want = echo_amplitudes_dense(r, mode=mode)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_scan_extreme_impedance_ratios(rng):
    # tissue <-> air interfaces: Z in {400, 1.5e6..1.7e6, 7.8e6} like the
    # reference tissue table; r approaches +-0.9995
    z = rng.choice([400.0, 1.5e6, 1.6e6, 1.68e6, 7.8e6], size=(2, 65))
    r = (z[:, 1:] - z[:, :-1]) / (z[:, 1:] + z[:, :-1])
    got = np.asarray(echo_amplitudes(jnp.asarray(r, dtype=jnp.float32)))
    want = echo_amplitudes_dense(r)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_scan_long_ray_stability(rng):
    # 511 interfaces with occasional strong reflectors: must not over/underflow
    r = rng.uniform(-0.2, 0.2, size=(2, 511))
    r[:, ::37] = 0.999
    got = np.asarray(echo_amplitudes(jnp.asarray(r, dtype=jnp.float32)))
    assert np.all(np.isfinite(got))
    # dense-oracle comparison at a shorter (cheaper) depth, same structure
    r2 = r[:, :191]
    got2 = np.asarray(echo_amplitudes(jnp.asarray(r2, dtype=jnp.float32)))
    want2 = echo_amplitudes_dense(r2)
    np.testing.assert_allclose(got2, want2, rtol=5e-3, atol=1e-3)


def test_r_equal_one_limit():
    # Z1=0 -> r=1: dense system forces d0 = g0 = 1 at every depth >= 1
    r = np.array([[1.0, 0.3, -0.2]])
    got = np.asarray(echo_amplitudes(jnp.asarray(r, dtype=jnp.float32)))
    want = echo_amplitudes_dense(r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[0, 1:], 1.0, rtol=1e-5)


def test_nan_reflection_zeroes_downstream():
    # Z1+Z2 = 0 => r = nan: reference nan_to_num yields 0 for all
    # truncation depths that include the NaN interface; shallower depths
    # stay valid (they never see it).
    r = np.array([[0.2, np.nan, 0.1]])
    got = np.asarray(echo_amplitudes(jnp.asarray(r, dtype=jnp.float32)))
    want = echo_amplitudes_dense(r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert got[0, 0] == 0.0
    np.testing.assert_allclose(got[0, 1], 0.2, rtol=1e-6)  # pre-NaN depth valid
    np.testing.assert_allclose(got[0, 2:], 0.0, atol=0.0)


def test_batch_shapes_and_vmap(rng):
    r = jnp.asarray(rng.uniform(-0.5, 0.5, size=(5, 7, 31)), dtype=jnp.float32)
    out = echo_amplitudes(r)
    assert out.shape == (5, 7, 32)
    per_ray = jax.vmap(lambda x: echo_amplitudes(x))(r.reshape(35, 31))
    np.testing.assert_allclose(
        np.asarray(out).reshape(35, 32), np.asarray(per_ray), rtol=1e-5, atol=1e-7
    )


def test_gradients_flow_and_match_fd(rng):
    r0 = rng.uniform(-0.4, 0.4, size=(12,))

    def loss(r):
        return jnp.sum(echo_amplitudes(r[None, :])[0] ** 2)

    with jax.enable_x64():
        g = np.asarray(jax.grad(loss)(jnp.asarray(r0, dtype=jnp.float64)))
        eps = 1e-6
        fd = np.zeros_like(r0)
        for i in range(len(r0)):
            rp, rm = r0.copy(), r0.copy()
            rp[i] += eps
            rm[i] -= eps
            fd[i] = (loss(jnp.asarray(rp)) - loss(jnp.asarray(rm))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-6)


def test_attenuation_and_delays():
    echo = jnp.ones((2, 5))
    out = np.asarray(depth_attenuation(echo, 0.5))
    np.testing.assert_allclose(out[0], np.exp(-0.5 * np.arange(5)), rtol=1e-5)
    d = np.asarray(echo_time_delays(4, spacing=1.0, c=1540.0))
    np.testing.assert_allclose(d, 2.0 * np.arange(4) / 1540.0, rtol=1e-5)
