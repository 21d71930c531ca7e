"""RF -> B-mode post-processing vs scipy oracles."""

import jax.numpy as jnp
import numpy as np
from scipy.signal import hilbert

from diffus_tpu.ops.bmode import (
    hilbert_envelope,
    rf_to_bmode,
    log_compress,
    intensity_projection,
)


def test_hilbert_envelope_matches_scipy(rng):
    for n in (40, 41):  # even and odd lengths
        rf = rng.normal(size=(3, n)).astype(np.float32)
        got = np.asarray(hilbert_envelope(jnp.asarray(rf)))
        want = np.abs(hilbert(rf.astype(np.float64), axis=1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rf_to_bmode_normalized(rng):
    rf = rng.normal(size=(4, 32)).astype(np.float32)
    b = np.asarray(rf_to_bmode(jnp.asarray(rf)))
    assert b.shape == (4, 32)
    np.testing.assert_allclose(b.max(), 1.0, rtol=1e-6)
    assert b.min() >= 0.0
    # parity with the notebook formula: log1p(|hilbert|)/max
    want = np.log1p(np.abs(hilbert(rf.astype(np.float64), axis=1)))
    want = want / want.max()
    np.testing.assert_allclose(b, want, rtol=1e-4, atol=1e-5)


def test_log_compress_range(rng):
    env = np.abs(rng.normal(size=(8, 16))).astype(np.float32)
    out = np.asarray(log_compress(jnp.asarray(env), dynamic_range_db=60.0))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the peak maps to 1.0
    np.testing.assert_allclose(out.flat[np.argmax(env)], 1.0, atol=1e-5)


def test_intensity_projection_matches_trapz(rng):
    v = rng.normal(size=(5, 20)).astype(np.float32)
    got = np.asarray(intensity_projection(jnp.asarray(v)))
    want = np.trapezoid(v, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
