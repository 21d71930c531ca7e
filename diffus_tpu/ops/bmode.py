"""RF-to-B-mode post-processing: analytic envelope + log compression.

Rebuild of the alternative B-mode pipeline in
``[DEMO] Renderer Alternatives.ipynb`` cell 14 (``process_rf_to_bmode``:
Hilbert-transform envelope per ray, ``log1p`` compression, max
normalization).  The Hilbert transform is the standard FFT method
(positive frequencies doubled), jittable with static lengths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def hilbert_envelope(rf: jax.Array) -> jax.Array:
    """|analytic signal| along the last (depth) axis — scipy.signal.hilbert
    semantics (FFT method, even/odd length handling)."""
    n = rf.shape[-1]
    spec = jnp.fft.fft(rf, axis=-1)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(spec * jnp.asarray(h), axis=-1)
    return jnp.abs(analytic)


@jax.jit
def rf_to_bmode(profiles: jax.Array) -> jax.Array:
    """Envelope -> log1p compression -> max-normalize to [0, 1]."""
    env = hilbert_envelope(profiles.astype(jnp.float32))
    bmode = jnp.log1p(env)
    return bmode / jnp.max(bmode)


@partial(jax.jit, static_argnames=("dynamic_range_db",))
def log_compress(env: jax.Array, dynamic_range_db: float = 60.0) -> jax.Array:
    """Clinical-style dB log compression to [0, 1] over a dynamic range —
    an extra knob beyond the reference's log1p, for realistic display."""
    env = jnp.abs(env)
    peak = jnp.max(env) + 1e-12
    db = 20.0 * jnp.log10(env / peak + 1e-12)
    return jnp.clip(1.0 + db / dynamic_range_db, 0.0, 1.0)


@jax.jit
def intensity_projection(values: jax.Array) -> jax.Array:
    """Trapezoidal intensity projection along depth — the
    ``torch.trapz``-based projection mode of ``Renderer Alternatives``
    cells 7-8."""
    return jnp.trapezoid(values, axis=-1)
