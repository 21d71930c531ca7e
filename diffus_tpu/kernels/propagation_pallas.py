"""Pallas TPU kernel: fused propagation-scan + depth attenuation along rays.

The XLA ``associative_scan`` path (``diffus_tpu.ops.propagation``)
materializes O(log N) full intermediate arrays in HBM.  This kernel
keeps the whole recurrence in VMEM/registers: rays ride the lane
dimension, depth is a sequential ``fori_loop``, and each step performs
the 2x2 transfer-matrix left-multiply

    a' = k*pa + r*pc        (k = 1 - r^2 - r*rho)
    b' = k*pb + r*pd
    c' = pc - rho*pa
    d' = pd - rho*pb

with per-step max-abs renormalization (the echo ratio -pc/pd is
scale-invariant; see ``ops/propagation.py`` for the derivation from the
reference's dense system, ``src/renderer.py:367-436``) and writes
``echo[i+1] = -c'/d' * exp(-att*(i+1))`` directly — propagation solve
and depth attenuation (``src/renderer.py:256-259``) in ONE pass over
VMEM-resident data.

Differentiability: wrapped in ``jax.custom_vjp`` whose backward runs the
(autodiff-able) XLA scan path — fast serving forward, exact training
gradients.

Layout note: depth-major ``(N, B)`` blocks (rays on lanes).  B is padded
to the 128-lane tile by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffus_tpu.ops import propagation as prop_jnp

_TINY = 1e-30
_LANE = 128


def _kernel(r_ref, out_ref, *, n_interfaces: int, mode: str, att: float):
    """r_ref: (N, B) reflection coefficients; out_ref: (N+1, B) echo.

    out[0] = 0; out[i+1] = d0 of the (i+1)-interface truncated system
    times exp(-att*(i+1)).
    """
    b = r_ref.shape[1]
    zeros = jnp.zeros((1, b), dtype=out_ref.dtype)
    ones = jnp.ones((1, b), dtype=out_ref.dtype)
    out_ref[0:1, :] = zeros

    decay = np.float32(np.exp(-att))

    def step(i, carry):
        pa, pb, pc, pd, att_i = carry
        r = r_ref[pl.ds(i, 1), :]
        if mode == "parity":
            k = 1.0 - 2.0 * r * r
            rho = r
        elif mode == "symmetric":
            k = ones
            rho = -r
        else:  # pragma: no cover - rejected before tracing
            raise ValueError(f"unsupported reflection mode: {mode!r}")
        a2 = k * pa + r * pc
        b2 = k * pb + r * pd
        c2 = pc - rho * pa
        d2 = pd - rho * pb
        s = jnp.maximum(
            jnp.maximum(jnp.abs(a2), jnp.abs(b2)),
            jnp.maximum(jnp.abs(c2), jnp.abs(d2)),
        )
        inv = 1.0 / jnp.maximum(s, _TINY)
        a2, b2, c2, d2 = a2 * inv, b2 * inv, c2 * inv, d2 * inv
        att_i = att_i * decay
        echo = jnp.nan_to_num(-(c2 / d2), nan=0.0) * att_i
        out_ref[pl.ds(i + 1, 1), :] = echo
        return a2, b2, c2, d2, att_i

    jax.lax.fori_loop(0, n_interfaces, step, (ones, zeros, zeros, ones, ones))


def _echo_pallas_raw(r_nb: jax.Array, mode: str, att: float) -> jax.Array:
    """(N, B) reflections -> (N+1, B) attenuated echo (B multiple of 128)."""
    n, b = r_nb.shape
    n_blocks = b // _LANE
    block_b = _LANE * max(1, min(n_blocks, 16))
    while b % block_b:
        block_b -= _LANE
    grid = (b // block_b,)
    # CPU has no Mosaic backend: fall back to the Pallas interpreter so
    # the kernel stays testable on the virtual CPU mesh
    interpret = jax.default_backend() != "tpu"  # Mosaic is TPU-only
    return pl.pallas_call(
        partial(_kernel, n_interfaces=n, mode=mode, att=att),
        out_shape=jax.ShapeDtypeStruct((n + 1, b), r_nb.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, block_b), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n + 1, block_b), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(r_nb)


def _echo_jnp_from_r(r: jax.Array, mode: str, att: float) -> jax.Array:
    """XLA path with identical semantics (autodiff-able)."""
    echo = prop_jnp.echo_amplitudes(r, mode=mode)
    return prop_jnp.depth_attenuation(echo, att)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def echo_pallas(r: jax.Array, mode: str = "parity", att: float = 0.5):
    """Fused echo + attenuation: ``(..., N)`` reflection coefficients ->
    ``(..., N+1)`` attenuated echo trace.

    Drop-in equivalent of
    ``depth_attenuation(echo_amplitudes(r, mode), att)`` with a Pallas
    forward and the XLA-scan VJP.  Modes: 'parity' | 'symmetric'
    ('physical' needs impedances and is served by the XLA path).
    """
    if mode not in ("parity", "symmetric"):
        raise ValueError(f"unsupported reflection mode for the kernel: {mode!r}")
    lead = r.shape[:-1]
    n = r.shape[-1]
    flat = r.reshape((-1, n))
    b = flat.shape[0]
    pad = (-b) % _LANE
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, n), flat.dtype)], axis=0)
    out = _echo_pallas_raw(flat.T, mode, att).T
    return out[:b].reshape(lead + (n + 1,))


def _fwd(r, mode, att):
    return echo_pallas(r, mode, att), r


def _bwd(mode, att, r, g):
    _, vjp = jax.vjp(lambda rr: _echo_jnp_from_r(rr, mode, att), r)
    (dr,) = vjp(g)
    return (dr,)


echo_pallas.defvjp(_fwd, _bwd)
