"""Multi-interface wave propagation as an associative scan over 2x2 transfer matrices.

This is the TPU-native replacement for the reference's hot loop: for every
truncation depth ``i = 0..N`` the reference assembles and densely solves a
``2(i+1) x 2(i+1)`` linear system per ray and reads off the surface-return
amplitude ``d0``  (``src/renderer.py:367-436``, math in
``forward_physics.md:17-48``).  That is ``N+1`` growing dense solves —
O(N^4) work and seconds per frame.

Reformulation
-------------
The reference system encodes, per interface ``i`` with left-incidence
reflection coefficient ``r_i`` (and the code's conventions
``traLR = 1 + r``, ``traRL = 1 - r``, ``refRL = rho`` where the shipped
code uses ``rho = +r``, ``src/renderer.py:380-382``):

    g_{i+1} = (1 + r_i) g_i + r_i  d_{i+1}        (renderer.py:397-400)
    d_i     = rho_i g_i + (1 - r_i) d_{i+1}       (renderer.py:402-405)

Solving for the downstream state gives a per-interface 2x2 transfer matrix

    [g_{i+1}]    1    [1 - r_i^2 - r_i rho_i   r_i] [g_i]
    [d_{i+1}] = ----- [   -rho_i                1 ] [d_i]
                1-r_i

With boundary conditions ``g_0 = 1`` and ``d_i = 0`` for the system
truncated at depth ``i`` (renderer.py:389-391), the return amplitude is a
ratio of entries of the prefix product ``P^(i) = M_{i-1} ... M_0``:

    0 = P10 * 1 + P11 * d0    =>    d0^(i) = -P10 / P11

The ratio is invariant under scaling each ``M_i`` by any nonzero scalar, so
we (a) drop the ``1/(1-r_i)`` prefactor entirely (avoiding the r -> 1
singularity; the limit is continuous and matches the dense solve) and
(b) renormalize every combined product by its max-abs entry inside the
scan to prevent f32 under/overflow for long rays with strong reflectors
(bone/air impedance ratios up to ~1e4:1).

One ``jax.lax.associative_scan`` then yields all N prefix products in
O(log N) parallel depth — fully vmappable over rays/poses and
differentiable by construction (the reference relies on
``torch.linalg.solve``'s adjoint; here autodiff flows through the scan).

The reference's ``cumsum`` over truncation depths followed by ``diff``
(``renderer.py:435`` then ``:454``) cancel exactly, so pixel ``i`` of the
echo trace is ``d0^(i)`` with a zero prepended (``d0^(0)`` solves the
0-interface system => 0).  We compute that directly.

NaN semantics match the reference: ``torch.nan_to_num(w, nan=0.0)``
(``renderer.py:408``) zeroes NaNs from degenerate systems (e.g.
``Z1 + Z2 = 0`` => ``r = 0/0``); we apply the same to the final amplitudes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TINY = 1e-30


def reflection_coeff(z1: jax.Array, z2: jax.Array) -> jax.Array:
    """Amplitude reflection coefficient at an impedance interface.

    R = (Z2 - Z1) / (Z1 + Z2) — matches ``compute_reflection_coeff``
    (``src/renderer.py:27-33``; the docstring there claims the squared
    power coefficient but the code computes amplitude — parity follows
    the code).
    """
    return (z2 - z1) / (z1 + z2)


def transfer_matrix_elements(r: jax.Array, rho: jax.Array):
    """Scaled 2x2 transfer-matrix entries per interface.

    Returns ``(a, b, c, d)`` of M~ = (1 - r) * M:

        M~ = [[1 - r^2 - r*rho,  r],
              [-rho,             1]]

    ``rho = +r`` reproduces the shipped reference (``renderer.py:382``);
    ``rho = -r`` the symmetric variant of the DEPR notebook.
    """
    a = 1.0 - r * r - r * rho
    b = r
    c = -rho
    d = jnp.ones_like(r)
    return a, b, c, d


def _combine(p, q):
    """Associative combine: later-element q left-multiplies p (Q @ P),
    renormalized by max-abs entry (the final d0 ratio is scale-invariant)."""
    pa, pb, pc, pd = p
    qa, qb, qc, qd = q
    a = qa * pa + qb * pc
    b = qa * pb + qb * pd
    c = qc * pa + qd * pc
    d = qc * pb + qd * pd
    s = jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.abs(b)),
        jnp.maximum(jnp.abs(c), jnp.abs(d)),
    )
    inv = 1.0 / jnp.maximum(s, _TINY)
    return a * inv, b * inv, c * inv, d * inv


def impedance_weighted_rho(r: jax.Array, z1: jax.Array, z2: jax.Array) -> jax.Array:
    """Right-to-left reflection for the full physical convention:
    ``R_{i+1,i} = -R_{i,i+1} * Z_i / Z_{i+1}`` (``forward_physics.md:66``)."""
    return -r * z1 / z2


@partial(jax.jit, static_argnames=("mode", "axis"))
def echo_amplitudes(
    r: jax.Array, mode: str = "parity", axis: int = -1, rho: jax.Array | None = None
) -> jax.Array:
    """All-depth surface-return amplitudes in one associative scan.

    Args:
      r: ``(..., N)`` reflection coefficients along each ray
        (N interfaces).
      mode: ``'parity'`` (refRL = +refLR, the shipped reference behavior,
        ``src/renderer.py:382``) or ``'symmetric'`` (refRL = -refLR,
        the DEPR-notebook variant).  Ignored when ``rho`` is given.
      axis: depth axis of ``r``.
      rho: optional explicit right-to-left reflection coefficients
        (``(..., N)``), e.g. the impedance-weighted physical convention
        from :func:`impedance_weighted_rho` — this reproduces the worked
        example of ``forward_physics.md:52-89``.

    Returns:
      ``(..., N + 1)`` echo trace: ``[0, d0^(1), ..., d0^(N)]`` — exactly
      the reference's ``compute_echo_traces`` output
      (``src/renderer.py:439-457``), NaNs zeroed like
      ``renderer.py:408``.
    """
    if rho is None:
        if mode == "parity":
            rho = r
        elif mode == "symmetric":
            rho = -r
        else:
            raise ValueError(f"unknown reflection mode: {mode!r}")

    if axis != -1:
        r = jnp.moveaxis(r, axis, -1)
        rho = jnp.moveaxis(rho, axis, -1)

    elems = transfer_matrix_elements(r, rho)
    _, _, pc, pd = jax.lax.associative_scan(_combine, elems, axis=-1)
    # prefix k holds P^(k+1) = M_k ... M_0  =>  d0 at truncation depth k+1
    d0 = -pc / pd
    d0 = jnp.nan_to_num(d0, nan=0.0)
    zeros = jnp.zeros(d0.shape[:-1] + (1,), dtype=d0.dtype)
    out = jnp.concatenate([zeros, d0], axis=-1)
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def propagate_boundary(g_left: jax.Array, d_right: jax.Array, r: jax.Array,
                       mode: str = "parity"):
    """Single-interface amplitude update (educational helper).

    The one-boundary relations the full system chains together
    (``[DEMO] Intro to the theory behind propagation.ipynb`` cell 12,
    ``forward_physics.md:17-25``): given the rightward amplitude ``g``
    incident from the left and the leftward amplitude ``d`` incident
    from the right,

        g_right = (1 + r) * g_left + r * d_right
        d_left  = rho * g_left + (1 - r) * d_right

    Returns ``(g_right, d_left)``.
    """
    rho = r if mode == "parity" else -r
    g_right = (1.0 + r) * g_left + r * d_right
    d_left = rho * g_left + (1.0 - r) * d_right
    return g_right, d_left


def echo_time_delays(n: int, spacing: float = 1.0, c: float = 1.54e3) -> jax.Array:
    """Two-way travel-time delays per depth sample.

    Mirrors ``compute_echo_traces``'s ``delays_us = 2*spacing*arange(n)/c``
    (``src/renderer.py:455``; c = 1540 m/s).
    """
    return 2.0 * spacing * jnp.arange(n, dtype=jnp.float32) / c


def depth_attenuation(echo: jax.Array, attenuation_coeff: float) -> jax.Array:
    """Exponential depth attenuation ``exp(-a * depth_index)``.

    Matches ``plot_beam_frame``'s attenuation model
    (``src/renderer.py:256-259``): depth index counts *post-start* samples.
    """
    depths = jnp.arange(echo.shape[-1], dtype=echo.dtype)
    return echo * jnp.exp(-attenuation_coeff * depths)
