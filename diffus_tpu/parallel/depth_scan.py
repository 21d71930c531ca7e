"""Depth-sharded propagation scan: the sequence-parallel analogue.

The reference has no sequence/context parallelism (nothing attention-like
exists); the closest structure is the per-ray depth axis, which our
solver reduces to prefix products of 2x2 transfer matrices
(``ops/propagation.py``).  Prefix products are associative, so the depth
axis itself can shard across devices (SURVEY section 5 "long-context"):

  1. each device runs the associative scan over its local depth chunk,
  2. the per-chunk *total* matrices are all-gathered over the mesh axis
     (one small ICI collective: 4 floats per ray per device),
  3. each device computes its exclusive prefix of the chunk totals and
     left-applies it to every local prefix.

At the reference's depth (512) a single chip is faster — this exists to
scale the depth axis beyond one chip's comfort (e.g. whole-body rays at
10^5+ samples) and to document the honest CP-equivalent.  Implemented
with ``jax.shard_map`` over a 1-D ``depth`` mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from diffus_tpu.ops.propagation import (
    transfer_matrix_elements,
    _combine,
)


def _local_scan(elems):
    return jax.lax.associative_scan(_combine, elems, axis=-1)


def _depth_sharded_scan_body(r, rho, axis_name: str):
    """Per-device body: local scan + cross-device prefix fix-up."""
    elems = transfer_matrix_elements(r, rho)
    local = _local_scan(elems)  # tuple of (..., chunk) prefix entries

    # chunk totals: the last local prefix on each device
    totals = tuple(x[..., -1] for x in local)  # each (...,)
    # gather every device's total: (n_dev, ...)
    gathered = tuple(jax.lax.all_gather(t, axis_name) for t in totals)

    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)

    # exclusive prefix of chunk totals for THIS device: product of all
    # earlier chunks (identity for device 0).  n_dev is tiny (mesh axis),
    # so a Python loop over devices with masked combines is fine.
    def ident_like(t):
        zeros = jnp.zeros_like(t)
        ones = jnp.ones_like(t)
        return ones, zeros, zeros, ones

    prefix = ident_like(gathered[0][0])
    for k in range(n_dev):  # static loop over mesh size
        candidate = _combine(prefix, tuple(g[k] for g in gathered))
        take = k < idx
        prefix = tuple(jnp.where(take, c, p) for c, p in zip(candidate, prefix))

    # left-apply the exclusive prefix to every local prefix:
    # P_global = P_local @ prefix  (prefix covers the EARLIER depth chunks,
    # so it sits on the right of the matrix product)
    prefix_b = tuple(p[..., None] for p in prefix)
    fixed = _combine(prefix_b, local)
    _, _, pc, pd = fixed
    d0 = jnp.nan_to_num(-pc / pd, nan=0.0)
    return d0


def echo_amplitudes_depth_sharded(
    r: jax.Array, mesh: Mesh, axis: str = "ray", mode: str = "parity"
) -> jax.Array:
    """Depth-sharded equivalent of
    :func:`diffus_tpu.ops.propagation.echo_amplitudes`.

    Args:
      r: ``(B, N)`` reflection coefficients; ``N`` must divide by the mesh
        axis size.
      mesh: device mesh containing ``axis`` (the depth axis rides it).
    Returns:
      ``(B, N + 1)``: ``[0, d0^(1), ..., d0^(N)]``, identical to the
      single-device scan.
    """
    if mode == "parity":
        rho = r
    elif mode == "symmetric":
        rho = -r
    else:
        # 'physical' needs impedances, not just r — cannot be derived here
        raise ValueError(f"unsupported reflection mode for depth sharding: {mode!r}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )
    def run(r_local, rho_local):
        return _depth_sharded_scan_body(r_local, rho_local, axis)

    d0 = run(r, rho)
    zeros = jnp.zeros(r.shape[:-1] + (1,), dtype=d0.dtype)
    return jnp.concatenate([zeros, d0], axis=-1)
