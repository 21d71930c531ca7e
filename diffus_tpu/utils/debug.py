"""Failure detection: explicit NaN/Inf guards with a debug flag.

The reference's only fault handling is a silent ``nan_to_num`` after the
solve (``src/renderer.py:408``) — degenerate scenes (zero-impedance
regions, singular systems) vanish into zeros.  Here the silent zeroing
is kept for parity, but a debug path makes degeneracy *visible*:
``checked`` wraps any jitted function with ``checkify`` so NaN/Inf
production raises a structured error instead of propagating garbage
(SURVEY section 5: "explicit NaN guards with debug flag, documented").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, *static_argnames):
    """Wrap ``fn`` with float-error checking (NaN/Inf/div-by-zero).

    Returns a callable with the same signature that RAISES
    ``checkify.JaxRuntimeError`` where the unchecked version would emit
    non-finite values.  Use in debugging sessions, not the hot path.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        checked_fn = checkify.checkify(
            lambda *a, **k: fn(*a, **k), errors=checkify.float_checks
        )
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "value"):
    """Host-side finiteness assertion over a pytree (blocks on device
    values; for tests and debugging)."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.all(jnp.isfinite(arr))
        ):
            raise FloatingPointError(f"{name}: non-finite values in leaf {i}")
    return tree
