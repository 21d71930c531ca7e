"""Tensor parallelism for scaled-width impedance MLPs.

The reference's ``ImpedanceEstimator`` is a 33-parameter 1->32->32->1
MLP (``src/impedance.py:6-53``) — tensor parallelism over it would be
pure overhead, which is why PARITY.md marks TP "N/A by design" for the
parity model.  This module demonstrates the capability anyway, the
TPU-native way, for the scaled-width variants a production deployment
might train (hidden 1024+): Megatron-style column/row parallelism
declared as GSPMD shardings — layer ``2k`` kernels column-sharded over
the mesh's ``ray`` axis, layer ``2k+1`` kernels row-sharded, biases
following — and XLA inserts the ``psum`` after each row-parallel matmul.
No hand-written collectives; identical math to the unsharded model.

Use ``tp_shard_params`` to lay existing params on a mesh and
``tp_train_on_table`` for the table-fit loop (the sharded counterpart of
``impedance.mlp.train_on_table``).  Activations stay replicated —
batches here are tiny (tissue tables); the win being demonstrated is
weight + matmul sharding, the TP building block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffus_tpu.impedance.mlp import ImpedanceMLP


def _tp_specs(params, axis: str):
    """PartitionSpec pytree: alternate column- and row-sharding per Dense
    layer (Megatron pattern); the final layer's (H, 1) kernel is
    row-sharded, so the closing psum folds into the output projection."""
    dense_names = sorted(
        params["params"].keys(), key=lambda s: int(s.split("_")[-1])
    )
    specs = {}
    for i, name in enumerate(dense_names):
        # the final (H, 1) projection is always row-sharded: its output
        # dim is 1 (unshardable) and the closing psum folds into it
        col = i % 2 == 0 and i != len(dense_names) - 1
        specs[name] = {
            "kernel": P(None, axis) if col else P(axis, None),
            "bias": P(axis) if col else P(),
        }
    return {"params": specs}


def tp_shard_params(mesh: Mesh, params, axis: str = "ray"):
    """Lay MLP params out tensor-parallel on ``mesh`` (column/row
    alternating over ``axis``).  Widths must divide the axis size —
    refused loudly otherwise (GSPMD would silently replicate)."""
    n = mesh.shape[axis]
    for name, leaf in jax.tree_util.tree_leaves_with_path(params):
        if leaf.ndim and max(leaf.shape) % n and max(leaf.shape) > 1:
            raise ValueError(
                f"param {jax.tree_util.keystr(name)} shape {leaf.shape} "
                f"does not divide the {axis!r} axis ({n}); pick hidden "
                "widths that are multiples of the TP degree"
            )
    specs = _tp_specs(params, axis)
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )


@partial(jax.jit, static_argnames=("hidden", "epochs", "lr"))
def _tp_fit(params, x, y, hidden, epochs, lr):
    """Same scan-compiled Adam fit as ``train_on_table``; the TP
    placement comes entirely from the params' input shardings (GSPMD
    propagates them through the grads and optimizer state and inserts
    the psums — nothing model-specific to rewrite)."""
    model = ImpedanceMLP(hidden=tuple(hidden))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = model.apply(p, x)
        return jnp.mean((pred - y) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), None, length=epochs
    )
    return params, losses


def tp_train_on_table(
    mesh: Mesh,
    params,
    x: jax.Array,
    y: jax.Array,
    hidden=(1024, 1024),
    epochs: int = 1000,
    lr: float = 1e-3,
    axis: str = "ray",
):
    """Tensor-parallel table fit: shard ``params`` over ``mesh[axis]``,
    replicate the (tiny) table batch, run the scan-compiled fit.  Output
    params keep the TP layout (feed them to further TP steps or
    ``jax.device_get`` to gather).  Returns ``(params, losses)``."""
    params = tp_shard_params(mesh, params, axis)
    xs = jax.device_put(
        jnp.asarray(x, jnp.float32).reshape(-1, 1), NamedSharding(mesh, P())
    )
    ys = jax.device_put(
        jnp.asarray(y, jnp.float32).reshape(-1, 1), NamedSharding(mesh, P())
    )
    return _tp_fit(params, xs, ys, tuple(hidden), int(epochs), float(lr))
