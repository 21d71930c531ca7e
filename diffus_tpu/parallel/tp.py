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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    alternating over ``axis``).  Dims the layout actually shards must
    divide the axis size — refused loudly otherwise (GSPMD would
    silently pad); replicated dims (e.g. row-layer biases) are free."""
    n = mesh.shape[axis]
    specs = _tp_specs(params, axis)
    for lname, lspec in specs["params"].items():
        for pname, spec in lspec.items():
            shape = params["params"][lname][pname].shape
            for dim, ax in zip(shape, spec):
                if ax == axis and dim % n:
                    raise ValueError(
                        f"param {lname}/{pname} shape {shape}: sharded "
                        f"dim {dim} does not divide the {axis!r} axis "
                        f"({n}); pick hidden widths that are multiples "
                        "of the TP degree"
                    )
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )


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
    replicate the (tiny) table batch, and run the SAME scan-compiled
    ``train_on_table`` loop — the TP placement comes entirely from the
    params' input shardings (GSPMD propagates them through the grads and
    optimizer state and inserts the psums; nothing model-specific to
    rewrite).  Output params keep the TP layout (feed them to further
    TP steps or ``jax.device_get`` to gather).
    Returns ``(params, losses)``."""
    from diffus_tpu.impedance.mlp import train_on_table

    params = tp_shard_params(mesh, params, axis)
    xs = jax.device_put(
        jnp.asarray(x, jnp.float32).reshape(-1, 1), NamedSharding(mesh, P())
    )
    ys = jax.device_put(
        jnp.asarray(y, jnp.float32).reshape(-1, 1), NamedSharding(mesh, P())
    )
    return train_on_table(
        params, xs, ys, hidden=tuple(hidden), epochs=int(epochs), lr=float(lr)
    )
