"""Learned intensity -> impedance mapping: flax MLP + optax training.

Rebuild of the reference's ``ImpedanceEstimator`` (1->32->32->1 ReLU MLP,
``src/impedance.py:6-53``; Adam lr=1e-3, MSE, 5000 full-batch epochs) and
the notebook 64-hidden variant (``[DEMO] REUBEN DATA 46.ipynb`` cell 1:
hidden 64, 1000 epochs, lr 0.01).  The training loop is a jitted
``lax.scan`` over optimizer steps — the whole 5000-epoch fit compiles to
one XLA program instead of 5000 Python iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from diffus_tpu.impedance.preproc import brain_mask, zscore_normalize


class ImpedanceMLP(nn.Module):
    """MLP intensity -> impedance (MRayl).  Default widths match
    ``src/impedance.py:10-14`` (1 -> 32 -> 32 -> 1, ReLU)."""

    hidden: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, x):
        for width in self.hidden:
            x = nn.relu(nn.Dense(width)(x))
        return nn.Dense(1)(x)


def init_params(key, hidden: Sequence[int] = (32, 32)):
    model = ImpedanceMLP(hidden=tuple(hidden))
    return model.init(key, jnp.zeros((1, 1)))


@partial(jax.jit, static_argnames=("hidden", "epochs", "lr"))
def train_on_table(
    params,
    x: jax.Array,
    y: jax.Array,
    hidden: Sequence[int] = (32, 32),
    epochs: int = 5000,
    lr: float = 1e-3,
):
    """Full-batch Adam fit of the MLP to (x, y) pairs.

    Equivalent of ``ImpedanceEstimator.train_model``
    (``src/impedance.py:19-37``) as one ``lax.scan``.

    Returns: ``(params, losses)`` with per-epoch MSE losses.
    """
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
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=epochs)
    return params, losses


def fit_table_mlp(key, table_x, table_y, hidden=(32, 32), epochs=5000, lr=1e-3):
    """Convenience: init + fit on tissue-table pairs
    (``diffus_tpu.impedance.table.table_arrays``)."""
    params = init_params(key, hidden)
    return train_on_table(
        params,
        jnp.asarray(table_x),
        jnp.asarray(table_y),
        hidden=tuple(hidden),
        epochs=epochs,
        lr=lr,
    )


@partial(jax.jit, static_argnames=("hidden", "threshold", "background", "scale"))
def impedance_volume_masked(
    params,
    volume: jax.Array,
    hidden: Sequence[int] = (32, 32),
    threshold: float = 50.0,
    background: float = 400.0,
    scale: float = 1e6,
) -> jax.Array:
    """Masked impedance volume: brain-mask -> z-score -> MLP -> * 1e6,
    background filled with air impedance 400.

    Parity with ``ImpedanceEstimator.compute_impedance_volume``
    (``src/impedance.py:39-53``) — but fully vectorized: the MLP runs on
    every voxel and the mask selects, instead of boolean fancy-indexing
    (dynamic shapes don't jit).
    """
    model = ImpedanceMLP(hidden=tuple(hidden))
    mask = brain_mask(volume, threshold)
    vol_norm = zscore_normalize(volume, mask)
    pred = model.apply(params, vol_norm.reshape(-1, 1)).reshape(volume.shape) * scale
    return jnp.where(mask, pred, background)


@partial(jax.jit, static_argnames=("hidden", "scale"))
def impedance_volume_normalized(
    params,
    volume: jax.Array,
    min_int: float,
    max_int: float,
    hidden: Sequence[int] = (32, 32),
    scale: float = 1e6,
) -> jax.Array:
    """Whole-volume variant: [0,1]-normalize by the table's intensity range,
    clamp, MLP everywhere, * 1e6.

    Parity with the notebook application path
    (``[DEMO] Modeling Choices.ipynb`` cell 17 / ``REUBEN 46`` cell 4).
    """
    model = ImpedanceMLP(hidden=tuple(hidden))
    norm = jnp.clip((volume - min_int) / (max_int - min_int), 0.0, 1.0)
    return model.apply(params, norm.reshape(-1, 1)).reshape(volume.shape) * scale


@partial(jax.jit, static_argnames=("hidden", "scale"))
def impedance_slice_zscore(
    params, x_slice: jax.Array, hidden: Sequence[int] = (32, 32), scale: float = 1e6
) -> jax.Array:
    """Per-slice z-score + MLP (the renderer-in-the-loop forward used by
    ``UltrasoundSynthesisModel.compute_impedance_volume``,
    ``[DEMO] REUBEN DATA 46.ipynb`` cell 11): gradients flow into params."""
    model = ImpedanceMLP(hidden=tuple(hidden))
    mean = jnp.mean(x_slice)
    std = jnp.std(x_slice, ddof=1)
    norm = (x_slice - mean) / (std + 1e-8)
    return model.apply(params, norm.reshape(-1, 1)).reshape(x_slice.shape) * scale
