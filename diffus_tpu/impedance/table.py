"""Tissue tables and the piecewise (tabular) impedance model.

The reference pretrains its impedance MLPs on a small tissue table
(T1 intensity <-> acoustic impedance in MRayl); the exact values appear in
``[DEMO] REUBEN DATA 46.ipynb`` cell 1 (8 rows, incl. Bone) /
``[DEMO] Modeling Choices.ipynb`` cell 15 (7 rows) /
``[NW] alignement.ipynb`` cell 6.  Here the table is first-class data and
the piecewise-linear interpolant is offered directly as a deterministic,
jitted impedance model (the MLP in :mod:`diffus_tpu.impedance.mlp`
remains the learnable, swappable variant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (tissue, T1 intensity, impedance MRayl) — REUBEN variant incl. Bone (PW)
TISSUE_TABLE = (
    ("Fat", 260.0, 1.34),
    ("Liver", 500.0, 1.67),
    ("Muscle", 870.0, 1.68),
    ("White Matter", 780.0, 1.60),
    ("Gray Matter", 920.0, 1.60),
    ("CSF", 2500.0, 1.50),
    ("Air", 0.0, 0.0004),
    ("Bone (PW)", 525.0, 1.50),
)

# 7-row variant without Bone ([DEMO] Modeling Choices.ipynb cell 15)
TISSUE_TABLE_NO_BONE = TISSUE_TABLE[:7]


def table_arrays(table=TISSUE_TABLE, normalize: bool = True):
    """Training pairs from a tissue table.

    Mirrors the notebook prep (``REUBEN 46`` cell 1): intensities
    min-max normalized to [0, 1]; impedances in MRayl.

    Returns:
      ``(x, y, (min_int, max_int))`` — ``x``/``y`` float32 ``(n, 1)``.
    """
    intensities = np.array([row[1] for row in table], dtype=np.float32)
    impedances = np.array([row[2] for row in table], dtype=np.float32)
    min_int, max_int = float(intensities.min()), float(intensities.max())
    x = intensities
    if normalize:
        x = (x - min_int) / (max_int - min_int)
    return x[:, None], impedances[:, None], (min_int, max_int)


@jax.jit
def piecewise_impedance(intensity: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Piecewise-linear interpolation through sorted table points
    (np.interp semantics: clamped at the ends)."""
    order = jnp.argsort(xs)
    return jnp.interp(intensity, xs[order], ys[order])


@partial(jax.jit, static_argnames=("scale",))
def tabular_impedance_volume(
    volume: jax.Array, table_x: jax.Array, table_y: jax.Array, scale: float = 1e6
) -> jax.Array:
    """Deterministic tabular impedance map: raw intensity -> Z (Rayl).

    Interpolates the (raw-intensity, MRayl) table and scales to Rayl —
    the exact curve the reference's table-trained MLP approximates
    (applied whole-volume like ``REUBEN 46`` cell 4).
    """
    return piecewise_impedance(volume, table_x, table_y) * scale


def default_table_points(table=TISSUE_TABLE):
    """Sorted (raw intensity, MRayl) arrays for :func:`tabular_impedance_volume`."""
    intensities = np.array([row[1] for row in table], dtype=np.float32)
    impedances = np.array([row[2] for row in table], dtype=np.float32)
    order = np.argsort(intensities)
    return jnp.asarray(intensities[order]), jnp.asarray(impedances[order])
