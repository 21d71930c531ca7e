"""CT (Hounsfield) -> acoustic impedance models.

Rebuild of the notebook-resident CT mappings
(``[DEMO] CT Render Lung.ipynb`` cell 4, ``[DEMO] CT Vivek data.ipynb``
cell 5):

  (a) Schneider-calibration piecewise HU -> density interpolation plus a
      Webb linear speed-of-sound fit ``c(HU) = a*HU + b`` (a=0.98, b=1240
      for the 120 kVp standard kernel), ``Z = rho * c`` — applied to
      ``HU + 1000`` (clinical-scale shift).
  (b) the crude closed form
      ``Z = 1000*(1540 + 0.35*HU) + HU*(1540 + 0.35*HU)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Schneider calibration points (HU, rho g/cm^3) — CT Render Lung cell 4
SCHNEIDER_HU = np.array(
    [930, 1055, 1037, 1003, 1003, 1050, 1023, 1055, 1043, 1053,
     1044, 259, 1028, 1042, 1045, 1032, 1098, 1014, 1260, 958,
     1075, 1054, 1032, 1040, 2376, 1903, 1499, 1683, 2006, 1595,
     1763, 1413, 1260, 1609, 1477], dtype=np.float32,
)
SCHNEIDER_RHO = np.array(
    [0.95, 1.06, 1.04, 1.02, 1.00, 1.07, 1.03, 1.06, 1.05, 1.06,
     1.05, 0.26, 1.03, 1.05, 1.05, 1.04, 1.10, 1.03, 1.18, 0.98,
     1.09, 1.06, 1.04, 1.05, 1.92, 1.61, 1.33, 1.46, 1.68, 1.41,
     1.52, 1.29, 1.18, 1.42, 1.33], dtype=np.float32,
) * 1000.0  # g/cm^3 -> kg/m^3

_ORDER = np.argsort(SCHNEIDER_HU)
_HU_SORTED = jnp.asarray(SCHNEIDER_HU[_ORDER])
_RHO_SORTED = jnp.asarray(SCHNEIDER_RHO[_ORDER])

WEBB_A = 0.98
WEBB_B = 1240.0


@jax.jit
def density_from_hu(hu: jax.Array) -> jax.Array:
    """Piecewise-linear Schneider HU -> density (kg/m^3), end-clamped
    (np.interp semantics, CT Render Lung cell 4)."""
    return jnp.interp(hu, _HU_SORTED, _RHO_SORTED)


def speed_from_hu(hu: jax.Array, a: float = WEBB_A, b: float = WEBB_B) -> jax.Array:
    """Webb linear fit c(HU) = a*HU + b (m/s)."""
    return a * hu + b


@jax.jit
def schneider_webb_impedance(ct_hu: jax.Array) -> jax.Array:
    """Z = rho(HU+1000) * c(HU+1000) — the reference's shifted application
    ``Z(vol + 1000)`` (CT Render Lung cell 4, last lines)."""
    hu = ct_hu + 1000.0
    return density_from_hu(hu) * speed_from_hu(hu)


@jax.jit
def crude_ct_impedance(ct_hu: jax.Array) -> jax.Array:
    """Closed-form crude model (CT Render Lung cell 4 / CT Vivek cell 5):
    ``Z = 1000*(1540 + 0.35*HU) + HU*(1540 + 0.35*HU)``."""
    c = 1540.0 + 0.35 * ct_hu
    return 1000.0 * c + ct_hu * c
