"""Impedance mapping layer: swappable jitted intensity -> Z modules.

Three families, mirroring the reference's capability surface (SURVEY
section 2): the deterministic tissue-table interpolant, the learned MLP
(``src/impedance.py``), and the CT Hounsfield models (CT notebooks).
"""

from diffus_tpu.impedance.preproc import brain_mask, zscore_normalize, minmax_normalize
from diffus_tpu.impedance.table import (
    TISSUE_TABLE,
    TISSUE_TABLE_NO_BONE,
    table_arrays,
    piecewise_impedance,
    tabular_impedance_volume,
    default_table_points,
)
from diffus_tpu.impedance.mlp import (
    ImpedanceMLP,
    init_params,
    train_on_table,
    fit_table_mlp,
    impedance_volume_masked,
    impedance_volume_normalized,
    impedance_slice_zscore,
)
from diffus_tpu.impedance.ct import (
    schneider_webb_impedance,
    crude_ct_impedance,
    density_from_hu,
    speed_from_hu,
)
