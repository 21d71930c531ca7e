"""Cross-modality rendering demos: CT lung, transcranial US, generic MRI.

The reference demonstrates these on private data
(``[DEMO] CT Render Lung.ipynb``: 3 views at 60-100 samples x 200 rays
with artifacts; ``additional_data/{CT_scan, transcranial_US, heart_MRI}``
ship only READMEs).  This runner reproduces the workflows on synthetic
phantoms, or on real volumes via ``--volume``.

    python examples/ct_render.py --modality ct --out ct.png
    python examples/ct_render.py --modality transcranial --out tc.png
"""

import argparse

import numpy as np
import jax.numpy as jnp

from diffus_tpu.types import RenderConfig
from diffus_tpu.render import render_frame
from diffus_tpu.geometry import fan_directions_2d
from diffus_tpu.impedance import (
    schneider_webb_impedance,
    crude_ct_impedance,
    default_table_points,
    tabular_impedance_volume,
)
from diffus_tpu.phantoms import (
    ct_lung_phantom_3d,
    transcranial_phantom_3d,
    t1_phantom_3d,
    heart_phantom_3d,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", default="ct",
                    choices=["ct", "ct-crude", "transcranial", "mri", "heart"])
    ap.add_argument("--volume", default=None, help="optional NIfTI/np volume")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--rays", type=int, default=200)   # CT notebook config
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--out", default="render.png")
    args = ap.parse_args()

    if args.volume:
        from diffus_tpu.cli import _load_volume

        raw = _load_volume(args.volume)
    elif args.modality.startswith("ct"):
        raw = ct_lung_phantom_3d((args.size,) * 3)
    elif args.modality == "transcranial":
        raw = transcranial_phantom_3d((args.size,) * 3)
    elif args.modality == "heart":
        # EMIDEC-layout cardiac phantom (the reference's heart_MRI config
        # ships only the dataset README)
        raw = heart_phantom_3d((args.size,) * 3)
    else:
        raw = t1_phantom_3d((args.size,) * 3)

    raw = jnp.asarray(raw)
    if args.modality == "ct":
        z_vol = schneider_webb_impedance(raw)          # Schneider + Webb fit
    elif args.modality == "ct-crude":
        z_vol = crude_ct_impedance(raw)                # closed-form model
    elif args.modality in ("transcranial", "heart"):
        z_vol = raw                                    # already impedance
    else:
        tx, ty = default_table_points()
        z_vol = tabular_impedance_volume(raw, tx, ty)

    half = raw.shape[0] / 2
    # start just inside the body: the crude CT model maps air (-1000 HU)
    # to exactly Z=0, and a ray born in a Z=0 region NaNs out (and is
    # zeroed, faithfully to the reference's nan_to_num semantics)
    src = jnp.array([half, 0.2 * raw.shape[1], half])
    dirs = fan_directions_2d([0.0, 1.0], np.radians(50.0), args.rays)
    cfg = RenderConfig(attenuation_coeff=1e-4)
    _, _, _, frame = render_frame(z_vol, src, dirs, args.samples, cfg)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(args.out, np.abs(np.asarray(frame)).T, cmap="gray")
    print(f"{args.modality}: frame {frame.shape}, "
          f"|echo| max {float(jnp.max(jnp.abs(frame))):.4f} -> {args.out}")


if __name__ == "__main__":
    main()
