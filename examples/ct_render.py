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
import jax
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


# The CT lung calibration opening angle carried across the reference's CT
# notebooks (``[DEMO] CT Vivek data.ipynb`` cell 6).
CT_OPENING_ANGLE = 0.9157579425453843

# The three canonical stored views of ``[DEMO] CT Render Lung.ipynb``
# (cells 14-28), as configs the way ``CASE_PRESETS`` stores ReMIND poses.
# ``generate_cone_directions`` builds the fan in the (x, y) plane from the
# first two direction components (``src/cone.py:242-258``); the notebook
# then permutes columns (``directions[:, [2, 1, 0]]`` etc.) and flips
# signs — ``perm``/``flip`` record the COMPOSED column permutation and
# sign flips.  ``source`` is in the private ``ctLung.nii.gz`` volume's
# voxel coordinates (not shipped); rendering a phantom keeps the view's
# beam geometry and uses the standard phantom source instead.
CT_VIEW_PRESETS = {
    # cells 16-17: direction [-1, 0.4] (3rd comp unused by the reference
    # fan gen), 1.5x opening, 100 samples, start=10, no artifacts
    "front": dict(source=(490.0, 180.0, 120.0), direction=(-1.0, 0.4),
                  opening_scale=1.5, perm=(0, 1, 2), flip=(1, 1, 1),
                  n_rays=200, num_samples=100, start=10, artifacts=False),
    # cells 20-21: fan permuted [2, 1, 0] with the y column negated,
    # 80 samples, start=5, artifacts on
    "side": dict(source=(136.0, 8.0, 19.0), direction=(0.0, -1.0),
                 opening_scale=1.0, perm=(2, 1, 0), flip=(1, -1, 1),
                 n_rays=200, num_samples=80, start=5, artifacts=True),
    # cells 25-28: permutation chain [2,1,0] -> [1,2,0] -> [0,2,1]
    # composes to [1, 2, 0]; 1.2x opening, start=20, artifacts on
    "third": dict(source=(20.0, 160.0, 120.0), direction=(0.0, -1.0),
                  opening_scale=1.2, perm=(1, 2, 0), flip=(1, 1, 1),
                  n_rays=200, num_samples=100, start=20, artifacts=True),
}


def view_directions(view: str, n_rays: int | None = None) -> jnp.ndarray:
    """Fan directions for a stored CT view (permutation + flips applied)."""
    p = CT_VIEW_PRESETS[view]
    fan = fan_directions_2d(
        p["direction"], p["opening_scale"] * CT_OPENING_ANGLE,
        n_rays or p["n_rays"],
    )
    fan = fan[:, list(p["perm"])] * jnp.asarray(p["flip"], fan.dtype)
    return fan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", default="ct",
                    choices=["ct", "ct-crude", "transcranial", "mri", "heart"])
    ap.add_argument("--view", default=None, choices=sorted(CT_VIEW_PRESETS),
                    help="stored CT lung view preset (overrides rays/samples)")
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
    key = None
    if args.view:
        p = CT_VIEW_PRESETS[args.view]
        dirs = view_directions(args.view)
        samples = p["num_samples"]
        cfg = RenderConfig(
            attenuation_coeff=1e-4, start=p["start"], artifacts=p["artifacts"]
        )
        if args.volume:
            src = jnp.asarray(p["source"])  # notebook voxel coords
        if p["artifacts"]:
            key = jax.random.PRNGKey(0)
    else:
        dirs = fan_directions_2d([0.0, 1.0], np.radians(50.0), args.rays)
        samples = args.samples
        cfg = RenderConfig(attenuation_coeff=1e-4)
    _, _, _, frame = render_frame(z_vol, src, dirs, samples, cfg, key)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(args.out, np.abs(np.asarray(frame)).T, cmap="gray")
    print(f"{args.modality}: frame {frame.shape}, "
          f"|echo| max {float(jnp.max(jnp.abs(frame))):.4f} -> {args.out}")


if __name__ == "__main__":
    main()
