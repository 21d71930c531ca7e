"""The animation workload: multi-pose sweep -> GIF.

Reproduces the reference's ``img/animation.gif`` loop
(``[DEPR] fix_propagation_full_transmission.ipynb`` cells 14-17: render
one frame per source depth with artifacts on) as a single vmapped sweep.

    python examples/sweep_animation.py --out sweep.gif
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from diffus_tpu.types import RenderConfig
from diffus_tpu.render import render_sweep
from diffus_tpu.geometry import fan_directions_2d
from diffus_tpu.impedance import default_table_points, tabular_impedance_volume
from diffus_tpu.phantoms import t1_phantom_3d
from diffus_tpu.viz import render_video_frame, save_gif


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="sweep.gif")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--poses", type=int, default=33)
    ap.add_argument("--rays", type=int, default=128)
    ap.add_argument("--samples", type=int, default=128)
    args = ap.parse_args()

    t1 = jnp.asarray(t1_phantom_3d((args.size,) * 3))
    tx, ty = default_table_points()
    z_vol = tabular_impedance_volume(t1, tx, ty)

    # the reference sweeps the source depth over a window (cells 14-17)
    half = args.size / 2
    sources = jnp.asarray(
        np.stack(
            [
                np.array([half + 20, d, half - 10], np.float32)
                for d in np.linspace(2, 2 + args.poses - 1, args.poses)
            ]
        )
    )
    directions = fan_directions_2d([0.0, 1.0], np.radians(45.0), args.rays)
    cfg = RenderConfig(attenuation_coeff=1e-4, artifacts=True)
    keys = jax.random.split(jax.random.PRNGKey(0), args.poses)

    _, _, _, frames = render_sweep(z_vol, sources, directions, args.samples, cfg, keys)
    save_gif(render_video_frame([np.asarray(f).T for f in frames]), args.out, fps=10)
    print(f"wrote {args.out}: {args.poses} frames")


if __name__ == "__main__":
    main()
