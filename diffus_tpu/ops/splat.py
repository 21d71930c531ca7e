"""Differentiable image formation: scatter-add splatting and fan rasterization.

TPU-native rebuild of ``differentiable_splat`` (``src/renderer.py:694-737``)
and ``rotate_around_apex`` (``:655-692``).  The scatter-add + Gaussian
blur + normalize pipeline is kept (differentiable w.r.t. intensities, like
the reference), but the projection-axis choice is static: the reference
picks the two highest-variance coordinate axes at runtime
(``renderer.py:704-707``) which cannot live under jit — use
:func:`highest_variance_axes` on the host to precompute it once per scene.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.ops.filters import correlate1d


def highest_variance_axes(x, y, z) -> tuple:
    """Host-side helper replicating the reference's axis pick
    (``src/renderer.py:704-707``): the two coordinate axes with the
    largest variance, in descending order."""
    variances = [float(np.var(np.asarray(c, dtype=np.float64))) for c in (x, y, z)]
    a0, a1 = sorted(range(3), key=lambda i: -variances[i])[:2]
    return a0, a1


@partial(jax.jit, static_argnames=("height", "width", "sigma"))
def differentiable_splat(
    coord0: jax.Array,
    coord1: jax.Array,
    intensities: jax.Array,
    height: int = 256,
    width: int = 256,
    sigma: float = 2.0,
) -> jax.Array:
    """Splat scattered samples onto a 2D image (differentiable in intensities).

    Mirrors ``differentiable_splat`` (``src/renderer.py:709-737``):
      - pixel indices: round + clamp (coord0 -> columns in [0, W-1],
        coord1 -> rows in [0, H-1]; note the reference clamps coord0 by W
        and coord1 by H exactly like this)
      - scatter-add intensity and unit weight per sample.  DELIBERATE
        DIVERGENCE: torch's ``image[idx1, idx0] += v`` is last-write-wins
        on duplicate pixel indices (nondeterministic which sample lands;
        fan rays converge near the apex so duplicates are common), whereas
        ``.at[].add`` ACCUMULATES all contributions.  Accumulation is the
        deterministic, gradient-correct semantics; the parity oracle
        (np.add.at) encodes it intentionally.
      - blur both with a Gaussian kernel of size ``int(6*sigma) | 1``
        (zero-padded conv, torch ``F.conv2d`` semantics)
      - normalize: ``blurred_img / (blurred_weight + 1e-8)``
      - return the transpose (the reference returns ``output[0, 0].T``)

    Coordinates only receive gradients through intensities (rounding is
    non-differentiable) — same as the reference.
    """
    c0 = jnp.clip(jnp.round(coord0.astype(jnp.float32)).astype(jnp.int32), 0, width - 1)
    c1 = jnp.clip(jnp.round(coord1.astype(jnp.float32)).astype(jnp.int32), 0, height - 1)
    flat0 = c0.reshape(-1)
    flat1 = c1.reshape(-1)
    vals = intensities.astype(jnp.float32).reshape(-1)

    image = jnp.zeros((height, width), dtype=jnp.float32)
    weight = jnp.zeros((height, width), dtype=jnp.float32)
    image = image.at[flat1, flat0].add(vals)
    weight = weight.at[flat1, flat0].add(1.0)

    size = int(6 * sigma) | 1
    t = np.arange(size, dtype=np.float64) - size // 2
    k1 = np.exp(-0.5 * (t / sigma) ** 2)
    k1 = (k1 / k1.sum()).astype(np.float32)

    def blur(img):
        # separable zero-padded conv == conv2d with the outer-product kernel
        return correlate1d(correlate1d(img, k1, axis=0, mode="zero"),
                           k1, axis=1, mode="zero")

    blurred_img = blur(image)
    blurred_weight = blur(weight)
    output = blurred_img / (blurred_weight + 1e-8)
    return output.T


def splat_frame(
    coords: tuple,
    intensities: jax.Array,
    axes: tuple = (0, 2),
    image_shape: tuple = (256, 256),
    sigma: float = 2.0,
) -> jax.Array:
    """Splat a rendered frame's ``(x, y, z)`` coord triple onto an image.

    The shared composition used by ``render_bmode`` and the training
    forward: pick two coordinate axes (static), splat intensities.
    """
    return differentiable_splat(
        coords[axes[0]].astype(jnp.float32),
        coords[axes[1]].astype(jnp.float32),
        intensities,
        height=image_shape[0],
        width=image_shape[1],
        sigma=sigma,
    )


def rotate_around_apex(x, z, apex, median, lateral_offset: float = 128.0):
    """Rotate (x, z) points around the apex so the median direction aligns
    with +z.

    Parity with ``rotate_around_apex`` (``src/renderer.py:655-692``),
    including its hardcoded ``x - 128`` lateral shift (exposed here as
    ``lateral_offset`` with the reference default).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    z = jnp.asarray(z, dtype=jnp.float32)
    median_vec = jnp.asarray(median, dtype=jnp.float32)
    median_vec = median_vec / jnp.linalg.norm(median_vec)
    angle = jnp.arctan2(median_vec[0], median_vec[1])
    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)

    x_shifted = x - lateral_offset
    x_rot = cos_a * x_shifted - sin_a * z + apex[0]
    z_rot = sin_a * x_shifted + cos_a * z + apex[1]
    return x_rot, z_rot


def rasterize_fan_host(
    x_coords, z_coords, intensities, output_shape=(256, 256), parity_grid=False
):
    """Host-side scattered->grid interpolation (non-differentiable).

    Mirrors ``rasterize_fan`` (``src/renderer.py:626-653``): scipy
    ``griddata`` linear interpolation of the fan samples.  By default the
    target is a regular ``output_shape`` grid spanning the samples'
    bounding box — O(H*W) memory, usable at full frame size.

    ``parity_grid=True`` reproduces the reference's quirk verbatim: the
    grid is ``meshgrid`` over the scattered coordinates *themselves*
    (every x paired with every z — N^2 pixels for N samples, unusable
    beyond toy sizes; ``output_shape`` is ignored, as in the reference).
    The differentiable splat is the production path either way.
    """
    from scipy.interpolate import griddata

    x = np.asarray(x_coords).ravel()
    z = np.asarray(z_coords).ravel()
    v = np.asarray(intensities).ravel()
    if parity_grid:
        grid_x, grid_z = np.meshgrid(x, z)
    else:
        h, w = output_shape
        grid_x, grid_z = np.meshgrid(
            np.linspace(x.min(), x.max(), w),
            np.linspace(z.min(), z.max(), h),
        )
    return griddata(
        points=np.stack((x, z), axis=-1),
        values=v,
        xi=(grid_x, grid_z),
        method="linear",
        fill_value=0.0,
    )
