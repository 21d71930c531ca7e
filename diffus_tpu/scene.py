"""Scene setup: the per-case calibration workflow as one API.

Packages the multi-step notebook workflow the reference repeats for every
ReMIND case (``[DEMO] REUBEN DATA {46,50,55,63}.ipynb``, SURVEY section
3.5): hand-fit fan edge lines on a US slice -> apex / opening angle /
bisector (``cone.py:98-126``) -> transform into MRI voxel space
(``cone.py:187-209``) -> fan directions (``cone.py:242-258``) -> a
render-ready scene (source, directions, geometry, masks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffus_tpu.types import BeamGeometry, RenderConfig, Volume
from diffus_tpu.geometry.calibration import (
    ConeCalibration,
    apex_and_direction_from_edges,
    cone_us_to_mri,
    cone_mask,
    cone_segment_mask,
    us_to_mri_beam_scale,
)
from diffus_tpu.geometry.fan import fan_directions_2d


@dataclasses.dataclass
class Scene:
    """A render-ready scene: everything ``render_frame`` needs plus the
    calibration byproducts (cone masks for loss masking)."""

    source: jax.Array          # (3,) apex in volume voxel coordinates
    directions: jax.Array      # (n_rays, 3)
    geometry: BeamGeometry
    calibration: ConeCalibration
    us_mask: jax.Array | None = None   # fan mask on the US slice
    d1: float = 0.0
    d2: float = 0.0

    def render(
        self,
        volume,
        config: RenderConfig = RenderConfig(),
        key=None,
        return_delays: bool = False,
    ):
        """Render the scene's frame.

        ``volume`` may be a raw ``(D, H, W)`` array or a
        :class:`~diffus_tpu.types.Volume`; with ``return_delays=True`` a
        fifth element is appended: per-ray mm-true two-way echo delays
        (reference ``compute_echo_traces``'s ``delays_us``,
        ``src/renderer.py:455-457``), computed from ``Volume.spacing``
        (unit spacing for raw arrays) and the scene's ``step``.
        """
        from diffus_tpu.render.renderer import render_frame, frame_time_delays

        out = render_frame(
            volume, self.source, self.directions,
            self.geometry.num_samples, config, key,
            step=self.geometry.step,
        )
        if not return_delays:
            return out
        spacing = volume.spacing if isinstance(volume, Volume) else 1.0
        delays = frame_time_delays(
            spacing, self.directions, self.geometry.num_samples, config,
            step=self.geometry.step,
        )
        return out + (delays,)


def build_scene_from_edges(
    m_left: float,
    b_left: float,
    m_right: float,
    b_right: float,
    us_affine,
    t1_affine,
    slice_idx: int,
    n_rays: int = 256,
    d1: float = 0.0,
    d2: float = 256.0,
    us_slice_shape: tuple | None = None,
    fan_plane: str = "xy",
    parity_step: bool = False,
) -> Scene:
    """Calibrate a transducer scene from two fan edge lines.

    Mirrors the notebook sequence: apex/angle/bisector from the lines,
    apex lifted to 3D with the US slice index, transformed into MRI voxel
    space, fan generated around the transformed bisector; ``num_samples``
    is the depth window length ``d2`` like the notebooks'
    ``UltrasoundRenderer(num_samples=d2)`` and ``start = d1/d2``.

    ``parity_step=True`` forces ``BeamGeometry.step = 1.0`` — the
    reference implicitly marches one MRI voxel per US-pixel depth sample
    regardless of the affines (``src/renderer.py:119-124``), so
    reference-exact calibrated frames need this escape hatch; the
    default derives the physically-correct step from the affine pair
    (``us_to_mri_beam_scale``), which diverges from the reference for
    any non-identity affines (documented divergence, r2).
    """
    cal = apex_and_direction_from_edges(m_left, b_left, m_right, b_right)
    apex_us = jnp.asarray(
        [cal.apex[0], cal.apex[1], float(slice_idx)], dtype=jnp.float32
    )
    apex_mri, dir_mri = cone_us_to_mri(
        apex_us, jnp.asarray(cal.direction, jnp.float32), us_affine, t1_affine
    )
    directions = fan_directions_2d(dir_mri, cal.opening_angle, n_rays, plane=fan_plane)
    # one depth step spans one US pixel: convert that length to MRI voxels
    # so the d1..d2 US-pixel window marches the right physical distance
    if parity_step:
        step = 1.0
    else:
        step = float(us_to_mri_beam_scale(cal.direction, us_affine, t1_affine))

    us_mask = None
    if us_slice_shape is not None:
        mask = cone_mask(us_slice_shape, cal.apex, cal.direction, cal.opening_angle)
        us_mask = cone_segment_mask(mask, cal.apex, cal.direction, d1, d2)

    geometry = BeamGeometry(
        n_rays=n_rays,
        num_samples=max(int(d2), 2),
        opening_angle=float(cal.opening_angle),
        step=step,
    )
    return Scene(
        source=apex_mri,
        directions=directions,
        geometry=geometry,
        calibration=cal,
        us_mask=us_mask,
        d1=float(d1),
        d2=float(d2),
    )


def crop_to_content(volume, threshold: float = None, mask=None, margin: int = 8,
                    multiple: int = 8):
    """Crop a volume to the bounding box of its content (+margin) and
    return the crop with the coordinate offset.

    Clinical volumes carry large air margins (ReMIND-style 256^3 brain
    scans are mostly background), and gather cost on TPU depends on the
    table the render builds from the volume fitting in fast on-chip
    memory (~128 MB, docs/benchmarking.md "Round 4"): cropping a 512^3
    scan to its ~300^3 content brings the trilinear tile table from
    778 MB (HBM gather rate, ~10 ns/take) back under the placement limit
    (~2.3 ns/take).  Host-side preprocessing: shapes are data-dependent,
    so this runs in numpy BEFORE jit; the cropped shape is then static.

    Args:
      volume: ``(D, H, W)`` array or :class:`~diffus_tpu.types.Volume`.
      threshold: content = ``data > threshold`` (default: ``data >
        data.min()``, i.e. anything above the background floor).
      mask: optional explicit boolean content mask (overrides threshold),
        e.g. ``impedance.preproc.create_brain_mask``'s output.
      margin: voxels of padding kept around the content box (rays need
        room to interpolate at the boundary).
      multiple: round each cropped dim up to this multiple (TPU-friendly
        shapes; also keeps jit cache reuse across similar crops).

    Returns:
      ``(cropped, offset)`` — the cropped volume (same type as the
      input; a :class:`Volume` gets its affine translated so
      world coordinates are preserved) and the ``(3,)`` integer voxel
      offset of the crop origin.  Render with
      ``render_frame(cropped, source - offset, directions, ...)``;
      add ``offset`` back to any returned integer sample coordinates.
      (One parity caveat: nearest mode rounds half-to-even, which picks
      a DIFFERENT voxel across an odd offset for coordinates landing
      exactly on the .5 lattice — a measure-zero set; trilinear values
      are offset-invariant everywhere.)
    """
    import numpy as np

    data = np.asarray(volume.data if isinstance(volume, Volume) else volume)
    if mask is None:
        thr = float(data.min()) if threshold is None else float(threshold)
        mask = data > thr
    else:
        mask = np.asarray(mask, bool)
    if not mask.any():
        raise ValueError("crop_to_content: the content mask is empty")
    lo = []
    hi = []
    for axis in range(3):
        proj = mask.any(axis=tuple(a for a in range(3) if a != axis))
        idx = np.nonzero(proj)[0]
        a = max(0, int(idx[0]) - margin)
        b = min(data.shape[axis], int(idx[-1]) + 1 + margin)
        size = b - a
        if multiple > 1:
            want = -(-size // multiple) * multiple
            grow = min(want - size, data.shape[axis] - size)
            a = max(0, a - grow // 2)
            b = min(data.shape[axis], a + size + grow)
            a = max(0, b - (size + grow))
        lo.append(a)
        hi.append(b)
    cropped = data[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    offset = np.asarray(lo, np.int32)
    if isinstance(volume, Volume):
        affine = np.asarray(volume.affine).copy()
        # voxel v in the crop is voxel v+offset in the original:
        # world = A @ (v + offset) => new translation absorbs A[:3,:3] @ offset
        affine[:3, 3] = affine[:3, 3] + affine[:3, :3] @ offset.astype(affine.dtype)
        return (
            Volume(
                data=jnp.asarray(cropped),
                affine=jnp.asarray(affine),
                spacing=volume.spacing,
            ),
            offset,
        )
    return jnp.asarray(cropped), offset
