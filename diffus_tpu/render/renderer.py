"""The differentiable B-mode renderer: the framework's core forward pass.

TPU-native equivalent of ``UltrasoundRenderer.plot_beam_frame``
(reference ``src/renderer.py:201-275``) and its sub-stages
(``simulate_rays`` :35, ``trace_ray`` :89, ``compute_echo_traces`` :439).
Everything is a pure function of ``(volume, source, directions)`` plus a
static :class:`~diffus_tpu.types.RenderConfig`, so the whole pipeline
jits into one XLA program: coordinate generation -> gather -> reflection
coefficients -> associative-scan propagation -> attenuation ->
(optional) artifact stack.  vmap over poses gives multi-pose sweeps;
sharding over a device mesh gives multi-chip throughput
(see ``diffus_tpu.parallel``).

Stage mapping (reference file:line -> here):
  renderer.py:119-124  point generation        -> ops.sampling.ray_points
  renderer.py:741-819  nearest sampler          -> ops.sampling.sample_nearest
  renderer.py:27-33    reflection coefficients  -> ops.propagation.reflection_coeff
  renderer.py:237-245  start-skip + median row  -> _apply_start (torch-median kept)
  renderer.py:367-457  N+1 dense solves + cumsum/diff -> ops.propagation.echo_amplitudes (one scan)
  renderer.py:256-259  exp depth attenuation    -> ops.propagation.depth_attenuation
  renderer.py:264-273  artifact stack           -> ops.artifacts (jax.random keyed)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from diffus_tpu.types import RenderConfig, Volume
from diffus_tpu.ops.propagation import (
    reflection_coeff,
    echo_amplitudes,
    depth_attenuation,
)
from diffus_tpu.ops.sampling import ray_points, SAMPLERS

_DEFAULT_CONFIG = RenderConfig()

# On-chip gather-operand placement capacity (v5e, measured r4,
# probe_arg_r4/probe_cliff_r4): in-jit tables place in fast on-chip
# memory only up to ~128 MB.  render_sweep warns (or, for the explicit
# exact one-take f32 3D tile, host-builds) past this.  Module-level so
# tests can exercise the over-capacity paths on small volumes; serve.py
# keeps its own slightly more conservative staging threshold.
_PLACEMENT_WARN_BYTES = 125_000_000


def _resolve_sampler(interp: str, num_samples: int = 0, step: float = 1.0) -> str:
    """On TPU, plain nearest upgrades to the lane-aligned row-gather
    formulation (bit-identical values, ~3x faster; see
    ``ops.sampling.sample_nearest_rows``) and trilinear to the
    overlapped-(y,z)-tile gather (2 row gathers/sample,
    ``sample_trilinear_tile``).  ``trilinear_bf16`` is the explicit
    opt-in one-gather 3D-tile mode; ``trilinear_fused`` the tile sampler
    with a Pallas-fused select stage (``config.use_pallas`` maps
    trilinear here; measured SLOWER than the XLA fusion on v5e — kept
    for completeness).  The depth-amortized K=2 pair sampler
    (``sample_trilinear_tile_k2``, 25% fewer gather transactions) is a
    measured END-TO-END NEGATIVE in three formulations (1.6-2.0x slower
    through the full render, docs/benchmarking.md r4) and is therefore
    NOT auto-selected — reachable explicitly via
    ``interp='trilinear_tile_k2'`` in :func:`trace_rays`.  ``num_samples``
    and ``step`` stay in the signature for samplers whose eligibility
    depends on them.  Trace-time decision."""
    if interp == "trilinear_bf16":
        return "trilinear_tile3d_bf16"
    if interp == "trilinear_fused":
        return "trilinear_tile_fused"
    if jax.default_backend() == "tpu":
        if interp == "nearest":
            return "nearest_rows"
        if interp == "trilinear":
            return "trilinear_tile"
    return interp


def _route_tile_family(resolved: str, volume) -> str:
    """Honor pre-prepared tables in the trace-time sampler choice: a
    caller may hand the renderer a :class:`TileVolume`/:class:`Tile3dVolume`
    staged ahead of time (serving, sweeps), possibly of a different tile
    family than the auto-selected one.

    Raw volumes are NOT auto-upgraded to the exact f32 one-take 3D tile
    (``sample_trilinear_tile3d_f32``): despite 1 take/sample vs the
    (y,z) tile's 2, it measured SLOWER end-to-end at every sub-capacity
    size tried — 224^3 headline-structure sweep 1.064 vs 0.978 ms/frame,
    and worse at small pose batches (probe_tile3df32[b]_r4,
    docs/benchmarking.md r4) — the 2.04x f32 table costs more bandwidth
    than the second take saves.  The sampler stays reachable explicitly
    (prepared f32 table or direct :func:`trace_rays` interp string)."""
    # plain "trilinear" reaches here un-upgraded on non-TPU backends —
    # a prepared table must still route to its tile sampler there (the
    # serving/staging workflow is backend-agnostic)
    if resolved not in ("trilinear", "trilinear_tile", "trilinear_tile_k2",
                        "trilinear_tile_k2i"):
        return resolved
    from diffus_tpu.ops.sampling import TileVolume, Tile3dVolume

    if isinstance(volume, Tile3dVolume):
        return (
            "trilinear_tile3d_bf16"
            if volume.table.dtype == jnp.bfloat16
            else "trilinear_tile3d_f32"
        )
    if isinstance(volume, TileVolume):
        # a caller may hand us a table prepared with the per-sample
        # strides (7, 15) (the r3 workflow) — honor it rather than fail
        if resolved in ("trilinear", "trilinear_tile_k2",
                        "trilinear_tile_k2i") and (
            volume.sy, volume.sz
        ) != (6, 14):
            return "trilinear_tile"
        if resolved == "trilinear":
            return "trilinear_tile_k2"  # a (6, 14) table implies K=2 family
    return resolved


def _effective_interp(config: RenderConfig) -> str:
    """``use_pallas`` means "Pallas kernels where they win" — today that
    is the fused propagation+attenuation kernel only.  The Pallas
    tile-select stage measured 2.6x SLOWER than XLA's own gather+select
    fusion (docs/benchmarking.md r4), so ``use_pallas`` deliberately
    does NOT route sampling through it; the kernel stays reachable via
    the explicit ``trilinear_fused`` interp string."""
    return config.interp


def trace_rays(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    interp: str = "nearest",
    step: float = 1.0,
):
    """March rays through the volume and sample it.

    Equivalent of ``trace_ray`` (``src/renderer.py:89-180``) minus the
    embedded matplotlib.  Returns ``(idx, values)``: integer sample coords
    ``(n_rays, num_samples, 3)`` and sampled values
    ``(n_rays, num_samples)``.
    """
    points = ray_points(source, directions, num_samples, step)
    resolved = _route_tile_family(
        _resolve_sampler(interp, num_samples, step), volume
    )
    return SAMPLERS[resolved](volume, points)


def simulate_rays(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    interp: str = "nearest",
):
    """Trace + adjacent-pair reflection coefficients.

    Equivalent of ``simulate_rays`` (``src/renderer.py:35-71``).
    Returns ``(idx, R)`` with ``R: (n_rays, num_samples - 1)``.
    """
    idx, z = trace_rays(volume, source, directions, num_samples, interp)
    # always compute reflection in f32: in bf16 serving mode the
    # subtraction (z2 - z1) would otherwise cancel catastrophically
    z = z.astype(jnp.float32)
    r = reflection_coeff(z[:, :-1], z[:, 1:])
    return idx, r


def simulate_frame(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    interp: str = "nearest",
):
    """Deprecated per-direction API (``src/renderer.py:73-87`` — the
    reference itself deprecates it in favor of batched ``simulate_rays``).
    Kept for API familiarity; equivalent to ``simulate_rays(...)[1]``."""
    import warnings

    warnings.warn(
        "simulate_frame is deprecated; use simulate_rays (batched)",
        DeprecationWarning,
        stacklevel=2,
    )
    return simulate_rays(volume, source, directions, num_samples, interp)[1]


def mri_projection(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    interp: str = "nearest",
):
    """Raw sampled intensities along the fan (the reference's ``MRI=True``
    short-circuit, ``src/renderer.py:69-70``): returns
    ``(n_rays, num_samples - 1)`` of the volume values themselves."""
    _, z = trace_rays(volume, source, directions, num_samples, interp)
    return z[:, :-1]


def trace_multi_source(
    volume: jax.Array,
    sources: jax.Array,
    directions: jax.Array,
    num_samples: int,
    interp: str = "nearest",
):
    """Trace the same fan from multiple source points and stack profiles.

    The vmapped equivalent of the reference's multi-source Python loop
    ``UltrasoundRenderer.trace_rays`` (``src/renderer.py:182-199``).

    Args:
      sources: ``(P, 3)``.
    Returns:
      ``(idx, values)`` with a leading source axis:
      ``(P, n_rays, num_samples, 3)`` / ``(P, n_rays, num_samples)``.
    """
    return jax.vmap(
        lambda s: trace_rays(volume, s, directions, num_samples, interp)
    )(sources)


def _torch_median(x: jax.Array) -> jax.Array:
    """torch.median semantics: lower of the two middle elements for even
    counts (jnp.median would average them — parity requires torch's).

    Reference call site: ``R[:, 0].median()`` at ``src/renderer.py:243``.
    """
    n = x.shape[0]
    return jnp.sort(x)[(n - 1) // 2]


def _apply_start(r: jax.Array, start: int) -> jax.Array:
    """Start-index skip with median patch of the new first column
    (``src/renderer.py:241-245``)."""
    if start <= 0:
        return r
    r = r[:, start:]
    med = _torch_median(r[:, 0])
    return r.at[:, 0].set(med)


@partial(jax.jit, static_argnames=("num_samples", "config", "step"))
def render_frame(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = _DEFAULT_CONFIG,
    key: Optional[jax.Array] = None,
    step: float = 1.0,
):
    """Render one fan frame of echo intensities.

    The jitted equivalent of ``plot_beam_frame``
    (``src/renderer.py:201-275``), returning the same quadruple:

    Returns:
      ``(x, y, z, intensities)`` — each ``(n_rays, num_samples - start)``;
      ``x, y, z`` are the integer sample coordinates after the start skip
      and ``intensities`` the attenuated (optionally artifacted) echo map.

    Args:
      volume: ``(D, H, W)`` acoustic impedance volume, or a
        :class:`~diffus_tpu.types.Volume` (its ``data`` is rendered; use
        :func:`frame_time_delays` with its ``spacing`` for mm-true echo
        timing).
      source: ``(3,)`` apex position in voxel coordinates.
      directions: ``(n_rays, 3)`` unit ray directions.
      num_samples: static depth-sample count.
      config: static render configuration.
      key: PRNG key, required when ``config.artifacts`` is set (the
        reference used unseeded np.random; here noise is explicit and
        reproducible).
      step: voxel units per depth sample (``BeamGeometry.step``;
        reference uses 1.0).
    """
    if isinstance(volume, Volume):
        volume = volume.data
    from diffus_tpu.ops.sampling import TileVolume, Tile3dVolume

    if len(volume.shape) != 3:
        raise ValueError(
            f"render_frame needs a 3D (D, H, W) volume, got shape "
            f"{tuple(volume.shape)} — squeeze singleton axes first"
        )

    if config.dtype == "bfloat16" and not isinstance(
        volume, (TileVolume, Tile3dVolume)
    ):
        # serving mode: bf16 volume halves the gather bandwidth (the
        # bottleneck); the scan stays f32.  ~4e-3 relative error on
        # reflection coefficients — NOT the parity mode.  (Prepared tile
        # tables carry their own dtype and are passed through.)
        volume = volume.astype(jnp.bfloat16)
    start = config.start_index(num_samples)
    if start >= num_samples - 1:
        raise ValueError(
            f"start={config.start!r} skips all {num_samples} samples "
            f"(resolved start index {start})"
        )
    idx, z = trace_rays(
        volume, source, directions, num_samples, _effective_interp(config), step
    )
    z = z.astype(jnp.float32)
    r = reflection_coeff(z[:, :-1], z[:, 1:])

    if config.reflection_mode == "physical":
        # impedance-weighted right-to-left reflection (forward_physics.md:66);
        # computed from the pre-slice r/z, then sliced like r with its own
        # torch-median first-column patch so start-skip semantics match
        from diffus_tpu.ops.propagation import impedance_weighted_rho

        rho = _apply_start(
            impedance_weighted_rho(r, z[:, :-1], z[:, 1:]), start
        )
        r = _apply_start(r, start)
        echo = echo_amplitudes(r, rho=rho)
        out = depth_attenuation(echo, config.attenuation_coeff)
    elif config.use_pallas:
        from diffus_tpu.kernels.propagation_pallas import echo_pallas

        r = _apply_start(r, start)
        out = echo_pallas(r, config.reflection_mode, config.attenuation_coeff)
    else:
        r = _apply_start(r, start)
        echo = echo_amplitudes(r, mode=config.reflection_mode)
        out = depth_attenuation(echo, config.attenuation_coeff)

    if config.pulse_length > 0:
        from diffus_tpu.ops.filters import gaussian_pulse, convolve_pulse

        pulse = gaussian_pulse(config.pulse_length, config.pulse_sigma)
        out = convolve_pulse(out, pulse)
        # torch's even-length conv1d padding quirk can grow the output by
        # one sample; crop to the frame width for a consistent shape
        out = out[..., : num_samples - start]

    if config.envelope:
        from diffus_tpu.ops.bmode import rf_to_bmode

        out = rf_to_bmode(out)

    if config.artifacts:
        from diffus_tpu.ops.artifacts import (
            add_speckle_arcs,
            depth_dependent_lateral_blur,
            sharpen,
        )

        if key is None:
            raise ValueError("config.artifacts=True requires a PRNG key")
        out = add_speckle_arcs(
            out, key, std_radial=config.std_radial, std_local=config.std_local
        )
        out = depth_dependent_lateral_blur(out, max_sigma=config.max_sigma)
        out = sharpen(out, alpha=config.sharpen_alpha)

    x = idx[:, start:, 0]
    y = idx[:, start:, 1]
    z = idx[:, start:, 2]
    return x, y, z, out


def frame_time_delays(
    spacing,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = _DEFAULT_CONFIG,
    step: float = 1.0,
    c: float = 1.54e3,
):
    """Per-ray two-way echo time delays for a rendered frame, mm-true.

    The reference returns ``delays_us = 2 * spacing * arange(N+1) / c``
    from ``compute_echo_traces`` (``src/renderer.py:455-457``) with a
    scalar ``spacing`` — i.e. it assumes isotropic voxels and unit steps.
    Here the physical length of one depth step is direction-dependent for
    anisotropic voxels: ``step * ||direction * spacing||`` mm, so each ray
    gets its own delay axis.  Delays are indexed relative to the start
    window, like the reference's.

    Args:
      spacing: ``(3,)`` voxel spacing in mm (``Volume.spacing``), or a
        scalar for isotropic volumes.
      directions: ``(n_rays, 3)`` unit ray directions (voxel space).
    Returns:
      ``(n_rays, num_samples - start)`` delays in the reference's units
      (microseconds when spacing is in mm and c in m/s, matching
      ``src/renderer.py:455``).
    """
    spacing = jnp.broadcast_to(jnp.asarray(spacing, jnp.float32), (3,))
    mm_per_step = step * jnp.linalg.norm(directions * spacing[None, :], axis=-1)
    start = config.start_index(num_samples)
    idx = jnp.arange(num_samples - start, dtype=jnp.float32)
    return 2.0 * mm_per_step[:, None] * idx[None, :] / c


@partial(jax.jit, static_argnames=("num_samples", "config", "image_shape", "sigma", "axes"))
def render_bmode(
    volume: jax.Array,
    source: jax.Array,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = _DEFAULT_CONFIG,
    key: Optional[jax.Array] = None,
    image_shape: tuple = (256, 256),
    sigma: float = 2.0,
    axes: tuple = (0, 2),
):
    """Full B-mode path: fan frame + differentiable splat to a 2D image.

    The caller-side composition used throughout the reference notebooks
    (``plot_beam_frame`` -> ``differentiable_splat``,
    ``src/renderer.py:694-737``).  ``axes`` selects which two coordinate
    axes span the image — static, unlike the reference's runtime
    variance-based pick (``renderer.py:704-707``), which cannot live
    under jit; use :func:`diffus_tpu.ops.splat.highest_variance_axes` to
    precompute it.
    """
    from diffus_tpu.ops.splat import splat_frame

    x, y, z, intensities = render_frame(
        volume, source, directions, num_samples, config, key
    )
    return splat_frame((x, y, z), intensities, axes, image_shape, sigma)


def _sweep_chunk(pose_batch: int, config: RenderConfig) -> int:
    """Default pose-chunk size for :func:`render_sweep`.

    Measured on v5e (docs/benchmarking.md): trilinear gathers make XLA
    materialize large per-pose intermediates, and beyond ~8 poses per
    compiled vmap the temp working set collapses throughput 2-4x.  With
    tile tables prepared per dispatch (r3) the small-chunk penalty of r2
    (per-chunk table rebuild) is gone and chunk 4 measures ~5% faster
    than 8 (1.01 vs 1.06-1.11 ms/frame at the benchmark config), so the
    default is the largest divisor of ``pose_batch`` that is <= 4 for
    trilinear-mode sweeps; nearest is unaffected (no chunking).
    """
    if config.interp.startswith("trilinear") and pose_batch > 4:
        for c in (4, 3, 2):
            if pose_batch % c == 0:
                return c
        return 1
    return pose_batch


def render_sweep(
    volume: jax.Array,
    sources: jax.Array,
    directions: jax.Array,
    num_samples: int,
    config: RenderConfig = _DEFAULT_CONFIG,
    keys: Optional[jax.Array] = None,
    step: float = 1.0,
    chunk: Optional[int] = None,
):
    """Batched multi-pose sweep: vmap of :func:`render_frame` over poses.

    The TPU-native version of the reference's per-pose Python loop
    (``[DEPR] fix_propagation_full_transmission.ipynb`` cells 14-17, the
    animation workload).  Large trilinear sweeps are processed in pose
    chunks (sequential ``lax.map`` of vmapped sub-batches) to bound XLA's
    gather-intermediate working set — see :func:`_sweep_chunk`; pass
    ``chunk`` to override (``chunk=P`` disables chunking).

    Args:
      sources: ``(P, 3)``; directions: ``(P, n_rays, 3)`` or shared
        ``(n_rays, 3)``; keys: optional ``(P, 2)`` PRNG keys.
    Returns:
      ``(x, y, z, frames)`` with a leading pose axis.
    """
    pose_batch = sources.shape[0]
    if directions.ndim == 2:
        directions = jnp.broadcast_to(
            directions[None], (pose_batch,) + directions.shape
        )
    # Hoist the tile-table build out of the chunk loop: built inside the
    # lax.map body it is re-materialized per chunk (~0.32 ms/frame at the
    # benchmark config, measured r3); prepared here it runs once per
    # dispatch.  No-op for non-tile samplers and already-prepared input.
    resolved = _resolve_sampler(_effective_interp(config), num_samples, step)
    if resolved in (
        "trilinear_tile", "trilinear_tile_k2", "trilinear_tile_k2i",
        "trilinear_tile_fused", "trilinear_tile3d_bf16",
        "trilinear_tile3d_f32",
    ):
        from diffus_tpu.ops.sampling import (
            TileVolume,
            Tile3dVolume,
            prepare_tile_volume,
            prepare_tile3d_volume,
        )

        if isinstance(volume, Volume):
            volume = volume.data
        if config.dtype == "bfloat16" and not isinstance(
            volume, (TileVolume, Tile3dVolume)
        ):
            # mirror render_frame's serving-mode cast BEFORE the table
            # build: without it a sweep silently prepared an f32 table
            # while the single-frame path served bf16 (ADVICE r3)
            volume = volume.astype(jnp.bfloat16)
        if not isinstance(volume, (TileVolume, Tile3dVolume)):
            # r4 placement model (docs/benchmarking.md "Round 4"): in-jit
            # tables place on-chip only up to ~128 MB; past that, the
            # per-dispatch build is pure overhead (15 vs 3.1 ms/frame at
            # 512^3).  Warn at trace time — the fixes are host-side.
            # exact bytes of the table that will actually be BUILT: the
            # bf16 3D tile stores bf16 corners (2 B/elem) whatever the
            # input dtype — sizing it by the f32 volume falsely warned on
            # the headline bf16 sweep (caught in the r4 bench output) —
            # and the K=2 (6, 14) strides cost ~1.6x, not the per-sample
            # table's 1.30x (ADVICE r4)
            from diffus_tpu.ops.sampling import (
                tile_table_bytes, tile3d_table_bytes,
            )

            if resolved == "trilinear_tile3d_bf16":
                table_bytes = tile3d_table_bytes(volume.shape)
            elif resolved == "trilinear_tile3d_f32":
                table_bytes = tile3d_table_bytes(
                    volume.shape, itemsize=volume.dtype.itemsize
                )
            else:
                strides = (
                    (6, 14)
                    if resolved in ("trilinear_tile_k2", "trilinear_tile_k2i")
                    else (7, 15)
                )
                table_bytes = tile_table_bytes(
                    volume.shape, *strides, itemsize=volume.dtype.itemsize
                )
            if (table_bytes > _PLACEMENT_WARN_BYTES
                    and resolved == "trilinear_tile3d_f32"):
                # explicit exact one-take mode above the placement
                # capacity: the in-XLA f32 build OOMs at 512^3 (~19 GB
                # transpose intermediate) — build on the host instead
                # (the adopted above-capacity staging, probe_host3d_r5);
                # no warning needed, this IS the fix the warning names.
                from diffus_tpu.ops.sampling import prepare_tile3d_volume_host

                volume = prepare_tile3d_volume_host(volume, dtype=volume.dtype)
            elif table_bytes > _PLACEMENT_WARN_BYTES:
                import warnings

                warnings.warn(
                    f"trilinear sweep over a {volume.shape} volume builds a "
                    f"~{table_bytes / 1e6:.0f} MB gather table per dispatch — "
                    "beyond the ~128 MB on-chip placement capacity, where the "
                    "in-jit build is pure overhead.  Crop the volume to its "
                    "content first (diffus_tpu.scene.crop_to_content; 6-9x "
                    "measured at 512^3) or stage a host-built one-take f32 "
                    "table (diffus_tpu.ops.sampling.prepare_tile3d_volume_host"
                    " — exact, 1.82 vs 3.02 ms/frame at 512^3, "
                    "probe_host3d_r5) instead of the raw array.",
                    stacklevel=3,
                )
        resolved = _route_tile_family(resolved, volume)
        if resolved == "trilinear_tile3d_bf16":
            volume = prepare_tile3d_volume(volume)
        elif resolved == "trilinear_tile3d_f32":
            if not isinstance(volume, Tile3dVolume):
                volume = prepare_tile3d_volume(volume, dtype=volume.dtype)
        elif resolved in ("trilinear_tile_k2", "trilinear_tile_k2i"):
            volume = prepare_tile_volume(volume, 6, 14)
        else:
            volume = prepare_tile_volume(volume)
    if chunk is None:
        chunk = _sweep_chunk(pose_batch, config)
    chunk = max(1, min(chunk, pose_batch))
    if pose_batch % chunk:
        # A non-dividing override must NOT silently fall back to one
        # unchunked vmap: for trilinear sweeps >8 poses that re-enters
        # the 2.6 GB gather-temp working set the chunking exists to
        # avoid.  Use the nearest dividing chunk instead.
        chunk = _sweep_chunk(pose_batch, config)

    if keys is None:
        inner = jax.vmap(
            lambda s, d: render_frame(volume, s, d, num_samples, config, step=step)
        )
        if chunk == pose_batch:
            return inner(sources, directions)
        out = jax.lax.map(
            lambda args: inner(*args),
            (
                sources.reshape(pose_batch // chunk, chunk, 3),
                directions.reshape((pose_batch // chunk, chunk) + directions.shape[1:]),
            ),
        )
        return tuple(o.reshape((pose_batch,) + o.shape[2:]) for o in out)

    inner_k = jax.vmap(
        lambda s, d, k: render_frame(volume, s, d, num_samples, config, k, step)
    )
    if chunk == pose_batch:
        return inner_k(sources, directions, keys)
    out = jax.lax.map(
        lambda args: inner_k(*args),
        (
            sources.reshape(pose_batch // chunk, chunk, 3),
            directions.reshape((pose_batch // chunk, chunk) + directions.shape[1:]),
            keys.reshape((pose_batch // chunk, chunk) + keys.shape[1:]),
        ),
    )
    return tuple(o.reshape((pose_batch,) + o.shape[2:]) for o in out)
