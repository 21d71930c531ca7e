"""Volume sampling along rays: nearest (parity) and trilinear (differentiable).

Replaces the reference's ``custom_nearest_sampler``
(``src/renderer.py:741-819``: round, clamp per-axis, fancy-index — with
matplotlib plotting inside the hot path, which we do not port) with pure
jittable gathers.  ``nearest`` reproduces the reference bit-for-bit
semantics (round-half-to-even like torch, clamp to ``[0, dim-1]``);
``trilinear`` makes the sample differentiable w.r.t. the query points so
pose gradients survive (the reference's rounding kills them,
``src/renderer.py:754-756`` — the known limitation motivating BASELINE's
trilinear requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ray_points(
    source: jax.Array, directions: jax.Array, num_samples: int, step: float = 1.0
) -> jax.Array:
    """Sample points along rays: ``points = source + steps * directions``.

    Mirrors ``trace_ray``'s point generation (``src/renderer.py:119-124``);
    steps are ``0..num_samples-1`` in voxel units.

    Args:
      source: ``(3,)`` ray origin (voxel coordinates).
      directions: ``(n_rays, 3)`` unit direction vectors.
    Returns:
      ``(n_rays, num_samples, 3)`` float points.
    """
    steps = jnp.arange(num_samples, dtype=jnp.float32) * step
    return source[None, None, :] + steps[None, :, None] * directions[:, None, :]


def _require_raw(volume, who: str):
    """Clear error when a prepared tile table reaches a non-tile sampler
    (e.g. a :class:`TileVolume` passed with ``interp='nearest'``)."""
    if isinstance(volume, (TileVolume, Tile3dVolume)):
        raise TypeError(
            f"{who} needs a raw (D, H, W) volume, got a prepared "
            f"{type(volume).__name__}; prepared tables only work with the "
            "tile samplers (interp='trilinear' on TPU / 'trilinear_bf16')"
        )
    return volume


def sample_nearest(volume: jax.Array, points: jax.Array):
    """Nearest-neighbor gather at real-valued points (parity mode).

    Round half-to-even (numpy/torch convention) then clamp each coordinate
    component ``i`` to ``[0, volume.shape[i] - 1]`` — exactly the
    reference sampler (``src/renderer.py:754-759``).

    Args:
      volume: ``(D, H, W)``.
      points: ``(..., 3)``.
    Returns:
      ``(idx, values)``: integer coords ``(..., 3)`` (int32) and sampled
      values ``(...,)``.
    """
    _require_raw(volume, "sample_nearest")
    dims = jnp.asarray(volume.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims - 1)
    values = volume[idx[..., 0], idx[..., 1], idx[..., 2]]
    return idx, values


def _flat_row_lookup(table2d: jax.Array, flat: jax.Array) -> jax.Array:
    """Exact f32 lookup of flat indices via 128-wide row gather + one-hot
    lane select (see :func:`sample_nearest_rows` for why this beats the
    per-element gather on TPU)."""
    row = flat >> 7
    lane = flat & 127
    rows = jnp.take(table2d, row, axis=0)
    onehot = (lane[..., None] == jnp.arange(128, dtype=jnp.int32)).astype(
        table2d.dtype
    )
    return jnp.sum(rows * onehot, axis=-1)


def _row_table(volume: jax.Array) -> jax.Array:
    total = volume.size
    table = volume.reshape(-1)
    pad = (-total) % 128
    if pad:
        table = jnp.concatenate([table, jnp.zeros((pad,), volume.dtype)])
    return table.reshape(-1, 128)


def sample_trilinear(volume: jax.Array, points: jax.Array, gather: str = "direct"):
    """Trilinearly interpolated gather, differentiable w.r.t. ``points``.

    Coordinates are clamped to the valid cube before interpolation
    (border behavior matches the nearest sampler's clamp).  At integer
    points this equals the nearest sample, so parity tests can pin both.

    ``gather='rows'`` routes the 8 corner loads through the lane-aligned
    row-gather primitive (TPU fast path, identical values).

    Returns:
      ``(idx, values)`` where ``idx`` are the *rounded* integer coords
      (same convention as :func:`sample_nearest`, used downstream for
      splatting) and ``values`` the interpolated samples.
    """
    _require_raw(volume, "sample_trilinear")
    dims = jnp.asarray(volume.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(volume.shape, jnp.int32) - 1)

    if gather == "rows":
        d, h, w = volume.shape
        table2d = _row_table(volume)

        def corner(ix, iy, iz):
            return _flat_row_lookup(table2d, (ix * h + iy) * w + iz)

    else:

        def corner(ix, iy, iz):
            return volume[ix, iy, iz]

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]

    c000 = corner(x0, y0, z0)
    c001 = corner(x0, y0, z1)
    c010 = corner(x0, y1, z0)
    c011 = corner(x0, y1, z1)
    c100 = corner(x1, y0, z0)
    c101 = corner(x1, y0, z1)
    c110 = corner(x1, y1, z0)
    c111 = corner(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    values = c0 * (1 - fx) + c1 * fx

    dims_i = jnp.asarray(volume.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


def sample_nearest_rows(volume: jax.Array, points: jax.Array):
    """Nearest-neighbor sampling via lane-aligned row gather (TPU fast path).

    XLA's generic per-element gather runs at ~8 cycles/element on TPU —
    the render bottleneck.  This formulation replaces the 1-element
    gathers with gathers of 128-element contiguous rows (the lane tile):

      flat = (x*H + y)*W + z ;  row = flat // 128 ;  lane = flat % 128
      rows = take(volume_as_(M,128), row)        # coalesced vector loads
      value = sum(rows * onehot(lane), axis=-1)  # VPU lane select

    128x read amplification, but the reads are sequential 512B bursts —
    bandwidth-bound instead of issue-bound, ~10x faster in practice.
    Bit-identical to :func:`sample_nearest` (same round/clamp, exact f32
    selection).  Works for arbitrary 3D points (no planar-fan assumption).
    """
    _require_raw(volume, "sample_nearest_rows")
    d, h, w = volume.shape
    dims = jnp.asarray(volume.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims - 1)
    flat = (idx[..., 0] * h + idx[..., 1]) * w + idx[..., 2]
    values = _flat_row_lookup(_row_table(volume), flat)
    return idx, values


def sample_trilinear_rows(volume: jax.Array, points: jax.Array):
    return sample_trilinear(volume, points, gather="rows")


def _row_table_256(volume: jax.Array) -> jax.Array:
    """Overlapped 256-wide row table: row r covers flat [r*128, r*128+256).

    Costs 2x the volume in HBM but lets one gather serve a PAIR of
    adjacent flat indices (lane, lane+1) even across the 128 boundary —
    the z0/z1 trilinear corners are adjacent, halving the trilinear
    gather-transaction count.
    """
    total = volume.size
    flat = volume.reshape(-1)
    pad = (-total) % 128 + 128  # one extra tile so the last row has a tail
    flat = jnp.concatenate([flat, jnp.zeros((pad,), volume.dtype)])
    base = flat[: (flat.shape[0] - 128)].reshape(-1, 128)
    shifted = flat[128:].reshape(-1, 128)
    return jnp.concatenate([base, shifted], axis=1)  # (M, 256)


def sample_trilinear_rows2(volume: jax.Array, points: jax.Array):
    """Trilinear sampling with paired-corner row gathers (TPU fast path 2).

    Gathers 4 overlapped 256-wide rows (one per (x, y) corner pair)
    instead of 8 x 128-wide rows; the (z0, z1) values are selected from
    lanes (l, l+1) of the same row.  Identical values to
    :func:`sample_trilinear`.

    Measured NEGATIVE result on v5e (59 ms vs 20 ms per 8 frames at the
    benchmark config): the doubled lane-select width and the per-call
    overlapped-table build outweigh the halved gather count, so the
    renderer auto-selects plain ``trilinear_rows``.  Kept as a tested
    alternative for future hardware where 1KB gathers amortize better.
    """
    d, h, w = volume.shape
    dims = jnp.asarray(volume.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(volume.shape, jnp.int32) - 1)

    table = _row_table_256(volume)
    lanes = jnp.arange(256, dtype=jnp.int32)

    def corner_pair(ix, iy, iz0, iz1):
        """Values at (ix, iy, iz0) and (ix, iy, iz1) from ONE row gather.
        iz1 is iz0 or iz0+1, so both flat indices live in the overlapped
        256-wide row of the first."""
        flat0 = (ix * h + iy) * w + iz0
        flat1 = (ix * h + iy) * w + iz1
        row_id = flat0 >> 7
        rows = jnp.take(table, row_id, axis=0)  # (..., 256)
        l0 = flat0 - (row_id << 7)
        l1 = flat1 - (row_id << 7)
        v0 = jnp.sum(rows * (l0[..., None] == lanes).astype(table.dtype), axis=-1)
        v1 = jnp.sum(rows * (l1[..., None] == lanes).astype(table.dtype), axis=-1)
        return v0, v1

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]

    c000, c001 = corner_pair(x0, y0, z0, z1)
    c010, c011 = corner_pair(x0, y1, z0, z1)
    c100, c101 = corner_pair(x1, y0, z0, z1)
    c110, c111 = corner_pair(x1, y1, z0, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    values = c0 * (1 - fx) + c1 * fx

    dims_i = jnp.asarray(volume.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


# --- overlapped-tile gathers (round 3) -------------------------------------
#
# The r1/r2 measurements established that the v5e gather engine charges
# ~2 ns per 512 B row REGARDLESS of row locality (a dominant-axis volume
# transpose that puts consecutive samples in the same row wins only ~7%,
# scripts/probe_layout_r3.py), so the only lever left is issuing FEWER
# transactions.  An overlapping (y, z) tile table does that structurally:
# each 128-lane row holds an 8x16 tile with stride (7, 15), so all four
# (y0/1, z0/1) trilinear corners of a sample sit in ONE row -> 2 takes
# per sample (x0, x1) instead of 8.  Table is ~1.36x the volume (87 MB
# for 256^3 f32 — tables >~128 MB hit a measured take-cost cliff, see
# docs/benchmarking.md).  Measured: 0.72 ms/frame vs 2.79 for the
# 8-corner row gather at the benchmark config (probe_tile_r3.py).

_TILE_TY, _TILE_TZ = 8, 16   # tile shape (one 128-lane row)
_TILE_SY, _TILE_SZ = 7, 15   # strides: overlap of 1 guarantees corner pairs


def _tile2d_table(volume: jax.Array, sy: int = _TILE_SY, sz: int = _TILE_SZ):
    """Overlapped (y, z) tile table: row ``(x*na + a)*nb + b`` holds
    ``volume[x, sy*a : sy*a+8, sz*b : sz*b+16]`` flattened C-order.

    Built with two static contiguous-index takes (NOT
    ``conv_general_dilated_patches``, whose TPU lowering routes the
    one-hot conv through the MXU with bf16 rounding — measured 4e-5
    relative corruption of the table values).

    Default strides (7, 15) overlap by 1 (per-sample corner pairs);
    strides (6, 14) overlap by 2 and guarantee containment of the
    corner span of TWO consecutive unit-step ray samples (the
    depth-amortized K=2 sampler, round 4).
    """
    d, h, w = volume.shape
    na = (h - 1) // sy + 1
    nb = (w - 1) // sz + 1
    ph = sy * (na - 1) + _TILE_TY - h
    pw = sz * (nb - 1) + _TILE_TZ - w
    vp = jnp.pad(volume, ((0, 0), (0, ph), (0, pw)))
    yi = (np.arange(na)[:, None] * sy + np.arange(_TILE_TY)[None, :]).ravel()
    zi = (np.arange(nb)[:, None] * sz + np.arange(_TILE_TZ)[None, :]).ravel()
    t = jnp.take(jnp.take(vp, yi, axis=1), zi, axis=2)
    t = t.reshape(d, na, _TILE_TY, nb, _TILE_TZ).transpose(0, 1, 3, 2, 4)
    return t.reshape(d * na * nb, _TILE_TY * _TILE_TZ), na, nb


@jax.tree_util.register_pytree_node_class
class TileVolume:
    """Pre-built overlapped (y, z) tile table (see :func:`_tile2d_table`).

    Building the table inside a ``lax.map`` sweep body costs ~0.32
    ms/frame at the benchmark config (measured r3) because XLA rebuilds
    it per chunk; ``render_sweep`` therefore prepares ONCE PER DISPATCH,
    inside the jit.  A pytree, so it passes through jit/vmap boundaries
    like an array.

    **Do NOT stage a prepared table across dispatches** (i.e. pass a
    host-built ``TileVolume`` as a jit argument to a long-lived serving
    loop): a gather operand that arrives as a jit ARGUMENT is
    HBM-resident and its row gathers run at the ~10.4 ns/take argument
    rate, while the same table built in-jit is an XLA temp placed in
    fast on-chip memory at ~2.3 ns/take — measured 3.3x end-to-end
    (r4, ``scripts/probe_arg_r4.py``).  Pass the raw volume and let the
    jitted program build the table.

    ``sy``/``sz`` are the tile strides (static aux data): (7, 15) is the
    per-sample table, (6, 14) the K=2 depth-amortized one.
    """

    def __init__(self, table, na: int, nb: int, shape: tuple,
                 sy: int = _TILE_SY, sz: int = _TILE_SZ):
        self.table = table
        self.na = int(na)
        self.nb = int(nb)
        self.shape = tuple(shape)
        self.sy = int(sy)
        self.sz = int(sz)

    def tree_flatten(self):
        return (self.table,), (self.na, self.nb, self.shape, self.sy, self.sz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def prepare_tile_volume(volume, sy: int = _TILE_SY, sz: int = _TILE_SZ) -> TileVolume:
    """Build (or pass through) the overlapped 2D tile table for
    :func:`sample_trilinear_tile` (strides (7, 15)) or the K=2 sampler
    (strides (6, 14))."""
    if isinstance(volume, TileVolume):
        # pass through as-is: sample_trilinear_tile handles any overlap
        # >= 1 (it reads tv.sy/tv.sz); samplers with stricter stride
        # requirements (K=2) validate on their own
        return volume
    table, na, nb = _tile2d_table(volume, sy, sz)
    return TileVolume(table, na, nb, tuple(volume.shape), sy, sz)


def sample_trilinear_tile(volume, points: jax.Array):
    """Trilinear sampling via the overlapped (y, z) tile table: 2 row
    gathers per sample (the TPU fast path, ~3.9x the 8-corner form).

    Same clamp/corner semantics as :func:`sample_trilinear`; the z and y
    blends are folded into the lane-select weights (four nonzero lanes
    per row — values match the canonical z->y->x blend to ULPs), then x
    blends after the two takes.  Differentiable w.r.t. ``points``
    (through the fractional weights) and w.r.t. ``volume`` (through the
    linear table build).  ``volume`` may be a raw ``(D, H, W)`` array or
    a :class:`TileVolume` prepared with :func:`prepare_tile_volume`.
    """
    tv = prepare_tile_volume(volume)
    table, na, nb = tv.table, tv.na, tv.nb
    dims = jnp.asarray(tv.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)

    y0, z0 = i0[..., 1], i0[..., 2]
    dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
    a, b = y0 // tv.sy, z0 // tv.sz
    ly, lz = y0 - a * tv.sy, z0 - b * tv.sz
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    lanes = jnp.arange(_TILE_TY * _TILE_TZ, dtype=jnp.int32)
    l00 = ly * _TILE_TZ + lz
    l10 = (ly + dy) * _TILE_TZ + lz

    # merge the y AND z blends into ONE lane-select built from 4 direct
    # one-hot compares (no wz0/wz1 intermediates), and blend the two
    # gathered row arrays BEFORE a single weighted reduce so the weight
    # build is consumed once.  Measured +1.7% end-to-end over the r3
    # two-reduce form at the headline config, bit-identical values
    # (scripts/probe_selvar_r5.py; r3's probe_sel_r3 bought the first
    # 9% by folding the y blend).  The y/z association moves inside the
    # lane sum — ULP-level difference from the canonical z->y->x order.
    w00 = ((1 - fy) * (1 - fz))[..., None]
    w01 = ((1 - fy) * fz)[..., None]
    w10 = (fy * (1 - fz))[..., None]
    w11 = (fy * fz)[..., None]
    w_yz = (
        (l00[..., None] == lanes) * w00
        + ((l00 + dz)[..., None] == lanes) * w01
        + (l10[..., None] == lanes) * w10
        + ((l10 + dz)[..., None] == lanes) * w11
    )
    rows0 = jnp.take(table, (i0[..., 0] * na + a) * nb + b, axis=0)
    rows1 = jnp.take(table, (i1[..., 0] * na + a) * nb + b, axis=0)
    mix = rows0 * (1 - fx)[..., None] + rows1 * fx[..., None]
    values = jnp.sum(mix * w_yz, axis=-1)

    dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


_K2_SY, _K2_SZ = 6, 14   # overlap 2: contains BOTH samples' corner spans


def sample_trilinear_tile_k2(volume, points: jax.Array):
    """Depth-amortized tile trilinear: 3 row gathers per PAIR of
    consecutive depth samples (1.5 takes/sample vs 2) — VERDICT r3 #1.

    A unit-step ray moves at most one voxel per axis per depth step, so
    the trilinear corner spans of two consecutive samples cover at most
    3 consecutive values per axis.  An (8, 16) tile with strides (6, 14)
    (overlap 2) therefore CONTAINS the whole pair's (y, z) corner set in
    the tile at ``(min_y // 6, min_z // 14)``; the pair needs only the
    x-planes ``xmin .. xmin+2`` — three takes serve all eight corners of
    both samples.  Exact (same clamp/corner math as
    :func:`sample_trilinear_tile`, values to ULPs).

    LAYOUT NOTE (measured r4): every intermediate is either a wide
    ``(..., S/2, 128)`` row array or a narrow ``(..., S/2)`` per-pair
    array — NEVER ``(..., S/2, 2)``-shaped.  TPU tiles arrays (8, 128)
    on the minor dims, so a trailing pair dim of 2 lane-pads 64x; the
    first formulation carried a dozen such arrays and ran 2x SLOWER
    end-to-end than the per-sample tile path despite 25% fewer gather
    transactions.  Consecutive samples are split even/odd with strided
    lane slices instead.

    Requirements: ``points`` is ``(..., S, 3)`` with consecutive samples
    along the second-to-last axis at most 1 voxel apart per axis (unit
    direction, ``step <= 1``); even ``S``.  Containment violations NaN
    loudly rather than sampling a wrong tile.  Table is ~1.52x the
    volume (107 MB at 256^3 f32 — under the >128 MB take-cost cliff).

    ``volume`` may be raw or a :class:`TileVolume` prepared with
    ``prepare_tile_volume(volume, 6, 14)``.
    """
    tv = prepare_tile_volume(volume, _K2_SY, _K2_SZ)
    if (tv.sy, tv.sz) != (_K2_SY, _K2_SZ):
        raise ValueError(
            f"K=2 sampler needs a table with strides ({_K2_SY}, {_K2_SZ}) "
            f"(overlap 2); got a prepared TileVolume with ({tv.sy}, {tv.sz}) "
            "— build it with prepare_tile_volume(volume, 6, 14)"
        )
    table, na, nb = tv.table, tv.na, tv.nb
    s = points.shape[-2]
    if s % 2:
        raise ValueError(
            "sample_trilinear_tile_k2 needs an even sample count "
            f"(got {s}); pad the depth axis or use sample_trilinear_tile"
        )

    dims = jnp.asarray(tv.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)

    # component-wise (..., S) arrays, then even/odd strided lane slices
    def split(arr):
        return arr[..., 0::2], arr[..., 1::2]

    x0 = split(i0[..., 0])
    y0 = split(i0[..., 1])
    z0 = split(i0[..., 2])
    x1 = split(i1[..., 0])
    dy = tuple(a - b for a, b in zip(split(i1[..., 1]), y0))
    dz = tuple(a - b for a, b in zip(split(i1[..., 2]), z0))
    fx = split(frac[..., 0])
    fy = split(frac[..., 1])
    fz = split(frac[..., 2])

    ymin = jnp.minimum(*y0)                              # (..., S/2)
    zmin = jnp.minimum(*z0)
    xmin = jnp.minimum(*x0)
    a, b = ymin // _K2_SY, zmin // _K2_SZ
    row_base = a * nb + b

    # three static x-plane takes per pair (the transaction saving: 3
    # rows serve 8 corners of both samples)
    rows = [
        jnp.take(
            table,
            jnp.minimum(xmin + k, tv.shape[0] - 1) * (na * nb) + row_base,
            axis=0,
        )
        for k in range(3)
    ]                                                    # each (..., S/2, 128)

    lanes = jnp.arange(_TILE_TY * _TILE_TZ, dtype=jnp.int32)
    vals = []
    bads = []
    for m in (0, 1):                                     # even / odd sample
        ly = y0[m] - a * _K2_SY                          # (..., S/2) in [0, 7]
        lz = z0[m] - b * _K2_SZ
        l00 = ly * _TILE_TZ + lz
        l10 = (ly + dy[m]) * _TILE_TZ + lz
        wz0 = (l00[..., None] == lanes) * (1 - fz[m])[..., None] + (
            (l00 + dz[m])[..., None] == lanes
        ) * fz[m][..., None]
        wz1 = (l10[..., None] == lanes) * (1 - fz[m])[..., None] + (
            (l10 + dz[m])[..., None] == lanes
        ) * fz[m][..., None]
        w_yz = (1 - fy[m])[..., None] * wz0 + fy[m][..., None] * wz1
        px0 = x0[m] - xmin                               # 0 or 1
        px1 = x1[m] - xmin                               # 0..2
        # cx is a scalar plane weight per (sample, plane) and w_yz does
        # not depend on the plane: one 128-wide reduction per plane, cx
        # scales the narrow result
        val = 0.0
        for k in range(3):
            cx = (px0 == k) * (1 - fx[m]) + (px1 == k) * fx[m]
            val = val + cx * jnp.sum(rows[k] * w_yz, axis=-1)
        vals.append(val)
        # containment guard: consecutive samples >1 voxel apart per
        # axis (non-unit directions / step>1) break the pair-tile
        # premise — NaN loudly instead of silently sampling wrong tiles
        bads.append(
            (ly + dy[m] > _TILE_TY - 1)
            | (lz + dz[m] > _TILE_TZ - 1)
            | (px0 > 1)
            | (px1 > 2)
        )

    vals = [jnp.where(bad, jnp.nan, v) for v, bad in zip(vals, bads)]
    values = jnp.stack(vals, axis=-1).reshape(points.shape[:-1])

    dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


def sample_trilinear_tile_k2i(volume, points: jax.Array):
    """K=2 depth-amortized tile trilinear, SINGLE-CONSUMER formulation
    (VERDICT r4 next #1): 3 row gathers per consecutive-sample pair
    (1.5 takes/sample) where each gathered row feeds exactly ONE
    weighted-sum reduction.

    Why this exists: the r4 K=2 variants (``sample_trilinear_tile_k2``)
    lost 1.6-2x end-to-end despite 25% fewer gather transactions because
    each gathered x-plane fed TWO consumers (the even and the odd
    sample's reductions), which forces XLA to materialize the
    ``(..., S/2, 128)`` row arrays that its gather-consumer fusion never
    writes on the per-sample tile path (docs/benchmarking.md "Round 4").
    Here the pair's combined per-sample weights (y/z lane select with
    the x-plane weight ``cx`` folded in) are built at per-SAMPLE shape
    ``(..., S, 128)`` and the gathered pair rows are broadcast to sample
    rank (``repeat`` = broadcast+bitcast reshape, fusible), so each
    gather has exactly one consumer chain:

        values = sum_k  reduce_l( repeat(rows_k) * W_k )     (k = 3 planes)

    Same table (strides (6, 14), ~1.6x volume), same containment
    contract and NaN guard as :func:`sample_trilinear_tile_k2`; values
    match canonical trilinear to blend-order ULPs.

    MEASURED NEGATIVE (v5e, probe_k2i_r5, docs/benchmarking.md "Round
    5"): the hypothesis held — every gather stays fused (0 entry-block
    gathers in compiled HLO) — and it STILL loses 2.05x end-to-end
    (2.011 vs 0.979 ms/frame at the headline config; temp bytes +23%).
    The three per-plane fused chains each carry their own (..., S, 128)
    weight intermediates, costing more than the saved take.  Kept
    explicit-only as the final K=2 refutation; never auto-selected.
    """
    tv = prepare_tile_volume(volume, _K2_SY, _K2_SZ)
    if (tv.sy, tv.sz) != (_K2_SY, _K2_SZ):
        raise ValueError(
            f"K=2 sampler needs a table with strides ({_K2_SY}, {_K2_SZ}) "
            f"(overlap 2); got a prepared TileVolume with ({tv.sy}, {tv.sz}) "
            "— build it with prepare_tile_volume(volume, 6, 14)"
        )
    table, na, nb = tv.table, tv.na, tv.nb
    s = points.shape[-2]
    if s % 2:
        raise ValueError(
            "sample_trilinear_tile_k2i needs an even sample count "
            f"(got {s}); pad the depth axis or use sample_trilinear_tile"
        )

    dims = jnp.asarray(tv.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)

    def pair_min(arr):                       # (..., S) -> (..., S/2)
        pairs = arr.reshape(arr.shape[:-1] + (s // 2, 2))
        return jnp.min(pairs, axis=-1)

    def rep(arr):                            # (..., S/2) -> (..., S)
        return jnp.repeat(arr, 2, axis=-1)

    xmin = pair_min(i0[..., 0])
    a = pair_min(i0[..., 1]) // _K2_SY       # pair tile coordinates
    b = pair_min(i0[..., 2]) // _K2_SZ
    row_base = a * nb + b

    # the transaction saving: 3 x-plane takes serve all 8 corners of
    # BOTH samples of the pair
    rows = [
        jnp.take(
            table,
            jnp.minimum(xmin + k, tv.shape[0] - 1) * (na * nb) + row_base,
            axis=0,
        )
        for k in range(3)
    ]                                        # each (..., S/2, 128)

    # per-SAMPLE lane offsets relative to the pair's tile
    a_s, b_s, xmin_s = rep(a), rep(b), rep(xmin)
    ly = i0[..., 1] - a_s * _K2_SY
    lz = i0[..., 2] - b_s * _K2_SZ
    dy = i1[..., 1] - i0[..., 1]
    dz = i1[..., 2] - i0[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    l00 = ly * _TILE_TZ + lz
    l10 = (ly + dy) * _TILE_TZ + lz

    lanes = jnp.arange(_TILE_TY * _TILE_TZ, dtype=jnp.int32)
    wz0 = (l00[..., None] == lanes) * (1 - fz)[..., None] + (
        (l00 + dz)[..., None] == lanes
    ) * fz[..., None]
    wz1 = (l10[..., None] == lanes) * (1 - fz)[..., None] + (
        (l10 + dz)[..., None] == lanes
    ) * fz[..., None]
    w_yz = (1 - fy)[..., None] * wz0 + fy[..., None] * wz1   # (..., S, 128)

    px0 = i0[..., 0] - xmin_s                # 0 or 1
    px1 = i1[..., 0] - xmin_s                # 0..2
    values = jnp.zeros(points.shape[:-1], jnp.result_type(table.dtype, w_yz.dtype))
    for k in range(3):
        cx = (px0 == k) * (1 - fx) + (px1 == k) * fx          # (..., S)
        # repeat = broadcast + bitcast reshape: the gathered pair rows
        # reach sample rank without a second consumer of the gather
        rows_s = jnp.repeat(rows[k], 2, axis=-2)              # (..., S, 128)
        values = values + jnp.sum(rows_s * (w_yz * cx[..., None]), axis=-1)

    # containment guard (same contract as sample_trilinear_tile_k2)
    bad = (ly + dy > _TILE_TY - 1) | (lz + dz > _TILE_TZ - 1) | (px0 > 1) | (px1 > 2)
    values = jnp.where(bad, jnp.nan, values)

    dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


def sample_trilinear_tile_fused(volume, points: jax.Array):
    """:func:`sample_trilinear_tile` with the post-gather stage (weight
    build + lane select + z/y/x blends) fused into one Pallas kernel pass
    (``kernels.tile_select_pallas``) instead of ~5 XLA passes over the
    ``(n, 128)`` row intermediates — the non-gather 48% of the exact
    trilinear frame time (VERDICT r3 weak #2).  Gathers stay in XLA.

    Same values as :func:`sample_trilinear_tile` up to blend-order ULPs;
    differentiable w.r.t. ``points`` and ``volume`` via the kernel's
    custom VJP (XLA backward).
    """
    from diffus_tpu.kernels.tile_select_pallas import tile_select

    tv = prepare_tile_volume(volume)
    table, na, nb = tv.table, tv.na, tv.nb
    dims = jnp.asarray(tv.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)

    y0, z0 = i0[..., 1], i0[..., 2]
    dy, dz = i1[..., 1] - y0, i1[..., 2] - z0
    a, b = y0 // tv.sy, z0 // tv.sz
    ly, lz = y0 - a * tv.sy, z0 - b * tv.sz
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    l00 = ly * _TILE_TZ + lz
    l10 = (ly + dy) * _TILE_TZ + lz

    rows0 = jnp.take(table, (i0[..., 0] * na + a) * nb + b, axis=0)
    rows1 = jnp.take(table, (i1[..., 0] * na + a) * nb + b, axis=0)
    values = tile_select(rows0, rows1, l00, l10, fx, fy, fz, dz)

    dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


_T3_SHAPE = (4, 8, 4)   # 3D tile: all EIGHT corners in one 128-lane row
_T3_STRIDE = (3, 7, 3)


def _tile3d_table(volume: jax.Array, dtype=jnp.bfloat16):
    """Overlapped 3D tile table (bf16 by default: the f32 version is
    ~140 MB for 256^3 and crosses the measured take-cost cliff)."""
    tx, ty, tz = _T3_SHAPE
    sx, sy, sz = _T3_STRIDE
    d, h, w = volume.shape
    nd = (d - 1) // sx + 1
    na = (h - 1) // sy + 1
    nb = (w - 1) // sz + 1
    vp = jnp.pad(
        volume.astype(dtype),
        (
            (0, sx * (nd - 1) + tx - d),
            (0, sy * (na - 1) + ty - h),
            (0, sz * (nb - 1) + tz - w),
        ),
    )
    xi = (np.arange(nd)[:, None] * sx + np.arange(tx)[None, :]).ravel()
    yi = (np.arange(na)[:, None] * sy + np.arange(ty)[None, :]).ravel()
    zi = (np.arange(nb)[:, None] * sz + np.arange(tz)[None, :]).ravel()
    t = jnp.take(jnp.take(jnp.take(vp, xi, axis=0), yi, axis=1), zi, axis=2)
    t = t.reshape(nd, tx, na, ty, nb, tz).transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(nd * na * nb, tx * ty * tz), nd, na, nb


@jax.tree_util.register_pytree_node_class
class Tile3dVolume:
    """Pre-built overlapped 3D tile table for the one-gather bf16
    trilinear mode (see :class:`TileVolume` for why preparing helps)."""

    def __init__(self, table, nd: int, na: int, nb: int, shape: tuple):
        self.table = table
        self.nd = int(nd)
        self.na = int(na)
        self.nb = int(nb)
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.table,), (self.nd, self.na, self.nb, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def prepare_tile3d_volume(volume, dtype=jnp.bfloat16) -> Tile3dVolume:
    """Build (or pass through) the overlapped 3D tile table for the
    one-gather samplers.  ``dtype=jnp.bfloat16`` (default) keeps the
    256^3 table at ~70 MB; ``jnp.float32`` gives the EXACT one-take mode
    for volumes small enough that the ~2.03x table still fits the
    ~128 MB on-chip placement capacity (<= ~240^3, e.g. content-cropped
    clinical scans — see :func:`sample_trilinear_tile3d_f32`)."""
    if isinstance(volume, Tile3dVolume):
        return volume
    table, nd, na, nb = _tile3d_table(volume, dtype=dtype)
    return Tile3dVolume(table, nd, na, nb, tuple(volume.shape))


def prepare_tile3d_volume_host(volume, dtype=None, device=None) -> Tile3dVolume:
    """Build the overlapped 3D tile table ON THE HOST (numpy) — the
    above-capacity staging path for big clinical scans (512^3-class).

    The in-XLA build (:func:`_tile3d_table`) cannot even run at 512^3
    f32: XLA lays the 6D transpose intermediate out with (8, 128) tiling
    padding that balloons to ~19 GB and OOMs (docs/benchmarking.md r3).
    On the host a zero-copy ``sliding_window_view`` + strided slice
    yields the same table with ONE ~2.03x copy, then a single
    ``device_put``.  Above the ~128 MB placement capacity the table is
    HBM-resident either way (flat ~10.4 ns/take, probe_arg_r4), so
    nothing is lost by pre-building — and the one-take f32 mode halves
    takes/sample vs the (y, z) tile's 2 at exactly the sizes where takes
    dominate (measured at 512^3, 256x512 rays: 1.82 vs 3.02 ms/frame
    exact, vs 1.79 bf16 / 1.71 nearest — scripts/probe_host3d_r5.py).
    Bit-identical to the in-jit table (pinned by test).

    ``dtype=None`` preserves the volume's dtype (f32 in => EXACT f32
    table); pass ``jnp.bfloat16`` for the half-size lossy table.
    ``device`` commits the staged table to a specific device (a
    multi-hundred-MB table landing on the wrong chip re-transfers per
    dispatch — serve passes its bound device).
    """
    if isinstance(volume, Tile3dVolume):
        return volume
    vol = np.asarray(volume)
    if dtype is not None:
        vol = vol.astype(dtype)
    tx, ty, tz = _T3_SHAPE
    sx, sy, sz = _T3_STRIDE
    d, h, w = vol.shape
    nd = (d - 1) // sx + 1
    na = (h - 1) // sy + 1
    nb = (w - 1) // sz + 1
    vp = np.pad(
        vol,
        (
            (0, sx * (nd - 1) + tx - d),
            (0, sy * (na - 1) + ty - h),
            (0, sz * (nb - 1) + tz - w),
        ),
    )
    win = np.lib.stride_tricks.sliding_window_view(vp, (tx, ty, tz))
    table = np.ascontiguousarray(win[::sx, ::sy, ::sz]).reshape(
        nd * na * nb, tx * ty * tz
    )
    staged = (
        jax.device_put(table, device) if device is not None
        else jnp.asarray(table)
    )
    return Tile3dVolume(staged, nd, na, nb, (d, h, w))


def _sample_tile3d(tv: Tile3dVolume, points: jax.Array):
    """Shared one-gather 3D-tile sampling body (weights f32; corner
    values in the table's dtype)."""
    tx, ty, tz = _T3_SHAPE
    sx, sy, sz = _T3_STRIDE
    table, na, nb = tv.table, tv.na, tv.nb
    dims = jnp.asarray(tv.shape, dtype=points.dtype)
    p = jnp.clip(points, 0.0, dims - 1.0)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(tv.shape, jnp.int32) - 1)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    dx, dy, dz = i1[..., 0] - x0, i1[..., 1] - y0, i1[..., 2] - z0
    ax, ay, az = x0 // sx, y0 // sy, z0 // sz
    lx, ly, lz = x0 - ax * sx, y0 - ay * sy, z0 - az * sz
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    wx = (lx[..., None] == jnp.arange(tx)) * (1 - fx)[..., None] + (
        (lx + dx)[..., None] == jnp.arange(tx)
    ) * fx[..., None]
    wy = (ly[..., None] == jnp.arange(ty)) * (1 - fy)[..., None] + (
        (ly + dy)[..., None] == jnp.arange(ty)
    ) * fy[..., None]
    wz = (lz[..., None] == jnp.arange(tz)) * (1 - fz)[..., None] + (
        (lz + dz)[..., None] == jnp.arange(tz)
    ) * fz[..., None]
    w = (wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]).reshape(
        wx.shape[:-1] + (tx * ty * tz,)
    )

    rows = jnp.take(table, (ax * na + ay) * nb + az, axis=0)
    values = jnp.sum(rows.astype(jnp.float32) * w, axis=-1)

    dims_i = jnp.asarray(tv.shape, dtype=jnp.int32)
    idx = jnp.clip(jnp.round(points).astype(jnp.int32), 0, dims_i - 1)
    return idx, values


def sample_trilinear_tile3d_bf16(volume, points: jax.Array):
    """Trilinear sampling with ONE row gather per sample: all 8 corners
    live in one overlapped 3D tile (bf16 corner values, f32 weights).

    0.26 ms/frame at the benchmark config on v5e (nearest-gather speed),
    at the cost of bf16 corner precision (~4e-3 relative on values).
    NOT the parity or default training path; opt in via
    ``RenderConfig(interp='trilinear_bf16')`` for pose sweeps where
    throughput dominates.  ``volume`` may be a raw array or a prepared
    :class:`Tile3dVolume`.
    """
    return _sample_tile3d(prepare_tile3d_volume(volume), points)


def sample_trilinear_tile3d_f32(volume, points: jax.Array):
    """EXACT trilinear sampling with ONE row gather per sample — the
    f32 3D-tile mode for volumes whose ~2.03x table fits the ~128 MB
    on-chip placement capacity (volume <= ~55 MB ~= 240^3 f32; e.g.
    content-cropped clinical scans, ``scene.crop_to_content``).

    At 256^3 the f32 table is ~130 MB and falls off the placement
    capacity (measured r3/r4) — the renderer's auto-selection applies a
    size gate; above it, use :func:`sample_trilinear_tile` (2 gathers)
    or the bf16 mode.  Values match canonical trilinear on the volume's
    dtype to blend-order ULPs (the table PRESERVES the volume's values —
    f32 stays f32; a bf16 serving-mode volume keeps its bf16 values
    rather than being upcast to a 2x table); differentiable w.r.t.
    points and volume.
    """
    if isinstance(volume, Tile3dVolume):
        return _sample_tile3d(volume, points)
    return _sample_tile3d(
        prepare_tile3d_volume(volume, dtype=volume.dtype), points
    )


def tile_table_bytes(shape, sy: int = _TILE_SY, sz: int = _TILE_SZ,
                     itemsize: int = 4) -> int:
    """Exact byte size of the (y, z) tile table :func:`_tile2d_table`
    builds for a ``shape`` volume — for placement-capacity gating
    (serve/renderer).  A flat 1.36x factor misclassifies the K=2 table,
    whose (6, 14) strides cost ~1.6x the volume (ADVICE r4)."""
    d, h, w = shape
    na = (h - 1) // sy + 1
    nb = (w - 1) // sz + 1
    return d * na * nb * _TILE_TY * _TILE_TZ * itemsize


def tile3d_table_bytes(shape, itemsize: int = 2) -> int:
    """Exact byte size of the 3D tile table :func:`_tile3d_table` builds
    (``itemsize=2`` for the default bf16 table, 4 for f32)."""
    tx, ty, tz = _T3_SHAPE
    sx, sy, sz = _T3_STRIDE
    d, h, w = shape
    nd = (d - 1) // sx + 1
    na = (h - 1) // sy + 1
    nb = (w - 1) // sz + 1
    return nd * na * nb * tx * ty * tz * itemsize


SAMPLERS = {
    "nearest": sample_nearest,
    "nearest_rows": sample_nearest_rows,
    "trilinear": sample_trilinear,
    "trilinear_rows": sample_trilinear_rows,
    "trilinear_rows2": sample_trilinear_rows2,
    "trilinear_tile": sample_trilinear_tile,
    "trilinear_tile_k2": sample_trilinear_tile_k2,
    "trilinear_tile_k2i": sample_trilinear_tile_k2i,
    "trilinear_tile_fused": sample_trilinear_tile_fused,
    "trilinear_tile3d_bf16": sample_trilinear_tile3d_bf16,
    "trilinear_tile3d_f32": sample_trilinear_tile3d_f32,
}
