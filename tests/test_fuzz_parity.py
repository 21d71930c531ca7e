"""Randomized parity sweep: render_frame vs the dense float64 oracle.

The targeted parity tests pin specific configs; this sweep samples the
configuration space broadly (volume sizes incl. non-cubic, sources
inside/outside the volume, arbitrary 3D ray bundles — not just planar
fans — anisotropic impedance scales, every start flavor) and requires
per-pixel agreement with `ops/reference_oracle.render_frame_dense`
everywhere.  Seeded and deterministic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_frame
from diffus_tpu.ops.reference_oracle import render_frame_dense


def _random_case(rng):
    dims = tuple(int(d) for d in rng.integers(7, 34, 3))
    scale = 10.0 ** rng.uniform(0, 6)
    volume = (rng.uniform(0.01, 1.8, dims) * scale).astype(np.float32)
    if rng.uniform() < 0.3:
        # flat regions: reflection coefficients exactly zero
        volume[: dims[0] // 2] = scale
    n_rays = int(rng.integers(1, 12))
    dirs = rng.normal(size=(n_rays, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # sources inside, near the face, or OUTSIDE (clamp territory)
    mode = rng.integers(0, 3)
    if mode == 0:
        source = rng.uniform(1, np.array(dims) - 2)
    elif mode == 1:
        source = np.array([dims[0] / 2, 0.3, dims[2] / 2])
    else:
        source = rng.uniform(-4, np.array(dims) + 4)
    num_samples = int(rng.integers(4, 40))
    start_flavor = rng.integers(0, 3)
    start = (0, int(rng.integers(0, max(1, num_samples - 2))),
             float(rng.uniform(0, 0.5)))[start_flavor]
    att = 10.0 ** rng.uniform(-4, -0.3)
    return (volume, source.astype(np.float32), dirs.astype(np.float32),
            num_samples, start, att)


@pytest.mark.parametrize("seed", range(24))
def test_fuzzed_config_matches_dense_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    volume, source, dirs, num_samples, start, att = _random_case(rng)

    config = RenderConfig(attenuation_coeff=att, start=start)
    ox, oy, oz, ours = render_frame(
        jnp.asarray(volume), jnp.asarray(source), jnp.asarray(dirs),
        num_samples, config,
    )
    start_idx = config.start_index(num_samples)
    wx, wy, wz, want = render_frame_dense(
        volume, source, dirs, num_samples, att, start_idx
    )

    np.testing.assert_array_equal(np.asarray(ox), wx)
    np.testing.assert_array_equal(np.asarray(oy), wy)
    np.testing.assert_array_equal(np.asarray(oz), wz)
    scale = np.max(np.abs(want)) + 1e-30
    err = np.max(np.abs(np.asarray(ours) - want)) / scale
    assert err < 5e-5, (
        f"seed {seed}: max rel err {err} "
        f"(dims {volume.shape}, rays {dirs.shape[0]}, samples {num_samples}, "
        f"start {start!r}, att {att:.2e})"
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_tile_sampler_matches_trilinear(seed):
    """Random shapes/points: the overlapped-tile gather must match plain
    trilinear everywhere (interior, boundary, far out of range)."""
    from diffus_tpu.ops.sampling import sample_trilinear, sample_trilinear_tile

    rng = np.random.default_rng(7000 + seed)
    shape = tuple(int(d) for d in rng.integers(2, 40, 3))
    vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    pts = rng.uniform(-3, max(shape) + 3, size=(300, 3)).astype(np.float32)
    # sprinkle exact-integer and exact-boundary coordinates
    pts[:40] = np.round(pts[:40])
    pts[40:60, 0] = shape[0] - 1
    pts[60:80, 2] = shape[2] - 1
    idx_a, a = sample_trilinear(vol, jnp.asarray(pts))
    idx_b, b = sample_trilinear_tile(vol, jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-6, atol=3e-6)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_crop_render_equality(seed):
    """Random content boxes, margins, and in-box sources: the cropped
    render with shifted source must equal the full-volume render (the
    crop_to_content coordinate contract, round 4)."""
    from diffus_tpu.scene import crop_to_content
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.types import RenderConfig

    r = np.random.default_rng(1000 + seed)
    shape = tuple(int(x) for x in r.integers(30, 46, 3))
    vol = np.zeros(shape, np.float32)
    lo = [int(r.integers(4, 10)) for _ in range(3)]
    hi = [int(r.integers(s - 10, s - 2)) for s in shape]
    vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = r.uniform(
        1.0, 2.0, (hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2])
    ).astype(np.float32)
    # margin/sample-count chosen so every ray (max 8 unit steps + 1
    # interpolation corner + source jitter) provably stays inside the
    # cropped box — outside it the crop clamps while the full volume
    # keeps sampling, and the equality contract deliberately ends there
    margin = int(r.integers(5, 8))
    cropped, offset = crop_to_content(vol, margin=margin,
                                      multiple=int(r.choice([1, 4, 8])))
    # avoid exact half-integer coordinates: round-half-to-even picks a
    # DIFFERENT voxel across an odd crop offset (10.5 -> 10 but
    # 7.5 -> 8), so nearest-mode equality holds off the measure-zero
    # .5 lattice (documented in crop_to_content)
    src = np.array([
        (lo[0] + hi[0]) / 2.0 + float(r.uniform(-2, 2)) + 0.13,
        lo[1] + 1.37,
        (lo[2] + hi[2]) / 2.0 + float(r.uniform(-2, 2)) + 0.21,
    ], np.float32)
    dirs = fan_directions_2d(
        [float(r.uniform(-0.3, 0.3)), 1.0], np.radians(float(r.uniform(20, 40))), 5
    )
    n = 8
    cfg = RenderConfig(
        attenuation_coeff=1e-4,
        interp="trilinear" if seed % 2 else "nearest",
    )
    _, _, _, full = render_frame(jnp.asarray(vol), jnp.asarray(src), dirs, n, cfg)
    _, _, _, crop = render_frame(
        cropped, jnp.asarray(src) - jnp.asarray(offset, jnp.float32), dirs, n, cfg
    )
    np.testing.assert_allclose(
        np.asarray(crop), np.asarray(full), rtol=1e-5, atol=1e-7
    )
