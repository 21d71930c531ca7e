"""Sampler parity and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.ops.sampling import (
    ray_points,
    sample_nearest,
    sample_trilinear,
)


def test_ray_points_formula():
    src = jnp.array([1.0, 2.0, 3.0])
    dirs = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]])
    pts = np.asarray(ray_points(src, dirs, 4))
    assert pts.shape == (2, 4, 3)
    np.testing.assert_allclose(pts[0, 3], [4.0, 2.0, 3.0], rtol=1e-6)
    np.testing.assert_allclose(pts[1, 2], [1.0, 3.0, 4.0], rtol=1e-6)


def test_nearest_round_half_even_and_clamp(rng):
    vol = jnp.asarray(rng.normal(size=(4, 5, 6)).astype(np.float32))
    # .5 coordinates: round-half-to-even (torch/numpy convention)
    pts = jnp.array([
        [0.5, 1.5, 2.5],    # -> (0, 2, 2)
        [2.5, 3.5, 4.5],    # -> (2, 4, 4)
        [-3.0, 99.0, 2.0],  # clamped -> (0, 4, 2)
    ])
    idx, vals = sample_nearest(vol, pts)
    want_idx = np.array([[0, 2, 2], [2, 4, 4], [0, 4, 2]])
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    v = np.asarray(vol)
    np.testing.assert_allclose(
        np.asarray(vals), v[want_idx[:, 0], want_idx[:, 1], want_idx[:, 2]]
    )


def test_trilinear_equals_nearest_at_integers(rng):
    vol = jnp.asarray(rng.normal(size=(5, 5, 5)).astype(np.float32))
    pts = jnp.asarray(rng.integers(0, 5, size=(10, 3)).astype(np.float32))
    _, v_near = sample_nearest(vol, pts)
    _, v_tri = sample_trilinear(vol, pts)
    np.testing.assert_allclose(np.asarray(v_near), np.asarray(v_tri), rtol=1e-5)


def test_trilinear_midpoint_value():
    vol = jnp.zeros((2, 2, 2)).at[1, 1, 1].set(8.0)
    _, v = sample_trilinear(vol, jnp.array([[0.5, 0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(v), [1.0], rtol=1e-6)


def test_trilinear_gradient_wrt_points(rng):
    vol = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))

    def f(p):
        _, v = sample_trilinear(vol, p)
        return jnp.sum(v)

    p0 = jnp.asarray(rng.uniform(1.2, 5.8, size=(6, 3)).astype(np.float32))
    g = jax.grad(f)(p0)
    assert np.any(np.abs(np.asarray(g)) > 0)  # gradients survive (unlike nearest)
    # finite-difference check on one coordinate
    eps = 1e-3
    pp = p0.at[2, 1].add(eps)
    pm = p0.at[2, 1].add(-eps)
    fd = (f(pp) - f(pm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[2, 1], np.asarray(fd), rtol=1e-2, atol=1e-3)


class TestTileSamplers:
    """Overlapped-tile trilinear gathers (the round-3 TPU fast paths)."""

    def _random_case(self, rng, shape=(9, 23, 37), n=400):
        from diffus_tpu.ops.sampling import sample_trilinear_tile

        vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        # interior, boundary, clamp-edge and out-of-range points
        pts = np.concatenate(
            [
                rng.uniform(-1.5, max(shape) + 1.5, size=(n, 3)),
                np.array(
                    [
                        [shape[0] - 1.0, shape[1] - 1.0, shape[2] - 1.0],
                        [0.0, 0.0, 0.0],
                        [shape[0] - 1.3, shape[1] - 1.3, shape[2] - 1.3],
                        [3.0, shape[1] - 1.0, 14.999],
                    ]
                ),
            ]
        ).astype(np.float32)
        return vol, jnp.asarray(pts)

    def test_tile2d_matches_trilinear(self, rng):
        from diffus_tpu.ops.sampling import sample_trilinear_tile

        vol, pts = self._random_case(rng)
        idx_a, a = sample_trilinear(vol, pts)
        idx_b, b = sample_trilinear_tile(vol, pts)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6)

    def test_tile2d_gradients_match(self, rng):
        from diffus_tpu.ops.sampling import sample_trilinear_tile

        vol, pts = self._random_case(rng, n=50)

        def f(fn, p, v):
            return jnp.sum(fn(v, p)[1] ** 2)

        ga = jax.grad(lambda p: f(sample_trilinear, p, vol))(pts)
        gb = jax.grad(lambda p: f(sample_trilinear_tile, p, vol))(pts)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4)
        # volume gradients flow through the overlapped table build
        va = jax.grad(lambda v: f(sample_trilinear, pts, v))(vol)
        vb = jax.grad(lambda v: f(sample_trilinear_tile, pts, v))(vol)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-4)

    def test_tile2d_small_and_awkward_shapes(self, rng):
        from diffus_tpu.ops.sampling import sample_trilinear_tile

        for shape in [(2, 2, 2), (3, 8, 16), (4, 7, 15), (5, 9, 17), (2, 30, 3)]:
            vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            pts = jnp.asarray(
                rng.uniform(-0.5, max(shape), size=(40, 3)).astype(np.float32)
            )
            _, a = sample_trilinear(vol, pts)
            _, b = sample_trilinear_tile(vol, pts)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6
            )

    def test_tile3d_bf16_close_and_differentiable(self, rng):
        from diffus_tpu.ops.sampling import sample_trilinear_tile3d_bf16

        vol, pts = self._random_case(rng, n=200)
        _, a = sample_trilinear(vol, pts)
        idx_b, b = sample_trilinear_tile3d_bf16(vol, pts)
        # bf16 corner values: ~8-bit mantissa
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)
        g = jax.grad(
            lambda p: jnp.sum(sample_trilinear_tile3d_bf16(vol, p)[1])
        )(pts)
        assert np.any(np.abs(np.asarray(g)) > 0)

    def test_render_config_accepts_trilinear_bf16(self):
        from diffus_tpu.types import RenderConfig
        from diffus_tpu.render.renderer import _resolve_sampler

        cfg = RenderConfig(interp="trilinear_bf16")
        assert _resolve_sampler(cfg.interp) == "trilinear_tile3d_bf16"


def test_prepared_tile_volume_matches_raw(rng):
    from diffus_tpu.ops.sampling import (
        prepare_tile_volume, prepare_tile3d_volume,
        sample_trilinear_tile, sample_trilinear_tile3d_bf16,
    )

    vol = jnp.asarray(rng.normal(size=(7, 19, 31)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 32, size=(60, 3)).astype(np.float32))
    for prep, fn in (
        (prepare_tile_volume, sample_trilinear_tile),
        (prepare_tile3d_volume, sample_trilinear_tile3d_bf16),
    ):
        tv = prep(vol)
        assert prep(tv) is tv  # idempotent pass-through
        idx_a, a = fn(vol, pts)
        idx_b, b = fn(tv, pts)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        # ULP-level tolerance: op fusion reassociates the lane-select sums
        # (atol: operand-scale ULPs — near-zero values on this normal
        # volume make pure-rtol brittle under eager-vs-jit FMA contraction
        # of the r5 single-reduce form)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
        # prepared volumes traverse jit boundaries as pytrees
        _, c = jax.jit(fn)(tv, pts)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=1e-6, atol=1e-6)


def test_render_sweep_accepts_prepared_volume(rng):
    """render_sweep hoists table prep per dispatch; passing an
    already-prepared volume must give identical frames (service path)."""
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_sweep, _resolve_sampler

    vol = jnp.asarray(rng.uniform(0.5, 2.5, size=(16, 16, 16)).astype(np.float32))
    dirs = jnp.asarray(
        np.stack([np.zeros(4), np.ones(4), np.linspace(-0.2, 0.2, 4)], -1).astype(
            np.float32
        )
    )
    dirs = dirs / np.linalg.norm(np.asarray(dirs), axis=1, keepdims=True)
    srcs = jnp.asarray(rng.uniform(4, 10, size=(3, 3)).astype(np.float32))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_bf16")
    frames_raw = render_sweep(vol, srcs, dirs, 12, cfg)[3]
    from diffus_tpu.ops.sampling import prepare_tile3d_volume

    frames_prep = render_sweep(prepare_tile3d_volume(vol), srcs, dirs, 12, cfg)[3]
    np.testing.assert_allclose(
        np.asarray(frames_raw), np.asarray(frames_prep), rtol=1e-6, atol=1e-7
    )


def test_non_tile_samplers_reject_prepared_volumes(rng):
    import pytest

    from diffus_tpu.ops.sampling import (
        prepare_tile_volume, sample_nearest, sample_nearest_rows,
    )

    tv = prepare_tile_volume(jnp.ones((4, 4, 4)))
    pts = jnp.zeros((3, 3))
    for fn in (sample_nearest, sample_nearest_rows, sample_trilinear):
        with pytest.raises(TypeError, match="prepared"):
            fn(tv, pts)


# --- K=2 depth-amortized pair sampler (round 4) ----------------------------


def test_tile_k2_matches_trilinear(rng):
    """3 takes per consecutive-sample pair must reproduce the canonical
    trilinear values exactly (unit-step rays, arbitrary 3D directions)."""
    from diffus_tpu.ops.sampling import sample_trilinear_tile_k2

    vol = jnp.asarray(rng.uniform(0.5, 2.5, (21, 26, 24)).astype(np.float32))
    for seed in range(4):
        r = np.random.default_rng(seed)
        dirs = r.normal(size=(7, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        src = jnp.asarray((np.array([10.0, 13.0, 12.0])
                           + r.uniform(-9, 9, 3)).astype(np.float32))
        pts = ray_points(src, jnp.asarray(dirs), 32)
        _, want = sample_trilinear(vol, pts)
        _, got = jax.jit(sample_trilinear_tile_k2)(vol, pts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )


def test_tile_k2_border_and_gradients(rng):
    from diffus_tpu.ops.sampling import (
        sample_trilinear_tile, sample_trilinear_tile_k2,
    )

    vol = jnp.asarray(rng.uniform(0.5, 2.0, (9, 10, 11)).astype(np.float32))
    # rays running off every face (clamped tails: dz=dy=0 paths)
    dirs = jnp.asarray(
        np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0.57, 0.57, 0.57]], np.float32)
    )
    pts = ray_points(jnp.array([8.5, 9.5, 10.5]), dirs, 24)
    _, want = sample_trilinear_tile(vol, pts)
    _, got = sample_trilinear_tile_k2(vol, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    g1 = jax.grad(lambda p: jnp.sum(sample_trilinear_tile_k2(vol, p)[1] ** 2))(pts)
    g2 = jax.grad(lambda p: jnp.sum(sample_trilinear_tile(vol, p)[1] ** 2))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)
    gv1 = jax.grad(lambda v: jnp.sum(sample_trilinear_tile_k2(v, pts)[1]))(vol)
    gv2 = jax.grad(lambda v: jnp.sum(sample_trilinear_tile(v, pts)[1]))(vol)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2),
                               rtol=1e-4, atol=1e-6)


def test_tile_k2_rejects_odd_samples_and_nans_on_big_steps(rng):
    import pytest

    from diffus_tpu.ops.sampling import sample_trilinear_tile_k2

    vol = jnp.asarray(rng.uniform(0.5, 2.0, (16, 16, 16)).astype(np.float32))
    dirs = jnp.asarray(np.array([[0.0, 1.0, 0.0]], np.float32))
    with pytest.raises(ValueError, match="even"):
        sample_trilinear_tile_k2(vol, ray_points(jnp.zeros(3), dirs, 7))
    # >1 voxel per step breaks pair-tile containment: NaN loudly, never
    # silently sample the wrong tile.  (Start y=4 so the first pair's
    # corners span rows 4..8 — genuinely outside the stride-6 tile; a
    # luckier alignment CAN still be contained, and then stays exact.)
    pts_fast = ray_points(jnp.array([1.0, 4.0, 1.0]), dirs * 3.0, 4)
    _, v = sample_trilinear_tile_k2(vol, pts_fast)
    assert np.isnan(np.asarray(v)).any()


def test_tile_k2_through_renderer_resolution(rng, monkeypatch):
    """Force the TPU-side K=2 resolution on CPU and pin the rendered
    frame against the plain trilinear render (the auto-selected path is
    TPU-only at trace time, so CI must force it)."""
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d

    orig = rmod._resolve_sampler

    def force_k2(interp, num_samples=0, step=1.0):
        if interp == "trilinear" and num_samples % 2 == 0 and step <= 1.0:
            return "trilinear_tile_k2"
        return orig(interp, num_samples, step)

    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    dirs = fan_directions_2d([0.2, 1.0], np.radians(50.0), 9)
    src = jnp.asarray(np.array([12.0, 1.5, 12.0], np.float32))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    # unique num_samples (26) so the monkeypatched trace can't hit a
    # cached jit entry from other tests
    _, _, _, want = rmod.render_frame(vol, src, dirs, 26, cfg)
    monkeypatch.setattr(rmod, "_resolve_sampler", force_k2)
    _, _, _, got = rmod.render_frame(vol, src, dirs, 26, cfg)
    srcs = jnp.stack([src, src + 0.61, src - 1.17, src + 1.93])
    _, _, _, got_sweep = rmod.render_sweep(vol, srcs, dirs, 26, cfg, chunk=2)
    monkeypatch.setattr(rmod, "_resolve_sampler", orig)
    _, _, _, want_sweep = rmod.render_sweep(vol, srcs, dirs, 26, cfg, chunk=2)
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-30
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) / scale < 1e-5
    s2 = float(np.max(np.abs(np.asarray(want_sweep)))) + 1e-30
    assert np.max(np.abs(np.asarray(got_sweep) - np.asarray(want_sweep))) / s2 < 1e-5


def test_tile_k2_prepared_and_stride_mismatch(rng):
    import pytest

    from diffus_tpu.ops.sampling import (
        prepare_tile_volume, sample_trilinear_tile, sample_trilinear_tile_k2,
    )

    vol = jnp.asarray(rng.uniform(0.5, 2.0, (16, 18, 17)).astype(np.float32))
    dirs = jnp.asarray(np.array([[0.0, 1.0, 0.0], [0.6, 0.8, 0.0]], np.float32))
    pts = ray_points(jnp.array([8.0, 1.0, 8.0]), dirs, 12)
    tv2 = prepare_tile_volume(vol, 6, 14)
    _, want = sample_trilinear_tile_k2(vol, pts)
    _, got = sample_trilinear_tile_k2(tv2, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-7)
    # the per-sample tile sampler works off the K=2 table too (overlap>=1)
    _, via_tile = sample_trilinear_tile(tv2, pts)
    np.testing.assert_allclose(np.asarray(via_tile), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    # stride mismatch is a loud error
    tv1 = prepare_tile_volume(vol)
    with pytest.raises(ValueError, match="strides"):
        sample_trilinear_tile_k2(tv1, pts)


def test_tile_k2i_single_consumer_matches_trilinear(rng):
    """Round-5 single-consumer K=2 formulation: same 3-takes-per-pair
    table access as ``tile_k2`` but each gathered row feeds exactly one
    weighted reduce.  Kept as a measured NEGATIVE (2.05x slower end-to-end
    on v5e, probe_k2i_r5) — this pins its exactness and contracts so the
    archived evidence stays reproducible."""
    import pytest

    from diffus_tpu.ops.sampling import (
        prepare_tile_volume, sample_trilinear_tile, sample_trilinear_tile_k2i,
    )

    vol = jnp.asarray(rng.uniform(0.5, 2.5, (21, 26, 24)).astype(np.float32))
    for seed in range(3):
        r = np.random.default_rng(seed)
        dirs = r.normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        src = jnp.asarray((np.array([10.0, 13.0, 12.0])
                           + r.uniform(-9, 9, 3)).astype(np.float32))
        pts = ray_points(src, jnp.asarray(dirs), 32)
        _, want = sample_trilinear(vol, pts)
        _, got = jax.jit(sample_trilinear_tile_k2i)(vol, pts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )
    # gradients flow like the canonical tile sampler's
    pts = ray_points(jnp.array([10.0, 2.0, 12.0]),
                     jnp.asarray([[0.0, 1.0, 0.0], [0.6, 0.8, 0.0]]), 16)
    g1 = jax.grad(lambda p: jnp.sum(sample_trilinear_tile_k2i(vol, p)[1] ** 2))(pts)
    g2 = jax.grad(lambda p: jnp.sum(sample_trilinear_tile(vol, p)[1] ** 2))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)
    # contracts shared with tile_k2: even sample count, (6,14) table
    with pytest.raises(ValueError, match="even"):
        sample_trilinear_tile_k2i(vol, pts[..., :7, :])
    with pytest.raises(ValueError, match="strides"):
        sample_trilinear_tile_k2i(prepare_tile_volume(vol), pts)
    _, via_prepared = sample_trilinear_tile_k2i(prepare_tile_volume(vol, 6, 14), pts)
    _, direct = sample_trilinear_tile_k2i(vol, pts)
    np.testing.assert_allclose(np.asarray(via_prepared), np.asarray(direct),
                               rtol=1e-7)


# --- exact f32 one-take 3D tile + volume-aware routing (round 4) ------------


def test_tile3d_f32_matches_trilinear_exactly(rng):
    """The f32 3D-tile sampler is the EXACT one-gather mode: same values
    as canonical trilinear to blend-order ULPs (unlike the bf16 tile's
    ~4e-3 corner rounding)."""
    from diffus_tpu.ops.sampling import sample_trilinear_tile3d_f32

    for shape in [(9, 23, 37), (2, 2, 2), (4, 7, 3), (5, 9, 17)]:
        vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        pts = jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(-1.5, max(shape) + 1.5, size=(120, 3)),
                    [[0.0, 0.0, 0.0],
                     [shape[0] - 1.0, shape[1] - 1.0, shape[2] - 1.0]],
                ]
            ).astype(np.float32)
        )
        idx_a, a = sample_trilinear(vol, pts)
        idx_b, b = sample_trilinear_tile3d_f32(vol, pts)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


def test_tile3d_f32_gradients_match(rng):
    from diffus_tpu.ops.sampling import sample_trilinear_tile3d_f32

    vol = jnp.asarray(rng.normal(size=(8, 11, 13)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0.2, 7.5, size=(40, 3)).astype(np.float32))

    def f(fn, p, v):
        return jnp.sum(fn(v, p)[1] ** 2)

    ga = jax.grad(lambda p: f(sample_trilinear, p, vol))(pts)
    gb = jax.grad(lambda p: f(sample_trilinear_tile3d_f32, p, vol))(pts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)
    va = jax.grad(lambda v: f(sample_trilinear, pts, v))(vol)
    vb = jax.grad(lambda v: f(sample_trilinear_tile3d_f32, pts, v))(vol)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               rtol=1e-4, atol=1e-4)


def test_tile3d_f32_prepared_and_dtype_preservation(rng):
    """prepare_tile3d_volume(dtype=volume.dtype) preserves values (f32
    stays f32, bf16 stays bf16 — no silent upcast to a 2x table), and the
    prepared pytree round-trips jit."""
    from diffus_tpu.ops.sampling import (
        Tile3dVolume, prepare_tile3d_volume, sample_trilinear_tile3d_f32,
    )

    vol = jnp.asarray(rng.normal(size=(7, 19, 31)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 32, size=(60, 3)).astype(np.float32))
    tv = prepare_tile3d_volume(vol, dtype=vol.dtype)
    assert tv.table.dtype == jnp.float32
    assert prepare_tile3d_volume(tv) is tv
    _, a = sample_trilinear_tile3d_f32(vol, pts)
    _, b = sample_trilinear_tile3d_f32(tv, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    _, c = jax.jit(sample_trilinear_tile3d_f32)(tv, pts)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), rtol=1e-6)
    # bf16 serving-mode volume: table keeps the bf16 values, blends in f32
    vb16 = vol.astype(jnp.bfloat16)
    tvb = prepare_tile3d_volume(vb16, dtype=vb16.dtype)
    assert tvb.table.dtype == jnp.bfloat16
    _, want = sample_trilinear(vb16, pts)
    _, got = sample_trilinear_tile3d_f32(vb16, pts)
    np.testing.assert_allclose(np.asarray(want).astype(np.float32),
                               np.asarray(got), rtol=2e-6, atol=2e-6)
    assert isinstance(tvb, Tile3dVolume)


def test_route_tile_family(rng):
    """Prepared tables of any tile family are honored; raw volumes keep
    the measured-optimal (y,z) tile (the exact f32 one-take 3D tile is a
    measured end-to-end NEGATIVE — probe_tile3df32[b]_r4 — so it is
    never auto-selected)."""
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.ops.sampling import (
        prepare_tile_volume, prepare_tile3d_volume,
    )

    route = rmod._route_tile_family
    vol = jnp.zeros((16, 16, 16), jnp.float32)
    # raw volumes are NOT upgraded to the one-take 3D tile
    assert route("trilinear_tile", vol) == "trilinear_tile"
    # non-tile resolutions pass through untouched
    assert route("trilinear", vol) == "trilinear"
    assert route("nearest_rows", vol) == "nearest_rows"
    # prepared 2D tile table is honored (no re-prep, no upgrade)
    tv = prepare_tile_volume(vol)
    assert route("trilinear_tile", tv) == "trilinear_tile"
    # K=2 with a per-sample-stride table falls back to the tile sampler
    assert route("trilinear_tile_k2", tv) == "trilinear_tile"
    tv2 = prepare_tile_volume(vol, 6, 14)
    assert route("trilinear_tile_k2", tv2) == "trilinear_tile_k2"
    # prepared 3D tables route by their dtype
    assert (
        route("trilinear_tile", prepare_tile3d_volume(vol, dtype=vol.dtype))
        == "trilinear_tile3d_f32"
    )
    assert (
        route("trilinear_tile", prepare_tile3d_volume(vol))
        == "trilinear_tile3d_bf16"
    )


def test_tile3d_f32_through_renderer(rng, monkeypatch):
    """A pre-prepared f32 Tile3dVolume routes render_frame AND
    render_sweep through the exact one-take 3D tile (the serving /
    explicit-opt-in path — auto-selection is a measured negative) and
    matches the plain trilinear render on the raw volume."""
    from diffus_tpu.render import renderer as rmod
    from diffus_tpu.ops.sampling import prepare_tile3d_volume
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d

    orig = rmod._resolve_sampler

    def force_tile(interp, num_samples=0, step=1.0):
        if interp == "trilinear":
            return "trilinear_tile"
        return orig(interp, num_samples, step)

    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    tv = prepare_tile3d_volume(vol, dtype=vol.dtype)
    dirs = fan_directions_2d([0.2, 1.0], np.radians(50.0), 9)
    src = jnp.asarray(np.array([12.0, 1.5, 12.0], np.float32))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    # unique num_samples (22) to dodge cached jit entries from other tests
    _, _, _, want = rmod.render_frame(vol, src, dirs, 22, cfg)
    monkeypatch.setattr(rmod, "_resolve_sampler", force_tile)
    assert rmod._route_tile_family("trilinear_tile", tv) == "trilinear_tile3d_f32"
    # raw volumes stay on the (y,z) tile under the TPU resolution
    assert rmod._route_tile_family("trilinear_tile", vol) == "trilinear_tile"
    _, _, _, got = rmod.render_frame(tv, src, dirs, 22, cfg)
    srcs = jnp.stack([src, src + 0.61, src - 1.17, src + 1.93])
    _, _, _, got_sweep = rmod.render_sweep(tv, srcs, dirs, 22, cfg, chunk=2)
    monkeypatch.setattr(rmod, "_resolve_sampler", orig)
    _, _, _, want_sweep = rmod.render_sweep(vol, srcs, dirs, 22, cfg, chunk=2)
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-30
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) / scale < 1e-5
    s2 = float(np.max(np.abs(np.asarray(want_sweep)))) + 1e-30
    assert np.max(np.abs(np.asarray(got_sweep) - np.asarray(want_sweep))) / s2 < 1e-5


def test_prepare_tile3d_volume_host_bit_identical(rng):
    """The host-built (numpy sliding-window) 3D tile table is
    BIT-IDENTICAL to the in-jit build in both dtypes — the above-capacity
    staging path for 512^3-class scans where the in-XLA f32 build OOMs
    (probe_host3d_r5: exact one-take beats the 2-take tile 1.82 vs 3.02
    ms/frame at 512^3)."""
    from diffus_tpu.ops.sampling import (
        _tile3d_table,
        prepare_tile3d_volume_host,
        sample_trilinear,
        sample_trilinear_tile3d_f32,
    )

    vol = rng.random((33, 29, 31)).astype(np.float32) * 2.0 + 0.5
    want, nd, na, nb = _tile3d_table(jnp.asarray(vol), dtype=jnp.float32)
    tv = prepare_tile3d_volume_host(vol)
    assert (tv.nd, tv.na, tv.nb, tv.shape) == (nd, na, nb, (33, 29, 31))
    assert tv.table.dtype == jnp.float32  # dtype preserved => exact mode
    assert bool(jnp.all(tv.table == want))
    want_b = _tile3d_table(jnp.asarray(vol), dtype=jnp.bfloat16)[0]
    tvb = prepare_tile3d_volume_host(vol, dtype=jnp.bfloat16)
    assert tvb.table.dtype == jnp.bfloat16
    assert bool(jnp.all(tvb.table == want_b))
    # prepared passthrough + exact sampling through the f32 sampler
    assert prepare_tile3d_volume_host(tv) is tv
    pts = jnp.asarray(
        rng.random((64, 3)).astype(np.float32) * np.array([32, 28, 30], np.float32)
    )
    _, v_ref = sample_trilinear(jnp.asarray(vol), pts)
    _, v_got = sample_trilinear_tile3d_f32(tv, pts)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               rtol=2e-6, atol=2e-6)


def test_host_tile3d_through_renderer(rng):
    """A host-prepared f32 table renders identically to the raw-volume
    trilinear path through render_frame (the serve._prepare route for
    above-capacity exact trilinear)."""
    import diffus_tpu.render.renderer as rmod
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import prepare_tile3d_volume_host
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.types import RenderConfig

    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    tv = prepare_tile3d_volume_host(vol)
    dirs = fan_directions_2d([0.2, 1.0], np.radians(50.0), 9)
    src = jnp.asarray(np.array([12.0, 1.5, 12.0], np.float32))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    # unique num_samples (23) to dodge cached jit entries from other tests
    _, _, _, want = rmod.render_frame(vol, src, dirs, 23, cfg)
    _, _, _, got = rmod.render_frame(tv, src, dirs, 23, cfg)
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-30
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) / scale < 1e-5


def test_prepare_tile3d_volume_host_device_placement(rng):
    """The host-built table commits to the requested device (a
    multi-hundred-MB table on the wrong chip would re-transfer per
    dispatch — self-review r5)."""
    import jax

    from diffus_tpu.ops.sampling import prepare_tile3d_volume_host

    target = jax.devices()[3 % len(jax.devices())]
    vol = rng.random((17, 13, 15)).astype(np.float32)
    tv = prepare_tile3d_volume_host(vol, device=target)
    assert tv.table.devices() == {target}


def test_config_explicit_interp_names_resolve(rng):
    """RenderConfig accepts every registered explicit sampler name
    (advanced opt-ins, r5) and each resolves to a real SAMPLERS entry —
    a rot guard for the hardcoded mirror in types.py (the leaf types
    module must not import the ops layer)."""
    from diffus_tpu.ops.sampling import SAMPLERS
    from diffus_tpu.render.renderer import _resolve_sampler
    from diffus_tpu.types import RenderConfig

    import pytest

    for name in RenderConfig._EXPLICIT_SAMPLERS:
        cfg = RenderConfig(attenuation_coeff=1e-4, interp=name)  # validates
        assert _resolve_sampler(cfg.interp, 8, 1.0) in SAMPLERS
    with pytest.raises(ValueError, match="unknown interp"):
        RenderConfig(interp="trilinear_typo")
