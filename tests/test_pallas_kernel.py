"""Pallas propagation kernel vs the XLA scan path (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.kernels.propagation_pallas import echo_pallas
from diffus_tpu.ops.propagation import echo_amplitudes, depth_attenuation
from diffus_tpu.ops.sampling import sample_nearest, sample_nearest_rows


@pytest.mark.parametrize("mode", ["parity", "symmetric"])
@pytest.mark.parametrize("shape", [(5, 33), (2, 7, 20), (1, 511)])
def test_echo_pallas_matches_scan(mode, shape, rng):
    r = jnp.asarray(rng.uniform(-0.8, 0.8, shape).astype(np.float32))
    got = np.asarray(echo_pallas(r, mode, 0.1))
    want = np.asarray(depth_attenuation(echo_amplitudes(r, mode=mode), 0.1))
    # symmetric mode: kernel computes k=1 exactly where the scan computes
    # (1 - r^2) + r^2 in f32 — same math, different rounding path
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_echo_pallas_nan_semantics():
    r = jnp.asarray(np.array([[0.2, np.nan, 0.1]], np.float32))
    got = np.asarray(echo_pallas(r, "parity", 0.0))
    want = np.asarray(echo_amplitudes(r))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_echo_pallas_gradients_match(rng):
    r = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 17)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(echo_pallas(x, "parity", 0.1) ** 2))(r)
    g2 = jax.grad(
        lambda x: jnp.sum(depth_attenuation(echo_amplitudes(x), 0.1) ** 2)
    )(r)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)


def test_rows_sampler_bit_identical(rng):
    # lane-aligned row gather must agree exactly with the plain sampler,
    # including clamped out-of-volume points and non-128-multiple volumes
    vol = jnp.asarray(rng.normal(size=(7, 9, 11)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-3, 13, (4, 25, 3)).astype(np.float32))
    idx_a, val_a = sample_nearest(vol, pts)
    idx_b, val_b = sample_nearest_rows(vol, pts)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))


def test_render_frame_pallas_config_matches(rng):
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d

    vol = jnp.asarray(rng.uniform(1.4e6, 1.7e6, (24, 24, 24)).astype(np.float32))
    src = jnp.array([12.0, 1.0, 12.0])
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 6)
    out_a = render_frame(vol, src, dirs, 16, RenderConfig(attenuation_coeff=0.1))[3]
    out_b = render_frame(
        vol, src, dirs, 16, RenderConfig(attenuation_coeff=0.1, use_pallas=True)
    )[3]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-7)


def test_render_frame_pallas_with_start(rng):
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d

    vol = jnp.asarray(rng.uniform(1.4e6, 1.7e6, (24, 24, 24)).astype(np.float32))
    src = jnp.array([12.0, 1.0, 12.0])
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 6)
    for start in (4, 0.25):
        out_a = render_frame(
            vol, src, dirs, 20, RenderConfig(attenuation_coeff=0.1, start=start)
        )[3]
        out_b = render_frame(
            vol, src, dirs, 20,
            RenderConfig(attenuation_coeff=0.1, start=start, use_pallas=True),
        )[3]
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-7
        )


def test_trilinear_rows_matches_direct(rng):
    from diffus_tpu.ops.sampling import sample_trilinear, sample_trilinear_rows

    vol = jnp.asarray(rng.normal(size=(9, 7, 11)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-2, 12, (5, 16, 3)).astype(np.float32))
    _, a = sample_trilinear(vol, pts)
    _, b = sample_trilinear_rows(vol, pts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # gradients w.r.t. points also identical
    ga = jax.grad(lambda p: jnp.sum(sample_trilinear(vol, p)[1] ** 2))(pts)
    gb = jax.grad(lambda p: jnp.sum(sample_trilinear_rows(vol, p)[1] ** 2))(pts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6)


def test_kernel_and_depth_scan_reject_physical_mode(rng):
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.parallel import make_mesh

    r = jnp.zeros((2, 8))
    with pytest.raises(ValueError, match="unsupported"):
        echo_pallas(r, "physical", 0.1)
    if len(jax.devices()) >= 2:
        with pytest.raises(ValueError, match="unsupported"):
            echo_amplitudes_depth_sharded(r, make_mesh(1, 2), axis="ray",
                                          mode="physical")


def test_trilinear_rows2_bit_identical(rng):
    from diffus_tpu.ops.sampling import sample_trilinear, sample_trilinear_rows2

    vol = jnp.asarray(rng.normal(size=(9, 7, 11)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-2, 12, (5, 40, 3)).astype(np.float32))
    _, a = sample_trilinear(vol, pts)
    _, b = sample_trilinear_rows2(vol, pts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # lane-127 boundary: z interpolation across a 128-multiple flat index
    vol2 = jnp.asarray(rng.normal(size=(4, 4, 128)).astype(np.float32))
    pts2 = jnp.asarray(
        np.stack([np.full(10, 1.0), np.full(10, 2.0),
                  np.linspace(125.2, 127.0, 10)], -1).astype(np.float32)
    )
    _, a2 = sample_trilinear(vol2, pts2)
    _, b2 = sample_trilinear_rows2(vol2, pts2)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    # gradients identical too
    g1 = jax.grad(lambda p: jnp.sum(sample_trilinear(vol, p)[1] ** 2))(pts)
    g2 = jax.grad(lambda p: jnp.sum(sample_trilinear_rows2(vol, p)[1] ** 2))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_gather_dma_probe_correctness(rng):
    """The row-DMA probe (the megakernel negative-result measurement,
    docs/benchmarking.md) gathers exactly the rows XLA's take does —
    interpreter mode on CPU."""
    from diffus_tpu.kernels.gather_dma_probe import dma_gather_probe, xla_take_probe

    table = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    off = jnp.asarray(np.array([5], np.int32))
    got = dma_gather_probe(off, table, n_rows=48, n_buf=4)
    want = xla_take_probe(off, table, n_rows=48)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want), rtol=1e-5)


# --- fused tile-select kernel (round 4: VERDICT r3 weak #2) ---------------


def _fused_fixture(rng, shape=(20, 24, 22), n_rays=6, samples=30):
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.ops.sampling import ray_points

    vol = jnp.asarray(brain_phantom_3d(shape)) / 1e6  # unit scale: tighter tols
    dirs = fan_directions_2d([0.15, 1.0], np.radians(60.0), n_rays)
    pts = ray_points(jnp.asarray(np.array([10.3, 1.2, 11.7], np.float32)), dirs, samples)
    return vol, pts


def test_tile_select_fused_matches_tile(rng):
    from diffus_tpu.ops.sampling import (
        sample_trilinear_tile, sample_trilinear_tile_fused,
    )

    vol, pts = _fused_fixture(rng)
    idx_t, v_tile = sample_trilinear_tile(vol, pts)
    idx_f, v_fused = jax.jit(sample_trilinear_tile_fused)(vol, pts)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_t))
    np.testing.assert_allclose(
        np.asarray(v_fused), np.asarray(v_tile), rtol=1e-6, atol=1e-7
    )


def test_tile_select_fused_border_clamp(rng):
    """Points outside / at the clamped border: dz=0 and dy=0 lanes must
    coincide exactly like the XLA formulation's doubled one-hot."""
    from diffus_tpu.ops.sampling import (
        sample_trilinear_tile, sample_trilinear_tile_fused,
    )

    vol = jnp.asarray(rng.uniform(0.5, 2.0, (9, 10, 11)).astype(np.float32))
    pts = jnp.asarray(
        np.array(
            [[-1.0, -2.0, -3.0], [8.0, 9.0, 10.0], [8.9, 9.9, 10.9],
             [20.0, 20.0, 20.0], [4.5, 8.99, 0.0], [0.0, 0.0, 10.49]],
            np.float32,
        )
    )
    _, v_tile = sample_trilinear_tile(vol, pts)
    _, v_fused = sample_trilinear_tile_fused(vol, pts)
    np.testing.assert_allclose(
        np.asarray(v_fused), np.asarray(v_tile), rtol=1e-6, atol=1e-7
    )


def test_tile_select_fused_gradients(rng):
    from diffus_tpu.ops.sampling import (
        sample_trilinear_tile, sample_trilinear_tile_fused,
    )

    vol, pts = _fused_fixture(rng)
    g_f = jax.grad(lambda p: jnp.sum(sample_trilinear_tile_fused(vol, p)[1] ** 2))(pts)
    g_t = jax.grad(lambda p: jnp.sum(sample_trilinear_tile(vol, p)[1] ** 2))(pts)
    # atol 1e-5: the r5 comb4 select blends rows BEFORE the weighted
    # reduce (bit-identical forward, ULP-reassociated backward), so the
    # two formulations' point-gradients differ by a few f32 ULPs (~4e-6)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_t), rtol=1e-4, atol=1e-5)
    gv_f = jax.grad(lambda v: jnp.sum(sample_trilinear_tile_fused(v, pts)[1]))(vol)
    gv_t = jax.grad(lambda v: jnp.sum(sample_trilinear_tile(v, pts)[1]))(vol)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_t), rtol=1e-4, atol=1e-6)


def test_render_frame_use_pallas_trilinear_matches():
    """config.use_pallas with interp='trilinear' routes propagation
    through echo_pallas (sampling stays on the XLA tile path — the
    Pallas select kernel measured slower end-to-end and is explicit-only);
    frames must match the plain trilinear render."""
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame, render_sweep
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.geometry.fan import fan_directions_2d

    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), 8)
    src = jnp.asarray(np.array([12.0, 1.5, 12.0], np.float32))
    plain = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    fused = RenderConfig(attenuation_coeff=1e-4, interp="trilinear", use_pallas=True)
    _, _, _, want = render_frame(vol, src, dirs, 20, plain)
    _, _, _, got = render_frame(vol, src, dirs, 20, fused)
    # frame-relative comparison: reflection coefficients amplify sampler
    # ULP differences where z2 ~= z1 (r ~ 0), so per-element rtol on
    # near-zero echoes is the wrong metric
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-30
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) / scale < 1e-4
    # and through the chunked sweep (prepared tile tables)
    srcs = jnp.stack([src, src + 0.73, src - 1.21, src + 2.02])
    _, _, _, want_s = render_sweep(vol, srcs, dirs, 20, plain, chunk=2)
    _, _, _, got_s = render_sweep(vol, srcs, dirs, 20, fused, chunk=2)
    scale_s = float(np.max(np.abs(np.asarray(want_s)))) + 1e-30
    assert np.max(np.abs(np.asarray(got_s) - np.asarray(want_s))) / scale_s < 1e-4
