"""Multi-device sharding on the virtual 8-device CPU mesh.

Validates that sharded execution is numerically identical to
single-device execution (sweep) and that the data-parallel training step
compiles + runs with real (pose, ray) shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_sweep
from diffus_tpu.parallel import make_mesh, default_mesh, sharded_render_sweep
from diffus_tpu.geometry.fan import fan_directions_2d
from diffus_tpu.phantoms import brain_phantom_3d

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_construction():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"pose": 2, "ray": 4}
    mesh = default_mesh(8)
    assert mesh.shape["pose"] * mesh.shape["ray"] == 8


def test_sharded_sweep_matches_single_device():
    vol = jnp.asarray(brain_phantom_3d((24, 24, 24)))
    rng = np.random.default_rng(0)
    sources = jnp.asarray(
        np.array([12.0, 1.0, 12.0], np.float32)[None]
        + rng.uniform(-1, 1, (4, 3)).astype(np.float32)
    )
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40), 8)
    cfg = RenderConfig(attenuation_coeff=1e-4)

    mesh = make_mesh(2, 4)
    _, _, _, sharded = sharded_render_sweep(mesh, vol, sources, dirs, 16, cfg)
    _, _, _, single = render_sweep(vol, sources, dirs, 16, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # compile-check on tiny shapes instead of the 256^3 bench volume
    import jax.numpy as jnp
    from diffus_tpu.types import RenderConfig
    from diffus_tpu.render.renderer import render_frame
    from diffus_tpu.geometry.fan import fan_directions_2d
    from diffus_tpu.phantoms import brain_phantom_3d

    vol = jnp.asarray(brain_phantom_3d((16, 16, 16)))
    src = jnp.array([8.0, 1.0, 8.0])
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45), 8)
    out = jax.jit(
        lambda v, s, d: render_frame(v, s, d, 12, RenderConfig(attenuation_coeff=1e-4))[3]
    )(vol, src, dirs)
    assert out.shape == (8, 12)


def test_depth_sharded_scan_matches_single_device(rng):
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.ops.propagation import echo_amplitudes

    mesh = make_mesh(1, 8)
    r = jnp.asarray(rng.uniform(-0.7, 0.7, (6, 64)).astype(np.float32))
    got = np.asarray(echo_amplitudes_depth_sharded(r, mesh, axis="ray"))
    want = np.asarray(echo_amplitudes(r))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_depth_sharded_scan_strong_reflectors(rng):
    from diffus_tpu.parallel.depth_scan import echo_amplitudes_depth_sharded
    from diffus_tpu.ops.propagation import echo_amplitudes

    mesh = make_mesh(1, 4)
    r = rng.uniform(-0.2, 0.2, (2, 32)).astype(np.float32)
    r[:, ::7] = 0.995
    got = np.asarray(echo_amplitudes_depth_sharded(jnp.asarray(r), mesh, axis="ray"))
    want = np.asarray(echo_amplitudes(jnp.asarray(r)))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
