"""Per-pixel parity against the ACTUAL reference implementation.

Every other parity anchor in this suite is a re-derivation
(``ops/reference_oracle.py`` numpy oracle, torch cross-checks assembled
by us).  This file closes the loop by executing the reference's own
``UltrasoundRenderer.plot_beam_frame`` (``/root/reference/src/renderer.py:201``)
under the installed torch and comparing per-pixel — three ways:
reference <-> ours <-> dense oracle.  A mistake shared between our
implementation and our oracle cannot hide from this test.

The reference module does matplotlib plotting inside its hot path
(``custom_nearest_sampler`` ``renderer.py:762-801``, visualize=True by
default), so we force the Agg backend and stub ``plt.show`` before use.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
pytest.importorskip("tqdm")  # the reference module imports it at top level

import jax.numpy as jnp

from diffus_tpu.types import RenderConfig
from diffus_tpu.render.renderer import render_frame
from diffus_tpu.geometry.fan import fan_directions_2d
from diffus_tpu.phantoms import brain_phantom_3d
from diffus_tpu.ops.reference_oracle import render_frame_dense

REF_SRC = "/root/reference/src"
_REF_CACHE = []


def _get_ref():
    """Import the reference renderer module itself (skip when absent)."""
    if not _REF_CACHE:
        if not os.path.isdir(REF_SRC):
            pytest.skip(f"reference checkout not present at {REF_SRC}")
        sys.path.insert(0, REF_SRC)
        try:
            import renderer as ref_mod
        except Exception as e:  # missing dep in a stripped env
            pytest.skip(f"reference renderer not importable: {e}")
        finally:
            sys.path.remove(REF_SRC)
        ref_mod.plt.show = lambda *a, **k: None  # headless
        # The sampler's visualize branch (renderer.py:762-801) is display-only
        # but CRASHES on fractional start (float slice at :774) — disable it
        # so the shipped compute path itself runs; outputs are unaffected.
        orig_sampler = ref_mod.custom_nearest_sampler

        def _no_viz_sampler(Z, points, visualize=True, sampler="prop", start=100):
            return orig_sampler(Z, points, visualize=False, sampler=sampler, start=start)

        ref_mod.custom_nearest_sampler = _no_viz_sampler
        _REF_CACHE.append(ref_mod)
    return _REF_CACHE[0]


def _reference_frame(ref, vol, src, dirs, num_samples, att, start):
    """Run the reference's own plot_beam_frame (float64 torch)."""
    r = ref.UltrasoundRenderer(num_samples=num_samples, attenuation_coeff=att)
    x, y, z, out = r.plot_beam_frame(
        volume=torch.from_numpy(vol).double(),
        source=torch.from_numpy(src).double(),
        directions=torch.from_numpy(dirs).double(),
        plot=False,
        start=start,
    )
    return x.numpy(), y.numpy(), z.numpy(), out.detach().numpy()


@pytest.mark.parametrize(
    "n_rays,start",
    [
        (9, 0),       # odd ray count, no skip
        (8, 4),       # even count + int start (torch even-median quirk)
        (8, 0.25),    # fractional start -> int(0.25 * num_samples)
    ],
)
def test_plot_beam_frame_parity_three_way(n_rays, start):
    vol = brain_phantom_3d((32, 32, 32))
    src = np.array([16.0, 2.0, 16.0], np.float32)
    dirs = np.asarray(
        fan_directions_2d([0.0, 1.0], np.radians(45.0), n_rays), np.float32
    )
    num_samples, att = 24, 1e-4

    rx, ry, rz, r_out = _reference_frame(
        _get_ref(), vol, src, dirs, num_samples, att, start
    )

    config = RenderConfig(attenuation_coeff=att, start=start)
    ox, oy, oz, ours = render_frame(
        jnp.asarray(vol), jnp.asarray(src), jnp.asarray(dirs), num_samples, config
    )

    # integer sample coordinates must match exactly
    np.testing.assert_array_equal(np.asarray(ox), rx)
    np.testing.assert_array_equal(np.asarray(oy), ry)
    np.testing.assert_array_equal(np.asarray(oz), rz)

    scale = np.max(np.abs(r_out)) + 1e-30
    err_ours = np.max(np.abs(np.asarray(ours) - r_out)) / scale
    assert err_ours < 2e-5, f"ours vs reference: max rel err {err_ours}"

    # three-way: the numpy dense oracle must agree with the reference too
    start_idx = config.start_index(num_samples)
    _, _, _, oracle = render_frame_dense(vol, src, dirs, num_samples, att, start_idx)
    err_oracle = np.max(np.abs(oracle - r_out)) / scale
    assert err_oracle < 1e-6, f"oracle vs reference: max rel err {err_oracle}"
