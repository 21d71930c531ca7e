"""Debug guards and profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.utils import checked, assert_finite, block_and_time, stage_timer


def test_checked_raises_on_nan():
    from jax.experimental import checkify

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(bad)
    out = f(jnp.array([1.0, 2.0]))
    assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(checkify.JaxRuntimeError):
        f(jnp.array([-1.0]))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite(jnp.array([1.0, np.nan]), "bad")


def test_block_and_time_and_stage_timer():
    f = jax.jit(lambda x: x * 2)
    dt = block_and_time(f, jnp.ones(8), iters=3)
    assert dt > 0
    results = {}
    with stage_timer("stage", results):
        f(jnp.ones(8))
    assert results["stage"] > 0
