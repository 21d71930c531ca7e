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


def test_timing_helpers_cpu():
    """Relay-proof timing helpers (bench methodology): sync measurement,
    readback draining, and per-call timing with sync subtraction."""
    import jax.numpy as jnp
    from diffus_tpu.utils.timing import readback, measure_sync_ms, readback_time_ms

    assert readback((jnp.arange(4.0), "meta")) == 6.0
    assert readback(()) == 0.0

    sync = measure_sync_ms(n=2)
    assert sync > 0

    calls = []

    def fn(x):
        calls.append(float(x[0]))
        return x * 2

    args = [(jnp.full((3,), float(i)),) for i in range(4)]
    ms = readback_time_ms(fn, args, n=3, sync_ms=0.0)
    assert ms > 0
    # warmup uses args[0]; timed calls cycle unique inputs from args[1:]
    assert calls[0] == 0.0 and calls[1:] == [1.0, 2.0, 3.0]
    # an absurd sync estimate clamps to the tiny positive floor, not negative
    assert readback_time_ms(fn, args, n=3, sync_ms=1e9) > 0
    # recycled argument tuples are rejected (relay caches identical inputs)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unique"):
        readback_time_ms(fn, args, n=4, sync_ms=0.0)


def test_robust_readback_time_ms():
    """Jitter-robust variant: per-group adjacent sync samples + median."""
    import jax.numpy as jnp
    import pytest as _pytest

    from diffus_tpu.utils.timing import robust_readback_time_ms

    calls = []

    def fn(x):
        calls.append(float(x[0]))
        return x + 1

    args = [(jnp.full((3,), float(i)),) for i in range(7)]
    ms = robust_readback_time_ms(fn, args, n=6, repeats=3)
    assert ms > 0
    # warmup arg 0, then three groups of two unique inputs in order
    assert calls[0] == 0.0 and calls[1:] == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    with _pytest.raises(ValueError, match="unique"):
        robust_readback_time_ms(fn, args[:3], n=6, repeats=3)
    with _pytest.raises(ValueError, match="repeats"):
        robust_readback_time_ms(fn, args, n=2, repeats=4)


def test_no_import_cycle_parallel_first():
    """Importing diffus_tpu.parallel before diffus_tpu.train must work:
    parallel.shard uses train.losses, and train.driver uses parallel —
    the driver therefore imports parallel lazily.  Regression test for
    the cycle that only bit when parallel was imported first (a fresh
    subprocess, unlike this test session, has no modules cached)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import diffus_tpu.parallel; import diffus_tpu.train; print('ok')"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "PALLAS_AXON_POOL_IPS": "",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
