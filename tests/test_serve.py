"""Serving runtime: batching tiers, padding, volume swap."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffus_tpu.serve import RendererService
from diffus_tpu.types import RenderConfig, BeamGeometry
from diffus_tpu.render.renderer import render_frame
from diffus_tpu.phantoms import brain_phantom_3d


@pytest.fixture(scope="module")
def svc():
    vol = brain_phantom_3d((24, 24, 24))
    geom = BeamGeometry(n_rays=8, num_samples=16, opening_angle=np.radians(40))
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 4))
    s.warmup()
    return s


def test_service_matches_functional(svc, rng):
    src = np.array([12.0, 1.0, 12.0], np.float32)
    frames = svc.render(src)
    want = render_frame(svc.volume, jnp.asarray(src), svc.directions, 16,
                        svc.config)[3]
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(want), rtol=1e-6)


def test_service_odd_batch_padding(svc, rng):
    # 3 poses -> padded to the 4-tier; 6 poses -> chunks of 4 + padded 2
    for p in (3, 6):
        sources = np.tile([12.0, 1.0, 12.0], (p, 1)).astype(np.float32) \
            + rng.uniform(-1, 1, (p, 3)).astype(np.float32)
        frames = svc.render(sources)
        assert frames.shape == (p, 8, 16)
        for i in range(p):
            want = render_frame(svc.volume, jnp.asarray(sources[i]),
                                svc.directions, 16, svc.config)[3]
            np.testing.assert_allclose(np.asarray(frames[i]), np.asarray(want),
                                       rtol=1e-5, atol=1e-7)
    assert svc.stats["padded_frames"] > 0


def test_service_volume_swap(svc):
    new_vol = brain_phantom_3d((24, 24, 24)) * 1.1
    svc.update_volume(new_vol)
    frames = svc.render(np.array([12.0, 1.0, 12.0], np.float32))
    assert np.all(np.isfinite(np.asarray(frames)))
    with pytest.raises(ValueError, match="staged"):
        svc.update_volume(brain_phantom_3d((16, 16, 16)))


def test_service_empty_batch(svc):
    frames = svc.render(np.zeros((0, 3), np.float32))
    assert frames.shape == (0, 8, 16)


def test_service_respects_step():
    vol = brain_phantom_3d((24, 24, 24))
    geom_half = BeamGeometry(n_rays=4, num_samples=12,
                             opening_angle=np.radians(40), step=0.5)
    s = RendererService(vol, geom_half, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1,))
    frames = s.render(np.array([12.0, 1.0, 12.0], np.float32))
    want = render_frame(jnp.asarray(vol), jnp.array([12.0, 1.0, 12.0]),
                        s.directions, 12, s.config, step=0.5)[3]
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(want), rtol=1e-6)
    # and it differs from the step=1 render (the old silent-ignore bug)
    full = render_frame(jnp.asarray(vol), jnp.array([12.0, 1.0, 12.0]),
                        s.directions, 12, s.config)[3]
    assert not np.allclose(np.asarray(frames[0]), np.asarray(full))


def test_service_concurrent_render_and_swap(svc, rng):
    """render/update_volume/snapshot_stats under concurrent callers: no
    lost stats updates, every result matches one of the two volumes
    (never a torn mix) — the r2 service mutated stats and swapped the
    volume unguarded (VERDICT r2 weak #7)."""
    from concurrent.futures import ThreadPoolExecutor

    vol_a = np.asarray(svc.volume)
    vol_b = vol_a * 2.0
    src = np.array([8.0, 1.0, 8.0], np.float32)
    want_a = np.asarray(svc.render(src[None])[0])
    svc.update_volume(vol_b)
    want_b = np.asarray(svc.render(src[None])[0])
    svc.update_volume(vol_a)
    base_frames = svc.snapshot_stats()["frames"]

    n_calls = 24

    def worker(i):
        if i % 6 == 5:
            svc.update_volume(vol_b if i % 2 else vol_a)
            return None
        return np.asarray(svc.render(np.stack([src, src]))[0])

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(worker, range(n_calls)))

    renders = [r for r in results if r is not None]
    for r in renders:
        ok_a = np.allclose(r, want_a, rtol=1e-5, atol=1e-6)
        ok_b = np.allclose(r, want_b, rtol=1e-5, atol=1e-6)
        assert ok_a or ok_b  # a whole-request volume, never a torn swap
    stats = svc.snapshot_stats()
    assert stats["frames"] == base_frames + 2 * len(renders)


@pytest.mark.parametrize("interp", ["trilinear", "trilinear_bf16"])
def test_service_meshed_matches_single_device(interp):
    """Multi-chip serving: a RendererService over a (2, 4) mesh returns
    the same frames as the single-device service (padded tiers, prepared
    tables and all; both tile table kinds ride the mesh as pytrees)."""
    from diffus_tpu.parallel import make_mesh

    vol = brain_phantom_3d((24, 24, 24))
    geom = BeamGeometry(n_rays=8, num_samples=16, opening_angle=np.radians(40))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp=interp)
    single = RendererService(vol, geom, cfg, batch_tiers=(1, 4))
    meshed = RendererService(
        vol, geom, cfg, batch_tiers=(1, 4), mesh=make_mesh(2, 4)
    )
    rng = np.random.default_rng(5)
    srcs = (np.array([12.0, 1.0, 12.0], np.float32)[None]
            + rng.uniform(-2, 2, (5, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(meshed.render(srcs)), np.asarray(single.render(srcs)),
        rtol=1e-5, atol=1e-7,
    )


def test_service_meshed_rejects_coupled_nondivisible():
    from diffus_tpu.parallel import make_mesh

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=6, num_samples=16)
    with pytest.raises(ValueError, match="couples rays"):
        RendererService(
            vol, geom, RenderConfig(attenuation_coeff=1e-4, start=4),
            batch_tiers=(2,), mesh=make_mesh(2, 4),
        )


def test_service_stats_available_during_inflight_render(svc):
    """The lock no longer spans the dispatch: /stats (and update_volume)
    return while a render is on device (VERDICT r3 weak #5)."""
    import threading
    import time as _time

    orig_fn = svc._fn

    def slow_fn(v, s, d):
        _time.sleep(0.4)
        return orig_fn(v, s, d)

    svc._fn = slow_fn
    try:
        t = threading.Thread(
            target=svc.render, args=(np.array([12.0, 1.0, 12.0], np.float32),)
        )
        t.start()
        _time.sleep(0.05)  # let the render reach the device dispatch
        t0 = _time.perf_counter()
        stats = svc.snapshot_stats()
        elapsed = _time.perf_counter() - t0
        t.join()
        assert elapsed < 0.2, f"snapshot_stats blocked {elapsed:.2f}s behind a render"
        assert stats["requests"] >= 1
    finally:
        svc._fn = orig_fn


def test_service_coalesces_concurrent_singletons():
    """8 concurrent single-pose requests ride <= 2 dispatched batches:
    the first arrival leads, stragglers queue during its dispatch and
    drain as ONE padded tier (VERDICT r3 weak #5 'request coalescing')."""
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    vol = brain_phantom_3d((24, 24, 24))
    geom = BeamGeometry(n_rays=8, num_samples=16, opening_angle=np.radians(40))
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 8))
    s.warmup()
    base_batches = s.snapshot_stats()["batches"]

    orig_fn = s._fn
    barrier = threading.Barrier(8)

    def slow_fn(v, src, d):
        _time.sleep(0.25)  # wide window: stragglers must all enqueue
        return orig_fn(v, src, d)

    s._fn = slow_fn
    rng = np.random.default_rng(3)
    srcs = (np.array([12.0, 1.0, 12.0], np.float32)[None]
            + rng.uniform(-2, 2, (8, 3)).astype(np.float32))

    def worker(i):
        barrier.wait()
        return np.asarray(s.render(srcs[i])[0])

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(worker, range(8)))
    s._fn = orig_fn

    batches = s.snapshot_stats()["batches"] - base_batches
    assert batches <= 2, f"8 singleton requests took {batches} dispatches"
    for i, got in enumerate(results):
        want = render_frame(s.volume, jnp.asarray(srcs[i]), s.directions, 16,
                            s.config)[3]
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-7)


def test_service_coalesced_error_propagates():
    """A failing dispatch must deliver the exception to EVERY waiter in
    the coalesced batch, not hang the followers."""
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 4))
    s.warmup()

    def broken_fn(v, src, d):
        _time.sleep(0.15)
        raise RuntimeError("device fell over")

    s._fn = broken_fn
    barrier = threading.Barrier(4)

    def worker(i):
        barrier.wait()
        try:
            s.render(np.array([8.0, 1.0, 8.0], np.float32))
            return None
        except RuntimeError as e:
            return str(e)

    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(worker, range(4), timeout=30))
    assert all(o == "device fell over" for o in outs), outs


def test_sharded_sweep_jit_is_cached(monkeypatch):
    """sharded_render_sweep reuses ONE jitted program across calls: the
    r3 code built a fresh jax.jit(lambda) per request, retracing the
    sweep every time (ADVICE r3, medium).  Tracing is observed directly:
    the render_sweep body must run once for two same-shape calls."""
    import diffus_tpu.parallel.shard as shard_mod
    from diffus_tpu.parallel import make_mesh

    traces = []
    orig = shard_mod.render_sweep

    def counting(*a, **k):
        traces.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(shard_mod, "render_sweep", counting)
    from diffus_tpu.geometry.fan import fan_directions_2d

    mesh = make_mesh(2, 4)
    vol = jnp.asarray(brain_phantom_3d((16, 16, 16)))
    dirs = fan_directions_2d([0.0, 1.0], np.radians(40.0), 8)
    # unique config instance -> fresh lru entry, so the count starts at 0
    cfg = RenderConfig(attenuation_coeff=1.2345e-4)
    rng = np.random.default_rng(0)
    for _ in range(3):
        src = jnp.asarray(np.array([[8.0, 1.0, 8.0]], np.float32)
                          + rng.uniform(-1, 1, (2, 3)).astype(np.float32))
        shard_mod.sharded_render_sweep(mesh, vol, src, dirs, 8, cfg)
    assert len(traces) == 1, f"sweep retraced {len(traces)}x for same-shape calls"


def test_service_leader_abort_does_not_strand_queue(monkeypatch):
    """If the dispatch leader unwinds outside the per-batch error path
    (e.g. an interrupt in the straggler sleep), queued waiters must fail
    loudly and leadership must reset so later requests still work."""
    import time as _time

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 4))
    s.warmup()

    calls = {"n": 0}
    orig_drain = s._drain

    def exploding_drain():
        calls["n"] += 1
        raise KeyboardInterrupt("simulated interrupt")

    s._drain = exploding_drain
    with pytest.raises(KeyboardInterrupt):
        s.render(np.array([8.0, 1.0, 8.0], np.float32))
    # leadership reset: a later request elects a new leader and succeeds
    s._drain = orig_drain
    out = s.render(np.array([8.0, 1.0, 8.0], np.float32))
    assert np.all(np.isfinite(np.asarray(out)))
    assert not s._dispatching and not s._queue


def test_service_crop_mode_transparent_to_clients(rng):
    """crop=True: the service crops the staged volume but clients keep
    ORIGINAL-volume coordinates; frames match the uncropped service, and
    update_volume re-applies the same box to original-shape volumes."""
    vol = np.zeros((40, 44, 42), np.float32)
    vol[8:32, 6:38, 7:35] = (
        np.asarray(brain_phantom_3d((24, 32, 28))) / 1e6
    ).astype(np.float32)
    geom = BeamGeometry(n_rays=6, num_samples=14, opening_angle=np.radians(30))
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    full = RendererService(vol, geom, cfg, batch_tiers=(2,))
    cropped = RendererService(vol, geom, cfg, batch_tiers=(2,), crop=True,
                              crop_margin=4)
    assert cropped.volume.shape < full.volume.shape
    srcs = (np.array([20.0, 9.0, 20.0], np.float32)[None]
            + rng.uniform(-1, 1, (3, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(cropped.render(srcs)), np.asarray(full.render(srcs)),
        rtol=1e-5, atol=1e-7,
    )
    # original-shape volume swap re-crops with the same box
    cropped.update_volume(vol * 1.1)
    full.update_volume(vol * 1.1)
    np.testing.assert_allclose(
        np.asarray(cropped.render(srcs[:1])),
        np.asarray(full.render(srcs[:1])),
        rtol=1e-5, atol=1e-7,
    )


# --- round 4b: adaptive coalescing window + pose-recovery endpoint ----------


def test_service_adaptive_window_controller():
    """The self-tuning straggler window: grows 1.5x on coalesced drain
    rounds, halves on lone-request rounds, clamped to bounds."""
    import threading

    from diffus_tpu.serve import _Pending

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(
        vol, geom, RenderConfig(attenuation_coeff=1e-4), batch_tiers=(1, 4),
        adaptive_window=True, coalesce_window_s=0.004,
        window_bounds_s=(0.001, 0.008),
    )
    s.warmup()
    assert s.snapshot_stats()["window_ms"] == 4.0
    # deterministic coalesced round: 3 queued requests drained by one
    # leader -> window grows 1.5x and every waiter gets its slice
    sc = s._get_scene("default")
    reqs = [
        _Pending(jnp.asarray(np.array([[8.0, 1.0 + i, 8.0]], np.float32)), sc)
        for i in range(3)
    ]
    with s._lock:
        s._queue.extend(reqs)
        s._dispatching = True
    s._drain()
    assert s.snapshot_stats()["window_ms"] == 6.0
    for r in reqs:
        assert r.event.is_set() and r.error is None
        assert np.asarray(r.result).shape == (1, 4, 8)
    # lone requests halve it down to the floor
    src = np.array([8.0, 1.0, 8.0], np.float32)
    s.render(src)
    assert s.snapshot_stats()["window_ms"] == 3.0
    for _ in range(3):
        s.render(src)
    assert s.snapshot_stats()["window_ms"] == 1.0  # clamped at min
    # ...and coalesced traffic is capped at the ceiling
    # (1.0 -> x1.5^6 = 11.4, clamped to 8)
    for _ in range(6):
        with s._lock:
            s._queue.extend(
                _Pending(jnp.asarray(np.array([[8.0, 1.0, 8.0]], np.float32)), sc)
                for _ in range(2)
            )
            s._dispatching = True
        s._drain()
    assert s.snapshot_stats()["window_ms"] == 8.0  # clamped at max
    with pytest.raises(ValueError, match="window_bounds"):
        RendererService(
            vol, geom, RenderConfig(attenuation_coeff=1e-4),
            adaptive_window=True, window_bounds_s=(0.01, 0.001),
        )


def test_service_recover_pose(svc):
    """End-to-end pose recovery through the service: target rendered at a
    known pose, multistart annealed descent recovers it (forward model =
    service config with interp='trilinear', canonical fan)."""
    import dataclasses

    from diffus_tpu.train.pose_recovery import AnnealedPoseConfig, render_pose
    from diffus_tpu.types import TransducerPose

    true = np.array([12.0, 1.5, 12.0], np.float32)
    cfg = AnnealedPoseConfig(
        geometry=svc.geometry,
        render=dataclasses.replace(svc.config, interp="trilinear"),
    )
    target = render_pose(svc.volume, TransducerPose.create(true), cfg.as_base())
    res = svc.recover_pose(
        np.asarray(target), true + np.array([0.9, -0.6, 0.7], np.float32),
        count=4, radius=1.0, rot_scale=0.0,
        phases=((1.0, 0.2, 0.0, 40), (0.0, 0.1, 0.0, 40)), seed=1,
    )
    best_err = np.linalg.norm(np.array(res["position"]) - true)
    assert best_err < 0.3
    assert res["final_loss"] < 1e-6
    errs = [
        np.linalg.norm(np.array(p) - true) for p in res["positions"]
    ]
    assert sum(e < 1.0 for e in errs) >= 2  # most starts recover
    assert len(res["final_losses"]) == 4
    assert svc.snapshot_stats()["recoveries"] >= 1
    # wrong target shape is a loud error
    with pytest.raises(ValueError, match="target frame shape"):
        svc.recover_pose(np.zeros((3, 3), np.float32), true)


def test_service_recover_pose_crop_coordinates():
    """crop=True recovery: clients pass and receive ORIGINAL-volume
    coordinates; the service translates across the crop box."""
    from diffus_tpu.train.pose_recovery import AnnealedPoseConfig, render_pose
    from diffus_tpu.types import TransducerPose
    import dataclasses

    full = np.zeros((32, 32, 32), np.float32)
    full[6:30, 4:28, 6:30] = brain_phantom_3d((24, 24, 24))
    geom = BeamGeometry(n_rays=8, num_samples=16, opening_angle=np.radians(40))
    s = RendererService(
        full, geom, RenderConfig(attenuation_coeff=1e-4), batch_tiers=(1, 4),
        crop=True, crop_margin=0,
    )
    assert s.volume.shape != (32, 32, 32)  # actually cropped
    true = np.array([18.0, 5.5, 18.0], np.float32)  # original coords
    cfg = AnnealedPoseConfig(
        geometry=geom, render=dataclasses.replace(s.config, interp="trilinear")
    )
    # forward model renders in CROPPED coordinates
    target = render_pose(
        s.volume,
        TransducerPose.create(jnp.asarray(true) - s._get_scene("default").offset),
        cfg.as_base(),
    )
    res = s.recover_pose(
        np.asarray(target), true + np.array([0.7, -0.4, 0.5], np.float32),
        count=2, radius=0.8, rot_scale=0.0,
        phases=((0.0, 0.15, 0.0, 50),), seed=3,
    )
    best_err = np.linalg.norm(np.array(res["position"]) - true)
    assert best_err < 0.5  # recovered in ORIGINAL coordinates


def test_service_recover_pose_divergence_is_loud():
    """A volume with zero-impedance regions has NaN reflection gradients;
    when every start diverges the service raises the actionable error
    instead of returning NaN poses."""
    vol = np.zeros((16, 16, 16), np.float32)
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(
        vol, geom, RenderConfig(attenuation_coeff=1e-4), batch_tiers=(1,),
    )
    target = np.zeros((4, 8), np.float32)
    with pytest.raises(ValueError, match="zero-impedance"):
        s.recover_pose(
            target, np.array([8.0, 1.0, 8.0], np.float32),
            count=2, radius=0.5, rot_scale=0.0,
            phases=((0.0, 0.1, 0.0, 5),), seed=0,
        )


def test_service_warmup_recovery(svc):
    """warmup_recovery precompiles-and-runs the recovery program without
    counting as a client request; the subsequent same-shape recover hits
    the jit cache (no retrace)."""
    import time as _time

    phases = ((0.0, 0.1, 0.0, 10),)
    before = svc.snapshot_stats()["recoveries"]
    spent = svc.warmup_recovery(count=2, phases=phases)
    assert spent > 0
    assert svc.snapshot_stats()["recoveries"] == before
    # a matching request is now cache-warm: much faster than the warmup
    target = np.zeros(
        (svc.geometry.n_rays, svc.geometry.num_samples), np.float32
    )
    t0 = _time.perf_counter()
    res = svc.recover_pose(
        target, np.array([12.0, 1.5, 12.0], np.float32),
        count=2, radius=0.5, rot_scale=0.0, phases=phases,
    )
    assert _time.perf_counter() - t0 < spent
    assert len(res["final_losses"]) == 2


def test_service_recover_pose_strips_artifacts():
    """An artifacts-configured service cannot thread a PRNG key through
    the recovery descent — the forward model strips artifacts (speckle
    is unlearnable noise for MSE) instead of erroring."""
    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(
        vol, geom, RenderConfig(attenuation_coeff=1e-4, artifacts=True),
        batch_tiers=(1,),
    )
    cfg = s._recovery_config()
    assert cfg.render.artifacts is False and cfg.render.interp == "trilinear"
    res = s.recover_pose(
        np.zeros((4, 8), np.float32), np.array([8.0, 1.0, 8.0], np.float32),
        count=2, radius=0.5, rot_scale=0.0, phases=((0.0, 0.1, 0.0, 4),),
    )
    assert np.all(np.isfinite(res["final_losses"]))


def test_service_latency_percentiles():
    """snapshot_stats surfaces per-kind request-latency percentiles with
    honest async semantics: device-array returns are 'dispatched'
    (handoff only), host-pulled coalesced results are 'pulled'."""
    import threading

    from diffus_tpu.serve import _Pending

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(
        vol, geom, RenderConfig(attenuation_coeff=1e-4), batch_tiers=(1, 4),
    )
    s.warmup()
    for i in range(3):
        s.render(np.array([8.0, 1.0 + i, 8.0], np.float32))
    st = s.snapshot_stats()
    assert st["latency_dispatched_ms"]["n"] == 3
    assert st["latency_dispatched_ms"]["p50_ms"] <= st["latency_dispatched_ms"]["max_ms"]
    assert "latency_pulled_ms" not in st  # nothing coalesced yet
    # coalesced round: waiters get host slices -> 'pulled' latencies.
    # (waiter latency is recorded by render(); drive two waiter threads
    # plus a manual leader so the drain coalesces deterministically)
    waiters = []
    with s._lock:
        s._dispatching = True  # hold the queue: arrivals become waiters
    for i in range(2):
        t = threading.Thread(
            target=s.render,
            args=(np.array([[8.0, 2.0 + i, 8.0]], np.float32),),
        )
        t.start()
        waiters.append(t)
    deadline = 50
    while deadline and len(s._queue) < 2:
        import time as _t
        _t.sleep(0.02)
        deadline -= 1
    assert len(s._queue) == 2
    s._drain()  # leader: one batch, one host pull
    for t in waiters:
        t.join()
    st = s.snapshot_stats()
    assert st["latency_pulled_ms"]["n"] == 2
    assert st["latency_pulled_ms"]["p95_ms"] >= st["latency_pulled_ms"]["p50_ms"]


def test_service_multi_scene_routing():
    """Named scene registry (VERDICT r4 #6): per-request routing hits
    the right resident case, the inventory reports staging, and
    per-scene stats count independently."""
    vol_a = brain_phantom_3d((16, 16, 16))
    # a structurally DIFFERENT case (reflection coefficients are
    # scale-invariant, so a scaled copy would render identically)
    vol_b = np.asarray(vol_a)[::-1].copy()
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol_a, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 4))
    s.add_scene("case_b", vol_b)
    s.warmup()  # both scenes share the compiled tier set (same shape)
    src = np.array([8.0, 1.0, 8.0], np.float32)
    f_a = np.asarray(s.render(src)[0])
    f_b = np.asarray(s.render(src, scene="case_b")[0])
    want_a = render_frame(jnp.asarray(vol_a), jnp.asarray(src), s.directions,
                          8, s.config)[3]
    want_b = render_frame(jnp.asarray(vol_b), jnp.asarray(src), s.directions,
                          8, s.config)[3]
    np.testing.assert_allclose(f_a, np.asarray(want_a), rtol=1e-6)
    np.testing.assert_allclose(f_b, np.asarray(want_b), rtol=1e-6)
    assert not np.allclose(f_a, f_b)  # cross-scene isolation
    inv = s.scenes()
    assert set(inv) == {"default", "case_b"}
    assert inv["case_b"]["shape"] == [16, 16, 16]
    assert inv["case_b"]["staged"] == "raw"  # under placement capacity
    st = s.snapshot_stats()
    assert st["scenes"]["default"]["frames"] == 1
    assert st["scenes"]["case_b"]["frames"] == 1
    with pytest.raises(KeyError, match="resident scenes"):
        s.render(src, scene="missing")


def test_service_multi_scene_coalescing_isolated():
    """Coalescing is keyed on the scene snapshot: interleaved queued
    requests for two scenes drain as per-scene batches (never one mixed
    dispatch), preserving FIFO within each scene."""
    from diffus_tpu.serve import _Pending

    vol_a = brain_phantom_3d((16, 16, 16))
    vol_b = np.asarray(vol_a) * 2.0
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol_a, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1, 4))
    s.add_scene("b", vol_b)
    s.warmup()
    src = np.array([8.0, 1.0, 8.0], np.float32)
    want_a = np.asarray(s.render(src)[0])
    want_b = np.asarray(s.render(src, scene="b")[0])
    base_batches = s.snapshot_stats()["batches"]
    sc_a = s._get_scene("default")
    sc_b = s._get_scene("b")
    reqs = [
        _Pending(jnp.asarray(src[None]), sc)
        for sc in (sc_a, sc_b, sc_a, sc_b)
    ]
    with s._lock:
        s._queue.extend(reqs)
        s._dispatching = True
    s._drain()
    for r, want in zip(reqs, (want_a, want_b, want_a, want_b)):
        assert r.event.is_set() and r.error is None
        np.testing.assert_allclose(
            np.asarray(r.result)[0], want, rtol=1e-6, atol=1e-7
        )
    # 4 interleaved requests, 2 scenes -> exactly 2 dispatched batches
    assert s.snapshot_stats()["batches"] == base_batches + 2


def test_service_update_volume_reshape():
    """Shape-changing update_volume: refused by default (compiled tiers),
    re-staged with allow_reshape=True (re-warm on next dispatch)."""
    vol = brain_phantom_3d((16, 16, 16))
    big = brain_phantom_3d((20, 20, 20))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1,))
    s.warmup()
    with pytest.raises(ValueError, match="allow_reshape"):
        s.update_volume(big)
    s.update_volume(big, allow_reshape=True)
    assert s.volume.shape == (20, 20, 20)
    s.warmup()  # re-warm compiles the new shape
    src = np.array([10.0, 1.0, 10.0], np.float32)
    got = np.asarray(s.render(src)[0])
    want = render_frame(jnp.asarray(big), jnp.asarray(src), s.directions,
                        8, s.config)[3]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)


def test_service_update_volume_reshape_recrops():
    """A cropped scene re-staged through allow_reshape recomputes the
    content box on the NEW volume (old box would be stale)."""
    full = np.zeros((28, 28, 28), np.float32)
    full[4:20, 4:20, 4:20] = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(full, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1,), crop=True, crop_margin=0)
    crop0 = s.volume.shape
    assert crop0 < (28, 28, 28)
    bigger = np.zeros((32, 32, 32), np.float32)
    bigger[2:26, 2:26, 2:26] = brain_phantom_3d((24, 24, 24))
    s.update_volume(bigger, allow_reshape=True)
    assert s.volume.shape != crop0
    # client coordinates remain in the NEW original frame
    src = np.array([14.0, 3.0, 14.0], np.float32)
    got = np.asarray(s.render(src)[0])
    sc = s._get_scene("default")
    want = render_frame(
        sc.volume, jnp.asarray(src) - sc.offset, s.directions, 8, s.config
    )[3]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)


def test_service_remove_scene():
    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1,))
    s.add_scene("b", np.asarray(vol) * 2.0)
    s.remove_scene("b")
    assert set(s.scenes()) == {"default"}
    with pytest.raises(KeyError, match="resident scenes"):
        s.remove_scene("b")
    with pytest.raises(ValueError, match="cannot be removed"):
        s.remove_scene("default")  # the constructor scene anchors the API
    # in-flight snapshots survive removal: a request holding the scene
    # object still renders (consistency contract)
    from diffus_tpu.serve import _Pending

    s.add_scene("c", np.asarray(vol) * 2.0)
    s.warmup()
    sc_c = s._get_scene("c")
    req = _Pending(jnp.asarray(np.array([[8.0, 1.0, 8.0]], np.float32)), sc_c)
    s.remove_scene("c")
    with s._lock:
        s._queue.append(req)
        s._dispatching = True
    s._drain()
    assert req.event.is_set() and req.error is None
    assert np.all(np.isfinite(np.asarray(req.result)))


def test_service_above_capacity_stages_host_tile3d(monkeypatch):
    """Above the placement capacity, an exact-trilinear scene stages the
    HOST-BUILT one-take f32 3D tile (1.66x over the 2-take tile at
    512^3, probe_host3d_r5) and renders identically to the raw path."""
    import diffus_tpu.serve as serve_mod
    from diffus_tpu.ops.sampling import Tile3dVolume

    vol = brain_phantom_3d((20, 20, 20))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear")
    want = np.asarray(
        RendererService(vol, geom, cfg, batch_tiers=(1,))
        .render(np.array([10.0, 1.0, 10.0], np.float32))[0]
    )
    # shrink the capacity so the 20^3 volume counts as "huge", and force
    # the TPU trace-time sampler resolution (CPU resolves to plain
    # trilinear, which skips the tile staging branch entirely)
    import diffus_tpu.render.renderer as rmod

    monkeypatch.setattr(serve_mod.RendererService, "_PLACEMENT_BYTES", 1_000)
    monkeypatch.setattr(
        rmod, "_resolve_sampler",
        lambda interp, n=0, step=1.0: "trilinear_tile"
        if interp == "trilinear" else interp,
    )
    s = RendererService(vol, geom, cfg, batch_tiers=(1,))
    sc = s._get_scene("default")
    assert isinstance(sc.staged, Tile3dVolume)
    assert sc.staged.table.dtype == jnp.float32  # exact mode
    assert s.scenes()["default"]["staged"] == "tile3d"
    got = np.asarray(s.render(np.array([10.0, 1.0, 10.0], np.float32))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# --- round 5 code-review fixes ----------------------------------------------


def test_service_above_capacity_explicit_tile3d_f32(monkeypatch):
    """The EXPLICIT exact one-take mode (interp='trilinear_tile3d_f32')
    must also get the above-capacity host-built staging — the in-XLA f32
    table build OOMs at 512^3 (code-review r5); parity with the
    under-capacity in-jit build is exact (the tables are bit-identical)."""
    import diffus_tpu.serve as serve_mod
    from diffus_tpu.ops.sampling import Tile3dVolume

    vol = brain_phantom_3d((20, 20, 20))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    cfg = RenderConfig(attenuation_coeff=1e-4, interp="trilinear_tile3d_f32")
    src = np.array([10.0, 1.0, 10.0], np.float32)
    want = np.asarray(
        RendererService(vol, geom, cfg, batch_tiers=(1,)).render(src)[0]
    )
    monkeypatch.setattr(serve_mod.RendererService, "_PLACEMENT_BYTES", 1_000)
    s = RendererService(vol, geom, cfg, batch_tiers=(1,))
    sc = s._get_scene("default")
    assert isinstance(sc.staged, Tile3dVolume)
    assert sc.staged.table.dtype == jnp.float32
    got = np.asarray(s.render(src)[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_remove_scene_drops_stats():
    """Evicting a scene drops its per-scene counters: /stats must not
    report ghost scenes, and a re-added namesake starts from zero
    (code-review r5)."""
    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(vol, geom, RenderConfig(attenuation_coeff=1e-4),
                        batch_tiers=(1,))
    s.add_scene("b", np.asarray(vol) * 2.0)
    src = np.array([8.0, 1.0, 8.0], np.float32)
    s.render(src, scene="b")
    assert s.snapshot_stats()["scenes"]["b"]["requests"] == 1
    s.remove_scene("b")
    assert "b" not in s.snapshot_stats()["scenes"]
    s.add_scene("b", np.asarray(vol) * 2.0)
    assert s.snapshot_stats()["scenes"]["b"]["requests"] == 0


def test_adaptive_window_ignores_scene_constrained_lone_rounds():
    """A lone drain round with DEFERRED other-scene work left is
    scene-constrained, not idle: the adaptive controller must not shrink
    on it, or interleaved multi-scene traffic collapses the window to the
    floor and same-scene singletons stop coalescing (code-review r5)."""
    from diffus_tpu.serve import _Pending

    vol = brain_phantom_3d((16, 16, 16))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    s = RendererService(
        vol, geom, RenderConfig(attenuation_coeff=1e-4), batch_tiers=(1, 4),
        adaptive_window=True, coalesce_window_s=0.004,
        window_bounds_s=(0.001, 0.008),
    )
    s.add_scene("b", np.asarray(vol) * 2.0)
    s.warmup()
    sc_a = s._get_scene("default")
    sc_b = s._get_scene("b")
    src = jnp.asarray(np.array([[8.0, 1.0, 8.0]], np.float32))
    reqs = [_Pending(src, sc_a), _Pending(src, sc_b)]
    with s._lock:
        s._queue.extend(reqs)
        s._dispatching = True
    s._drain()
    for r in reqs:
        assert r.event.is_set() and r.error is None
    # round 1 (scene A, lone, scene B deferred): NO shrink; round 2
    # (scene B, lone, queue empty): one genuine shrink.  The old
    # controller halved twice (4 -> 1 ms).
    assert s.snapshot_stats()["window_ms"] == 2.0


def test_add_scene_device_array_stays_on_device():
    """A device-resident volume added as a scene must not be pulled back
    to host during staging: np.asarray on a jax.Array round-trips the
    whole volume through the TPU relay (code-review r5)."""
    import jax

    import diffus_tpu.serve as serve_mod

    vol = brain_phantom_3d((12, 12, 12))
    geom = BeamGeometry(n_rays=4, num_samples=8)
    cfg = RenderConfig(attenuation_coeff=1e-4)
    s = RendererService(vol, geom, cfg, batch_tiers=(1,))
    dev_vol = jnp.asarray(vol, jnp.float32) * 1.5

    class GuardedNp:
        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def asarray(a, *args, **kw):
            assert not isinstance(a, jax.Array), (
                "staging pulled a device volume back to host"
            )
            return np.asarray(a, *args, **kw)

    orig_np = serve_mod.np
    serve_mod.np = GuardedNp()
    try:
        s.add_scene("dev", dev_vol)
    finally:
        serve_mod.np = orig_np
    src = np.array([6.0, 1.0, 6.0], np.float32)
    got = np.asarray(s.render(src, scene="dev")[0])
    want = render_frame(
        jnp.asarray(dev_vol, jnp.float32), jnp.asarray(src), s.directions,
        8, cfg,
    )[3]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)
