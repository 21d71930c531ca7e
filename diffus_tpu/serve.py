"""Serving runtime: a persistent renderer for production deployment.

The functional API (``render_frame``/``render_sweep``) recompiles per
shape and re-stages inputs per call; a serving deployment wants a
long-lived object that (a) keeps the impedance volume resident in HBM,
(b) precompiles the render for a fixed set of batch sizes, and
(c) pads incoming pose batches to the nearest compiled size so arbitrary
request sizes hit the jit cache.  That is what :class:`RendererService`
provides — the runtime shell around the compute path (the reference has
no serving story; everything is notebook cells).
"""

from __future__ import annotations

import threading
import time
from typing import Sequence

import jax
import jax.numpy as jnp

from diffus_tpu.types import RenderConfig, BeamGeometry
from diffus_tpu.render.renderer import render_sweep
from diffus_tpu.geometry.fan import fan_directions_2d


class RendererService:
    """Long-lived B-mode renderer bound to one volume + beam geometry.

    Example::

        svc = RendererService(z_volume, BeamGeometry(n_rays=256,
                              num_samples=512),
                              RenderConfig(attenuation_coeff=1e-4))
        svc.warmup()                       # compile the batch tiers
        frames = svc.render(sources)       # (P, 3) -> (P, rays, depth)

    Thread safety: ``render``, ``update_volume`` and ``snapshot_stats``
    may be called from multiple threads.  A single lock serializes the
    volume-reference read, the dispatch, and the stats update — a
    concurrent ``update_volume`` can therefore never swap the volume out
    from under a half-dispatched batch, and stats counters cannot be
    lost to read-modify-write races.  (Dispatches themselves already
    serialize on the device queue, so the lock adds no throughput cost.)
    """

    def __init__(
        self,
        volume,
        geometry: BeamGeometry = BeamGeometry(),
        config: RenderConfig = RenderConfig(attenuation_coeff=1e-4),
        median_direction=(0.0, 1.0),
        batch_tiers: Sequence[int] = (1, 8, 32),
        device=None,
        mesh=None,
    ):
        self.geometry = geometry
        self.config = config
        self._mesh = mesh
        self.batch_tiers = tuple(sorted(set(int(b) for b in batch_tiers)))
        if not self.batch_tiers:
            raise ValueError("need at least one batch tier")
        self._device = device or jax.devices()[0]
        # stage the scene once: volume + fan directions live on-device
        self.volume = jax.device_put(jnp.asarray(volume, jnp.float32), self._device)
        self.directions = jax.device_put(
            fan_directions_2d(
                median_direction, geometry.opening_angle, geometry.n_rays
            ),
            self._device,
        )
        step = float(geometry.step)
        if mesh is None:
            self._fn = jax.jit(
                lambda v, s, d: render_sweep(
                    v, s, d, self.geometry.num_samples, self.config, step=step
                )[3]
            )
        else:
            # multi-chip serving: poses shard over the mesh's `pose` axis
            # and rays over `ray` (GSPMD inserts the collectives); padded
            # tiers keep the compiled-shape set small exactly as on one
            # chip.  Ray-coupling configs with a non-divisible ray count
            # fail here, at construction, not per request.
            from diffus_tpu.parallel.shard import sharded_render_sweep

            ray_m = mesh.shape.get("ray", 1)
            if geometry.n_rays % ray_m and (
                config.start_index(geometry.num_samples) > 0 or config.artifacts
            ):
                raise ValueError(
                    f"n_rays={geometry.n_rays} does not divide the mesh ray "
                    f"axis ({ray_m}) and the config couples rays; use a "
                    "divisible ray count for meshed serving"
                )
            self._fn = lambda v, s, d: sharded_render_sweep(
                mesh, v, s, d, self.geometry.num_samples, self.config, step=step
            )[3]
        self.stats = {"requests": 0, "frames": 0, "padded_frames": 0}
        self._lock = threading.Lock()
        # trilinear modes gather from a prebuilt overlapped-tile table:
        # prepare it ONCE here so no dispatch ever pays the build
        self._staged = self._prepare(self.volume)

    def _prepare(self, volume):
        from diffus_tpu.render.renderer import _resolve_sampler

        resolved = _resolve_sampler(self.config.interp)
        if resolved == "trilinear_tile":
            from diffus_tpu.ops.sampling import prepare_tile_volume

            return jax.jit(prepare_tile_volume)(volume)
        if resolved == "trilinear_tile3d_bf16":
            from diffus_tpu.ops.sampling import prepare_tile3d_volume

            return jax.jit(prepare_tile3d_volume)(volume)
        return volume

    def _tier(self, n: int) -> int:
        for b in self.batch_tiers:
            if n <= b:
                return b
        return self.batch_tiers[-1]

    def warmup(self) -> float:
        """Compile every batch tier; returns seconds spent."""
        t0 = time.perf_counter()
        dummy = jnp.zeros((1, 3), jnp.float32)
        for b in self.batch_tiers:
            src = jnp.broadcast_to(dummy, (b, 3))
            self._fn(self._staged, src, self.directions).block_until_ready()
        return time.perf_counter() - t0

    def render(self, sources) -> jax.Array:
        """Render a batch of poses.

        Args:
          sources: ``(P, 3)`` apex positions (any P).
        Returns:
          ``(P, n_rays, num_samples - start)`` frames.
        """
        sources = jnp.asarray(sources, jnp.float32)
        if sources.ndim == 1:
            sources = sources[None]
        p = sources.shape[0]
        if p == 0:
            depth = self.geometry.num_samples - self.config.start_index(
                self.geometry.num_samples
            )
            return jnp.zeros((0, self.geometry.n_rays, depth), jnp.float32)
        out = []
        offset = 0
        max_tier = self.batch_tiers[-1]
        with self._lock:
            volume = self._staged  # one volume for the WHOLE request
            while offset < p:
                n = min(p - offset, max_tier)
                tier = self._tier(n)
                chunk = sources[offset : offset + n]
                if n < tier:
                    chunk = jnp.concatenate(
                        [chunk, jnp.broadcast_to(chunk[-1:], (tier - n, 3))]
                    )
                    self.stats["padded_frames"] += tier - n
                frames = self._fn(volume, chunk, self.directions)
                out.append(frames[:n])
                offset += n
            self.stats["requests"] += 1
            self.stats["frames"] += int(p)
        return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]

    def snapshot_stats(self) -> dict:
        """Consistent copy of the request counters."""
        with self._lock:
            return dict(self.stats)

    def update_volume(self, volume) -> None:
        """Swap the resident volume (e.g. new case) without recompiling —
        shapes must match the staged volume."""
        new = jnp.asarray(volume, jnp.float32)
        if new.shape != self.volume.shape:
            raise ValueError(
                f"volume shape {new.shape} != staged {self.volume.shape}; "
                "build a new service for a different shape"
            )
        staged = jax.device_put(new, self._device)
        prepared = self._prepare(staged)
        with self._lock:
            self.volume = staged
            self._staged = prepared


def make_http_server(service: RendererService, host: str = "127.0.0.1",
                     port: int = 8080, max_body_bytes: int = 1 << 30):
    """Minimal stdlib HTTP front-end for :class:`RendererService`.

    Endpoints (JSON):
      GET  /healthz            -> {"ok": true}
      GET  /stats              -> request counters
      POST /render {"sources": [[x,y,z], ...]}
           -> {"shape": [...], "dtype": "float32", "npy_b64": "..."}
              (frames as a base64 .npy payload — lossless and compact;
              decode with ``np.load(io.BytesIO(base64.b64decode(s)))``)
      POST /update_volume {"npy_b64": "..."}   (same-shape volume swap:
           new case without recompiling; tables re-staged)

    Returns a ``ThreadingHTTPServer`` (call ``serve_forever()``; the
    service's internal lock makes concurrent handler threads safe).
    Bodies above ``max_body_bytes`` (default 1 GiB — covers a 512^3 f32
    volume as base64) are rejected with 413 before being read.  The
    endpoint is unauthenticated: deploy behind a trusted network or an
    authenticating proxy.
    """
    import base64
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: metrics go through /stats
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, service.snapshot_stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    self._send(413, {"error": f"body {n} bytes > limit {max_body_bytes}"})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/render":
                    sources = np.asarray(req["sources"], np.float32)
                    frames = np.asarray(service.render(sources))
                    buf = io.BytesIO()
                    np.save(buf, frames)
                    self._send(
                        200,
                        {
                            "shape": list(frames.shape),
                            "dtype": str(frames.dtype),
                            "npy_b64": base64.b64encode(buf.getvalue()).decode(),
                        },
                    )
                elif self.path == "/update_volume":
                    new = np.load(io.BytesIO(base64.b64decode(req["npy_b64"])))
                    service.update_volume(new)
                    self._send(200, {"ok": True, "shape": list(new.shape)})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # surface bad requests, don't kill the server
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
