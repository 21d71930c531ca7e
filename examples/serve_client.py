"""End-to-end serving demo: spin up the HTTP runtime, drive it as a client.

Starts a RendererService on a phantom volume, serves it over HTTP on an
ephemeral port, renders a pose batch through the wire protocol, swaps
the volume, and prints latency + stats — the whole serving surface in
one script.

    JAX_PLATFORMS=cpu python examples/serve_client.py --size 48
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np


def post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.load(r)


def decode_frames(payload: dict) -> np.ndarray:
    return np.load(io.BytesIO(base64.b64decode(payload["npy_b64"])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--rays", type=int, default=64)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--interp", default="nearest",
                    choices=["nearest", "trilinear", "trilinear_bf16"])
    args = ap.parse_args()

    from diffus_tpu.phantoms import brain_phantom_3d, t1_phantom_3d
    from diffus_tpu.serve import RendererService, make_http_server
    from diffus_tpu.types import BeamGeometry, RenderConfig

    d = args.size
    svc = RendererService(
        brain_phantom_3d((d, d, d)),
        BeamGeometry(n_rays=args.rays, num_samples=args.samples),
        RenderConfig(attenuation_coeff=1e-4, interp=args.interp),
        batch_tiers=(1, 4),
    )
    warm = svc.warmup()
    server = make_http_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    print(f"serving at {url} (warmup {warm:.2f}s)")

    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        assert json.load(r)["ok"]

    rng = np.random.default_rng(0)
    sources = (
        np.array([d / 2, 2.0, d / 2], np.float32)[None]
        + rng.uniform(-3, 3, (4, 3)).astype(np.float32)
    )
    t0 = time.perf_counter()
    frames = decode_frames(post(f"{url}/render", {"sources": sources.tolist()}))
    ms = (time.perf_counter() - t0) * 1e3
    print(f"rendered {frames.shape} over the wire in {ms:.1f} ms")

    # pose recovery over the wire: where was this frame taken from?
    # (run against the impedance-like brain phantom — a volume with
    # zero-impedance regions has NaN reflection GRADIENTS and /recover
    # would refuse with a pointer to the impedance mapping)
    from diffus_tpu.train.pose_recovery import AnnealedPoseConfig, render_pose
    from diffus_tpu.types import TransducerPose
    import dataclasses

    true = np.array([d / 2, 2.0, d / 2], np.float32)
    cfg = AnnealedPoseConfig(
        geometry=svc.geometry,
        render=dataclasses.replace(svc.config, interp="trilinear"),
    )
    target = render_pose(svc.volume, TransducerPose.create(true), cfg.as_base())
    buf = io.BytesIO()
    np.save(buf, np.asarray(target))
    t0 = time.perf_counter()
    rec = post(f"{url}/recover", {
        "target_npy_b64": base64.b64encode(buf.getvalue()).decode(),
        "init_position": (true + [1.0, -0.5, 0.8]).tolist(),
        "count": 4, "radius": 1.0, "rot_scale": 0.0,
        "phases": [[1.0, 0.2, 0.0, 60], [0.0, 0.1, 0.0, 90]],
    })
    err = float(np.linalg.norm(np.array(rec["position"]) - true))
    print(f"recovered pose over the wire in "
          f"{time.perf_counter() - t0:.1f}s: {rec['position']} "
          f"(err {err:.3f} vox, loss {rec['final_loss']:.2e})")

    # case swap: new volume, no recompile, renders change
    buf = io.BytesIO()
    np.save(buf, t1_phantom_3d((d, d, d)))
    post(f"{url}/update_volume",
         {"npy_b64": base64.b64encode(buf.getvalue()).decode()})
    frames2 = decode_frames(post(f"{url}/render", {"sources": sources.tolist()}))
    changed = not np.allclose(frames, frames2)
    print(f"volume swapped; frames changed: {changed}")

    # multi-scene: stage a second resident case over the wire (the
    # reference's per-case REUBEN workflow) and route requests to it
    buf = io.BytesIO()
    np.save(buf, np.roll(np.asarray(svc.volume), d // 4, axis=1))
    post(f"{url}/add_scene",
         {"name": "case_b", "npy_b64": base64.b64encode(buf.getvalue()).decode()})
    with urllib.request.urlopen(f"{url}/scenes", timeout=30) as r:
        print("resident scenes:", json.load(r))
    frames_b = decode_frames(post(
        f"{url}/render", {"sources": sources.tolist(), "scene": "case_b"}
    ))
    print(f"scene routing works: case_b frames differ: "
          f"{not np.allclose(frames2, frames_b)}")
    post(f"{url}/remove_scene", {"name": "case_b"})

    with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
        print("stats:", json.load(r))
    server.shutdown()
    server.server_close()
    print("serve client demo OK")


if __name__ == "__main__":
    main()
