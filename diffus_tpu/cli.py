"""Command-line interface — every framework subsystem, headless.

The reference has no CLI (everything lives in notebook cells, SURVEY
section 5 "Config / flag system: none"); this module makes every
workflow reachable headlessly:

    python -m diffus_tpu.cli render  --volume case.nii.gz --out frame.npy
    python -m diffus_tpu.cli sweep   --volume case.nii.gz --poses 32 --gif sweep.gif
    python -m diffus_tpu.cli train-impedance --t1 t1.nii.gz --us us.npy ...
    python -m diffus_tpu.cli train-cases --manifest cases.json --epochs 3 ...
    python -m diffus_tpu.cli recover-pose    --volume case.nii.gz ...
    python -m diffus_tpu.cli serve   --volume case.nii.gz --port 8080
    python -m diffus_tpu.cli selftest

Volumes may be NIfTI files or .npy arrays; ``--impedance
table|mlp|none`` maps intensities through the tissue table, a TRAINED
MLP checkpoint (``--impedance-checkpoint``), or not at all.
``train-cases`` drives the multi-case production loop
(``train.driver.train_impedance_cases``: prefetching loader, device
mesh, checkpoints, JSONL metrics) from a JSON manifest; ``serve`` runs
the HTTP serving runtime (``serve.make_http_server``).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_volume(path: str):
    import os

    if not os.path.exists(path):
        raise SystemExit(f"error: volume file not found: {path}")
    if path.endswith(".npy"):
        data = np.load(path).astype(np.float32)
    else:
        from diffus_tpu.io import load_nifti

        data, _, _ = load_nifti(path)
    # real-world NIfTI is often 4D with a singleton time/channel axis
    while data.ndim > 3 and 1 in data.shape:
        data = np.squeeze(
            data, axis=int(np.argwhere(np.asarray(data.shape) == 1)[0][0])
        )
    if data.ndim != 3:
        raise SystemExit(
            f"error: volume {path!r} has shape {data.shape}; need 3D "
            "(or 4D with singleton axes)"
        )
    return data


def _maybe_impedance(vol, mode: str, checkpoint: str | None = None):
    import jax.numpy as jnp

    if mode == "none":
        return jnp.asarray(vol)
    if mode == "table":
        from diffus_tpu.impedance import default_table_points, tabular_impedance_volume

        tx, ty = default_table_points()
        return tabular_impedance_volume(jnp.asarray(vol), tx, ty)
    if mode == "mlp":
        # inference with a TRAINED impedance MLP: restore the params a
        # train-impedance / train-cases run checkpointed and map the
        # volume through the masked pipeline (mask -> zscore -> MLP -> Z)
        if not checkpoint:
            raise SystemExit("--impedance mlp requires --impedance-checkpoint")
        from diffus_tpu.impedance.mlp import impedance_volume_masked
        from diffus_tpu.train import load_checkpoint

        try:
            state = load_checkpoint(checkpoint)
            params = state["params"]
        except Exception as e:
            raise SystemExit(f"cannot restore checkpoint {checkpoint!r}: {e}")
        return impedance_volume_masked(params, jnp.asarray(vol))
    raise SystemExit(f"unknown --impedance mode {mode!r} (use: table, mlp, none)")


def _scene_args(p: argparse.ArgumentParser):
    p.add_argument("--volume", required=True, help="NIfTI or .npy volume")
    p.add_argument("--impedance", default="table", choices=["table", "mlp", "none"])
    p.add_argument("--impedance-checkpoint", default=None,
                   help="orbax dir with trained MLP params (for --impedance mlp)")
    p.add_argument("--source", type=float, nargs=3, default=[128.0, 4.0, 128.0])
    p.add_argument("--direction", type=float, nargs=2, default=[0.0, 1.0])
    p.add_argument("--angle", type=float, default=45.0, help="opening angle (deg)")
    p.add_argument("--rays", type=int, default=256)
    p.add_argument("--samples", type=int, default=512)
    p.add_argument("--attenuation", type=float, default=1e-4)
    p.add_argument("--start", type=float, default=0.0)
    p.add_argument("--artifacts", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pallas", action="store_true", help="use the Pallas kernel path")


def _build(args):
    import jax
    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry import fan_directions_2d

    vol = _maybe_impedance(
        _load_volume(args.volume), args.impedance,
        getattr(args, "impedance_checkpoint", None),
    )
    src = jnp.asarray(np.asarray(args.source, np.float32))
    dirs = fan_directions_2d(args.direction, np.radians(args.angle), args.rays)
    start = args.start if args.start < 1 else int(args.start)
    cfg = RenderConfig(
        attenuation_coeff=args.attenuation,
        start=start,
        artifacts=args.artifacts,
        use_pallas=args.pallas,
    )
    key = jax.random.PRNGKey(args.seed) if args.artifacts else None
    return vol, src, dirs, cfg, key


def cmd_render(args):
    from diffus_tpu.render import render_frame, render_bmode

    vol, src, dirs, cfg, key = _build(args)
    x, y, z, frame = render_frame(vol, src, dirs, args.samples, cfg, key)
    np.save(args.out, np.asarray(frame))
    print(f"wrote {args.out}: frame {frame.shape}")
    if args.image:
        img = render_bmode(vol, src, dirs, args.samples, cfg, key,
                           image_shape=(args.image_size, args.image_size))
        _save_png(np.asarray(img), args.image)
        print(f"wrote {args.image}")


def cmd_sweep(args):
    import jax

    from diffus_tpu.render import render_sweep

    vol, src, dirs, cfg, _ = _build(args)
    rng = np.random.default_rng(args.seed)
    sources = np.asarray(src)[None, :] + rng.uniform(
        -args.jitter, args.jitter, (args.poses, 3)
    ).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.poses) if args.artifacts else None
    x, y, z, frames = render_sweep(vol, sources, dirs, args.samples, cfg, keys)
    np.save(args.out, np.asarray(frames))
    print(f"wrote {args.out}: {frames.shape[0]} frames of {frames.shape[1:]}")
    if args.gif:
        from diffus_tpu.viz import render_video_frame, save_gif

        save_gif(render_video_frame([np.asarray(f).T for f in frames]), args.gif)
        print(f"wrote {args.gif}")


def cmd_train_impedance(args):
    import jax
    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry import fan_directions_2d
    from diffus_tpu.train import ImpedanceTrainConfig, train_impedance, save_checkpoint

    t1 = _load_volume(args.t1)
    target = np.load(args.us).astype(np.float32)
    dirs = fan_directions_2d(args.direction, np.radians(args.angle), args.rays)
    cfg = ImpedanceTrainConfig(
        num_samples=args.samples,
        slice_index=args.slice_index,
        epochs=args.epochs,
        lr=args.lr,
        loss=args.loss,
        image_shape=tuple(target.shape),
        render=RenderConfig(attenuation_coeff=args.attenuation, interp="trilinear"),
    )
    params, losses = train_impedance(
        jax.random.PRNGKey(args.seed), jnp.asarray(t1), target,
        jnp.asarray(np.asarray(args.source, np.float32)), dirs, cfg,
    )
    print(f"loss: {float(losses[0]):.6f} -> {float(losses[-1]):.6f}")
    if args.checkpoint:
        save_checkpoint(args.checkpoint, {"params": params, "epochs": np.int32(args.epochs)})
        print(f"wrote checkpoint {args.checkpoint}")


def cmd_recover_pose(args):
    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig, TransducerPose, BeamGeometry
    from diffus_tpu.train import PoseRecoveryConfig, render_pose, recover_pose

    vol = _maybe_impedance(
        _load_volume(args.volume), args.impedance,
        getattr(args, "impedance_checkpoint", None),
    )
    geom = BeamGeometry(n_rays=args.rays, num_samples=args.samples,
                        opening_angle=np.radians(args.angle))
    cfg = PoseRecoveryConfig(
        geometry=geom,
        render=RenderConfig(attenuation_coeff=args.attenuation, interp="trilinear"),
        lr=args.lr,
        steps=args.steps,
    )
    target = np.load(args.target) if args.target else np.asarray(
        render_pose(vol, TransducerPose.create(args.true_source), cfg)
    )
    if args.annealed:
        # the r4 production recipe: coarse-to-fine blur schedule +
        # per-group cosine Adam (single-phase Adam measurably diverges
        # on the 6-DoF chart — train/pose_recovery.py docstring)
        import jax

        from diffus_tpu.train.pose_recovery import (
            AnnealedPoseConfig,
            recover_pose_multistart_annealed,
            sample_init_poses,
        )

        acfg = AnnealedPoseConfig(geometry=geom, render=cfg.render)
        inits = sample_init_poses(
            jax.random.PRNGKey(args.seed), args.source, args.radius,
            args.rot_scale, max(args.starts, 1),
        )
        poses, all_losses, best = recover_pose_multistart_annealed(
            vol, jnp.asarray(target), inits, acfg
        )
        b = int(best)
        result = {
            "annealed": True,
            "starts": int(max(args.starts, 1)),
            "best": b,
            "loss_first": float(all_losses[b, 0]),
            "loss_last": float(all_losses[b, -1]),
            "position": [float(v) for v in np.asarray(poses.position[b])],
            "rotvec": [float(v) for v in np.asarray(poses.rotvec[b])],
        }
    elif args.starts > 1:
        # multistart: batched descents from random inits around --source
        # (the render-MSE landscape is multi-modal); best basin wins
        import jax

        from diffus_tpu.train import recover_pose_multistart, sample_init_poses

        inits = sample_init_poses(
            jax.random.PRNGKey(args.seed), args.source, args.radius,
            args.rot_scale, args.starts,
        )
        poses, all_losses, best = recover_pose_multistart(
            vol, jnp.asarray(target), inits, cfg
        )
        b = int(best)
        result = {
            "starts": args.starts,
            "best": b,
            "loss_first": float(all_losses[b, 0]),
            "loss_last": float(all_losses[b, -1]),
            "position": [float(v) for v in np.asarray(poses.position[b])],
            "rotvec": [float(v) for v in np.asarray(poses.rotvec[b])],
        }
    else:
        init = TransducerPose.create(args.source)
        pose, losses = recover_pose(vol, jnp.asarray(target), init, cfg)
        result = {
            "loss_first": float(losses[0]),
            "loss_last": float(losses[-1]),
            "position": [float(v) for v in np.asarray(pose.position)],
            "rotvec": [float(v) for v in np.asarray(pose.rotvec)],
        }
    print(json.dumps(result))


def cmd_train_cases(args):
    """Multi-case production training from a JSON manifest.

    Manifest: a list of case objects, each with ``t1`` (NIfTI/.npy path),
    ``target`` (.npy frame path), optional ``mask`` (.npy bool path,
    default all-true), ``source`` ([x, y, z]), and optional
    ``direction``/``angle``/``rays`` overriding the shared flags.
    """
    import jax
    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.geometry import fan_directions_2d
    from diffus_tpu.train import ImpedanceTrainConfig
    from diffus_tpu.train.driver import CaseSpec, train_impedance_cases

    with open(args.manifest) as fh:
        entries = json.load(fh)
    if not isinstance(entries, list) or not entries:
        raise SystemExit(f"manifest {args.manifest!r} must be a non-empty list")

    cases = []
    image_shape = None
    for e in entries:
        target = np.load(e["target"]).astype(np.float32)
        mask = (
            np.load(e["mask"]).astype(bool)
            if e.get("mask")
            else np.ones_like(target, dtype=bool)
        )
        dirs = fan_directions_2d(
            e.get("direction", args.direction),
            np.radians(e.get("angle", args.angle)),
            e.get("rays", args.rays),
        )
        t1 = e["t1"]
        if isinstance(t1, str) and t1.endswith(".npy"):
            t1 = np.load(t1).astype(np.float32)
        cases.append(
            CaseSpec(
                t1=t1,
                target=target,
                mask=mask,
                source=np.asarray(e["source"], np.float32),
                directions=np.asarray(dirs),
            )
        )
        image_shape = target.shape

    mesh = None
    if args.mesh_pose > 1 or args.mesh_ray > 1:
        from diffus_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_pose, args.mesh_ray)
    cfg = ImpedanceTrainConfig(
        num_samples=args.samples,
        slice_index=args.slice_index,
        lr=args.lr,
        loss=args.loss,
        image_shape=tuple(image_shape),
        render=RenderConfig(attenuation_coeff=args.attenuation, interp=args.interp),
    )
    params, history = train_impedance_cases(
        jax.random.PRNGKey(args.seed),
        cases,
        cfg,
        epochs=args.epochs,
        batch_size=args.batch_size,
        mesh=mesh,
        checkpoint_dir=args.checkpoint,
        metrics_path=args.metrics,
        loader_threads=args.threads,
        resume=args.resume,
    )
    print(
        json.dumps(
            {
                "cases": len(cases),
                "steps": len(history),
                "loss_first": history[0] if history else None,
                "loss_last": history[-1] if history else None,
            }
        )
    )


def cmd_serve(args):
    from diffus_tpu.types import RenderConfig, BeamGeometry
    from diffus_tpu.serve import RendererService, make_http_server

    vol = _maybe_impedance(
        _load_volume(args.volume), args.impedance,
        getattr(args, "impedance_checkpoint", None),
    )
    geom = BeamGeometry(
        n_rays=args.rays,
        num_samples=args.samples,
        opening_angle=float(np.radians(args.angle)),
    )
    cfg = RenderConfig(attenuation_coeff=args.attenuation, interp=args.interp)
    mesh = None
    if args.mesh_pose > 1 or args.mesh_ray > 1:
        from diffus_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_pose, args.mesh_ray)
    svc = RendererService(
        vol, geom, cfg,
        median_direction=args.direction,
        batch_tiers=tuple(args.tiers),
        mesh=mesh,
        crop=args.crop,
        adaptive_window=args.adaptive_window,
    )
    for spec in args.scene:
        name, _, path = spec.partition("=")
        if not name or not path:
            raise SystemExit(f"--scene wants NAME=PATH, got {spec!r}")
        svc.add_scene(
            name,
            _maybe_impedance(
                _load_volume(path), args.impedance,
                getattr(args, "impedance_checkpoint", None),
            ),
            crop=args.crop,
        )
    warm = svc.warmup()
    warm_rec = (
        svc.warmup_recovery(count=args.warmup_recovery)
        if args.warmup_recovery > 0
        else None
    )
    server = make_http_server(svc, host=args.host, port=args.port)
    status = {
        "listening": f"http://{args.host}:{server.server_address[1]}",
        "warmup_s": round(warm, 2),
        "tiers": list(svc.batch_tiers),
        "scenes": sorted(svc.scenes()),
    }
    if warm_rec is not None:
        status["warmup_recovery_s"] = round(warm_rec, 2)
    print(json.dumps(status), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


def cmd_selftest(args):
    """Small end-to-end smoke: phantom -> impedance -> render -> parity."""
    import jax.numpy as jnp

    from diffus_tpu.types import RenderConfig
    from diffus_tpu.phantoms import brain_phantom_3d
    from diffus_tpu.geometry import fan_directions_2d
    from diffus_tpu.render import render_frame
    from diffus_tpu.ops.reference_oracle import render_frame_dense

    vol = brain_phantom_3d((32, 32, 32))
    src = np.array([16.0, 1.0, 16.0], np.float32)
    dirs = fan_directions_2d([0.0, 1.0], np.radians(45.0), 8)
    _, _, _, got = render_frame(
        jnp.asarray(vol), jnp.asarray(src), dirs, 24, RenderConfig(attenuation_coeff=1e-4)
    )
    _, _, _, want = render_frame_dense(vol, src, np.asarray(dirs), 24, 1e-4, 0)
    err = float(np.max(np.abs(np.asarray(got) - want)) / (np.max(np.abs(want)) + 1e-12))
    ok = err < 1e-3
    print(json.dumps({"parity_max_rel_err": err, "ok": ok}))
    return 0 if ok else 1


def _save_png(img: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(path, img, cmap="gray")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="diffus_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("render", help="render one B-mode frame")
    _scene_args(p)
    p.add_argument("--out", default="frame.npy")
    p.add_argument("--image", default=None, help="also write a splatted PNG")
    p.add_argument("--image-size", type=int, default=256)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("sweep", help="batched multi-pose sweep")
    _scene_args(p)
    p.add_argument("--poses", type=int, default=16)
    p.add_argument("--jitter", type=float, default=8.0)
    p.add_argument("--out", default="sweep.npy")
    p.add_argument("--gif", default=None)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("train-impedance", help="fit the MRI->Z MLP through the renderer")
    p.add_argument("--t1", required=True)
    p.add_argument("--us", required=True, help=".npy target image")
    p.add_argument("--source", type=float, nargs=3, default=[128.0, 4.0, 128.0])
    p.add_argument("--direction", type=float, nargs=2, default=[0.0, 1.0])
    p.add_argument("--angle", type=float, default=45.0)
    p.add_argument("--rays", type=int, default=256)
    p.add_argument("--samples", type=int, default=512)
    p.add_argument("--attenuation", type=float, default=1e-4)
    p.add_argument("--slice-index", type=int, default=128)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--loss", default="ssim", choices=["ssim", "masked_mse_edge"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None)
    p.set_defaults(fn=cmd_train_impedance)

    p = sub.add_parser(
        "train-cases",
        help="multi-case production training (prefetch/mesh/checkpoint/metrics)",
    )
    p.add_argument("--manifest", required=True, help="JSON list of case specs")
    p.add_argument("--direction", type=float, nargs=2, default=[0.0, 1.0])
    p.add_argument("--angle", type=float, default=45.0)
    p.add_argument("--rays", type=int, default=256)
    p.add_argument("--samples", type=int, default=512)
    p.add_argument("--attenuation", type=float, default=1e-4)
    p.add_argument("--interp", default="nearest",
                   choices=["nearest", "trilinear", "trilinear_bf16"])
    p.add_argument("--slice-index", type=int, default=128)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--loss", default="masked_mse_edge",
                   choices=["ssim", "masked_mse_edge"])
    p.add_argument("--mesh-pose", type=int, default=1)
    p.add_argument("--mesh-ray", type=int, default=1)
    p.add_argument("--threads", type=int, default=0, help="loader threads")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train_cases)

    p = sub.add_parser("serve", help="HTTP serving runtime (RendererService)")
    p.add_argument("--volume", required=True)
    p.add_argument("--impedance", default="table", choices=["table", "mlp", "none"])
    p.add_argument("--impedance-checkpoint", default=None)
    p.add_argument("--direction", type=float, nargs=2, default=[0.0, 1.0])
    p.add_argument("--angle", type=float, default=45.0)
    p.add_argument("--rays", type=int, default=256)
    p.add_argument("--samples", type=int, default=512)
    p.add_argument("--attenuation", type=float, default=1e-4)
    p.add_argument("--interp", default="nearest",
                   choices=["nearest", "trilinear", "trilinear_bf16"])
    p.add_argument("--tiers", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--mesh-pose", type=int, default=1,
                   help=">1: serve over a (pose, ray) device mesh")
    p.add_argument("--mesh-ray", type=int, default=1)
    p.add_argument("--crop", action="store_true",
                   help="content-crop the volume at startup (6-9x for big "
                        "scans with air margins; client coordinates "
                        "unchanged)")
    p.add_argument("--adaptive-window", action="store_true",
                   help="self-tune the request-coalescing straggler window "
                        "(lone clients shed the latency tax, bursty fleets "
                        "coalesce harder)")
    p.add_argument("--warmup-recovery", type=int, default=0, metavar="COUNT",
                   help="precompile the /recover pose-recovery program for "
                        "COUNT multistart descents at startup (first client "
                        "call is cache-warm)")
    p.add_argument("--scene", action="append", default=[], metavar="NAME=PATH",
                   help="stage an additional resident case (repeatable; the "
                        "--volume case is scene 'default').  Requests route "
                        "per scene: POST /render {\"scene\": NAME, ...}")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("recover-pose", help="6-DoF pose recovery by gradient descent")
    p.add_argument("--volume", required=True)
    p.add_argument("--impedance", default="table", choices=["table", "mlp", "none"])
    p.add_argument("--impedance-checkpoint", default=None)
    p.add_argument("--target", default=None, help=".npy target frame (else rendered from --true-source)")
    p.add_argument("--true-source", type=float, nargs=3, default=[128.0, 4.0, 128.0])
    p.add_argument("--source", type=float, nargs=3, required=True, help="initial guess")
    p.add_argument("--angle", type=float, default=45.0)
    p.add_argument("--rays", type=int, default=64)
    p.add_argument("--samples", type=int, default=128)
    p.add_argument("--attenuation", type=float, default=1e-4)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--starts", type=int, default=1,
                   help=">1: multistart descents from random inits")
    p.add_argument("--radius", type=float, default=4.0,
                   help="multistart position-init ball (voxels)")
    p.add_argument("--rot-scale", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--annealed", action="store_true",
                   help="coarse-to-fine multistart recovery (the robust "
                        "r4 recipe; uses --starts/--radius/--rot-scale)")
    p.set_defaults(fn=cmd_recover_pose)

    p = sub.add_parser("selftest", help="end-to-end parity smoke test")
    p.set_defaults(fn=cmd_selftest)

    args = parser.parse_args(argv)
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
