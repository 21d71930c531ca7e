"""Multi-case training driver: the production loop around the step fn.

The reference trains one case per notebook run, loading it eagerly and
looping epochs in Python (``[DEMO] Train MRI to Impedance MLP - GPU``
cell 16-18).  A fleet-scale training run needs the glue this module
provides: stream T1 volumes from disk through the prefetching native
loader (decode overlapped with compute), shard each scene batch over a
``(pose, ray)`` device mesh, run the GSPMD data-parallel step, and
checkpoint + log along the way — one call.

    epochs x [VolumePrefetcher -> shard_batch -> make_sharded_train_step]
             + orbax checkpoints + JSONL metrics
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffus_tpu.train.impedance_train import ImpedanceTrainConfig
from diffus_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from diffus_tpu.train.metrics import MetricsLogger
from diffus_tpu.impedance.mlp import init_params

# NOTE: diffus_tpu.parallel is imported lazily inside train_impedance_cases:
# parallel.shard uses train.losses, so a module-level import here would
# close an import cycle whenever diffus_tpu.parallel is imported first.


@dataclasses.dataclass(frozen=True)
class CaseSpec:
    """One training scene: a T1 volume source plus its render target.

    ``t1`` is a NIfTI path (streamed through the native loader) or an
    in-memory array.  ``target``/``mask`` are frame-shaped
    ``(rays, samples')`` arrays; ``source`` ``(3,)``; ``directions``
    ``(rays, 3)``.
    """

    t1: object
    target: np.ndarray
    mask: np.ndarray
    source: np.ndarray
    directions: np.ndarray


def _case_batches(cases: Sequence[CaseSpec], batch_size: int, threads: int):
    """Yield stacked (t1, targets, masks, sources, directions) batches,
    prefetching path-backed volumes through the native pipeline."""
    from diffus_tpu.io.pipeline import VolumePrefetcher, batched

    path_cases = [c for c in cases if isinstance(c.t1, str)]
    if len(path_cases) not in (0, len(cases)):
        raise ValueError("mix of path-backed and in-memory cases is not supported")

    groups = [list(cases[i:i + batch_size]) for i in range(0, len(cases), batch_size)]

    def stack_rest(group):
        return (
            jnp.asarray(np.stack([np.asarray(c.target, np.float32) for c in group])),
            jnp.asarray(np.stack([np.asarray(c.mask) for c in group])),
            jnp.asarray(np.stack([np.asarray(c.source, np.float32) for c in group])),
            jnp.asarray(np.stack([np.asarray(c.directions, np.float32) for c in group])),
        )

    if not path_cases:
        for group in groups:
            t1 = jnp.asarray(np.stack([np.asarray(c.t1, np.float32) for c in group]))
            yield (t1,) + stack_rest(group)
        return

    # to_device=False: shard_batch places each batch directly onto the
    # mesh — staging to device 0 first would double the H2D transfer
    with VolumePrefetcher(
        batched([c.t1 for c in cases], batch_size), threads=threads,
        to_device=False,
    ) as pf:
        for group, (stack, _, _) in zip(groups, pf):
            yield (jnp.asarray(stack),) + stack_rest(group)


def train_impedance_cases(
    key,
    cases: Sequence[CaseSpec],
    cfg: ImpedanceTrainConfig = ImpedanceTrainConfig(),
    epochs: int = 1,
    batch_size: int = 4,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    metrics_path: Optional[str] = None,
    loader_threads: int = 0,
    resume: bool = False,
):
    """Train the impedance MLP over many cases, data-parallel.

    Args:
      cases: the training set (see :class:`CaseSpec`); ``len(cases)``
        and ``batch_size`` must both divide cleanly onto the mesh's
        ``pose`` axis per batch (``parallel.shard.shard_batch`` raises
        otherwise — resize rather than silently padding scenes).
      mesh: ``(pose, ray)`` device mesh; default is the trivial 1x1 mesh
        (single device; the same code path end to end).
      checkpoint_dir: when set, saves ``{params, opt_state, epoch}``
        every ``checkpoint_every`` epochs; ``resume=True`` restores and
        continues from the stored epoch.
      metrics_path: JSONL metrics (one line per batch step).
    Returns:
      ``(params, history)`` — final params and the per-step loss list.
    """
    from diffus_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch

    if mesh is None:
        mesh = make_mesh(1, 1, jax.devices()[:1])
    pose_m = mesh.shape["pose"]
    if len(cases) % batch_size or batch_size % pose_m:
        # fail BEFORE an epoch of compute, not at the trailing batch:
        # shard_batch refuses non-divisible scene counts, and a ragged
        # remainder would also force a second jit program per shape
        raise ValueError(
            f"len(cases)={len(cases)} must divide into batch_size={batch_size} "
            f"batches that divide the mesh pose axis ({pose_m})"
        )
    step_fn, init_opt = make_sharded_train_step(mesh, cfg, lr=cfg.lr)
    params = init_params(key, hidden=cfg.hidden)
    opt_state = init_opt(params)
    start_epoch = 0
    if resume and checkpoint_dir and os.path.exists(os.path.abspath(checkpoint_dir)):
        state = load_checkpoint(
            checkpoint_dir,
            template={"params": params, "opt_state": opt_state, "epoch": 0},
        )
        params, opt_state = state["params"], state["opt_state"]
        start_epoch = int(state["epoch"])

    history = []  # device scalars during the loop: float() per step would
    # force a host sync and serialize dispatch against the prefetcher
    step = start_epoch * (len(cases) // batch_size)
    last_saved = start_epoch
    with MetricsLogger(metrics_path) as log, mesh:
        for epoch in range(start_epoch, epochs):
            for batch in _case_batches(cases, batch_size, loader_threads):
                # ssim targets are splatted images: rays stay replicated
                # (the splat couples them); frame losses shard rays too
                batch = shard_batch(mesh, batch, shard_rays=cfg.loss != "ssim")
                params, opt_state, loss = step_fn(params, opt_state, batch)
                history.append(loss)
                if metrics_path is not None:
                    # per-step observability costs one host sync per batch
                    log.log(step, epoch=epoch, loss=float(loss))
                step += 1
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_checkpoint(
                    checkpoint_dir,
                    {"params": params, "opt_state": opt_state, "epoch": epoch + 1},
                )
                last_saved = epoch + 1
        if checkpoint_dir and last_saved != epochs and epochs > start_epoch:
            # the final epoch must never exist only in memory
            save_checkpoint(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state, "epoch": epochs},
            )
    return params, [float(l) for l in history]
