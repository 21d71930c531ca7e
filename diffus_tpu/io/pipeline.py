"""Training input pipeline: prefetched, device-resident volume batches.

The reference loads each case eagerly through nibabel inside the
training notebook (``src/datatype.py:30``, ``[DEMO] REUBEN DATA``
cell 3) — decode stalls sit on the training critical path.  At
production scale (hundreds of 256^3 cases per epoch) the input pipeline
must overlap host-side decode with device compute.  This module does
that natively: a background thread drives the C++ multithreaded batch
decoder (``io.native.load_nifti_batch``) and stages each batch onto the
device (``jax.device_put``) while the accelerator trains on the previous
one, with a bounded queue for backpressure.

Typical use::

    with VolumePrefetcher(batched(paths, 8), threads=8) as pf:
        for volumes, affine, spacing in pf:   # device-resident stacks
            params, opt_state, loss = step(params, opt_state, volumes)
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Iterable, Iterator, Sequence

def batched(paths: Sequence[str], batch_size: int, drop_remainder: bool = False):
    """Split a path list into consecutive batches (the native batch
    decoder requires equally-shaped files within one batch; a trailing
    short batch is kept unless ``drop_remainder``)."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    out = [list(paths[i:i + batch_size]) for i in range(0, len(paths), batch_size)]
    if drop_remainder and out and len(out[-1]) != batch_size:
        out.pop()
    return out


def _loader_put(q: queue.Queue, stop: threading.Event, item) -> bool:
    """Bounded put with stop polling so close()/finalization can't
    deadlock against a full queue."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


def _loader_main(batches, q, stop, done, threads, device, to_device):
    try:
        from diffus_tpu.io.native import load_nifti_batch

        for paths in batches:
            if stop.is_set():
                return
            try:
                stack, affine, spacing = load_nifti_batch(paths, threads=threads)
                if to_device:
                    import jax

                    dev = device or jax.devices()[0]
                    stack = jax.device_put(stack, dev)
                item = (stack, affine, spacing)
            except BaseException as e:  # surfaced to the consumer
                item = e
            _loader_put(q, stop, item)
            if isinstance(item, BaseException):
                return
        _loader_put(q, stop, done)
    except BaseException as e:
        # anything that escapes the loop itself (import failure, queue
        # trouble) must still reach the consumer — a silent worker death
        # would hang __iter__ forever
        _loader_put(q, stop, e)


class VolumePrefetcher:
    """Background-thread NIfTI batch loader with device staging.

    Iterates ``(stack, affine, spacing)`` per path-batch: ``stack`` is a
    device-committed ``(B, *dims)`` float32 array (``jax.device_put``
    runs on the loader thread, so the H2D transfer overlaps training),
    ``affine``/``spacing`` are the first file's metadata (all files in a
    batch must share one shape — enforced by the native decoder's
    status -6 contract).

    Args:
      path_batches: iterable of path lists (see :func:`batched`).
      prefetch: queue depth — how many decoded+staged batches may wait
        ahead of the consumer (2 hides decode under compute without
        hoarding HBM).
      threads: decoder threads per batch (0 = one per file, capped by
        CPU count).
      device: target device (default: first ``jax.devices()``).
      to_device: set False to yield host numpy stacks instead.

    Exceptions raised by the loader thread (bad file, shape mismatch)
    re-raise in the consumer on the iteration where they occurred, in
    order.  Use as a context manager (or fully drain) so the thread is
    joined.
    """

    _DONE = object()

    def __init__(
        self,
        path_batches: Iterable[Sequence[str]],
        prefetch: int = 2,
        threads: int = 0,
        device=None,
        to_device: bool = True,
    ):
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
        self._batches = list(path_batches)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        # The worker is a module-level function over shared state, NOT a
        # bound method: a Thread(target=self._run) would keep `self`
        # alive forever, so a consumer that abandons iteration without
        # close() would leak the thread (and the decoded, possibly
        # HBM-resident batch it pins).  With no self-reference the
        # abandoned prefetcher is collected and the finalizer stops the
        # thread.
        self._worker = threading.Thread(
            target=_loader_main,
            args=(self._batches, self._q, self._stop, self._DONE,
                  threads, device, to_device),
            daemon=True,
        )
        self._worker.start()
        self._finalizer = weakref.finalize(self, self._stop.set)

    def __iter__(self) -> Iterator:
        while True:
            try:
                item = self._q.get(timeout=1.0)
            except queue.Empty:
                if not self._worker.is_alive():
                    raise RuntimeError(
                        "VolumePrefetcher loader thread died without "
                        "reporting a result"
                    ) from None
                continue
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self):
        """Stop the loader thread and drop queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._worker.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def iterate_cases(paths: Sequence[str], batch_size: int = 4, **kwargs):
    """One-call convenience: yield prefetched device batches over
    ``paths`` (see :class:`VolumePrefetcher`)."""
    with VolumePrefetcher(batched(paths, batch_size), **kwargs) as pf:
        yield from pf
