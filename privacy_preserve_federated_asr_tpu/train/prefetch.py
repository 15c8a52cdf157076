"""Host->device input prefetch for the training loop.

The jitted step is dispatched asynchronously, but building a
:class:`~privacy_preserve_federated_asr_tpu.train.steps.DeviceBatch`
(host padding copies + the H2D transfer started by ``jnp.asarray``) runs on
the loop thread and serializes with the step dispatch. A small daemon
thread staging ``depth`` batches ahead overlaps that host work and the
transfer with device compute — the standard JAX input-pipeline pattern
(equivalent role to the reference's HF DataLoader worker processes,
dataloader_num_workers, which this framework otherwise has no need for).

Both generators release their worker thread when the consumer abandons
them early (exception or break): the worker checks a stop flag around every
bounded put, so no staged device buffers stay pinned by a blocked thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

from ..data.collate import Batch
from .steps import DeviceBatch

_END = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def _producer_consumer(items: Iterable, depth: int, stage: Callable) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in items:
                if not _put((stage(item),)):
                    return  # consumer gone: drop staged work, exit
            _put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            _put(_Failure(e))

    threading.Thread(target=worker, daemon=True, name="prefetch").start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, _Failure):
                raise item.exc
            yield item[0]
    finally:
        stop.set()  # unblock the worker if the consumer leaves early


def prefetch_iter(items: Iterable, depth: int = 1) -> Iterator:
    """Generic producer thread: evaluate ``items`` up to ``depth`` elements
    ahead of the consumer (used by the federated engine to overlap host-side
    round building with the previous round's device execution).
    ``depth <= 0`` degenerates to plain iteration."""
    if depth <= 0:
        yield from items
        return
    yield from _producer_consumer(items, depth, lambda x: x)


def prefetch_device_batches(
    batches: Iterable[Batch], depth: int = 2, sharding=None
) -> Iterator[tuple[Batch, DeviceBatch]]:
    """Yield ``(host_batch, device_batch)`` with up to ``depth`` device
    batches staged ahead of the consumer. ``depth <= 0`` disables the
    thread (synchronous staging, identical semantics). ``sharding``
    (a jax.sharding.Sharding) places every leaf — e.g. batch-dim sharding
    over a "data" mesh for data-parallel training."""

    def stage(b: Batch) -> tuple[Batch, DeviceBatch]:
        db = DeviceBatch.from_host(b)
        if sharding is not None:
            import jax

            db = jax.device_put(db, sharding)
        return b, db

    if depth <= 0:
        for b in batches:
            yield stage(b)
        return
    yield from _producer_consumer(batches, depth, stage)
