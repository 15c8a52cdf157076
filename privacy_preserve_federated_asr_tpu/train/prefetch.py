"""Host->device input prefetch for the training loop.

The jitted step is dispatched asynchronously, but building a
:class:`~privacy_preserve_federated_asr_tpu.train.steps.DeviceBatch`
(host padding copies + the H2D transfer started by ``jnp.asarray``) runs on
the loop thread and serializes with the step dispatch. A small daemon
thread staging ``depth`` batches ahead overlaps that host work and the
transfer with device compute — the standard JAX input-pipeline pattern
(equivalent role to the reference's HF DataLoader worker processes,
dataloader_num_workers, which this framework otherwise has no need for).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

from ..data.collate import Batch
from .steps import DeviceBatch

_END = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_iter(items: Iterable, depth: int = 1) -> Iterator:
    """Generic producer thread: evaluate ``items`` up to ``depth`` elements
    ahead of the consumer (used by the federated engine to overlap host-side
    round building with the previous round's device execution).
    ``depth <= 0`` degenerates to plain iteration."""
    if depth <= 0:
        yield from items
        return
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for x in items:
                q.put((x,))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            q.put(_Failure(e))

    threading.Thread(target=worker, daemon=True, name="iter-prefetch").start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, _Failure):
            raise item.exc
        yield item[0]


def prefetch_device_batches(
    batches: Iterable[Batch], depth: int = 2, sharding=None
) -> Iterator[tuple[Batch, DeviceBatch]]:
    """Yield ``(host_batch, device_batch)`` with up to ``depth`` device
    batches staged ahead of the consumer. ``depth <= 0`` disables the
    thread (synchronous staging, identical semantics). ``sharding``
    (a jax.sharding.Sharding) places every leaf — e.g. batch-dim sharding
    over a "data" mesh for data-parallel training."""

    def stage(b: Batch) -> DeviceBatch:
        db = DeviceBatch.from_host(b)
        if sharding is not None:
            import jax

            db = jax.device_put(db, sharding)
        return db

    if depth <= 0:
        for b in batches:
            yield b, stage(b)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for b in batches:
                q.put((b, stage(b)))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            q.put(_Failure(e))

    t = threading.Thread(target=worker, daemon=True, name="batch-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, _Failure):
            raise item.exc
        yield item
