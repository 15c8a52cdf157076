"""Device-mesh helpers for federated + data parallelism.

The reference's "distributed stack" is OS processes + filesystem weight
exchange (SURVEY.md §2.6). Here parallelism is a `jax.sharding.Mesh` with
two named axes:

  * ``client`` — federated clients: each client's model replica + optimizer
    state + data shard live on its slice of the mesh; a FedAvg round is one
    XLA collective over this axis (ICI, not disk).
  * ``data``   — per-client batch sharding (classic DP) when a client spans
    multiple chips.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    client: int = 1, data: int | None = None, devices=None
) -> Mesh:
    """Build a (client, data) mesh. ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = max(len(devices) // client, 1)
    n = client * data
    if n > len(devices):
        raise ValueError(f"mesh {client}x{data} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(client, data)
    return Mesh(arr, ("client", "data"))


def shard_leading_axis(mesh: Mesh, axis: str = "client"):
    """Sharding pytree-mapper: shard leaf dim 0 over ``axis``, replicate rest."""
    sharding = NamedSharding(mesh, P(axis))

    def fn(tree):
        return jax.tree.map(lambda _: sharding, tree)

    return fn


def replicated(mesh: Mesh):
    sharding = NamedSharding(mesh, P())

    def fn(tree):
        return jax.tree.map(lambda _: sharding, tree)

    return fn
