"""Device-mesh helpers for federated + data parallelism.

The reference's "distributed stack" is OS processes + filesystem weight
exchange (SURVEY.md §2.6). Here parallelism is a `jax.sharding.Mesh` with
two named axes:

  * ``client`` — federated clients: each client's model replica + optimizer
    state + data shard live on its slice of the mesh; a FedAvg round is one
    XLA collective over this axis (ICI, not disk). The FL engine runs
    clients shard_map-MANUAL over this axis, so no cross-client collective
    can exist inside local training.
  * ``data``   — per-client batch sharding (classic DP) when a client spans
    multiple chips: batch rows are physically sharded and each client's
    per-step gradient sync is an all-reduce over its ``data`` devices.

Both properties are asserted on lowered HLO (input shard shapes +
collective replica groups), not just numerics: tests/test_fl_dp.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    client: int = 1, data: int | None = None, devices=None, model: int = 1
) -> Mesh:
    """Build a (client, data) mesh — or (client, data, model) when
    ``model > 1`` (tensor parallelism inside each client's device group,
    FederatedConfig.tp). ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = max(len(devices) // (client * model), 1)
    n = client * data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {client}x{data}" + (f"x{model}" if model > 1 else "")
            + f" needs {n} devices, have {len(devices)}")
    if model > 1:
        arr = np.array(devices[:n]).reshape(client, data, model)
        return Mesh(arr, ("client", "data", "model"))
    arr = np.array(devices[:n]).reshape(client, data)
    return Mesh(arr, ("client", "data"))


def make_multislice_mesh(
    client: int = 1,
    data: int = 1,
    num_slices: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (client, data) mesh laid out slice-aware for multi-slice pods.

    On a multi-slice TPU deployment, devices within a slice are connected by
    ICI while slices talk over DCN (orders of magnitude less bandwidth). The
    layout rule here keeps each client's ``data`` sub-axis inside ONE slice —
    so a client's per-step gradient all-reduce rides ICI — and spreads
    clients across slices, so only the once-per-round FedAvg mean (a few
    bytes per parameter per round, vs per step) crosses DCN. This is the
    SURVEY §2.6 target: "collectives ride ICI, not DCN" for the hot path,
    with the FL aggregation as the only DCN traffic — asserted on the
    lowered round's collective replica groups in
    tests/test_fl_dp.py::test_multislice_hot_loop_rides_ici.

    Slice membership comes from ``device.slice_index`` when the runtime
    exposes it (real multi-slice jobs). ``num_slices`` overrides it to
    simulate a multi-slice topology on flat device sets (CPU virtual
    devices, single-slice tests): devices are grouped into ``num_slices``
    equal contiguous groups.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_slices is None:
        slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
        groups = [[d for d in devices
                   if (getattr(d, "slice_index", 0) or 0) == s]
                  for s in slice_ids]
    else:
        if len(devices) % num_slices:
            raise ValueError(
                f"{len(devices)} devices do not split into {num_slices} slices")
        per = len(devices) // num_slices
        groups = [devices[i * per : (i + 1) * per] for i in range(num_slices)]
    n_slices = len(groups)
    if client % n_slices:
        raise ValueError(
            f"client axis ({client}) must be a multiple of the slice count "
            f"({n_slices}) so clients divide evenly across slices")
    per_slice_clients = client // n_slices
    need = per_slice_clients * data
    rows = []
    for g in groups:
        if need > len(g):
            raise ValueError(
                f"each slice must hold {per_slice_clients} clients x {data} "
                f"data devices = {need}, slice has {len(g)}")
        rows.append(np.array(g[:need]).reshape(per_slice_clients, data))
    # client axis = slice-major: clients [0, per_slice) on slice 0, etc.;
    # each row's data axis stays within its slice
    arr = np.concatenate(rows, axis=0)
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
