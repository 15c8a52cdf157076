"""ZeRO-1 optimizer-state sharding over the data-parallel mesh axis.

The reference has no multi-device optimizer sharding (its FL clients are
OS processes exchanging whole checkpoints, federated/src/update.py; the
centralized path is torch DataParallel — SURVEY.md §2.6). This is the
beyond-parity memory-scale path for the centralized Trainer: with plain
``--dp N`` the fp32 Adam moments are replicated on every chip (~2.5 GB for
data2vec-audio-large), so HBM headroom — not FLOPs — caps the per-chip
batch. ZeRO-1 (Rajbhandari et al., 2020) shards the optimizer state over
the data axis instead; in GSPMD terms that is just a per-leaf
``NamedSharding`` on the Adam moments plus a sharding constraint on the
updated state, and XLA lowers the plain-dp gradient all-reduce into
reduce-scatter (into the moment shards) + all-gather (of the parameter
update) — the canonical ZeRO-1 communication pattern, compiled rather
than hand-written. Params stay replicated (this is ZeRO-1, not ZeRO-3:
the model fits; only the optimizer bytes are the problem).

Layout rule: each optimizer-state array is sharded along its *first* dim
divisible by the axis size (kernels [D_in, D_out] shard rows; biases [D]
shard directly; scan-layers stacks [L, ...] shard the layer dim when L
divides). Indivisible leaves and scalars (Adam ``count``) stay
replicated — they are a rounding error of the state bytes.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def zero1_partition_spec(shape: tuple[int, ...], n: int,
                         axis: str = "data") -> P:
    """PartitionSpec sharding the first dim divisible by ``n`` (the data-
    axis size); fully replicated when no dim divides (incl. scalars)."""
    for d, s in enumerate(shape):
        if s >= n and s % n == 0:
            spec: list[Any] = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def zero1_opt_shardings(mesh: Mesh, opt_state: Any, axis: str = "data") -> Any:
    """Per-leaf ``NamedSharding`` tree for an optax state (same structure)."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, zero1_partition_spec(tuple(getattr(x, "shape", ())), n, axis)),
        opt_state)


def zero1_constrain(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Constrain every array of an optax state tree to its ZeRO-1 layout
    (``zero1_partition_spec`` along ``axis``) INSIDE a jitted program.

    This is the federated-engine form of ZeRO-1: the per-client Adam
    moments are created and consumed entirely inside the jitted FL round
    (``tx.init`` in the vmapped local training, federated/engine.py), so
    there is no host-visible state to place — the layout must be pinned
    with ``with_sharding_constraint`` at init and on the scan carry. Works
    inside ``vmap`` (the client batch dim is lifted into the spec) and
    inside partial-auto ``shard_map`` over the ``client`` axis (``axis``
    stays auto, so GSPMD still owns the moment layout)."""
    n = int(mesh.shape[axis])
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, zero1_partition_spec(tuple(x.shape), n, axis))),
        tree)


def zero1_state_shardings(mesh: Mesh, state: Any, axis: str = "data") -> Any:
    """Sharding tree for a full ``DACSTrainState``: params / step / rng
    replicated (ZeRO-1 keeps parameters whole on every chip), optimizer
    state sharded per :func:`zero1_opt_shardings`."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        step=repl,
        params=jax.tree.map(lambda _: repl, state.params),
        opt_state=zero1_opt_shardings(mesh, state.opt_state, axis),
        rng=repl,
    )
