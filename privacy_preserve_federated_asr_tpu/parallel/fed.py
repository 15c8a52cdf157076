"""Federated weight operations as pytree transforms.

Replaces the reference's module-object surgery and state-dict averaging:
  * ``update_network_weight`` / ``update_network`` / ``get_model_weight``
    (reference: federated/src/update.py:223-283) — loading a model and
    grafting the "ASR" / "AD" / "toggling_network" sub-network from another
    source — become pure pytree select/graft by path prefix.
  * ``average_weights`` (reference: federated/src/utils.py:240-249) —
    element-wise mean over client state_dicts — becomes a tree-mean, and
    its on-device form ``fedavg_stacked`` is a single mean over the stacked
    client axis (XLA lowers it to one reduce over the ``client`` mesh axis).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

# sub-network name -> top-level param-path prefixes
# (reference: update_network_weight's "ASR" = data2vec_audio + lm_head,
#  "AD" = dementia_head, "toggling_network" = arbitrator; update.py:246-266)
NETWORKS: dict[str, tuple[str, ...]] = {
    "ASR": ("backbone", "lm_head"),
    "AD": ("dementia_head",),
    "toggling_network": ("arbitrator",),
    "all": ("backbone", "lm_head", "dementia_head", "arbitrator", "similar_fc"),
}


def network_mask(params: Any, network: str) -> Any:
    """Boolean pytree: True on leaves belonging to the sub-network."""
    prefixes = NETWORKS[network]

    def mark(path, _):
        key0 = path[0].key if hasattr(path[0], "key") else str(path[0])
        return key0 in prefixes or any(key0.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(mark, params)


def select_network(params: Any, network: str) -> dict:
    """Extract the sub-network's top-level subtrees (``get_model_weight``)."""
    prefixes = NETWORKS[network]
    return {k: v for k, v in params.items()
            if k in prefixes or any(k.startswith(p) for p in prefixes)}


def graft_network(target: Any, source: Any, network: str) -> Any:
    """Return target params with the sub-network replaced from source
    (``update_network_weight``). Pure — inputs are not mutated."""
    mask = network_mask(target, network)
    return jax.tree.map(lambda t, s, m: s if m else t, target, source, mask)


def average_weights(params_list: Sequence[Any], weights: Sequence[float] | None = None) -> Any:
    """FedAvg over a list of client param pytrees (host-side convenience;
    unweighted mean like the reference, optional sample-count weighting)."""
    if weights is None:
        return jax.tree.map(lambda *xs: sum(xs) / len(xs), *params_list)
    w = jnp.asarray(weights, dtype=jnp.float32)
    w = w / jnp.sum(w)
    return jax.tree.map(
        lambda *xs: sum(wi * x for wi, x in zip(w, xs)), *params_list)


def fedavg_stacked(
    stacked_params: Any,
    weights: jax.Array | None = None,
) -> Any:
    """FedAvg over the leading (client) axis of a stacked param pytree.

    Inside jit with the leading axis sharded over the ``client`` mesh axis,
    the mean lowers to a single reduce-scatter/all-reduce over ICI — the
    TPU-native replacement for the reference's filesystem weight exchange.
    """
    if weights is None:
        return jax.tree.map(lambda x: jnp.mean(x, axis=0), stacked_params)
    w = weights / jnp.sum(weights)

    def wmean(x):
        wb = w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jnp.sum(x * wb, axis=0)

    return jax.tree.map(wmean, stacked_params)


def dp_fedavg_stacked(
    stacked_params: Any,
    global_params: Any,
    clip_norm: float,
    noise_multiplier: float,
    rng: jax.Array,
) -> Any:
    """Differentially-private FedAvg (McMahan et al. 2018) over the stacked
    client axis: per-client update deltas are clipped to ``clip_norm`` in
    global L2 norm, averaged (unweighted — DP accounting assumes uniform
    contributions), and Gaussian noise with per-coordinate std
    ``clip_norm * noise_multiplier / K`` is added before applying to the
    global params.

    This is BEYOND the reference (whose privacy mechanism is the
    representation-level toggling network); it composes with it — the
    arbitrator hides AD content in embeddings, DP-FedAvg bounds what the
    aggregated weights leak about any single client. Everything runs inside
    the jitted round program; on a ``client`` mesh the clip norms and the
    mean each lower to one collective.
    """
    deltas = jax.tree.map(
        lambda s, g: (s.astype(jnp.float32) - g[None].astype(jnp.float32)),
        stacked_params, global_params)
    leaves = jax.tree.leaves(deltas)
    k = leaves[0].shape[0]
    sq = sum(jnp.sum(d * d, axis=tuple(range(1, d.ndim))) for d in leaves)
    norms = jnp.sqrt(jnp.maximum(sq, 1e-24))                       # [K]
    scale = jnp.minimum(1.0, clip_norm / norms)                    # [K]

    def clipped_mean(d):
        sb = scale.reshape((-1,) + (1,) * (d.ndim - 1))
        return jnp.mean(d * sb, axis=0)

    mean = jax.tree.map(clipped_mean, deltas)
    std = clip_norm * noise_multiplier / k
    flat, treedef = jax.tree_util.tree_flatten(mean)
    keys = jax.random.split(rng, len(flat))
    noisy = [m + std * jax.random.normal(kk, m.shape, jnp.float32)
             for m, kk in zip(flat, keys)]
    agg = jax.tree_util.tree_unflatten(treedef, noisy)
    return jax.tree.map(
        lambda g, a: (g.astype(jnp.float32) + a).astype(g.dtype),
        global_params, agg)
