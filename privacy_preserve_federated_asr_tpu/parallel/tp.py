"""Tensor-parallel (Megatron-style) parameter sharding for the encoder.

The reference has no tensor parallelism (SURVEY.md §2.6 — optional for
parity); this is the beyond-parity scale path for backbones too large for
one chip's HBM. Sharding is expressed as per-leaf ``NamedSharding``s over a
``model`` mesh axis and handed to GSPMD: each transformer block becomes a
column-parallel (q/k/v, FFN-up) -> row-parallel (out-proj, FFN-down) pair,
so XLA inserts exactly one all-reduce per attention block and one per FFN
block — the standard Megatron communication pattern, compiled rather than
hand-written.

Everything outside those four matmul families (LayerNorms, conv frontend,
positional conv, heads, arbitrator) is replicated: it is <2% of parameter
bytes and sharding it would only add collectives.

Works transparently for both parameter layouts:
  * per-layer   ``encoder/layers_{i}/attention/q_proj/kernel``  [D, D]
  * scan-layers ``encoder/layers_scan/layer/attention/q_proj/kernel``
    [L, D, D] (leading stacked-layer dim)
and for optimizer-state trees (optax Adam moments mirror the param dict
structure, so the same path suffix match applies).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: shard the output features (kernel last dim, bias last dim)
_COL_MODULES = frozenset({"q_proj", "k_proj", "v_proj", "intermediate_dense"})
# row-parallel: shard the input features (kernel second-to-last dim);
# bias stays replicated (it is added after the all-reduce)
_ROW_MODULES = frozenset({"out_proj", "output_dense"})


def tp_partition_spec(path_names: tuple[str, ...], ndim: int,
                      axis: str = "model") -> P:
    """PartitionSpec for one parameter leaf, by its pytree path suffix."""
    if ndim >= 1 and len(path_names) >= 2:
        module, leaf = path_names[-2], path_names[-1]
        if module in _COL_MODULES and leaf in ("kernel", "bias"):
            spec = [None] * ndim
            spec[-1] = axis
            return P(*spec)
        if module in _ROW_MODULES and leaf == "kernel" and ndim >= 2:
            spec = [None] * ndim
            spec[-2] = axis
            return P(*spec)
    return P()


def _path_names(path) -> tuple[str, ...]:
    names = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            names.append(str(entry.key))
        elif isinstance(entry, jax.tree_util.GetAttrKey):
            names.append(str(entry.name))
    return tuple(names)


def tp_shardings(mesh: Mesh, tree: Any, axis: str = "model") -> Any:
    """Map a params-like pytree (params, Adam moments, whole opt_state) to
    per-leaf NamedShardings: TP specs for the four matmul families,
    replicated for everything else (incl. scalars like Adam's count)."""

    def to_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, tp_partition_spec(_path_names(path), ndim, axis))

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def validate_tp_divisibility(cfg, tp: int) -> None:
    """The sharded feature dims must divide evenly over the model axis —
    GSPMD would still be correct with padding, but silently slower."""
    bad = []
    if cfg.hidden_size % tp:
        bad.append(f"hidden_size={cfg.hidden_size}")
    if cfg.intermediate_size % tp:
        bad.append(f"intermediate_size={cfg.intermediate_size}")
    if cfg.num_attention_heads % tp:
        bad.append(f"num_attention_heads={cfg.num_attention_heads}")
    if bad:
        raise ValueError(f"tp={tp} does not divide {', '.join(bad)}")
