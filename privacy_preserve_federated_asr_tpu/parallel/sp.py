"""Sequence (context) parallelism for the encoder layer stack.

The reference has no sequence parallelism (SURVEY.md §2.6 — its utterances
are seconds long); like tp/pp this is a beyond-parity scale path. It earns
its keep on the LONG-sequence inputs this framework does see — Whisper
long-form windows (1500 frames) and >30 s ADReSSo session audio — where the
per-layer activations [B, T, D] (and the XLA attention path's [B, H, Tq, Tk]
score tile) dominate HBM. SP shards the TIME axis of every stack activation
over a ``seq`` mesh axis, cutting per-device activation memory by the axis
size.

TPU-native design — GSPMD does the collectives, we pin the layout:

  * The stack runs as the same ``lax.scan`` over stacked [L, ...] layer
    params the single-device ``scan_layers`` path compiles; a
    ``with_sharding_constraint`` P(data, seq, None) on the scan carry (and
    on every layer output) pins activations time-sharded. Propagation
    through LayerNorm/FFN is trivially time-local; for attention GSPMD
    inserts the minimal gather — each device computes its Tq/seq query
    rows against gathered keys/values (the all-gather-KV form of context
    parallelism; at D=1024, gathering K+V is 2·T·D bytes vs the T·T/seq
    score tile it avoids materializing in full).
  * Ring attention (ppermute'd KV blocks) is deliberately NOT used here:
    it only beats all-gather-KV when T·D is too big to gather, i.e.
    T >> 10^4 — an order of magnitude beyond anything an utterance encoder
    sees. The compiler-scheduled gather wins at these sizes and keeps the
    whole step one GSPMD program.
  * The stack EXIT is constrained back to P(data, None, None): heads, CTC
    (a time-ordered scan) and masks run exactly like the vanilla dp path,
    so SP changes nothing downstream — one [B, T, D] all-gather at the
    boundary, amortized over the 24-layer sharded region.

Everything outside the stack reuses the vanilla flax modules on the vanilla
param tree via ``parallel/stacked.py`` (same as pp), so checkpoints /
FedAvg / export are untouched. Backward needs no hand-written collectives:
the transpose of the constrained layout is the same layout, and GSPMD
derives the reverse gathers.

Numerics: identical math per (batch, frame) element, so SP == single-device
up to fp32 reduction order — asserted in tests/test_sp.py alongside a
physical-sharding proof (the stack output's addressable shards really hold
T/seq frames each; replication cannot masquerade as SP).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_stack(bcfg, dtype, mesh: Mesh, *, axis: str = "seq",
                  batch_axis: str | None = "data",
                  remat: bool = False) -> Callable:
    """Build ``stack_fn(layer_params, x, frame_mask, rng, deterministic)``
    running the [L, ...]-stacked encoder layers with activations sharded
    P(batch_axis, axis, None). ``layer_params`` is the
    ``backbone/encoder/layers_scan/layer`` subtree."""
    from ..models.backbone import EncoderLayer

    layer = EncoderLayer(bcfg, dtype)
    b_ax = batch_axis if (batch_axis in mesh.shape) else None
    inside = NamedSharding(mesh, P(b_ax, axis, None))
    outside = NamedSharding(mesh, P(b_ax, None, None))

    def stack_fn(layer_params, x, frame_mask, rng, deterministic: bool):
        bias = jnp.where(frame_mask[:, None, None, :].astype(bool),
                         0.0, -1e9).astype(jnp.float32)
        x = jax.lax.with_sharding_constraint(x, inside)

        def body(carry, sl):
            lp, k = sl
            rngs = {} if deterministic else {"dropout": k}
            y = layer.apply({"params": lp}, carry, bias, deterministic,
                            frame_mask, rngs=rngs)
            # pin the carry layout: without this, propagation is free to
            # all-gather once and run the stack replicated over "seq" —
            # numerically right, but not sequence parallelism
            return jax.lax.with_sharding_constraint(y, inside), None

        if remat:
            body = jax.checkpoint(body)
        keys = jax.random.split(rng, bcfg.num_hidden_layers)
        y, _ = jax.lax.scan(body, x, (layer_params, keys))
        # exit the SP region: downstream (final LN, heads, CTC's time scan)
        # runs on the vanilla dp layout
        return jax.lax.with_sharding_constraint(y, outside)

    return stack_fn


def make_sp_forward(model, mesh: Mesh, *, axis: str = "seq",
                    batch_axis: str | None = "data",
                    remat: bool = False) -> Callable:
    """Drop-in DACS forward with stack activations time-sharded over
    ``axis`` (composable with dp over ``batch_axis``). Same signature as
    ``make_pp_forward`` — the ``train/steps.py`` ``forward_fn`` hook."""
    from .stacked import make_composed_forward

    stack_fn = make_sp_stack(model.cfg.backbone, model.dtype, mesh,
                             axis=axis, batch_axis=batch_axis, remat=remat)
    return make_composed_forward(model, stack_fn)
