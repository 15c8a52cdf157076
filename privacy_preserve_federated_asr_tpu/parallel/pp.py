"""Pipeline parallelism (GPipe-style) for the encoder layer stack.

The reference has no pipeline parallelism (SURVEY.md §2.6 — optional for
parity); like tensor parallelism (``parallel/tp.py``) this is a
beyond-parity scale path, completing the §2.6 taxonomy: it splits the
24-layer transformer stack across a ``pipe`` mesh axis so a backbone too
deep for one chip's HBM trains across chips with only point-to-point
activation traffic between neighbours.

TPU-native design — the opposite of a translated torch PP runtime:

  * The stack is already a ``lax.scan`` over stacked layer params
    (``scan_layers`` layout, [L, ...] leaves). PP shards that leading
    layer dim over the ``pipe`` axis with ``shard_map`` — each device
    holds L/P consecutive layers and runs them as its own scan.
  * The GPipe schedule is ONE more ``lax.scan`` over M + P − 1 ticks:
    every tick each stage runs its local layers on the microbatch it
    holds, then ``lax.ppermute`` rotates activations (+ the travelling
    frame mask) one stage forward around the ring. Stage 0 injects
    microbatch ``t`` at tick ``t``; stage P−1 emits microbatch
    ``t − (P−1)``. No per-tick host dispatch, no NCCL send/recv threads:
    the whole pipeline — bubbles, rotation and all — is one compiled XLA
    program, and the only collectives are neighbour ``ppermute``s (ICI)
    plus one final ``psum`` that broadcasts the last stage's outputs.
  * Everything outside the layer stack (conv frontend, feature
    projection, positional conv, heads, losses) is <10% of FLOPs and
    runs replicated on every stage, composed functionally from the same
    flax modules the vanilla model uses (exact same param trees — no
    separate "PP model"), with ``DACSModel.apply_heads`` for the head
    side exactly like the cached-encoder fast paths
    (``train/steps.py:make_hidden_train_step``).

Backward works by construction: ``jax.grad`` differentiates through
``shard_map`` + ``scan`` + ``ppermute`` (the transpose of a rotation is
the reverse rotation), so the backward pipeline is derived, not
hand-scheduled. ``remat=True`` checkpoints each layer application so a
stage stores one activation per (tick, layer) boundary instead of every
intermediate.

Numerics: identical math per microbatch row (LayerNorm/attention are
row-local), so PP == single-device up to fp32 reduction order — asserted
exactly in tests/test_pp.py alongside an HLO check that the lowered
program really contains the ``collective-permute`` ring and no
cross-stage all-gather of layer params.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def validate_pp(bcfg, pp: int, batch_size: int, num_microbatches: int) -> None:
    """Static divisibility requirements (GSPMD-style padding would hide a
    silent slowdown; we refuse instead, like ``validate_tp_divisibility``)."""
    bad = []
    if bcfg.num_hidden_layers % pp:
        bad.append(f"num_hidden_layers={bcfg.num_hidden_layers} % pp={pp}")
    if num_microbatches < pp:
        bad.append(f"microbatches={num_microbatches} < pp={pp} "
                   "(pipeline would never fill)")
    if batch_size % num_microbatches:
        bad.append(f"batch_size={batch_size} % microbatches={num_microbatches}")
    if bad:
        raise ValueError("pipeline config invalid: " + "; ".join(bad))


def make_pp_stack(bcfg, dtype, mesh: Mesh, *, axis: str = "pipe",
                  num_microbatches: int, remat: bool = False) -> Callable:
    """Build ``stack_fn(layer_params, x, frame_mask, rng, deterministic)``
    running the [L, ...]-stacked encoder layers as a GPipe pipeline over
    ``mesh``'s ``axis``. ``layer_params`` is the
    ``backbone/encoder/layers_scan/layer`` subtree."""
    from ..models.backbone import EncoderLayer

    n_stages = int(mesh.shape[axis])
    n_local = bcfg.num_hidden_layers // n_stages
    layer = EncoderLayer(bcfg, dtype)

    def run_local(lp_local, x, km, key, deterministic):
        # this stage's n_local consecutive layers, as the same kind of
        # param-stacked scan the single-device scan_layers path compiles
        bias = jnp.where(km[:, None, None, :].astype(bool),
                         0.0, -1e9).astype(jnp.float32)

        def body(carry, sl):
            lp, k = sl
            rngs = {} if deterministic else {"dropout": k}
            y = layer.apply({"params": lp}, carry, bias, deterministic, km,
                            rngs=rngs)
            return y, None

        if remat:
            body = jax.checkpoint(body)
        keys = jax.random.split(key, n_local)
        y, _ = jax.lax.scan(body, x, (lp_local, keys))
        return y

    def stack_fn(layer_params, x, frame_mask, rng, deterministic: bool):
        b, t, d = x.shape
        m = num_microbatches
        if b % m:
            raise ValueError(f"batch {b} not divisible by microbatches {m}")
        mb = b // m
        xs = x.reshape(m, mb, t, d)
        kms = frame_mask.reshape(m, mb, t)

        def device_fn(lp, xs, kms, rng):
            stage = jax.lax.axis_index(axis)
            ticks = m + n_stages - 1
            # pcast: the zeros are per-stage state (varying over "pipe"),
            # not replicated values — the scan carry must be typed varying
            # because the body rotates it with ppermute
            s_x, s_km, outs = jax.lax.pcast(
                (jnp.zeros((mb, t, d), xs.dtype),
                 jnp.zeros((mb, t), kms.dtype),
                 jnp.zeros((m, mb, t, d), xs.dtype)),
                (axis,), to="varying")
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

            def tick(carry, tt):
                s_x, s_km, outs = carry
                inj = jnp.clip(tt, 0, m - 1)
                first = stage == 0
                # stage 0 ingests microbatch tt (re-running the last one
                # during drain ticks — its output never reaches stage P-1
                # within the tick budget, so it is dead compute, not error)
                x_in = jnp.where(first, xs[inj], s_x)
                km_in = jnp.where(first, kms[inj], s_km)
                k = jax.random.fold_in(jax.random.fold_in(rng, tt), stage)
                y = run_local(lp, x_in, km_in, k, deterministic)
                oidx = jnp.clip(tt - (n_stages - 1), 0, m - 1)
                write = jnp.logical_and(stage == n_stages - 1,
                                        tt >= n_stages - 1)
                outs = outs.at[oidx].set(jnp.where(write, y, outs[oidx]))
                s_x = jax.lax.ppermute(y, axis, perm)
                s_km = jax.lax.ppermute(km_in, axis, perm)
                return (s_x, s_km, outs), None

            (_, _, outs), _ = jax.lax.scan(
                tick, (s_x, s_km, outs), jnp.arange(ticks))
            # only the last stage holds real outputs; psum broadcasts them
            # (one [B, T, D] all-reduce per forward — the heads/losses run
            # replicated on every stage, mirroring how the rest of the
            # framework treats the model as one logical replica)
            outs = outs * (stage == n_stages - 1).astype(outs.dtype)
            return jax.lax.psum(outs, axis)

        # manual over the pipe axis only: any OTHER mesh axis (e.g. "data"
        # under dp x pp) stays auto, so GSPMD keeps batch rows sharded and
        # inserts the per-microbatch compute partitioning by itself
        outs = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(axis), P(), P(), P()),
            out_specs=P(),
            axis_names={axis}, check_vma=False,
        )(layer_params, xs, kms, rng)
        return outs.reshape(b, t, d)

    return stack_fn


def make_pp_forward(model, mesh: Mesh, *, axis: str = "pipe",
                    num_microbatches: int, remat: bool = False) -> Callable:
    """Drop-in DACS forward with the layer stack pipelined over ``axis``.

    Returns ``forward(params, input_values, input_lengths, deterministic,
    backbone_deterministic, rngs) -> DACSOutputs`` — the signature
    ``train/steps.py`` consumes via its ``forward_fn`` hook. Everything
    outside the stack is the SAME flax modules applied functionally on the
    vanilla param tree (``parallel/stacked.py``), so checkpoints / FedAvg /
    export are untouched by PP.
    """
    from .stacked import make_composed_forward

    stack_fn = make_pp_stack(model.cfg.backbone, model.dtype, mesh, axis=axis,
                             num_microbatches=num_microbatches, remat=remat)
    return make_composed_forward(model, stack_fn)
