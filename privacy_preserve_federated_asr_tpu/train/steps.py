"""Pure train/eval step functions shared by the centralized Trainer and the
federated engine (which vmaps them over a client mesh axis)."""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collate import Batch
from ..models.config import DACSConfig
from ..models.dacs import DACSModel
from ..models.recipes import Recipe, get_recipe
from ..ops.decode import ad_vote, greedy_ids
from .optim import _path_strings, stage_trainable_predicate
from .train_state import DACSTrainState


@flax.struct.dataclass
class DeviceBatch:
    """Array-only view of a host Batch (a jit-able pytree)."""

    input_values: jax.Array
    input_lengths: jax.Array
    labels: jax.Array
    label_lengths: jax.Array
    dementia_labels: jax.Array
    sample_mask: jax.Array

    @classmethod
    def from_host(cls, b: Batch) -> "DeviceBatch":
        return cls(
            input_values=jnp.asarray(b.input_values),
            input_lengths=jnp.asarray(b.input_lengths),
            labels=jnp.asarray(b.labels),
            label_lengths=jnp.asarray(b.label_lengths),
            dementia_labels=jnp.asarray(b.dementia_labels),
            sample_mask=jnp.asarray(b.sample_mask),
        )

    @classmethod
    def stack(cls, batches: list["DeviceBatch"]) -> "DeviceBatch":
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_train_step(
    model, tx: optax.GradientTransformation, cfg: DACSConfig,
    aux_metrics: bool = False, recipe: Recipe | None = None,
    forward_fn: Callable | None = None,
) -> Callable[[DACSTrainState, DeviceBatch], tuple[DACSTrainState, dict]]:
    """Build the pure train step for one optimizer/config pair.

    Method-agnostic: ``recipe`` (default ``cfg.method``) supplies the loss,
    the trainable-parameter predicate and the backbone-trains flag
    (models/recipes.py), so the same step serves the DACS, GRL,
    single-toggle and FSM trainers.

    Frozen parameters (per the recipe's trainable predicate) are wrapped in
    ``stop_gradient`` inside the loss so XLA dead-code-eliminates their
    backward pass entirely — in stages 1/2 that removes the whole encoder
    backward (the optimizer masking alone would still *compute* those
    gradients and then zero the updates). ``aux_metrics=False`` likewise
    prunes loss terms the stage doesn't consume (see dacs_loss).

    ``forward_fn`` swaps the model forward for an alternative producing
    the same DACSOutputs (the pipeline-parallel forward,
    ``parallel/pp.py:make_pp_forward``); losses/optimizer are unchanged.
    """
    recipe = recipe or get_recipe(cfg.method)
    trainable = recipe.trainable(cfg.stage)
    # frozen encoder: dropout off (reference .eval() parity)
    backbone_det = not recipe.backbone_trains(cfg.stage)

    def _freeze(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x if trainable(_path_strings(p))
            else jax.lax.stop_gradient(x),
            params,
        )

    def train_step(state: DACSTrainState, batch: DeviceBatch):
        rngs, new_rng = state.next_rngs()

        def loss_fn(params):
            params = _freeze(params)
            if forward_fn is not None:
                out = forward_fn(params, batch.input_values,
                                 batch.input_lengths, deterministic=False,
                                 backbone_deterministic=backbone_det,
                                 rngs=rngs)
            else:
                out = model.apply(
                    {"params": params}, batch.input_values, batch.input_lengths,
                    deterministic=False, backbone_deterministic=backbone_det,
                    rngs=rngs,
                )
            return recipe.loss(out, batch.labels, batch.label_lengths,
                               batch.dementia_labels, cfg, params,
                               batch.sample_mask, aux_metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


@flax.struct.dataclass
class HiddenBatch:
    """A batch of CACHED encoder outputs for frozen-encoder stages (1/2):
    the head-only train step consumes these instead of waveforms."""

    hidden_states: jax.Array    # [B, T', D] backbone output (pre final dropout)
    frame_lengths: jax.Array    # [B]
    labels: jax.Array           # [B, L]
    label_lengths: jax.Array    # [B]
    dementia_labels: jax.Array  # [B]
    sample_mask: jax.Array      # [B]


def backbone_forward_fn(model: DACSModel):
    """Deterministic backbone-only forward -> (h [B,T',D], frame_lengths) —
    the cache-building primitive shared by the Trainer's cache_encoder path
    and the federated engine's res_h rounds (jit it at the call site)."""
    bcfg = model.cfg.backbone

    def fwd(params, input_values, input_lengths):
        from ..models.backbone import feat_extract_output_lengths

        t = feat_extract_output_lengths(bcfg, input_values.shape[1])
        fl = feat_extract_output_lengths(bcfg, input_lengths)
        fm = (jnp.arange(t)[None, :] < fl[:, None]).astype(jnp.int32)
        h = model.apply(
            {"params": params}, input_values, fm, True,
            method=lambda m, iv, fm, det: m.backbone(iv, fm, deterministic=det))
        return h, fl

    return fwd


def gather_hidden(h, fl, labels, label_lengths, dementia_labels, idx,
                  row_mask=None) -> HiddenBatch:
    """Row-gather a HiddenBatch from cached encoder outputs; idx == -1 marks
    batch-padding rows (masked out). ``row_mask`` carries the source rows'
    own sample mask when the cache itself contains padding rows (the
    federated engine's stacked per-client data)."""
    safe = jnp.clip(idx, 0, h.shape[0] - 1)
    mask = idx >= 0
    sm = mask.astype(jnp.float32)
    if row_mask is not None:
        sm = sm * row_mask[safe]
    return HiddenBatch(
        hidden_states=h[safe],
        frame_lengths=jnp.where(mask, fl[safe], 0),
        labels=jnp.where(mask[:, None], labels[safe], -100),
        label_lengths=jnp.where(mask, label_lengths[safe], 0),
        dementia_labels=jnp.where(mask, dementia_labels[safe], 0),
        sample_mask=sm,
    )


def make_hidden_train_step(
    model: DACSModel, tx: optax.GradientTransformation, cfg: DACSConfig,
    aux_metrics: bool = False,
):
    """Train step over cached encoder outputs (``DACSModel.apply_heads``).

    Valid exactly when the backbone is frozen AND deterministic — the DACS
    stage-1/2 semantics (reference freezes the encoder and calls .eval() on
    it, federated/src/models.py:311-323) — so ``backbone(x)`` is a
    round-invariant constant per utterance. Final dropout and the Gumbel
    noise stay live per step (they are applied after the cache point).
    """
    recipe = get_recipe(cfg.method)
    assert not recipe.backbone_trains(cfg.stage), (
        "cached-encoder training needs a frozen backbone")
    trainable = recipe.trainable(cfg.stage)

    def _freeze(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x if trainable(_path_strings(p))
            else jax.lax.stop_gradient(x),
            params,
        )

    def train_step(state: DACSTrainState, batch: HiddenBatch):
        rngs, new_rng = state.next_rngs()
        t = batch.hidden_states.shape[1]
        frame_mask = (
            jnp.arange(t)[None, :] < batch.frame_lengths[:, None]
        ).astype(jnp.int32)

        def loss_fn(params):
            params = _freeze(params)
            out = model.apply(
                {"params": params}, batch.hidden_states, frame_mask,
                batch.frame_lengths, deterministic=False, rngs=rngs,
                method=DACSModel.apply_heads,
            )
            return recipe.loss(out, batch.labels, batch.label_lengths,
                               batch.dementia_labels, cfg, params,
                               batch.sample_mask, aux_metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


@flax.struct.dataclass
class FeatureBatch:
    """A batch of CACHED conv-frontend outputs for stage-0 training: the
    feature extractor is frozen in every recipe (reference
    freeze_feature_encoder) and deterministic, so its output is a
    training-invariant constant per utterance."""

    features: jax.Array         # [B, T', C_conv] FeatureEncoder output
    frame_lengths: jax.Array    # [B]
    labels: jax.Array           # [B, L]
    label_lengths: jax.Array    # [B]
    dementia_labels: jax.Array  # [B]
    sample_mask: jax.Array      # [B]


def frontend_forward_fn(model: DACSModel):
    """Conv-frontend-only forward -> (features [B,T',C], frame_lengths) —
    the stage-0 cache-building primitive (jit it at the call site)."""
    bcfg = model.cfg.backbone

    def fwd(params, input_values, input_lengths):
        from ..models.backbone import FeatureEncoder, feat_extract_output_lengths

        fl = feat_extract_output_lengths(bcfg, input_lengths)
        feats = FeatureEncoder(bcfg, model.dtype).apply(
            {"params": params["backbone"]["feature_extractor"]}, input_values)
        return feats, fl

    return fwd


def gather_features(feats, fl, labels, label_lengths, dementia_labels, idx,
                    row_mask=None) -> FeatureBatch:
    """Row-gather a FeatureBatch from cached conv-frontend outputs (same
    semantics as :func:`gather_hidden`)."""
    hb = gather_hidden(feats, fl, labels, label_lengths, dementia_labels,
                       idx, row_mask)
    return FeatureBatch(
        features=hb.hidden_states, frame_lengths=hb.frame_lengths,
        labels=hb.labels, label_lengths=hb.label_lengths,
        dementia_labels=hb.dementia_labels, sample_mask=hb.sample_mask)


def make_feature_train_step(
    model: DACSModel, tx: optax.GradientTransformation, cfg: DACSConfig,
    aux_metrics: bool = False,
):
    """Stage-0 train step over cached conv-frontend outputs
    (``DACSModel.apply_from_features``).

    Valid for every stage (the conv frontend is always frozen and has no
    dropout); it matters for stage 0, where the rest of the backbone trains
    and the cached-encoder path (make_hidden_train_step) does not apply.
    Everything stochastic (feat-proj dropout, SpecAugment, encoder dropouts,
    final dropout, Gumbel) sits after the cache point and stays live.
    """
    recipe = get_recipe(cfg.method)
    trainable = recipe.trainable(cfg.stage)
    backbone_det = not recipe.backbone_trains(cfg.stage)

    def _freeze(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x if trainable(_path_strings(p))
            else jax.lax.stop_gradient(x),
            params,
        )

    def train_step(state: DACSTrainState, batch: FeatureBatch):
        rngs, new_rng = state.next_rngs()
        t = batch.features.shape[1]
        frame_mask = (
            jnp.arange(t)[None, :] < batch.frame_lengths[:, None]
        ).astype(jnp.int32)

        def loss_fn(params):
            params = _freeze(params)
            out = model.apply(
                {"params": params}, batch.features, frame_mask,
                batch.frame_lengths, deterministic=False,
                backbone_deterministic=backbone_det, rngs=rngs,
                method=DACSModel.apply_from_features,
            )
            return recipe.loss(out, batch.labels, batch.label_lengths,
                               batch.dementia_labels, cfg, params,
                               batch.sample_mask, aux_metrics)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_multitask_train_step(
    model: DACSModel, tx: optax.GradientTransformation, cfg: DACSConfig,
):
    """Train step for the N-best multitask model (``cfg.num_lms > 1``):
    head i trains on pseudo-transcript set i, CTC losses averaged over heads
    (reference Data2VecAudioForCTCMultitask, ASRLocalUpdate_Multitask.py).

    The scanned batch element is (DeviceBatch, labels_stack [N,B,L],
    label_lengths_stack [N,B]). Same stop-gradient freezing as
    make_train_step (lm_heads_* are trainable in stage 0).
    """
    from ..federated.multitask import multitask_loss

    trainable = stage_trainable_predicate(cfg.stage)

    def _freeze(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x if trainable(_path_strings(p))
            else jax.lax.stop_gradient(x),
            params,
        )

    def train_step(state: DACSTrainState, element):
        batch, labels_stack, ll_stack = element
        rngs, new_rng = state.next_rngs()

        def loss_fn(params):
            params = _freeze(params)
            out = model.apply(
                {"params": params}, batch.input_values, batch.input_lengths,
                deterministic=False, backbone_deterministic=cfg.stage != 0,
                rngs=rngs,
            )
            return multitask_loss(out, labels_stack, ll_stack,
                                  batch.dementia_labels, cfg,
                                  params["similar_fc"]["kernel"],
                                  batch.sample_mask)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def _eval_from_outputs(out, params, batch, cfg: DACSConfig,
                       recipe: Recipe | None = None):
    recipe = recipe or get_recipe(cfg.method)
    loss, _ = recipe.loss(out, batch.labels, batch.label_lengths,
                          batch.dementia_labels, cfg, params,
                          batch.sample_mask, True)
    ctc_logits, ad_logits = recipe.eval_streams(out, cfg)
    pred_ids = greedy_ids(ctc_logits, out.frame_mask, cfg.backbone.pad_token_id)
    ad_pred = ad_vote(ad_logits, out.frame_mask)
    return loss, pred_ids, ad_pred


def make_eval_step(model, cfg: DACSConfig, recipe: Recipe | None = None,
                   forward_fn: Callable | None = None):
    recipe = recipe or get_recipe(cfg.method)

    def eval_step(params, batch: DeviceBatch):
        rngs = {"gumbel": jax.random.PRNGKey(0)}
        if forward_fn is not None:
            out = forward_fn(params, batch.input_values, batch.input_lengths,
                             deterministic=True, rngs=rngs)
        else:
            out = model.apply(
                {"params": params}, batch.input_values, batch.input_lengths,
                deterministic=True, rngs=rngs,
            )
        return _eval_from_outputs(out, params, batch, cfg, recipe)

    return eval_step


def make_hidden_eval_step(model: DACSModel, cfg: DACSConfig):
    """Eval step over cached encoder outputs (same validity condition as
    :func:`make_hidden_train_step`: frozen deterministic backbone)."""

    def eval_step(params, batch: HiddenBatch):
        t = batch.hidden_states.shape[1]
        frame_mask = (
            jnp.arange(t)[None, :] < batch.frame_lengths[:, None]
        ).astype(jnp.int32)
        out = model.apply(
            {"params": params}, batch.hidden_states, frame_mask,
            batch.frame_lengths, True, rngs={"gumbel": jax.random.PRNGKey(0)},
            method=DACSModel.apply_heads,
        )
        return _eval_from_outputs(out, params, batch, cfg)

    return eval_step
