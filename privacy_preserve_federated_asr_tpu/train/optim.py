"""Optimizer factory with stage-based parameter masking.

The reference freezes modules by mutating ``requires_grad`` and calling
``.eval()`` per stage (federated/src/models.py:304-363) and trains with HF
AdamW, max_grad_norm=1.0, weight decay 0.005, warmup 1000, stage-dependent
LR 1e-5 / 1e-4 / 1e-3 (federated/src/update.py:434-464, utils.py:31). In JAX
the same semantics are pure-functional: the parameter tree is partitioned
into trainable/frozen (optax.multi_transform), frozen leaves get zero
updates and carry NO Adam moments — so one compiled train step serves every
stage and the stage-1/2 optimizer pass touches only the trained head. The
weight-decay mask excludes no-decay leaves (bias / norm scales, like HF).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

STAGE_LRS = {0: 1e-5, 1: 1e-4, 2: 1e-3}


def stage_trainable_predicate(stage: int) -> Callable[[tuple[str, ...]], bool]:
    """Path -> trainable? for the DACS stages.

    stage 0 (ASR fine-tune): encoder (minus the conv feature extractor,
      which is *always* frozen — reference ``freeze_feature_encoder``
      :328-333) + lm_head train; dementia_head / arbitrator / similar_fc
      frozen (:304-310).
    stage 1 (AD classifier): only dementia_head trains (:311-317).
    stage 2 (toggling network): only the arbitrator trains (:318-323).
    stage 3 (toggle_more joint fine-tune): arbitrator + lm_head +
      dementia_head train; encoder and similar_fc stay frozen (reference:
      centralized/functions/OtherMdls_Toggle_more.py:749-753).
    """

    def pred(path: tuple[str, ...]) -> bool:
        if path[0] == "backbone":
            if stage != 0:
                return False
            return path[1] != "feature_extractor"
        head = path[0]
        if stage == 0:
            return head in ("lm_head",) or head.startswith("lm_heads_")
        if stage == 1:
            return head == "dementia_head"
        if stage == 2:
            return head == "arbitrator"
        if stage == 3:
            return head in ("arbitrator", "lm_head", "dementia_head")
        raise ValueError(f"unknown stage {stage}")

    return pred


def _path_strings(path) -> tuple[str, ...]:
    return tuple(
        p.key if hasattr(p, "key") else (p.name if hasattr(p, "name") else str(p))
        for p in path
    )


def _no_weight_decay(path: tuple[str, ...]) -> bool:
    """HF AdamW skips decay for biases and LayerNorm weights."""
    leaf = path[-1]
    if leaf == "bias":
        return True
    return leaf == "scale"  # LayerNorm/GroupNorm scale


def make_lr_schedule(
    peak_lr: float, warmup_steps: int = 1000, total_steps: int = 10000
) -> optax.Schedule:
    """HF default: linear warmup then linear decay to 0."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1)),
            optax.linear_schedule(peak_lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def proximal_term(mu: float) -> optax.GradientTransformation:
    """FedProx (Li et al. 2020): augment the local objective with
    ``(mu/2) * ||w - w_ref||^2`` by adding ``mu * (w - w_ref)`` to the
    gradient, where ``w_ref`` is the parameter snapshot taken at optimizer
    ``init``. The federated engine creates a fresh optimizer per round
    phase starting from the broadcast global params, so the reference point
    is exactly FedProx's round-start global model — the proximal pull damps
    client drift on non-IID speaker partitions. Chain this BEFORE gradient
    clipping (the proximal gradient is part of the local objective).
    """

    def init(params):
        # under multi_transform the frozen partition arrives as MaskedNode
        # subtrees (no leaves), so the snapshot holds trainable leaves only
        return jax.tree.map(jnp.asarray, params)

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("proximal_term requires params")
        updates = jax.tree.map(
            lambda g, w, r: g + mu * (w.astype(g.dtype) - r.astype(g.dtype)),
            updates, params, state)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params_shape,
    stage: int,
    learning_rate: float | optax.Schedule | None = None,
    weight_decay: float = 0.005,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 1000,
    total_steps: int = 10000,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    trainable_pred: Callable[[tuple[str, ...]], bool] | None = None,
    fedprox_mu: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW with stage masking, decay masking, and global-norm clipping.

    ``trainable_pred`` overrides the DACS stage predicate (used by the
    single-toggle / FSM variant recipes, models/variants.py).
    ``fedprox_mu > 0`` prepends the FedProx proximal term (trainable
    partition only; the reference point is the init-time params).
    """
    if learning_rate is None:
        learning_rate = make_lr_schedule(
            STAGE_LRS.get(stage, 1e-4), warmup_steps, total_steps)

    trainable = trainable_pred or stage_trainable_predicate(stage)
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: "train" if trainable(_path_strings(p)) else "frozen",
        params_shape,
    )

    def wd_mask_fn(params):
        # called by adamw on the multi_transform-masked params tree: frozen
        # leaves are MaskedNode subtrees (no leaves), so this only labels
        # real trainable leaves and the structures line up.
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not _no_weight_decay(_path_strings(p)), params)

    parts = [proximal_term(fedprox_mu)] if fedprox_mu else []
    parts += [
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=wd_mask_fn),
    ]
    adam = optax.chain(*parts)
    # multi_transform keeps Adam moments (and their per-step HBM traffic)
    # ONLY for the trainable partition — in stages 1/2 that shrinks the
    # optimizer pass from the full ~315M-param tree to the small head.
    # Frozen leaves get set_to_zero (identical updates to the previous
    # zero-the-gradients formulation: zero grads -> zero moments -> zero
    # updates; the clipping norm is likewise unchanged since frozen grads
    # contributed zeros).
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels)


def trainable_mask(params, stage: int):
    """Boolean pytree marking trainable leaves (for tests / introspection)."""
    pred = stage_trainable_predicate(stage)
    return jax.tree_util.tree_map_with_path(
        lambda p, _: pred(_path_strings(p)), params
    )
