"""Optimizer factory with stage-based parameter masking.

The reference freezes modules by mutating ``requires_grad`` and calling
``.eval()`` per stage (federated/src/models.py:304-363) and trains with HF
AdamW, max_grad_norm=1.0, weight decay 0.005, warmup 1000, stage-dependent
LR 1e-5 / 1e-4 / 1e-3 (federated/src/update.py:434-464, utils.py:31). In JAX
the same semantics are pure-functional: a stateless transform zeroes the
gradients of frozen parameters *before* AdamW (zero grads -> zero moments ->
zero updates), and the weight-decay mask excludes both no-decay leaves
(bias / norm scales, like HF) and frozen leaves — so one compiled train step
serves every stage.
"""

from __future__ import annotations

from typing import Callable

import jax
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
) -> optax.GradientTransformation:
    """AdamW with stage masking, decay masking, and global-norm clipping.

    ``trainable_pred`` overrides the DACS stage predicate (used by the
    single-toggle / FSM variant recipes, models/variants.py).
    """
    if learning_rate is None:
        learning_rate = make_lr_schedule(
            STAGE_LRS.get(stage, 1e-4), warmup_steps, total_steps)

    trainable = trainable_pred or stage_trainable_predicate(stage)
    train_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: trainable(_path_strings(p)), params_shape
    )
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: (not _no_weight_decay(_path_strings(p)))
        and trainable(_path_strings(p)),
        params_shape,
    )

    def _zero_frozen(updates, state, params=None):
        del params
        return (
            jax.tree.map(lambda u, m: u if m else jax.numpy.zeros_like(u),
                         updates, train_mask),
            state,
        )

    zero_frozen = optax.GradientTransformation(lambda params: optax.EmptyState(),
                                               _zero_frozen)
    return optax.chain(
        zero_frozen,
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=wd_mask),
    )


def trainable_mask(params, stage: int):
    """Boolean pytree marking trainable leaves (for tests / introspection)."""
    pred = stage_trainable_predicate(stage)
    return jax.tree_util.tree_map_with_path(
        lambda p, _: pred(_path_strings(p)), params
    )
