"""Semi-/unsupervised federated pieces: N-best multitask heads + pseudo-
labels (reference: federated/src/Data2VecAudioForCTCMultitask_model.py and
ASRLocalUpdate_Multitask.py).

The reference's unsupervised clients run the stochastic (Gumbel-masked)
model N times per utterance, greedy-decode each pass into a pseudo
transcript with a confidence score, then train ``num_lms`` lm_heads — head
i on transcript set i — averaging the CTC losses; ``lm_heads[0]`` is copied
back into ``lm_head`` afterwards (1-best).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import LengthBucketBatcher
from ..data.dataset import AsrExample
from ..data.tokenizer import CTCCharTokenizer
from ..models.config import DACSConfig
from ..models.dacs import DACSModel, DACSOutputs
from ..models.objectives import dacs_loss, masked_time_mean
from ..ops.ctc import ctc_loss
from ..ops.decode import greedy_ids
from ..ops.grl import gradient_reversal
from ..ops.losses import am_softmax_loss, recall_family_loss
from ..train.steps import DeviceBatch


def init_lm_heads_from_lm_head(params: Any, num_lms: int) -> Any:
    """The reference's ``lm_heads_init``: every N-best head starts from the
    pretrained lm_head's weights (Multitask_model.py:272-275)."""
    params = dict(params)
    for i in range(num_lms):
        params[f"lm_heads_{i}"] = jax.tree.map(jnp.array, params["lm_head"])
    return params


def copy_first_head_to_lm_head(params: Any) -> Any:
    """After unsupervised training, lm_heads[0] (1-best) becomes lm_head
    (reference: ASRLocalUpdate_Multitask.py update_weights_adapted)."""
    params = dict(params)
    params["lm_head"] = jax.tree.map(jnp.array, params["lm_heads_0"])
    return params


def multitask_loss(
    outputs: DACSOutputs,
    labels_stack: jax.Array,         # [N, B, L] per-head pseudo labels (-100 pad)
    label_lengths_stack: jax.Array,  # [N, B]
    dementia_labels: jax.Array,
    cfg: DACSConfig,
    similar_fc_kernel: jax.Array,
    sample_mask: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, Any]]:
    """Stage-routed multitask objective (Multitask_model.py:439-497):
    CTC losses averaged over the N heads (each head on its own transcript
    set), AD and diversity terms as in the base DACS loss."""
    bcfg = cfg.backbone
    n = len(outputs.extra_logits)
    assert n == labels_stack.shape[0], (n, labels_stack.shape)

    def _ctc(logits, labels, lengths, reverse):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if reverse:
            lp = gradient_reversal(lp, cfg.lambda_grl)
        return ctc_loss(lp, labels, outputs.frame_lengths, lengths,
                        blank_id=bcfg.pad_token_id, reduction=bcfg.ctc_loss_reduction,
                        zero_infinity=bcfg.ctc_zero_infinity)

    total_unmask = total = total_r = 0.0
    for i, (lg_unmask, lg, lg_r) in enumerate(outputs.extra_logits):
        lab, ll = labels_stack[i], label_lengths_stack[i]
        total_unmask = total_unmask + _ctc(lg_unmask, lab, ll, False)
        total = total + _ctc(lg, lab, ll, False)
        total_r = total_r + _ctc(lg_r, lab, ll, True)
    total_unmask, total, total_r = total_unmask / n, total / n, total_r / n

    pool = cfg.pool_valid_frames_only
    fm = outputs.frame_mask
    w = {"recall": list(cfg.w_loss), "prec": [0.1, 0.9], "cel": None}.get(
        cfg.ad_loss, [0.5, 0.5])
    ad_unmask = recall_family_loss(
        masked_time_mean(outputs.dementia_logits_unmask.astype(jnp.float32), fm, pool),
        dementia_labels, cfg.ad_loss, w, sample_mask)
    ad_rev = recall_family_loss(
        gradient_reversal(
            masked_time_mean(outputs.dementia_logits_lm.astype(jnp.float32), fm, pool),
            cfg.lambda_grl),
        dementia_labels, cfg.ad_loss, w, sample_mask)
    ad = recall_family_loss(
        masked_time_mean(outputs.dementia_logits_ad.astype(jnp.float32), fm, pool),
        dementia_labels, cfg.ad_loss, w, sample_mask)

    h = outputs.hidden_states.astype(jnp.float32)
    lm_rows = (outputs.lm_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
    ad_rows = (outputs.ad_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
    rows = jnp.concatenate([lm_rows, ad_rows], axis=0)
    am_labels = jnp.concatenate([
        jnp.zeros(lm_rows.shape[0], dtype=jnp.int32),
        jnp.ones(ad_rows.shape[0], dtype=jnp.int32)])
    row_w = None
    if pool:
        fw = fm.astype(jnp.float32).reshape(-1)
        row_w = jnp.concatenate([fw, fw])
    div, _ = am_softmax_loss(rows, am_labels, similar_fc_kernel.T,
                             loss_type=cfg.am_loss_type, sample_weight=row_w)

    if cfg.stage == 0:
        final = total_unmask
    elif cfg.stage == 1:
        final = ad_unmask
    elif cfg.stage == 2:
        final = total + total_r + ad_rev + ad + div
    else:
        raise ValueError(cfg.stage)
    return final, {"loss": final, "ctc_unmask": total_unmask, "ctc_masked": total,
                   "ctc_reversed": total_r, "ad_unmask": ad_unmask,
                   "ad_reversed": ad_rev, "ad_masked": ad, "am_softmax": div}


def make_pseudo_forward(cfg: DACSConfig):
    """One jitted stochastic decode pass (Gumbel-masked logits -> greedy ids
    + max-softmax confidence). Built once and reused across FL rounds — a
    fresh jit wrapper per round would retrace."""
    model = DACSModel(cfg)

    @jax.jit
    def forward(p, batch: DeviceBatch, rng):
        out = model.apply({"params": p}, batch.input_values, batch.input_lengths,
                          deterministic=True, rngs={"gumbel": rng})
        pred = greedy_ids(out.logits, out.frame_mask, cfg.backbone.pad_token_id)
        probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
        conf = jnp.max(probs * out.frame_mask[:, :, None], axis=(1, 2))
        return pred, conf

    return forward


def generate_pseudo_labels(
    cfg: DACSConfig,
    params: Any,
    examples: Sequence[AsrExample],
    tokenizer: CTCCharTokenizer,
    num_lms: int,
    batch_size: int = 16,
    time_multiple: int = 16000,
    seed: int = 0,
    forward_fn=None,
) -> dict[str, list[tuple[str, list[int], float]]]:
    """N stochastic decode passes per utterance -> N (transcript, label ids,
    confidence) per path (reference gen_Ntranscripts / get_Embs,
    ASRLocalUpdate_Multitask.py:131-225: same model run num_lms times, the
    Gumbel mask sampling providing the variation; confidence = max softmax
    probability over the utterance's logits)."""
    forward = forward_fn if forward_fn is not None else make_pseudo_forward(cfg)

    batcher = LengthBucketBatcher(examples, batch_size, time_multiple=time_multiple)
    result: dict[str, list[tuple[str, list[int], float]]] = {e.path: [] for e in examples}
    for b in batcher.epoch(epoch_seed=0):
        for j in range(num_lms):
            rng = jax.random.PRNGKey(seed * 1000 + j)
            pred, conf = jax.device_get(forward(params, DeviceBatch.from_host(b), rng))
            for i, path in enumerate(b.paths):
                text = tokenizer.decode(pred[i])
                result[path].append((text, tokenizer.encode(text), float(conf[i])))
    return result


def multitask_local_update(
    cfg: DACSConfig,
    params: Any,
    unsup_examples: Sequence[AsrExample],
    tokenizer: CTCCharTokenizer,
    num_epochs: int = 1,
    batch_size: int = 4,
    time_multiple: int = 16000,
    label_multiple: int = 32,
    learning_rate: float | None = None,
    warmup_steps: int = 100,
    seed: int = 0,
    rng: jax.Array | None = None,
) -> tuple[Any, list[float]]:
    """The reference's unsupervised N-best client update
    (ASRLocalUpdate_Multitask.update_weights_adapted :479-621), end to end:

      1. generate num_lms pseudo-transcripts per utterance (stochastic
         Gumbel passes + greedy decode),
      2. initialize the N lm_heads from lm_head,
      3. train with the multitask objective (head i on transcript set i,
         CTC losses averaged over heads),
      4. copy lm_heads[0] (1-best) back into lm_head.

    Returns (updated params, per-step losses).
    """
    import optax

    from ..data.collate import LengthBucketBatcher
    from ..train.optim import make_optimizer
    from ..train.train_state import DACSTrainState

    n = cfg.num_lms
    assert n > 1, "multitask update needs num_lms > 1"
    pseudo = generate_pseudo_labels(
        cfg.replace(num_lms=1), params, unsup_examples, tokenizer, n,
        batch_size=batch_size, time_multiple=time_multiple, seed=seed)
    params = init_lm_heads_from_lm_head(params, n)

    model = DACSModel(cfg)
    tx = make_optimizer(
        jax.eval_shape(lambda: params), stage=cfg.stage,
        learning_rate=learning_rate, warmup_steps=warmup_steps,
        total_steps=max(len(unsup_examples) // batch_size, 1) * num_epochs)

    # give each example its 1-best labels so the batcher pads a base set;
    # the N-best stacks ride alongside keyed by path
    examples = attach_pseudo_labels(list(unsup_examples), pseudo)
    if not examples:  # every 1-best transcript empty (e.g. untrained model)
        print("[multitask] no usable pseudo transcripts; skipping update")
        return copy_first_head_to_lm_head(jax.device_get(params)), []
    batcher = LengthBucketBatcher(examples, batch_size,
                                  time_multiple=time_multiple,
                                  label_multiple=label_multiple, seed=seed)

    @jax.jit
    def step(state: DACSTrainState, batch: DeviceBatch, labels_stack, ll_stack):
        rngs, new_rng = state.next_rngs()

        def loss_fn(p):
            out = model.apply({"params": p}, batch.input_values,
                              batch.input_lengths, deterministic=False,
                              backbone_deterministic=cfg.stage != 0, rngs=rngs)
            return multitask_loss(out, labels_stack, ll_stack,
                                  batch.dementia_labels, cfg,
                                  p["similar_fc"]["kernel"], batch.sample_mask)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return DACSTrainState(step=state.step + 1, params=new_params,
                              opt_state=opt_state, rng=new_rng), metrics["loss"]

    state = DACSTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        rng=jax.random.PRNGKey(seed) if rng is None else rng)
    losses = []
    for ep in range(num_epochs):
        for b in batcher.epoch(epoch_seed=seed + ep):
            l_pad = b.labels.shape[1]
            stack = np.full((n, len(b.paths), l_pad), -100, dtype=np.int32)
            lls = np.zeros((n, len(b.paths)), dtype=np.int32)
            for j, path in enumerate(b.paths):
                for i, (_, ids, _) in enumerate(pseudo[path]):
                    ids = ids[:l_pad]
                    stack[i, j, : len(ids)] = ids
                    lls[i, j] = len(ids)
            # pad the batch dim to the static batch size
            bsz = b.labels.shape[0]
            if stack.shape[1] < bsz:
                pad_n = bsz - stack.shape[1]
                stack = np.pad(stack, ((0, 0), (0, pad_n), (0, 0)),
                               constant_values=-100)
                lls = np.pad(lls, ((0, 0), (0, pad_n)))
            state, loss = step(state, DeviceBatch.from_host(b),
                               jnp.asarray(stack), jnp.asarray(lls))
            losses.append(float(loss))
    out_params = copy_first_head_to_lm_head(jax.device_get(state.params))
    return out_params, losses


def attach_pseudo_labels(
    examples: Sequence[AsrExample],
    pseudo: dict[str, list[tuple[str, list[int], float]]],
) -> list[AsrExample]:
    """Give each unlabeled example its 1-best pseudo transcript (for the
    plain single-head pipeline); full N-best sets ride alongside for the
    multitask objective. Non-mutating: returns copies."""
    import dataclasses as _dc

    out = []
    for e in examples:
        if e.path in pseudo and pseudo[e.path]:
            text, ids, _ = pseudo[e.path][0]
            out.append(_dc.replace(
                e, text=text, labels=np.asarray(ids, dtype=np.int32)))
    return out
