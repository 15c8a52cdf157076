"""Stage-routed DACS training objective as a pure function.

Reproduces the reference loss graph (federated/src/models.py:480-624):

  stage 0:  ctc(logits_unmask)                                  # ASR fine-tune
  stage 1:  AD_loss(mean_t(dementia_logits_unmask))             # AD classifier
  stage 2:  ctc(lm_masked) + AD_loss(GRL(mean_t(ad_on_lm)))     # toggling net
          + ctc(GRL(log_probs(ad_masked))) + AD_loss(ad_on_ad)
          + am_softmax(stack(lm_masked, ad_masked))

GRL insertion points match the reference exactly: on the *time-pooled AD
logits* of the lm stream (:471-472) and on the *log-softmax* of the AD
stream's CTC logits (:501-502), both with strength lambda.

In JAX, stages switch loss terms here and trainable parameters via optimizer
masks (see train/optim.py) — the reference's ``requires_grad`` freezing +
``.eval()`` calls become pure-functional equivalents.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.ctc import ctc_loss
from ..ops.grl import gradient_reversal
from ..ops.losses import am_softmax_loss, recall_family_loss
from .config import DACSConfig
from .dacs import DACSOutputs

# AD-loss kind -> class-weight selection (reference :535-582: "recall" uses
# args.W_LOSS, "prec" uses [0.1, 0.9], the rest use [0.5, 0.5]; "cel" none).
def _ad_weight(cfg: DACSConfig):
    if cfg.ad_loss == "recall":
        return list(cfg.w_loss)
    if cfg.ad_loss == "prec":
        return [0.1, 0.9]
    if cfg.ad_loss == "cel":
        return None
    return [0.5, 0.5]


def masked_time_mean(x: jax.Array, frame_mask: jax.Array, enabled: bool) -> jax.Array:
    """Mean over time. ``enabled=False`` reproduces the reference quirk of
    pooling over *all* frames including padding (harmless at batch size 1)."""
    if not enabled:
        return jnp.mean(x, axis=1)
    fm = frame_mask.astype(x.dtype)[:, :, None]
    return jnp.sum(x * fm, axis=1) / jnp.maximum(jnp.sum(fm, axis=1), 1.0)


def dacs_loss(
    outputs: DACSOutputs,
    labels: jax.Array,          # [B, L] int32, -100 padded
    label_lengths: jax.Array,   # [B]
    dementia_labels: jax.Array, # [B]
    cfg: DACSConfig,
    similar_fc_kernel: jax.Array,   # [D, 2] flax layout of criterion_similar.fc
    sample_mask: jax.Array | None = None,  # [B] 1/0 real-vs-pad rows
    aux_metrics: bool = True,
) -> tuple[jax.Array, dict[str, Any]]:
    """Returns (stage-routed final loss, metrics dict).

    ``aux_metrics=False`` computes only the terms the stage's final loss
    consumes — XLA then dead-code-eliminates the unused logit streams and
    their backward, which is a real throughput win (the reference's
    monolithic forward always computes every branch; gradients of the
    *trained* parameters are identical either way). Skipped metric entries
    are reported as 0.
    """
    bcfg = cfg.backbone
    lam = cfg.lambda_grl
    pool = cfg.pool_valid_frames_only
    frame_lengths = outputs.frame_lengths
    reduction = bcfg.ctc_loss_reduction
    stage = cfg.stage
    zero = jnp.zeros((), jnp.float32)

    def _ctc(logits, reverse=False):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if reverse:
            lp = gradient_reversal(lp, lam)  # ASR-GRL (reference :501-502)
        return ctc_loss(
            lp, labels, frame_lengths, label_lengths,
            blank_id=bcfg.pad_token_id, reduction=reduction,
            zero_infinity=bcfg.ctc_zero_infinity,
        )

    fm = outputs.frame_mask
    w = _ad_weight(cfg)
    kind = cfg.ad_loss

    def _ad(logits, reverse=False):
        mean = masked_time_mean(logits.astype(jnp.float32), fm, pool)
        if reverse:
            mean = gradient_reversal(mean, lam)  # AD-GRL (reference :471-472)
        return recall_family_loss(mean, dementia_labels, kind, w, sample_mask)

    need_unmask = aux_metrics or stage == 0
    need_masked = aux_metrics or stage in (2, 3)
    need_ad_unmask = aux_metrics or stage == 1
    # stage 3 (toggle_more) drops the AM-softmax term — DCE it there
    need_score = aux_metrics or stage == 2

    loss_unmask = _ctc(outputs.logits_unmask) if need_unmask else zero
    loss_masked = _ctc(outputs.logits) if need_masked else zero
    loss_r = _ctc(outputs.logits_r, reverse=True) if need_masked else zero
    ad_loss_unmask = _ad(outputs.dementia_logits_unmask) if need_ad_unmask else zero
    ad_loss_rev = _ad(outputs.dementia_logits_lm, reverse=True) if need_masked else zero
    ad_loss = _ad(outputs.dementia_logits_ad) if need_masked else zero

    if need_score:
        # diversity (AM-softmax) over stacked masked frame embeddings
        # (reference :592-607: rows = B*T frames of each stream, labels 0/1)
        h = outputs.hidden_states.astype(jnp.float32)
        lm_rows = (outputs.lm_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
        ad_rows = (outputs.ad_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
        rows = jnp.concatenate([lm_rows, ad_rows], axis=0)
        am_labels = jnp.concatenate([
            jnp.zeros(lm_rows.shape[0], dtype=jnp.int32),
            jnp.ones(ad_rows.shape[0], dtype=jnp.int32),
        ])
        row_w = None
        if pool:
            fw = fm.astype(jnp.float32).reshape(-1)
            row_w = jnp.concatenate([fw, fw])
        score_loss, _ = am_softmax_loss(
            rows, am_labels, similar_fc_kernel.T, loss_type=cfg.am_loss_type,
            sample_weight=row_w,
        )
    else:
        score_loss = zero

    if stage == 0:
        final = loss_unmask
    elif stage == 1:
        final = ad_loss_unmask
    elif stage == 2:
        final = loss_masked + ad_loss_rev + loss_r + ad_loss + score_loss
    elif stage == 3:
        # toggle_more stage 3 (joint arbitrator + both heads): the stage-2
        # loss minus the AM-softmax term (reference:
        # centralized/functions/OtherMdls_Toggle_more.py:1057-1060)
        final = loss_masked + ad_loss_rev + loss_r + ad_loss
    else:
        raise ValueError(f"unknown stage {cfg.stage}")

    metrics = {
        "loss": final,
        "ctc_unmask": loss_unmask,
        "ctc_masked": loss_masked,
        "ctc_reversed": loss_r,
        "ad_unmask": ad_loss_unmask,
        "ad_reversed": ad_loss_rev,
        "ad_masked": ad_loss,
        "am_softmax": score_loss,
        # reported only when the stage consumes the masks (or full metrics
        # are requested) — otherwise they would force the arbitrator +
        # gumbel forward that stage 0/1 training otherwise DCEs away
        "lm_mask_on_rate": masked_time_mean(outputs.lm_mask, fm, True).mean()
        if need_masked else zero,
        "ad_mask_on_rate": masked_time_mean(outputs.ad_mask, fm, True).mean()
        if need_masked else zero,
    }
    return final, metrics


def grl_multitask_loss(
    outputs: DACSOutputs,
    labels: jax.Array,
    label_lengths: jax.Array,
    dementia_labels: jax.Array,
    cfg: DACSConfig,
    reverse: bool = True,
    sample_mask: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, Any]]:
    """GRL/multi-task baseline (reference: centralized/Models.py:298-425
    ``Data2VecAudioForCTC(config, LAMBDA, REVERSE)``): CTC on the unmasked
    stream + (optionally gradient-reversed) AD cross-entropy."""
    bcfg = cfg.backbone
    lp = jax.nn.log_softmax(outputs.logits_unmask.astype(jnp.float32), axis=-1)
    loss_ctc = ctc_loss(lp, labels, outputs.frame_lengths, label_lengths,
                        blank_id=bcfg.pad_token_id, reduction=bcfg.ctc_loss_reduction,
                        zero_infinity=bcfg.ctc_zero_infinity)
    ad_mean = masked_time_mean(
        outputs.dementia_logits_unmask.astype(jnp.float32),
        outputs.frame_mask, cfg.pool_valid_frames_only)
    if reverse:
        ad_mean = gradient_reversal(ad_mean, cfg.lambda_grl)
    ad = recall_family_loss(ad_mean, dementia_labels, "cel", None, sample_mask)
    final = loss_ctc + ad
    return final, {"loss": final, "ctc": loss_ctc, "ad": ad}
