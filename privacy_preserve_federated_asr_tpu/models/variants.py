"""DACS method-family variants: single-toggle and FSM models.

The reference implements these as separate in-file model classes per
trainer script (and ×5 backbones in centralized/functions/OtherMdls_*.py);
here each is one flax module over the shared :class:`SSLBackbone`, and the
backbone choice is just config.

* SingleToggleModel — arbitrator is Dense(D -> 2D): ONLY the lm mask exists
  (reference: centralized/trainer_data2vec_toggle.py:53-334, arbitrator at
  :72). Stages: 1 = AD head on unmasked stream, 2/3 = ctc(lm_masked) +
  gradient-reversed AD CE on the lm stream.

* FSMModel — two separate feature-scoring machines ``lm_fsm`` /
  ``dementia_fsm`` (Dense(D -> D)); masks = sigmoid(score) >= threshold
  (hard, reference: centralized/trainer_data2vec_5st.py:242-250), plus a
  GRL branch that re-masks the gradient-reversed embedding and feeds
  ``lm_grl`` / ``dementia_grl`` heads (:275-296). Six stage configurations
  (:372-391). NOTE (reproduced quirk): the reference's straight-through
  hack ``mask + 0 * lm_fsm(mask)`` contributes exactly zero gradient, so
  the threshold masks are non-differentiable there too — we use
  ``stop_gradient`` which is the same function.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops.ctc import ctc_loss
from ..ops.grl import gradient_reversal
from ..ops.gumbel import gumbel_softmax
from ..ops.losses import am_softmax_loss, fsm_attention_loss, recall_family_loss
from .backbone import feat_extract_output_lengths
from .config import DACSConfig
from .factory import make_backbone
from .objectives import masked_time_mean


# ---------------------------------------------------------------------------
# single-toggle
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class SingleToggleOutputs:
    hidden_states: jax.Array
    logits: jax.Array                  # lm_head(lm_mask * h)
    dementia_logits_unmask: jax.Array  # ad_head(h)
    dementia_logits_lm: jax.Array      # ad_head(lm_mask * h)
    lm_mask: jax.Array
    lm_score: jax.Array
    frame_mask: jax.Array
    frame_lengths: jax.Array


class SingleToggleModel(nn.Module):
    cfg: DACSConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, input_values, input_lengths=None, deterministic=True,
                 backbone_deterministic=None, gumbel_noise=None) -> SingleToggleOutputs:
        c = self.cfg
        if backbone_deterministic is None:
            backbone_deterministic = deterministic
        t_frames = feat_extract_output_lengths(c.backbone, input_values.shape[1])
        if input_lengths is None:
            input_lengths = jnp.full((input_values.shape[0],), input_values.shape[1],
                                     dtype=jnp.int32)
        frame_lengths = feat_extract_output_lengths(c.backbone, input_lengths)
        frame_mask = (jnp.arange(t_frames)[None, :] < frame_lengths[:, None]).astype(jnp.int32)

        h = make_backbone(c.backbone, self.dtype, self.remat, self.scan_layers,
                          name="backbone")(
            input_values, frame_mask, deterministic=backbone_deterministic)
        h = nn.Dropout(c.backbone.final_dropout)(h, deterministic=deterministic)

        d = c.hidden_size
        all_score = nn.Dense(2 * d, dtype=self.dtype, name="arbitrator")(h)
        all_score = all_score.astype(jnp.float32)
        lm_score = jnp.stack((all_score[..., :d], all_score[..., d:]), axis=-1)
        if gumbel_noise is not None:
            lm_mask = gumbel_softmax(None, lm_score, tau=c.gs_tau, hard=True,
                                     noise=gumbel_noise)[..., 0]
        else:
            lm_mask = gumbel_softmax(self.make_rng("gumbel"), lm_score,
                                     tau=c.gs_tau, hard=True)[..., 0]
        lm_mask = lm_mask.astype(self.dtype)
        lm_masked = lm_mask * h

        lm_head = nn.Dense(c.backbone.vocab_size, dtype=self.dtype, name="lm_head")
        ad_head = nn.Dense(c.num_ad_classes, dtype=self.dtype, name="dementia_head")
        return SingleToggleOutputs(
            hidden_states=h,
            logits=lm_head(lm_masked),
            dementia_logits_unmask=ad_head(h),
            dementia_logits_lm=ad_head(lm_masked),
            lm_mask=lm_mask,
            lm_score=lm_score,
            frame_mask=frame_mask,
            frame_lengths=frame_lengths,
        )


def single_toggle_loss(out: SingleToggleOutputs, labels, label_lengths,
                       dementia_labels, cfg: DACSConfig,
                       sample_mask=None) -> tuple[jax.Array, dict[str, Any]]:
    """Stages (reference trainer_data2vec_toggle.py:320-327):
    1 = AD CE on unmasked; 2/3 = ctc(lm_masked) + reversed AD CE."""
    bcfg = cfg.backbone
    lp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
    loss_ctc = ctc_loss(lp, labels, out.frame_lengths, label_lengths,
                        blank_id=bcfg.pad_token_id, reduction=bcfg.ctc_loss_reduction,
                        zero_infinity=bcfg.ctc_zero_infinity)
    pool = cfg.pool_valid_frames_only
    ad_unmask = masked_time_mean(out.dementia_logits_unmask.astype(jnp.float32),
                                 out.frame_mask, pool)
    ad_lm = masked_time_mean(out.dementia_logits_lm.astype(jnp.float32),
                             out.frame_mask, pool)
    ad_lm_rev = gradient_reversal(ad_lm, cfg.lambda_grl)
    # reference single-toggle uses W=[0.1, 0.9] for its "recall" branch
    w = [0.1, 0.9] if cfg.ad_loss == "recall" else None
    ad_loss_unmask = recall_family_loss(ad_unmask, dementia_labels, cfg.ad_loss, w, sample_mask)
    ad_loss_rev = recall_family_loss(ad_lm_rev, dementia_labels, cfg.ad_loss, w, sample_mask)

    if cfg.stage == 1:
        final = ad_loss_unmask
    else:  # stages 2 and 3 share the loss; they differ in trainable params
        final = loss_ctc + ad_loss_rev
    return final, {"loss": final, "ctc": loss_ctc, "ad_unmask": ad_loss_unmask,
                   "ad_reversed": ad_loss_rev}


def single_toggle_trainable(stage: int):
    """Reference freezing (trainer_data2vec_toggle.py:83-100): stage 1 ->
    dementia_head; stage 2 -> arbitrator; stage 3 -> heads + arbitrator."""
    def pred(path: tuple[str, ...]) -> bool:
        top = path[0]
        if top == "backbone":
            return False
        if stage == 1:
            return top == "dementia_head"
        if stage == 2:
            return top == "arbitrator"
        if stage == 3:
            return top in ("lm_head", "dementia_head", "arbitrator")
        raise ValueError(stage)
    return pred


# ---------------------------------------------------------------------------
# FSM (sigmoid-threshold feature-scoring machines)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class FSMOutputs:
    hidden_states: jax.Array
    logits: jax.Array            # lm_head(lm_mask * h)
    logits_r: jax.Array          # lm_grl(dementia_mask_r * GRL(h))
    dementia_logits: jax.Array   # dementia_head(dementia_mask * h)
    dementia_logits_r: jax.Array # dementia_grl(lm_mask_r * GRL(h))
    lm_mask: jax.Array
    dementia_mask: jax.Array
    lm_score: jax.Array
    dementia_score: jax.Array
    frame_mask: jax.Array
    frame_lengths: jax.Array


class FSMModel(nn.Module):
    cfg: DACSConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    lm_thres: float = 0.5
    ad_thres: float = 0.5

    @nn.compact
    def __call__(self, input_values, input_lengths=None, deterministic=True,
                 backbone_deterministic=None) -> FSMOutputs:
        c = self.cfg
        if backbone_deterministic is None:
            backbone_deterministic = deterministic
        t_frames = feat_extract_output_lengths(c.backbone, input_values.shape[1])
        if input_lengths is None:
            input_lengths = jnp.full((input_values.shape[0],), input_values.shape[1],
                                     dtype=jnp.int32)
        frame_lengths = feat_extract_output_lengths(c.backbone, input_lengths)
        frame_mask = (jnp.arange(t_frames)[None, :] < frame_lengths[:, None]).astype(jnp.int32)

        h = make_backbone(c.backbone, self.dtype, self.remat, self.scan_layers,
                          name="backbone")(
            input_values, frame_mask, deterministic=backbone_deterministic)
        h = nn.Dropout(c.backbone.final_dropout)(h, deterministic=deterministic)

        lm_fsm = nn.Dense(c.hidden_size, dtype=self.dtype, name="lm_fsm")
        ad_fsm = nn.Dense(c.hidden_size, dtype=self.dtype, name="dementia_fsm")

        def hard_mask(x, fsm, thres):
            score = jax.nn.sigmoid(fsm(x).astype(jnp.float32))
            # reference's "+ 0 * fsm(mask)" straight-through hack contributes
            # zero gradient; stop_gradient is the same function
            return jax.lax.stop_gradient(
                jnp.where(score >= thres, 1.0, 0.0)).astype(self.dtype), score

        lm_mask, lm_score = hard_mask(h, lm_fsm, self.lm_thres)
        ad_mask, ad_score = hard_mask(h, ad_fsm, self.ad_thres)
        lm_masked = lm_mask * h
        ad_masked = ad_mask * h

        # GRL branch: reversed embedding, re-masked, crossed heads
        h_r = gradient_reversal(h, c.lambda_grl)
        lm_mask_r, _ = hard_mask(h_r, lm_fsm, self.lm_thres)
        ad_mask_r, _ = hard_mask(h_r, ad_fsm, self.ad_thres)

        lm_head = nn.Dense(c.backbone.vocab_size, dtype=self.dtype, name="lm_head")
        lm_grl = nn.Dense(c.backbone.vocab_size, dtype=self.dtype, name="lm_grl")
        ad_head = nn.Dense(c.num_ad_classes, dtype=self.dtype, name="dementia_head")
        ad_grl = nn.Dense(c.num_ad_classes, dtype=self.dtype, name="dementia_grl")
        _ = nn.Dense(c.num_ad_classes, use_bias=False, dtype=self.dtype,
                     name="similar_fc")(jnp.zeros((1, c.hidden_size), self.dtype))

        return FSMOutputs(
            hidden_states=h,
            logits=lm_head(lm_masked),
            logits_r=lm_grl(ad_mask_r * h_r),
            dementia_logits=ad_head(ad_masked),
            dementia_logits_r=ad_grl(lm_mask_r * h_r),
            lm_mask=lm_mask,
            dementia_mask=ad_mask,
            lm_score=lm_score,
            dementia_score=ad_score,
            frame_mask=frame_mask,
            frame_lengths=frame_lengths,
        )


def fsm_loss(out: FSMOutputs, labels, label_lengths, dementia_labels,
             cfg: DACSConfig, similar_fc_kernel,
             sample_mask=None) -> tuple[jax.Array, dict[str, Any]]:
    """Six stage configurations (reference trainer_data2vec_5st.py:372-391)."""
    bcfg = cfg.backbone

    def _ctc(logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return ctc_loss(lp, labels, out.frame_lengths, label_lengths,
                        blank_id=bcfg.pad_token_id, reduction=bcfg.ctc_loss_reduction,
                        zero_infinity=bcfg.ctc_zero_infinity)

    loss = _ctc(out.logits)
    loss_r = _ctc(out.logits_r)

    pool = cfg.pool_valid_frames_only
    fm = out.frame_mask
    ad_mean = masked_time_mean(out.dementia_logits.astype(jnp.float32), fm, pool)
    ad_mean_r = masked_time_mean(out.dementia_logits_r.astype(jnp.float32), fm, pool)
    dementia_loss = recall_family_loss(ad_mean, dementia_labels, "cel", None, sample_mask)
    dementia_loss_rev = recall_family_loss(ad_mean_r, dementia_labels, "cel", None, sample_mask)

    att_loss = fsm_attention_loss(out.lm_mask, out.dementia_mask,
                                  fm if pool else None)

    h = out.hidden_states.astype(jnp.float32)
    lm_rows = (out.lm_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
    ad_rows = (out.dementia_mask.astype(jnp.float32) * h).reshape(-1, h.shape[-1])
    rows = jnp.concatenate([lm_rows, ad_rows], axis=0)
    am_labels = jnp.concatenate([
        jnp.zeros(lm_rows.shape[0], dtype=jnp.int32),
        jnp.ones(ad_rows.shape[0], dtype=jnp.int32)])
    row_w = None
    if pool:
        fw = fm.astype(jnp.float32).reshape(-1)
        row_w = jnp.concatenate([fw, fw])
    score_loss, _ = am_softmax_loss(rows, am_labels, similar_fc_kernel.T,
                                    loss_type=cfg.am_loss_type, sample_weight=row_w)

    stage = cfg.stage
    if stage in (1, 2, 6):
        final = loss + dementia_loss + score_loss + att_loss
    elif stage == 3:
        final = dementia_loss_rev
    elif stage == 4:
        final = loss_r
    elif stage == 5:
        final = loss + dementia_loss_rev
    else:
        raise ValueError(f"unknown FSM stage {stage}")
    return final, {"loss": final, "ctc": loss, "ctc_reversed": loss_r,
                   "ad": dementia_loss, "ad_reversed": dementia_loss_rev,
                   "att": att_loss, "am_softmax": score_loss}


def fsm_trainable(stage: int):
    """Reference freezing (trainer_data2vec_5st.py:108-148)."""
    def pred(path: tuple[str, ...]) -> bool:
        top = path[0]
        if top == "backbone":
            if path[1] == "feature_extractor":
                return False
            return stage in (1, 2)
        frozen = {
            1: {"lm_grl", "dementia_grl", "lm_head", "dementia_head"},
            2: {"lm_grl", "dementia_grl"},
            3: {"lm_fsm", "dementia_fsm", "lm_head", "dementia_head", "lm_grl"},
            4: {"lm_fsm", "dementia_fsm", "lm_head", "dementia_head", "dementia_grl"},
            5: {"dementia_fsm", "similar_fc", "lm_head", "dementia_head",
                "lm_grl", "dementia_grl"},
            6: {"lm_head", "dementia_head", "similar_fc", "lm_grl", "dementia_grl"},
        }[stage]
        return top not in frozen
    return pred
