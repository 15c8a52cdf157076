"""DACS model: SSL encoder + CTC head + AD head + toggling network.

One model serves both training and extraction — the forward always returns
the full outputs bundle (hidden states, both masks, all logit streams), so
the reference's duplicated train/eval twin classes
(``Data2VecAudioForCTC`` federated/src/models.py:262-631 and
``Data2VecAudioForCTC_eval`` :633-1004) collapse into a single module; the
stage-routed loss lives in :mod:`.objectives` as a pure function.

Mask machinery (reference forward :421-446):
  * ``arbitrator``: Dense(D -> 4D). Channels [0,D)+[D,2D) form per-node
    2-logit pairs for the **lm mask**; [2D,3D)+[3D,4D) for the **AD mask**.
  * optional TOGGLE_RATIO rescale ``y0' = (y1 - y0) * ratio + y0``,
  * straight-through Gumbel-softmax (tau = GS_TAU) -> hard mask = pair[...,0],
  * ``lm_masked = lm_mask * h``, ``ad_masked = ad_mask * h``.

Multitask N-best heads (``num_lms > 1``) reproduce the semi-supervised FL
model (reference: federated/src/Data2VecAudioForCTCMultitask_model.py:270-275).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops.gumbel import gumbel_softmax
from .backbone import feat_extract_output_lengths
from .config import DACSConfig
from .factory import make_backbone


@flax.struct.dataclass
class DACSOutputs:
    """Everything the trainer, evaluator and extractor need from one forward."""

    hidden_states: jax.Array          # [B, T, D] encoder output (post final dropout)
    logits_unmask: jax.Array          # [B, T, V] lm_head(h)        (stage-0 ASR)
    logits: jax.Array                 # [B, T, V] lm_head(lm_mask*h) (ASR loss)
    logits_r: jax.Array               # [B, T, V] lm_head(ad_mask*h) (ASR-GRL)
    dementia_logits_unmask: jax.Array # [B, T, 2] ad_head(h)         (stage-1)
    dementia_logits_lm: jax.Array     # [B, T, 2] ad_head(lm_mask*h) (AD-GRL)
    dementia_logits_ad: jax.Array     # [B, T, 2] ad_head(ad_mask*h) (AD clf)
    lm_mask: jax.Array                # [B, T, D] hard 0/1
    ad_mask: jax.Array                # [B, T, D] hard 0/1
    lm_score: jax.Array               # [B, T, D, 2] pre-GS logits (analysis)
    ad_score: jax.Array               # [B, T, D, 2]
    frame_mask: jax.Array             # [B, T] valid-frame indicator
    frame_lengths: jax.Array          # [B]
    # N-best lm_heads streams when num_lms > 1: tuple of
    # (head(h), head(lm_masked), head(ad_masked)) triples
    # (reference: Data2VecAudioForCTCMultitask_model.py:420-431)
    extra_logits: tuple = ()


class DACSModel(nn.Module):
    cfg: DACSConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    def setup(self):
        c = self.cfg
        self.backbone = make_backbone(c.backbone, self.dtype, self.remat,
                                      self.scan_layers, name="backbone")
        self.dropout = nn.Dropout(c.backbone.final_dropout)
        self.arbitrator = nn.Dense(c.hidden_size * 4, dtype=self.dtype, name="arbitrator")
        self.lm_head = nn.Dense(c.backbone.vocab_size, dtype=self.dtype, name="lm_head")
        self.dementia_head = nn.Dense(c.num_ad_classes, dtype=self.dtype, name="dementia_head")
        # AM-softmax projection ("criterion_similar.fc" in the reference) —
        # a model parameter so FedAvg / weight surgery see it.
        self.similar_fc = nn.Dense(c.num_ad_classes, use_bias=False, dtype=self.dtype,
                                   name="similar_fc")
        if c.num_lms > 1:
            self.lm_heads = [
                nn.Dense(c.backbone.vocab_size, dtype=self.dtype, name=f"lm_heads_{i}")
                for i in range(c.num_lms)
            ]

    def __call__(
        self,
        input_values: jax.Array,          # [B, T_samples]
        input_lengths: jax.Array | None = None,
        deterministic: bool = True,
        backbone_deterministic: bool | None = None,
        gumbel_noise: tuple[jax.Array, jax.Array] | None = None,
        mask_override: tuple[jax.Array | None, jax.Array | None] | None = None,
    ) -> DACSOutputs:
        """Forward pass.

        ``backbone_deterministic`` reproduces the reference's frozen-module
        semantics: stages 1/2 call ``.eval()`` on the frozen encoder
        (dropout off) while head dropout stays live
        (reference: federated/src/models.py:328-363 freeze methods).
        """
        c = self.cfg
        if backbone_deterministic is None:
            backbone_deterministic = deterministic

        # static python int: shapes are static under jit
        t_frames = feat_extract_output_lengths(c.backbone, input_values.shape[1])
        if input_lengths is None:
            input_lengths = jnp.full((input_values.shape[0],), input_values.shape[1],
                                     dtype=jnp.int32)
        frame_lengths = feat_extract_output_lengths(c.backbone, input_lengths)
        frame_mask = (
            jnp.arange(t_frames)[None, :] < frame_lengths[:, None]
        ).astype(jnp.int32)

        h = self.backbone(input_values, frame_mask, deterministic=backbone_deterministic)
        return self.apply_heads(h, frame_mask, frame_lengths, deterministic,
                                gumbel_noise, mask_override)

    def apply_from_features(
        self,
        features: jax.Array,              # [B, T', C_conv] frozen conv-frontend output
        frame_mask: jax.Array,            # [B, T']
        frame_lengths: jax.Array,         # [B]
        deterministic: bool = False,
        backbone_deterministic: bool | None = None,
        gumbel_noise: tuple[jax.Array, jax.Array] | None = None,
        mask_override: tuple[jax.Array | None, jax.Array | None] | None = None,
    ) -> DACSOutputs:
        """Forward from CACHED conv-frontend outputs (stage-0 fast path).

        The conv feature extractor is frozen in every recipe (reference
        ``freeze_feature_encoder``, federated/src/models.py:328-334) and has
        no dropout, so ``feature_extractor(x)`` is a training-invariant
        constant per utterance. Everything trained at stage 0 (feature
        projection, encoder, heads) and every stochastic layer (feat-proj
        dropout, SpecAugment, encoder dropouts, final dropout, Gumbel) sits
        after this cache point — numerically identical to ``__call__``."""
        if backbone_deterministic is None:
            backbone_deterministic = deterministic
        h = self.backbone(None, frame_mask, deterministic=backbone_deterministic,
                          precomputed_features=features)
        return self.apply_heads(h, frame_mask, frame_lengths, deterministic,
                                gumbel_noise, mask_override)

    def apply_heads(
        self,
        h: jax.Array,                     # [B, T, D] encoder output (pre final dropout)
        frame_mask: jax.Array,            # [B, T]
        frame_lengths: jax.Array,         # [B]
        deterministic: bool = True,
        gumbel_noise: tuple[jax.Array, jax.Array] | None = None,
        mask_override: tuple[jax.Array | None, jax.Array | None] | None = None,
    ) -> DACSOutputs:
        """Everything after the backbone. Exposed separately so frozen-
        encoder stages (1/2: the encoder is frozen AND run deterministic,
        reference .eval() semantics) can train heads on CACHED encoder
        outputs — numerically identical because final dropout (live in
        training) is applied here, after the cache point
        (``federated/engine.py`` cached-encoder rounds)."""
        c = self.cfg
        h = self.dropout(h, deterministic=deterministic)

        # --- toggling network -> masks ---
        d = c.hidden_size
        all_score = self.arbitrator(h).astype(jnp.float32)  # [B, T, 4D]
        lm_score = jnp.stack((all_score[..., :d], all_score[..., d : 2 * d]), axis=-1)
        ad_score = jnp.stack((all_score[..., 2 * d : 3 * d], all_score[..., 3 * d :]), axis=-1)
        if c.toggle_ratio != 0.0:
            lm_score = _toggle_rescale(lm_score, c.toggle_ratio)
            ad_score = _toggle_rescale(ad_score, c.toggle_ratio)

        if gumbel_noise is not None:  # injected noise (parity tests)
            lm_noise, ad_noise = gumbel_noise
            r1 = r2 = None
        else:
            r1, r2 = jax.random.split(self.make_rng("gumbel"))
            lm_noise = ad_noise = None
        lm_mask = gumbel_softmax(r1, lm_score, tau=c.gs_tau, hard=True, noise=lm_noise)[..., 0]
        ad_mask = gumbel_softmax(r2, ad_score, tau=c.gs_tau, hard=True, noise=ad_noise)[..., 0]
        if mask_override is not None:
            # forced-toggle experiments (evaluation/forced_toggle.py) replace
            # one or both Gumbel masks with externally constructed ones
            lm_over, ad_over = mask_override
            lm_mask = lm_mask if lm_over is None else lm_over
            ad_mask = ad_mask if ad_over is None else ad_over
        lm_mask = lm_mask.astype(self.dtype)
        ad_mask = ad_mask.astype(self.dtype)

        lm_masked = lm_mask * h
        ad_masked = ad_mask * h

        # materialize the AM-softmax projection params (the loss consumes the
        # kernel directly; this call is dead code XLA eliminates, but flax
        # needs it to create/track the parameter)
        _ = self.similar_fc(jnp.zeros((1, d), dtype=self.dtype))

        extra = ()
        if c.num_lms > 1:
            extra = tuple(
                (head(h), head(lm_masked), head(ad_masked)) for head in self.lm_heads)

        return DACSOutputs(
            hidden_states=h,
            logits_unmask=self.lm_head(h),
            logits=self.lm_head(lm_masked),
            logits_r=self.lm_head(ad_masked),
            dementia_logits_unmask=self.dementia_head(h),
            dementia_logits_lm=self.dementia_head(lm_masked),
            dementia_logits_ad=self.dementia_head(ad_masked),
            lm_mask=lm_mask,
            ad_mask=ad_mask,
            lm_score=lm_score,
            ad_score=ad_score,
            frame_mask=frame_mask,
            frame_lengths=frame_lengths,
            extra_logits=extra,
        )


def _toggle_rescale(score: jax.Array, ratio: float) -> jax.Array:
    """TOGGLE_RATIO knob: shift the mask-on logit toward the off logit
    (reference: federated/src/models.py:431-440)."""
    y0, y1 = score[..., 0], score[..., 1]
    return jnp.stack(((y1 - y0) * ratio + y0, y1), axis=-1)
