"""Shared functional forward for stack-parallel paths (pp, sp).

``make_composed_forward(model, stack_fn)`` rebuilds the DACS forward out of
the SAME flax modules the vanilla model uses (exact same param trees — no
separate "parallel model"), with the transformer layer stack replaced by a
caller-supplied ``stack_fn``:

  * ``parallel/pp.py`` plugs in the GPipe pipeline over a "pipe" mesh axis,
  * ``parallel/sp.py`` plugs in the sequence-sharded scan over a "seq" axis.

Everything before the stack (conv frontend, feature projection, SpecAugment,
positional conv, pre-LN, dropout) and after it (final LN, heads) is applied
functionally on the vanilla param tree, so checkpoints / FedAvg / export are
untouched by the parallelism choice. The returned forward matches the
``forward_fn`` hook signature ``train/steps.py`` consumes.

``stack_fn(layer_params, x, frame_mask, rng, deterministic) -> y`` receives
the ``backbone/encoder/layers_scan/layer`` subtree (the stacked [L, ...]
``scan_layers`` layout) and the encoder-input activations [B, T, D].
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def make_composed_forward(model, stack_fn: Callable) -> Callable:
    """DACS forward with the encoder layer stack replaced by ``stack_fn``.

    Returns ``forward(params, input_values, input_lengths, deterministic,
    backbone_deterministic, rngs) -> DACSOutputs``.
    """
    from ..models.backbone import (
        FeatureEncoder,
        FeatureProjection,
        PositionalConvEmbedding,
        feat_extract_output_lengths,
        sample_span_mask,
    )
    from ..models.dacs import DACSModel

    cfg = model.cfg
    bcfg = cfg.backbone
    dtype = model.dtype

    def forward(params, input_values, input_lengths=None,
                deterministic: bool = True,
                backbone_deterministic: bool | None = None, rngs=None):
        if backbone_deterministic is None:
            backbone_deterministic = deterministic
        rngs = dict(rngs or {})
        dkey = rngs.get("dropout", jax.random.PRNGKey(0))
        det = backbone_deterministic

        t_frames = feat_extract_output_lengths(bcfg, input_values.shape[1])
        if input_lengths is None:
            input_lengths = jnp.full((input_values.shape[0],),
                                     input_values.shape[1], jnp.int32)
        frame_lengths = feat_extract_output_lengths(bcfg, input_lengths)
        frame_mask = (jnp.arange(t_frames)[None, :]
                      < frame_lengths[:, None]).astype(jnp.int32)

        bp = params["backbone"]
        feats = FeatureEncoder(bcfg, dtype).apply(
            {"params": bp["feature_extractor"]}, input_values)
        x = FeatureProjection(bcfg, dtype).apply(
            {"params": bp["feature_projection"]}, feats, det,
            rngs=None if det else {"dropout": jax.random.fold_in(dkey, 101)})
        if not det and (bcfg.mask_time_prob > 0 or bcfg.mask_feature_prob > 0):
            # SSLBackbone._spec_augment, functionally
            b, t, d = x.shape
            if bcfg.mask_time_prob > 0:
                tm = sample_span_mask(
                    jax.random.fold_in(dkey, 102), (b, t),
                    bcfg.mask_time_prob, bcfg.mask_time_length, frame_mask)
                x = jnp.where(tm[:, :, None],
                              bp["masked_spec_embed"].astype(x.dtype)[None, None],
                              x)
            if bcfg.mask_feature_prob > 0:
                fm = sample_span_mask(
                    jax.random.fold_in(dkey, 103), (b, d),
                    bcfg.mask_feature_prob, bcfg.mask_feature_length)
                x = jnp.where(fm[:, None, :], jnp.zeros((), x.dtype), x)

        # Encoder pre-stack (models/backbone.py Encoder.__call__ order)
        ep = bp["encoder"]
        x = x * frame_mask.astype(dtype)[:, :, None]
        x = x + PositionalConvEmbedding(bcfg, dtype).apply(
            {"params": ep["pos_conv_embed"]}, x)
        if not bcfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=bcfg.layer_norm_eps).apply(
                {"params": ep["layer_norm"]}, x).astype(dtype)
        x = nn.Dropout(bcfg.hidden_dropout).apply(
            {}, x, deterministic=det,
            rngs=None if det else {"dropout": jax.random.fold_in(dkey, 104)})

        if "layers_scan" not in ep:
            raise ValueError(
                "stack-parallel forwards need the scan_layers (stacked "
                "[L, ...]) param layout — construct the Trainer/model with "
                "scan_layers=True")
        x = stack_fn(ep["layers_scan"]["layer"], x, frame_mask,
                     jax.random.fold_in(dkey, 105), det)

        if bcfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=bcfg.layer_norm_eps).apply(
                {"params": ep["layer_norm"]}, x).astype(dtype)

        return model.apply(
            {"params": params}, x, frame_mask, frame_lengths, deterministic,
            method=DACSModel.apply_heads, rngs=rngs)

    return forward
