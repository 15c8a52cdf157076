"""SEW-D backbone: Squeezed-and-Efficient Wav2vec with DeBERTa-v2
disentangled attention (the fifth backbone family in the reference's sweep,
centralized/functions/OtherMdls_*.py ``SEWDForCTC``).

Architecture (mirrors HF ``SEWDModel`` for checkpoint porting):
  13-layer conv frontend (GroupNorm on conv 0 only) -> feature LayerNorm ->
  optional projection to hidden -> encoder: strided weight-normed positional
  conv + average-pool squeeze (factor 2) -> DeBERTa-v2 transformer
  (post-norm; content + c2p + p2c disentangled attention over log-bucketed
  relative positions with shared, layer-normed relative embeddings) ->
  linear upsample back to the pre-squeeze frame rate.

Relative-position buckets are computed statically (numpy) at trace time —
sequence lengths are static under jit, so the bucket table is a constant.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .backbone import ACT2FN, FeatureEncoder, _dense_dot
from .config import BackboneConfig


def make_log_bucket_position(relative_pos: np.ndarray, bucket_size: int,
                             max_position: int) -> np.ndarray:
    """DeBERTa-v2 log-bucketed relative positions (static numpy)."""
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where(
        (relative_pos < mid) & (relative_pos > -mid), mid - 1,
        np.abs(relative_pos))
    log_pos = (
        np.ceil(np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1))
        + mid
    )
    return np.where(abs_pos <= mid, relative_pos.astype(log_pos.dtype),
                    log_pos * sign)


def build_relative_position(q_len: int, k_len: int, bucket_size: int,
                            max_position: int) -> np.ndarray:
    rel = np.arange(q_len)[:, None] - np.arange(k_len)[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel.astype(np.int32)  # [Tq, Tk]


class DisentangledSelfAttention(nn.Module):
    """DeBERTa-v2 attention: content-content + c2p + p2c terms."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_embeddings, relative_pos, key_bias=None,
                 deterministic=True):
        c = self.cfg
        h = c.num_attention_heads
        d = c.hidden_size // h
        b, t, _ = x.shape
        span = c.position_buckets if c.position_buckets > 0 else c.max_position_embeddings

        q_proj = nn.Dense(c.hidden_size, dtype=self.dtype, name="query_proj",
                          dot_general=_dense_dot(c))
        k_proj = nn.Dense(c.hidden_size, dtype=self.dtype, name="key_proj",
                          dot_general=_dense_dot(c))
        v_proj = nn.Dense(c.hidden_size, dtype=self.dtype, name="value_proj",
                          dot_general=_dense_dot(c))

        def heads(y, n):
            return y.reshape(y.shape[0], n, h, d)

        q = heads(q_proj(x), t)
        k = heads(k_proj(x), t)
        v = heads(v_proj(x), t)

        scale_factor = 1 + len(c.pos_att_type)
        scale = jnp.sqrt(jnp.asarray(d * scale_factor, jnp.float32))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / scale

        if c.relative_attention:
            # shared att key: reuse q/k projections on the rel embeddings
            rel = rel_embeddings[None, : span * 2, :].astype(self.dtype)  # [1, 2S, D]
            pos_k = heads(k_proj(rel), span * 2)[0]  # [2S, h, d]
            pos_q = heads(q_proj(rel), span * 2)[0]
            rp = jnp.asarray(relative_pos)  # [Tq, Tk] int32

            if "c2p" in c.pos_att_type:
                c2p = jnp.einsum("bqhd,shd->bhqs", q, pos_k,
                                 preferred_element_type=jnp.float32)
                c2p_pos = jnp.clip(rp + span, 0, span * 2 - 1)  # [Tq, Tk]
                gathered = jnp.take_along_axis(
                    c2p, c2p_pos[None, None, :, :].astype(jnp.int32),
                    axis=-1)
                scores = scores + gathered / scale
            if "p2c" in c.pos_att_type:
                p2c = jnp.einsum("bkhd,shd->bhks", k, pos_q,
                                 preferred_element_type=jnp.float32)
                p2c_pos = jnp.clip(-rp + span, 0, span * 2 - 1)
                gathered = jnp.take_along_axis(
                    p2c, p2c_pos[None, None, :, :].astype(jnp.int32),
                    axis=-1)  # [B, h, Tk, Tq]
                scores = scores + gathered.transpose(0, 1, 3, 2) / scale

        if key_bias is not None:
            scores = scores + key_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c.hidden_size)
        return ctx


class SEWDLayer(nn.Module):
    """Post-norm BERT-style block with disentangled attention."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_embeddings, relative_pos, key_bias=None,
                 deterministic=True):
        c = self.cfg
        attn = DisentangledSelfAttention(c, self.dtype, name="attention_self")(
            x, rel_embeddings, relative_pos, key_bias, deterministic)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output",
                        dot_general=_dense_dot(c))(attn)
        attn = nn.Dropout(c.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_layer_norm")(
            x + attn).astype(self.dtype)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate",
                         dot_general=_dense_dot(c))(x)
        inter = ACT2FN[c.hidden_act](inter)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output",
                       dot_general=_dense_dot(c))(inter)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_layer_norm")(
            x + out).astype(self.dtype)


class SEWDBackbone(nn.Module):
    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False  # accepted for interface parity; not used

    @nn.compact
    def __call__(self, input_values, frame_mask=None, deterministic=True):
        c = self.cfg
        feats = FeatureEncoder(c, self.dtype, name="feature_extractor")(input_values)
        x = nn.LayerNorm(epsilon=c.feature_layer_norm_eps, name="layer_norm")(feats)
        x = x.astype(self.dtype)
        if c.conv_dim[-1] != c.hidden_size:
            x = nn.Dense(c.hidden_size, dtype=self.dtype, name="feature_projection",
                         dot_general=_dense_dot(c))(x)
        x = nn.Dropout(c.feat_proj_dropout)(x, deterministic=deterministic)

        t_conv = x.shape[1]
        if frame_mask is not None:
            x = x * frame_mask.astype(self.dtype)[:, :, None]

        # positional conv (stride = squeeze) + avg-pool squeeze
        k = c.num_conv_pos_embeddings
        pos = nn.Conv(
            features=c.hidden_size, kernel_size=(k,), strides=(c.squeeze_factor,),
            padding=[(k // 2, k // 2)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="pos_conv")(x)
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        pos = ACT2FN[c.feat_extract_activation](pos)

        sq = c.squeeze_factor
        t_pool = t_conv // sq
        pooled = x[:, : t_pool * sq, :].reshape(
            x.shape[0], t_pool, sq, -1).mean(axis=2)
        t_inner = min(pos.shape[1], pooled.shape[1])
        h = pooled[:, :t_inner] + pos[:, :t_inner]

        key_bias = None
        if frame_mask is not None:
            inner_lengths = jnp.sum(frame_mask, axis=1) // sq
            inner_mask = (jnp.arange(t_inner)[None, :] < inner_lengths[:, None])
            key_bias = jnp.where(inner_mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)

        # shared relative embeddings (layer-normed)
        span = c.position_buckets if c.position_buckets > 0 else c.max_position_embeddings
        rel_embeddings = self.param(
            "rel_embeddings", nn.initializers.normal(0.02),
            (span * 2, c.hidden_size))
        if "layer_norm" in c.norm_rel_ebd:
            rel_embeddings = nn.LayerNorm(
                epsilon=c.layer_norm_eps, name="rel_embeddings_layer_norm")(rel_embeddings)
        relative_pos = build_relative_position(
            t_inner, t_inner, c.position_buckets, c.max_position_embeddings)

        layer_cls = SEWDLayer
        if self.remat:
            layer_cls = nn.remat(SEWDLayer, static_argnums=(5,))
        for i in range(c.num_hidden_layers):
            h = layer_cls(c, self.dtype, name=f"layers_{i}")(
                h, rel_embeddings, relative_pos, key_bias, deterministic)

        # upsample back to the conv frame rate
        up = nn.Dense(c.hidden_size * sq, dtype=self.dtype, name="upsample",
                      dot_general=_dense_dot(c))(h)
        up = ACT2FN[c.feat_extract_activation](up)
        b = up.shape[0]
        up = up.reshape(b, t_inner * sq, c.hidden_size)
        if up.shape[1] < t_conv:
            up = jnp.pad(up, ((0, 0), (0, t_conv - up.shape[1]), (0, 0)))
        return up


def port_hf_sewd(state_dict, cfg: BackboneConfig, encoder_prefix: str | None = None) -> dict:
    """HF torch ``SEWDModel`` state_dict -> flax params for SEWDBackbone."""
    from .port import _merge_weight_norm, _np

    if encoder_prefix is None:
        encoder_prefix = "sew_d." if any(
            k.startswith("sew_d.") for k in state_dict) else ""
    sd = {k[len(encoder_prefix):]: v for k, v in state_dict.items()
          if k.startswith(encoder_prefix)}

    p: dict = {"feature_extractor": {}}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": {"kernel": _np(sd[f"{base}.conv.weight"]).transpose(2, 1, 0)}}
        if f"{base}.conv.bias" in sd:
            layer["conv"]["bias"] = _np(sd[f"{base}.conv.bias"])
        if f"{base}.layer_norm.weight" in sd:
            layer["layer_norm"] = {"scale": _np(sd[f"{base}.layer_norm.weight"]),
                                   "bias": _np(sd[f"{base}.layer_norm.bias"])}
        p["feature_extractor"][f"conv_layers_{i}"] = layer
    p["layer_norm"] = {"scale": _np(sd["layer_norm.weight"]),
                       "bias": _np(sd["layer_norm.bias"])}
    if "feature_projection.weight" in sd:
        p["feature_projection"] = {"kernel": _np(sd["feature_projection.weight"]).T,
                                   "bias": _np(sd["feature_projection.bias"])}
    w = _merge_weight_norm(sd, "encoder.pos_conv_embed.conv")
    p["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                     "bias": _np(sd["encoder.pos_conv_embed.conv.bias"])}
    p["rel_embeddings"] = _np(sd["encoder.encoder.rel_embeddings.weight"])
    if "encoder.encoder.LayerNorm.weight" in sd:
        p["rel_embeddings_layer_norm"] = {
            "scale": _np(sd["encoder.encoder.LayerNorm.weight"]),
            "bias": _np(sd["encoder.encoder.LayerNorm.bias"])}
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.encoder.layer.{i}"
        p[f"layers_{i}"] = {
            "attention_self": {
                "query_proj": {"kernel": _np(sd[f"{base}.attention.self.query_proj.weight"]).T,
                               "bias": _np(sd[f"{base}.attention.self.query_proj.bias"])},
                "key_proj": {"kernel": _np(sd[f"{base}.attention.self.key_proj.weight"]).T,
                             "bias": _np(sd[f"{base}.attention.self.key_proj.bias"])},
                "value_proj": {"kernel": _np(sd[f"{base}.attention.self.value_proj.weight"]).T,
                               "bias": _np(sd[f"{base}.attention.self.value_proj.bias"])},
            },
            "attention_output": {"kernel": _np(sd[f"{base}.attention.output.dense.weight"]).T,
                                 "bias": _np(sd[f"{base}.attention.output.dense.bias"])},
            "attention_layer_norm": {"scale": _np(sd[f"{base}.attention.output.LayerNorm.weight"]),
                                     "bias": _np(sd[f"{base}.attention.output.LayerNorm.bias"])},
            "intermediate": {"kernel": _np(sd[f"{base}.intermediate.dense.weight"]).T,
                             "bias": _np(sd[f"{base}.intermediate.dense.bias"])},
            "output": {"kernel": _np(sd[f"{base}.output.dense.weight"]).T,
                       "bias": _np(sd[f"{base}.output.dense.bias"])},
            "output_layer_norm": {"scale": _np(sd[f"{base}.output.LayerNorm.weight"]),
                                  "bias": _np(sd[f"{base}.output.LayerNorm.bias"])},
        }
    p["upsample"] = {"kernel": _np(sd["encoder.upsample.projection.weight"]).T,
                     "bias": _np(sd["encoder.upsample.projection.bias"])}
    return p
