"""SSL speech-encoder backbone family in flax.linen, TPU-first.

One parameterized implementation covers the checkpoints the reference sweeps
over — data2vec-audio (flagship, reference: federated/src/models.py using HF
``Data2VecAudioModel``), wav2vec2, hubert, unispeech-sat (reference:
centralized/functions/OtherMdls_*.py) — instead of five near-duplicated
model files. Structure switches are config flags (see ``BackboneConfig``).

TPU notes:
  * convs and matmuls run in the configured compute dtype (bf16 for speed);
    LayerNorm / softmax accumulate in fp32,
  * attention uses a fused additive-bias softmax formulation XLA maps to the
    MXU; sequence lengths here are ~10^3 so no ring/blockwise machinery,
  * optional ``remat`` wraps each transformer block in ``jax.checkpoint``
    (the reference trains with HF gradient_checkpointing,
    federated/src/update.py:451),
  * LayerDrop is intentionally not implemented (data-dependent layer skips
    defeat XLA tracing; the reference's fine-tune recipes run eval/frozen or
    short fine-tunes where its effect is marginal). Param-parity porting is
    unaffected.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .config import BackboneConfig

ACT2FN: dict[str, Callable] = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_python": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


def _dense_dot(cfg: BackboneConfig):
    """Dense ``dot_general`` by config: None (lax default, fp training
    semantics), the dynamic-W8A8 int8 matmul (ops/quant.py) for the
    inference-only ``dense_impl="int8"`` mode, or its custom-VJP
    SwitchBack-gradient twin for ``dense_impl="int8_train"``."""
    if cfg.dense_impl == "fp":
        return None
    if cfg.dense_impl == "int8":
        from ..ops.quant import int8_dense_dot_general

        return int8_dense_dot_general
    if cfg.dense_impl == "int8_train":
        from ..ops.quant import int8_train_dense_dot_general

        return int8_train_dense_dot_general
    raise ValueError(f"unknown dense_impl {cfg.dense_impl!r}")


def feat_extract_output_lengths(cfg: BackboneConfig, input_lengths: jax.Array) -> jax.Array:
    """Waveform sample count -> encoder frame count via the conv formula
    ``floor((len - kernel) / stride) + 1`` per layer (reference:
    centralized/Models.py:249-271 ``_get_feat_extract_output_lengths``)."""
    lengths = input_lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


class _ConvLayer(nn.Module):
    cfg: BackboneConfig
    layer_id: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C_in]
        cfg = self.cfg
        out_dim = cfg.conv_dim[self.layer_id]
        x = nn.Conv(
            features=out_dim,
            kernel_size=(cfg.conv_kernel[self.layer_id],),
            strides=(cfg.conv_stride[self.layer_id],),
            padding="VALID",
            use_bias=cfg.conv_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        # Norms here run at waveform-scale T (16k frames after conv0), where
        # flax's default fp32 LayerNorm materializes fp32 tensors and costs
        # ~half the whole feature-extractor runtime in HBM traffic (measured:
        # 8.1 -> ~5.5 ms at B=16x5s). Stats stay fp32 via LayerNorm's
        # float32-reduction promotion; only the normalize/affine apply runs
        # in the compute dtype.
        if cfg.feat_extract_norm == "layer":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        elif cfg.feat_extract_norm == "group" and self.layer_id == 0:
            # per-channel norm over time (torch GroupNorm(C, C))
            x = nn.GroupNorm(num_groups=out_dim, epsilon=1e-5, dtype=self.dtype,
                             name="layer_norm")(x)
        return ACT2FN[cfg.feat_extract_activation](x)


class FeatureEncoder(nn.Module):
    """Raw waveform [B, T] -> conv features [B, T', C]."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jax.Array) -> jax.Array:
        x = input_values[:, :, None].astype(self.dtype)
        for i in range(len(self.cfg.conv_dim)):
            x = _ConvLayer(self.cfg, i, self.dtype, name=f"conv_layers_{i}")(x)
        return x


class FeatureProjection(nn.Module):
    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x)
        x = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="projection",
                     dot_general=_dense_dot(self.cfg))(x.astype(self.dtype))
        return nn.Dropout(self.cfg.feat_proj_dropout)(x, deterministic=deterministic)


class _StackedPosConvLayer(nn.Module):
    """data2vec positional conv block: grouped conv + non-affine LN + GELU."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        k = cfg.conv_pos_kernel_size
        x = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:  # even kernel: symmetric pad adds one extra frame
            x = x[:, :-1, :]
        x = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)(x)
        return ACT2FN[cfg.feat_extract_activation](x.astype(self.dtype))


class PositionalConvEmbedding(nn.Module):
    """Convolutional relative positional embeddings.

    ``stacked`` = data2vec's N small grouped conv+LN+GELU layers;
    ``single`` = wav2vec2/hubert's one wide weight-normed grouped conv
    (weight norm is merged into a plain kernel at port time — it is a
    reparametrization, not a distinct function).
    """

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.pos_conv_type == "stacked":
            for i in range(cfg.num_conv_pos_embeddings):
                x = _StackedPosConvLayer(cfg, self.dtype, name=f"layers_{i}")(x)
            return x
        k = cfg.num_conv_pos_embeddings
        x = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:
            x = x[:, :-1, :]
        return ACT2FN[cfg.feat_extract_activation](x)


class Attention(nn.Module):
    """Multi-head self-attention; fp32 softmax, MXU-friendly einsums, or the
    fused Pallas flash kernel (cfg.attention_impl == "pallas"; no [T, T]
    probability tensor in HBM — ops/attention.py)."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attention_bias: jax.Array | None = None,
        deterministic: bool = True,
        key_mask: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        h, d = cfg.num_attention_heads, cfg.head_dim

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name,
                            dot_general=_dense_dot(cfg))

        b, t, _ = x.shape
        impl = cfg.attention_impl
        if impl == "auto":
            # On TPU the flash kernel beats XLA at every T once the block is
            # tuned (ops/attention.py auto_block) and it carries dropout
            # in-kernel, so "auto" = pallas whenever we're on TPU. On CPU
            # (tests) the kernel would run in the slow interpreter -> XLA.
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            # The fused kernel implements attention-prob dropout in-kernel
            # (counter-based hash mask, regenerated in the recompute
            # backward), so impl choice does not change training semantics.
            # At T >= ~1024 XLA's materialized [T, T] attention stops
            # compiling on v5e; this kernel is what makes long utterances
            # trainable at all.
            from ..ops.attention import multihead_attention

            rate = 0.0 if deterministic else cfg.attention_dropout
            rng = self.make_rng("dropout") if rate > 0.0 else None
            q = proj("q_proj")(x).reshape(b, t, h, d)
            k = proj("k_proj")(x).reshape(b, t, h, d)
            v = proj("v_proj")(x).reshape(b, t, h, d)
            ctx = multihead_attention(q, k, v, key_mask, impl="pallas",
                                      dropout_rate=rate, dropout_rng=rng)
            return proj("out_proj")(ctx.reshape(b, t, cfg.hidden_size))

        q = proj("q_proj")(x) * (d**-0.5)
        k = proj("k_proj")(x)
        v = proj("v_proj")(x)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, h, d)
        v = v.reshape(b, t, h, d)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if attention_bias is not None:
            scores = scores + attention_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, cfg.hidden_size)
        return proj("out_proj")(ctx)


class FeedForward(nn.Module):
    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense", dot_general=_dense_dot(cfg))(x)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.Dropout(cfg.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense",
                     dot_general=_dense_dot(cfg))(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class EncoderLayer(nn.Module):
    """Transformer block; post-norm (data2vec) or pre-norm (stable-LN)."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attention_bias: jax.Array | None = None,
        deterministic: bool = True,
        key_mask: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")
        ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")
        attn = Attention(cfg, self.dtype, name="attention")
        ffn = FeedForward(cfg, self.dtype, name="feed_forward")
        drop = nn.Dropout(cfg.hidden_dropout)

        if cfg.do_stable_layer_norm:  # pre-norm
            x = x + drop(
                attn(ln1(x).astype(self.dtype), attention_bias, deterministic,
                     key_mask),
                deterministic=deterministic,
            )
            x = x + ffn(ln2(x).astype(self.dtype), deterministic)
            return x
        # post-norm (data2vec audio)
        x = x + drop(attn(x, attention_bias, deterministic, key_mask),
                     deterministic=deterministic)
        x = ln1(x).astype(self.dtype)
        x = x + ffn(x, deterministic)
        return ln2(x).astype(self.dtype)


class _ScanBody(nn.Module):
    """nn.scan adapter: EncoderLayer as a (carry, ()) step function."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, carry, attention_bias, key_mask, deterministic: bool = True):
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        out = layer_cls(self.cfg, self.dtype, name="layer")(
            carry, attention_bias, deterministic, key_mask)
        return out, ()


class Encoder(nn.Module):
    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        frame_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        attention_bias = None
        if frame_mask is not None:
            fm = frame_mask.astype(self.dtype)
            x = x * fm[:, :, None]  # zero padded frames before pos conv
            attention_bias = jnp.where(
                frame_mask[:, None, None, :].astype(bool), 0.0, -1e9
            ).astype(jnp.float32)

        x = x + PositionalConvEmbedding(cfg, self.dtype, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
            x = x.astype(self.dtype)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        if self.scan_layers:
            # one compiled layer scanned over stacked params: identical math,
            # ~num_layers x smaller XLA program (compile-time win on TPU)
            scan = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_hidden_layers,
            )
            x, _ = scan(cfg, self.dtype, self.remat, name="layers_scan")(
                x, attention_bias, frame_mask, deterministic
            )
        else:
            layer_cls = EncoderLayer
            if self.remat:
                layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
            for i in range(cfg.num_hidden_layers):
                x = layer_cls(cfg, self.dtype, name=f"layers_{i}")(
                    x, attention_bias, deterministic, frame_mask
                )
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
            x = x.astype(self.dtype)
        return x


def sample_span_mask(
    rng: jax.Array,
    shape: tuple[int, int],
    mask_prob: float,
    mask_length: int,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """jit-friendly SpecAugment span sampling: Bernoulli span *starts* with
    rate ``mask_prob / mask_length`` (expected coverage = mask_prob),
    dilated to ``mask_length`` via a max window. Static shapes throughout
    (HF's numpy ``_compute_mask_indices`` is host-side and shape-dynamic)."""
    b, t = shape
    starts = jax.random.bernoulli(rng, mask_prob / mask_length, (b, t))
    if valid_mask is not None:
        starts = starts & valid_mask.astype(bool)
    spans = jax.lax.reduce_window(
        starts.astype(jnp.int32), 0, jax.lax.max,
        window_dimensions=(1, mask_length), window_strides=(1, 1),
        padding=((0, 0), (mask_length - 1, 0)),
    )
    return spans.astype(bool)


class SSLBackbone(nn.Module):
    """Full SSL speech encoder: waveform [B, T] -> embeddings [B, T', D].

    Equivalent role to HF ``Data2VecAudioModel`` / ``Wav2Vec2Model`` /
    ``HubertModel`` in the reference model layer (SURVEY.md §2.1 L1).
    """

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        input_values: jax.Array | None,
        frame_mask: jax.Array | None = None,
        deterministic: bool = True,
        precomputed_features: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        if precomputed_features is not None:
            # the conv frontend is frozen in every recipe (reference
            # freeze_feature_encoder) and fully deterministic, so its output
            # is a training-invariant constant per utterance — callers may
            # cache it and skip the conv stack (train/steps.py feature path)
            feats = precomputed_features
        else:
            feats = FeatureEncoder(cfg, self.dtype, name="feature_extractor")(input_values)
        x = FeatureProjection(cfg, self.dtype, name="feature_projection")(
            feats, deterministic
        )
        if cfg.mask_time_prob > 0:
            # created in both modes so init-at-eval and train share params
            masked_embed = self.param(
                "masked_spec_embed", nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,))
        else:
            masked_embed = None
        if not deterministic and (cfg.mask_time_prob > 0 or cfg.mask_feature_prob > 0):
            x = self._spec_augment(x, frame_mask, masked_embed)
        return Encoder(cfg, self.dtype, self.remat, self.scan_layers, name="encoder")(
            x, frame_mask, deterministic
        )

    def _spec_augment(self, x: jax.Array, frame_mask: jax.Array | None,
                      masked_embed: jax.Array | None) -> jax.Array:
        """SpecAugment (HF _mask_hidden_states equivalent): masked time spans
        are replaced by a learned embedding; masked feature spans are zeroed."""
        cfg = self.cfg
        b, t, d = x.shape
        if cfg.mask_time_prob > 0:
            tm = sample_span_mask(self.make_rng("dropout"), (b, t),
                                  cfg.mask_time_prob, cfg.mask_time_length,
                                  frame_mask)
            x = jnp.where(tm[:, :, None], masked_embed.astype(x.dtype)[None, None], x)
        if cfg.mask_feature_prob > 0:
            fm = sample_span_mask(self.make_rng("dropout"), (b, d),
                                  cfg.mask_feature_prob, cfg.mask_feature_length)
            x = jnp.where(fm[:, None, :], jnp.zeros((), x.dtype), x)
        return x

    def frame_mask_from_lengths(self, input_lengths: jax.Array, num_frames: int) -> jax.Array:
        frame_lengths = feat_extract_output_lengths(self.cfg, input_lengths)
        return (jnp.arange(num_frames)[None, :] < frame_lengths[:, None]).astype(jnp.int32)
