"""Minimal BERT encoder in flax + WordPiece tokenizer + HF torch port.

The reference's text branch embeds transcripts with HF BERT-family models
(mBERT, clinical/bio BERTs, XLM — reference:
centralized/Dementia_challenge_models.py:246-303 ``_setup_embedding`` /
``_get_embedding``). Here the encoder is a small flax module (post-norm
transformer, same math as BERT) whose params port from any HF torch
``BertModel`` state_dict, so the same pretrained checkpoints plug in —
TPU-native instead of a torch dependency.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfigT:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @classmethod
    def tiny_for_tests(cls):
        return cls(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64)


class _BertLayer(nn.Module):
    cfg: BertConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True):
        c = self.cfg
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        b, t, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        q = q.reshape(b, t, h, d) * (d ** -0.5)
        k = k.reshape(b, t, h, d)
        v = v.reshape(b, t, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c.hidden_size)
        attn_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(ctx)
        attn_out = nn.Dropout(c.hidden_dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_layer_norm")(
            x + attn_out).astype(self.dtype)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_layer_norm")(
            x + out).astype(self.dtype)


class BertEncoder(nn.Module):
    cfg: BertConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.cfg
        b, t = input_ids.shape
        emb = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")(jnp.arange(t)[None, :])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_layer_norm")(
            emb + pos + typ).astype(self.dtype)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)

        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :].astype(bool),
                             0.0, -1e9).astype(jnp.float32)
        for i in range(c.num_hidden_layers):
            x = _BertLayer(c, self.dtype, name=f"layer_{i}")(x, bias, deterministic)
        pooled = jnp.tanh(
            nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0]))
        return x, pooled


def port_hf_bert(state_dict, cfg: BertConfigT, prefix: str = "") -> dict:
    """HF torch BertModel state_dict -> flax params for BertEncoder."""
    def t(key):
        v = state_dict[prefix + key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    p: dict = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": t("embeddings.token_type_embeddings.weight")},
        "embeddings_layer_norm": {"scale": t("embeddings.LayerNorm.weight"),
                                  "bias": t("embeddings.LayerNorm.bias")},
        "pooler": {"kernel": t("pooler.dense.weight").T, "bias": t("pooler.dense.bias")},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "query": {"kernel": t(b + "attention.self.query.weight").T,
                      "bias": t(b + "attention.self.query.bias")},
            "key": {"kernel": t(b + "attention.self.key.weight").T,
                    "bias": t(b + "attention.self.key.bias")},
            "value": {"kernel": t(b + "attention.self.value.weight").T,
                      "bias": t(b + "attention.self.value.bias")},
            "attention_output": {"kernel": t(b + "attention.output.dense.weight").T,
                                 "bias": t(b + "attention.output.dense.bias")},
            "attention_layer_norm": {"scale": t(b + "attention.output.LayerNorm.weight"),
                                     "bias": t(b + "attention.output.LayerNorm.bias")},
            "intermediate": {"kernel": t(b + "intermediate.dense.weight").T,
                             "bias": t(b + "intermediate.dense.bias")},
            "output": {"kernel": t(b + "output.dense.weight").T,
                       "bias": t(b + "output.dense.bias")},
            "output_layer_norm": {"scale": t(b + "output.LayerNorm.weight"),
                                  "bias": t(b + "output.LayerNorm.bias")},
        }
    return p


def _basic_split(text: str, lowercase: bool) -> list[str]:
    if lowercase:
        text = text.lower()
    out, word = [], []
    for ch in text:
        if ch.isalnum() or ch == "'":
            word.append(ch)
        else:
            if word:
                out.append("".join(word))
                word = []
            if not ch.isspace():
                out.append(ch)
    if word:
        out.append("".join(word))
    return out


class WordPieceTokenizer:
    """Greedy longest-match WordPiece (BERT-style), loading a standard
    vocab.txt (one token per line, ## continuations)."""

    def __init__(self, vocab: dict[str, int] | list[str], lowercase: bool = True,
                 cls_token="[CLS]", sep_token="[SEP]", pad_token="[PAD]",
                 unk_token="[UNK]"):
        if isinstance(vocab, list):
            vocab = {tok: i for i, tok in enumerate(vocab)}
        self.vocab = vocab
        self.lowercase = lowercase
        self.cls_id = vocab[cls_token]
        self.sep_id = vocab[sep_token]
        self.pad_id = vocab[pad_token]
        self.unk_id = vocab[unk_token]

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        with open(path) as f:
            return cls([line.rstrip("\n") for line in f], **kw)

    @classmethod
    def from_corpus(cls, texts, max_vocab: int = 8000, lowercase: bool = True,
                    **kw) -> "WordPieceTokenizer":
        """Whole-word vocab built from a corpus (degenerate WordPiece: no
        ## continuations, OOV -> [UNK]) — lets the fine-tune path run
        standalone, with no pretrained vocab.txt asset."""
        from collections import Counter

        counts: Counter = Counter()
        for t in texts:
            counts.update(_basic_split(str(t), lowercase))
        specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        words = [w for w, _ in counts.most_common(max_vocab - len(specials))]
        return cls(specials + words, lowercase=lowercase, **kw)

    def _split(self, text: str) -> list[str]:
        return _basic_split(text, self.lowercase)

    def _wordpiece(self, word: str) -> list[int]:
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str, max_length: int = 512,
               pad_to: int | None = None) -> tuple[list[int], list[int]]:
        """-> (input_ids, attention_mask) with [CLS] ... [SEP] framing."""
        ids = [self.cls_id]
        for word in self._split(text):
            ids.extend(self._wordpiece(word))
        ids = ids[: max_length - 1] + [self.sep_id]
        mask = [1] * len(ids)
        if pad_to is not None:
            ids = ids + [self.pad_id] * (pad_to - len(ids))
            mask = mask + [0] * (pad_to - len(mask))
        return ids, mask
