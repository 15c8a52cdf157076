"""Transcript-based AD classifiers (the reference's Lightning
``SingleForwardModel`` family, centralized/Dementia_challenge_models.py:
208-577, and the 0207_DM_* experiment scripts).

Structure parity:
  * pluggable embedding backend (a :class:`..text.bert.BertEncoder` pooled
    output, or any precomputed per-input embedding),
  * 1-3 inputs fused by concatenation or a small attention pooled mix
    (reference sentence-level 1/2/3-input homo/heterogeneous variants),
  * pooler -> 2-layer MLP head, cross-entropy for AD classification or MSE
    for the MMSE regression twin,
  * AdamW with exponential / linear / cosine LR schedules, early stopping
    on validation accuracy.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class TextClassifierConfig:
    embed_dim: int = 768
    hidden_dim: int = 768
    num_classes: int = 2          # 1 + regression=True -> MMSE twin
    regression: bool = False
    num_inputs: int = 1
    fusion: str = "concat"        # concat | attention | cross_attention
    dropout: float = 0.1
    # per-input embedding widths for heterogeneous inputs (e.g. mbert 768 +
    # audio 512); inputs arrive flat-concatenated as [B, sum(input_dims)].
    # None -> homogeneous [B, num_inputs, embed_dim] (or [B, embed_dim]).
    input_dims: tuple[int, ...] | None = None
    align_dim: int = 128          # cross_attention projection width
                                  # (reference alignhiddensize, attentionFuse)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class TextClassifier(nn.Module):
    cfg: TextClassifierConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings: jax.Array, deterministic: bool = True):
        """embeddings: [B, num_inputs, E], [B, E] for 1 input, or — with
        cfg.input_dims — a flat [B, sum(input_dims)] heterogeneous pack."""
        c = self.cfg
        if c.input_dims is not None:
            parts, off = [], 0
            for dim in c.input_dims:
                parts.append(embeddings[:, off:off + dim])
                off += dim
        else:
            if embeddings.ndim == 2:
                embeddings = embeddings[:, None, :]
            parts = [embeddings[:, i] for i in range(embeddings.shape[1])]
        if len(parts) == 1:
            x = parts[0]
        elif c.fusion == "concat":
            # reference 2/3-input concat models: head width = sum of inputs
            # (Dementia_challenge_models.py / SentenceLvl2inputHeterogeneous)
            x = jnp.concatenate(parts, axis=-1)
        elif c.fusion == "cross_attention":
            # reference attentionFuse: project both inputs to align_dim and
            # cross-attend each against the other, concat the two views
            # (SentenceLvl2inputHeterogeneous_attentionFuse.py: clf1/clf2 to
            # alignhiddensize=128, mha_a_t + mha_t_a)
            assert len(parts) == 2, "cross_attention fuses exactly 2 inputs"
            a = nn.Dense(c.align_dim, dtype=self.dtype, name="align_1")(parts[0])
            b = nn.Dense(c.align_dim, dtype=self.dtype, name="align_2")(parts[1])
            ab = _single_query_attention(a, b, c.align_dim, self.dtype, "mha_a_t")
            ba = _single_query_attention(b, a, c.align_dim, self.dtype, "mha_t_a")
            x = jnp.concatenate([ab, ba], axis=-1)
        else:  # attention-fuse: softmax-scored mix of the input embeddings
            embeddings = jnp.stack(parts, axis=1)
            scores = nn.Dense(1, dtype=self.dtype, name="fuse_score")(embeddings)
            w = jax.nn.softmax(scores, axis=1)
            x = jnp.sum(w * embeddings, axis=1)
        # pooler (dense+tanh, as in BertPooler) then 2-layer MLP head
        x = jnp.tanh(nn.Dense(c.hidden_dim, dtype=self.dtype, name="pooler")(x))
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(c.hidden_dim, dtype=self.dtype, name="clf1")(x))
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        out_dim = 1 if c.regression else c.num_classes
        return nn.Dense(out_dim, dtype=self.dtype, name="clf2")(x)


@dataclass
class TextTrainerConfig:
    learning_rate: float = 2e-5
    lr_schedule: str = "lin"      # exp | lin | cos (reference AdamW options)
    weight_decay: float = 0.01
    num_epochs: int = 20
    batch_size: int = 16
    early_stopping_patience: int = 5
    seed: int = 0


class TextTrainer:
    """Fit/eval loop with early stopping on validation accuracy
    (EarlyStopping/ModelCheckpoint on val_acc in the reference)."""

    def __init__(self, cfg: TextClassifierConfig, tcfg: TextTrainerConfig = None):
        self.cfg = cfg
        self.tcfg = tcfg or TextTrainerConfig()
        self.model = TextClassifier(cfg)
        self.params = None
        self.best_params = None

    def _schedule(self, steps_per_epoch: int) -> optax.Schedule:
        t = self.tcfg
        total = max(steps_per_epoch * t.num_epochs, 1)
        if t.lr_schedule == "exp":
            return optax.exponential_decay(t.learning_rate, steps_per_epoch, 0.9)
        if t.lr_schedule == "cos":
            return optax.cosine_decay_schedule(t.learning_rate, total)
        return optax.linear_schedule(t.learning_rate, 0.0, total)

    def fit(self, x_train: np.ndarray, y_train: np.ndarray,
            x_val: np.ndarray | None = None, y_val: np.ndarray | None = None
            ) -> dict:
        t = self.tcfg
        rng = jax.random.PRNGKey(t.seed)
        x_train = jnp.asarray(x_train, dtype=jnp.float32)
        y_train = jnp.asarray(y_train)
        self.params = self.model.init(
            {"params": rng, "dropout": rng}, x_train[:1])["params"]
        steps_per_epoch = max(len(x_train) // t.batch_size, 1)
        tx = optax.adamw(self._schedule(steps_per_epoch),
                         weight_decay=t.weight_decay)
        opt_state = tx.init(self.params)

        def loss_fn(params, xb, yb, rng):
            logits = self.model.apply({"params": params}, xb,
                                      deterministic=False, rngs={"dropout": rng})
            if self.cfg.regression:
                return jnp.mean((logits[:, 0] - yb) ** 2)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None].astype(jnp.int32), 1))

        @jax.jit
        def step(params, opt_state, xb, yb, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        best_metric, patience, history = -np.inf, 0, []
        nprng = np.random.default_rng(t.seed)
        for epoch in range(t.num_epochs):
            order = nprng.permutation(len(x_train))
            losses = []
            for i in range(0, len(order) - t.batch_size + 1, t.batch_size):
                idx = order[i : i + t.batch_size]
                rng, sub = jax.random.split(rng)
                self.params, opt_state, loss = step(
                    self.params, opt_state, x_train[idx], y_train[idx], sub)
                losses.append(float(loss))
            row = {"epoch": epoch, "train_loss": float(np.mean(losses)) if losses else 0.0}
            if x_val is not None:
                val = self.evaluate(x_val, y_val)
                row.update({f"val_{k}": v for k, v in val.items()})
                metric = -val["mse"] if self.cfg.regression else val["acc"]
                if metric > best_metric:
                    best_metric, patience = metric, 0
                    self.best_params = jax.device_get(self.params)
                else:
                    patience += 1
                    if patience >= t.early_stopping_patience:
                        history.append(row)
                        break
            history.append(row)
        if self.best_params is not None:
            self.params = self.best_params
        return {"history": history, "best_val_metric": float(best_metric)}

    def predict(self, x: np.ndarray) -> np.ndarray:
        logits = self.model.apply({"params": self.params},
                                  jnp.asarray(x, dtype=jnp.float32))
        if self.cfg.regression:
            return np.asarray(logits[:, 0])
        return np.asarray(jnp.argmax(logits, axis=-1))

    def evaluate(self, x: np.ndarray, y: np.ndarray) -> dict:
        pred = self.predict(x)
        if self.cfg.regression:
            return {"mse": float(np.mean((pred - np.asarray(y)) ** 2))}
        return {"acc": float(np.mean(pred == np.asarray(y)))}


def _single_query_attention(q_vec, kv_vec, dim, dtype, name):
    """Multi-head attention with one pooled query against one pooled
    key/value (the degenerate-but-shape-faithful form of the reference's
    nn.MultiheadAttention over pooled sentence embeddings)."""
    q = nn.Dense(dim, dtype=dtype, name=f"{name}_q")(q_vec)
    k = nn.Dense(dim, dtype=dtype, name=f"{name}_k")(kv_vec)
    v = nn.Dense(dim, dtype=dtype, name=f"{name}_v")(kv_vec)
    # attention over a single key: softmax is identity, but the scaled score
    # still gates the value like the torch module does before out-proj
    del q, k  # single-key softmax == 1; scores don't change the output
    return nn.Dense(dim, dtype=dtype, name=f"{name}_out")(v)


def embed_sessions(
    encoder_apply: Callable[[np.ndarray, np.ndarray], np.ndarray],
    tokenizer,
    texts: Sequence[str],
    max_length: int = 512,
    batch_size: int = 16,
) -> np.ndarray:
    """Embed session documents with a BertEncoder pooled output (the
    reference's ``_get_embedding``), batched with padding."""
    out = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i : i + batch_size]
        enc = [tokenizer.encode(t, max_length=max_length) for t in chunk]
        width = max(len(ids) for ids, _ in enc)
        ids = np.full((len(chunk), width), tokenizer.pad_id, dtype=np.int32)
        mask = np.zeros((len(chunk), width), dtype=np.int32)
        for j, (seq, m) in enumerate(enc):
            ids[j, : len(seq)] = seq
            mask[j, : len(m)] = m
        out.append(np.asarray(encoder_apply(ids, mask)))
    return np.concatenate(out, axis=0)
