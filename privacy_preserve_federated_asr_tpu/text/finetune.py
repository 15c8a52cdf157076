"""End-to-end text-branch fine-tuning: the encoder INSIDE the training
graph, AdamW over ALL parameters.

This is the reference's actual ``SingleForwardModel`` training setup
(centralized/Dementia_challenge_models.py:304-313 — ``forward`` runs
``inp_model(inp)`` and ``configure_optimizers`` builds
``AdamW(self.parameters())`` with exp/lin/cos schedulers under Lightning),
as opposed to the head-on-frozen-embeddings fast path in
``.classifier.TextTrainer``. Head parity: ``logits = clf2(clf1(pooled))``
— two linear layers hidden -> hidden//2 -> num_labels with NO
nonlinearity between them (Dementia_challenge_models.py:243-244,307).

TPU-native shape discipline: tokenization pads every example to one
static ``max_length`` so the whole fit is a single jitted program; data
parallelism shards the batch over a ``data`` mesh axis with
``jax.sharding`` (the reference trains under Lightning DDP,
0207_DM_SentenceLvl1input.py:102) — XLA inserts the gradient psum from
the input shardings, no hand-written collectives.

Multi-input experiments (0207_DM_SentenceLvl2input*/3input*): one
trainable encoder per TEXT input (optionally shared), pooled outputs
fused by concat or the attentionFuse cross-attention; AUDIO inputs enter
as precomputed feature vectors appended at the head (``extra``) — the
wav2vec conv frontend stays frozen here (see text/audio_backend.py),
a documented deviation from the reference's fully-trained audio tower.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .bert import BertConfigT, BertEncoder


@dataclass(frozen=True)
class FinetuneConfig:
    bert: BertConfigT
    num_text_inputs: int = 1
    extra_dim: int = 0            # frozen (audio/semb) features fed to the head
    num_classes: int = 2
    regression: bool = False      # MMSE twin (SingleForwardModelRegression)
    fusion: str = "concat"        # concat | cross_attention
    align_dim: int = 128          # attentionFuse alignhiddensize
    share_encoder: bool = False   # one encoder serving every text input

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def fused_dim(self) -> int:
        if self.fusion == "cross_attention":
            return 2 * self.align_dim + self.extra_dim
        return self.num_text_inputs * self.bert.hidden_size + self.extra_dim


class FinetuneTextModel(nn.Module):
    """Trainable BERT encoder(s) + the reference's linear clf1/clf2 head."""

    cfg: FinetuneConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 extra: jax.Array | None = None, deterministic: bool = True):
        """input_ids/attention_mask: [B, L] for one text input or
        [B, num_text_inputs, L]; extra: [B, extra_dim] frozen features."""
        c = self.cfg
        if input_ids.ndim == 2:
            input_ids = input_ids[:, None, :]
            attention_mask = attention_mask[:, None, :]
        assert input_ids.shape[1] == c.num_text_inputs, (
            f"got {input_ids.shape[1]} text inputs, config says {c.num_text_inputs}")
        pooled = []
        for i in range(c.num_text_inputs):
            name = "encoder" if c.share_encoder else f"encoder_{i}"
            enc = BertEncoder(c.bert, self.dtype, name=name)
            _, p = enc(input_ids[:, i], attention_mask[:, i],
                       deterministic=deterministic)
            pooled.append(p)

        if c.fusion == "cross_attention":
            # attentionFuse (SentenceLvl2inputHeterogeneous_attentionFuse.py):
            # project both pooled views to align_dim, cross-attend each
            # against the other, concat the two attended views
            assert len(pooled) == 2, "cross_attention fuses exactly 2 text inputs"
            a = nn.Dense(c.align_dim, dtype=self.dtype, name="align_1")(pooled[0])
            b = nn.Dense(c.align_dim, dtype=self.dtype, name="align_2")(pooled[1])
            parts = [
                nn.Dense(c.align_dim, dtype=self.dtype, name="mha_a_t_out")(
                    nn.Dense(c.align_dim, dtype=self.dtype, name="mha_a_t_v")(b)),
                nn.Dense(c.align_dim, dtype=self.dtype, name="mha_t_a_out")(
                    nn.Dense(c.align_dim, dtype=self.dtype, name="mha_t_a_v")(a)),
            ]
        else:
            parts = pooled
        if extra is not None:
            assert c.extra_dim and extra.shape[-1] == c.extra_dim, (
                f"extra width {extra.shape[-1]} != extra_dim {c.extra_dim}")
            parts = parts + [extra.astype(self.dtype)]
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        # reference head: clf2(clf1(output)) — purely linear
        x = nn.Dense(c.fused_dim // 2, dtype=self.dtype, name="clf1")(x)
        out_dim = 1 if c.regression else c.num_classes
        return nn.Dense(out_dim, dtype=self.dtype, name="clf2")(x)


@dataclass
class FinetuneTrainerConfig:
    learning_rate: float = 2e-5
    lr_schedule: str = "lin"      # exp | lin | cos (configure_optimizers)
    weight_decay: float = 0.01
    num_epochs: int = 4
    batch_size: int = 8
    early_stopping_patience: int = 3
    max_length: int = 64          # static token length (one jitted program)
    dp: int = 1                   # batch sharding over a 'data' mesh axis
    seed: int = 0


class FinetuneTextTrainer:
    """Fit/eval with AdamW over ALL params (encoders + head), early
    stopping on validation accuracy, optional data parallelism."""

    def __init__(self, cfg: FinetuneConfig, tokenizer,
                 tcfg: FinetuneTrainerConfig | None = None):
        self.cfg = cfg
        self.tok = tokenizer
        self.tcfg = tcfg or FinetuneTrainerConfig()
        self.model = FinetuneTextModel(cfg)
        self.params = None
        self.best_params = None
        assert self.tcfg.max_length <= cfg.bert.max_position_embeddings, (
            f"max_length={self.tcfg.max_length} exceeds the encoder's "
            f"max_position_embeddings={cfg.bert.max_position_embeddings} — "
            "out-of-range position lookups produce NaN embeddings")
        self._mesh = None
        if self.tcfg.dp > 1:
            from jax.sharding import Mesh

            devs = jax.devices()
            assert len(devs) >= self.tcfg.dp, (
                f"dp={self.tcfg.dp} needs >= that many devices, have {len(devs)}")
            self._mesh = Mesh(np.asarray(devs[: self.tcfg.dp]), ("data",))

    # -- data plumbing ----------------------------------------------------
    def tokenize(self, texts_per_input: Sequence[Sequence[str]]
                 ) -> tuple[np.ndarray, np.ndarray]:
        """-> (ids, mask), each [N, num_text_inputs, max_length] int32."""
        L = self.tcfg.max_length
        n = len(texts_per_input[0])
        k = len(texts_per_input)
        assert k == self.cfg.num_text_inputs, (
            f"{k} text input columns, config says {self.cfg.num_text_inputs}")
        ids = np.full((n, k, L), self.tok.pad_id, dtype=np.int32)
        mask = np.zeros((n, k, L), dtype=np.int32)
        for j, texts in enumerate(texts_per_input):
            assert len(texts) == n, "text input columns must align"
            for i, t in enumerate(texts):
                seq, m = self.tok.encode(str(t), max_length=L, pad_to=L)
                ids[i, j], mask[i, j] = seq, m
        return ids, mask

    def init_params(self, rng=None, encoder_params: dict | None = None):
        """Init all params; optionally graft pretrained BERT params (from
        ``port_hf_bert``) into every encoder tower."""
        rng = jax.random.PRNGKey(self.tcfg.seed) if rng is None else rng
        L = self.tcfg.max_length
        ids = jnp.zeros((1, self.cfg.num_text_inputs, L), jnp.int32)
        extra = (jnp.zeros((1, self.cfg.extra_dim), jnp.float32)
                 if self.cfg.extra_dim else None)
        self.params = self.model.init(
            {"params": rng, "dropout": rng}, ids, jnp.ones_like(ids),
            extra)["params"]
        if encoder_params is not None:
            names = (["encoder"] if self.cfg.share_encoder else
                     [f"encoder_{i}" for i in range(self.cfg.num_text_inputs)])
            for name in names:
                chex_ref = jax.tree_util.tree_structure(self.params[name])
                got = jax.tree_util.tree_structure(encoder_params)
                assert chex_ref == got, "encoder params don't match the model"
                self.params[name] = jax.tree_util.tree_map(
                    jnp.asarray, encoder_params)
        return self.params

    def _schedule(self, steps_per_epoch: int) -> optax.Schedule:
        t = self.tcfg
        total = max(steps_per_epoch * t.num_epochs, 1)
        if t.lr_schedule == "exp":
            # ExponentialLR(gamma=0.5) steps once per epoch
            return optax.exponential_decay(
                t.learning_rate, steps_per_epoch, 0.5, staircase=True)
        if t.lr_schedule == "cos":
            return optax.cosine_decay_schedule(t.learning_rate, total)
        return optax.linear_schedule(t.learning_rate, 0.0, total)

    def _shard(self, tree):
        if self._mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
            return jax.device_put(x, NamedSharding(self._mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    def _replicate(self, tree):
        if self._mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(self._mesh, P())), tree)

    # -- fit/eval ---------------------------------------------------------
    def fit(self, texts_per_input: Sequence[Sequence[str]],
            labels: np.ndarray,
            extra: np.ndarray | None = None,
            val_texts_per_input: Sequence[Sequence[str]] | None = None,
            val_labels: np.ndarray | None = None,
            val_extra: np.ndarray | None = None,
            encoder_params: dict | None = None) -> dict:
        t, c = self.tcfg, self.cfg
        assert t.batch_size % t.dp == 0, "dp must divide batch_size"
        rng = jax.random.PRNGKey(t.seed)
        if self.params is None:
            self.init_params(rng, encoder_params)
        elif encoder_params is not None:
            raise ValueError(
                "params are already initialized; grafting encoder_params "
                "now would be ignored — pass them to init_params() or use "
                "a fresh trainer")
        ids, mask = self.tokenize(texts_per_input)
        val_tok = (self.tokenize(val_texts_per_input)
                   if val_labels is not None else None)
        labels = np.asarray(labels)
        steps_per_epoch = max(len(labels) // t.batch_size, 1)
        tx = optax.adamw(self._schedule(steps_per_epoch),
                         weight_decay=t.weight_decay)
        self.params = self._replicate(self.params)
        opt_state = self._replicate(tx.init(self.params))

        @jax.jit
        def step(params, opt_state, bids, bmask, bextra, yb, drng):
            loss, grads = jax.value_and_grad(self._loss)(
                params, bids, bmask, bextra, yb, drng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        best_metric, patience, history = -np.inf, 0, []
        nprng = np.random.default_rng(t.seed)
        ydt = np.float32 if c.regression else np.int32
        y = labels.astype(ydt)
        for epoch in range(t.num_epochs):
            order = nprng.permutation(len(y))
            losses = []
            for i in range(0, len(order) - t.batch_size + 1, t.batch_size):
                idx = order[i : i + t.batch_size]
                rng, sub = jax.random.split(rng)
                bextra = (self._shard(jnp.asarray(extra[idx], jnp.float32))
                          if extra is not None else None)
                self.params, opt_state, loss = step(
                    self.params, opt_state,
                    self._shard(jnp.asarray(ids[idx])),
                    self._shard(jnp.asarray(mask[idx])),
                    bextra, self._shard(jnp.asarray(y[idx])), sub)
                losses.append(float(loss))
            row = {"epoch": epoch,
                   "train_loss": float(np.mean(losses)) if losses else 0.0}
            if val_labels is not None:
                val = self._evaluate_tokenized(val_tok, val_labels, val_extra)
                row.update({f"val_{k}": v for k, v in val.items()})
                metric = -val["mse"] if c.regression else val["acc"]
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

    def predict(self, texts_per_input, extra: np.ndarray | None = None
                ) -> np.ndarray:
        return self._predict_tokenized(self.tokenize(texts_per_input), extra)

    def _predict_tokenized(self, tok_pair, extra: np.ndarray | None
                           ) -> np.ndarray:
        ids, mask = tok_pair
        out = []
        b = self.tcfg.batch_size
        # one param fetch per call, not per chunk (sharded params live on
        # the mesh; the eval program runs unsharded on the default device)
        params = jax.device_get(self.params) if self._mesh else self.params
        for i in range(0, len(ids), b):
            bids, bmask = ids[i : i + b], mask[i : i + b]
            pad = b - len(bids)   # static batch: one program for every chunk
            if pad:
                bids = np.concatenate([bids, np.repeat(bids[-1:], pad, 0)])
                bmask = np.concatenate([bmask, np.repeat(bmask[-1:], pad, 0)])
            bextra = None
            if extra is not None:
                be = extra[i : i + b]
                if pad:
                    be = np.concatenate([be, np.repeat(be[-1:], pad, 0)])
                bextra = jnp.asarray(be, jnp.float32)
            logits = self._apply_jit(
                params, jnp.asarray(bids), jnp.asarray(bmask), bextra)
            out.append(np.asarray(logits)[: b - pad if pad else b])
        logits = np.concatenate(out, axis=0)
        if self.cfg.regression:
            return logits[:, 0]
        return np.argmax(logits, axis=-1)

    @property
    def _apply_jit(self):
        if not hasattr(self, "_apply_cache"):
            self._apply_cache = jax.jit(
                lambda p, i, m, e: self.model.apply({"params": p}, i, m, e))
        return self._apply_cache

    def evaluate(self, texts_per_input, labels,
                 extra: np.ndarray | None = None) -> dict:
        return self._evaluate_tokenized(
            self.tokenize(texts_per_input), labels, extra)

    def _evaluate_tokenized(self, tok_pair, labels,
                            extra: np.ndarray | None = None) -> dict:
        pred = self._predict_tokenized(tok_pair, extra)
        y = np.asarray(labels)
        if self.cfg.regression:
            return {"mse": float(np.mean((pred - y) ** 2))}
        return {"acc": float(np.mean(pred == y))}

    def _loss(self, params, bids, bmask, bextra, yb, drng):
        """Training objective (shared by fit() and loss_and_grads —
        the dp-parity probe must differentiate the SAME function)."""
        logits = self.model.apply(
            {"params": params}, bids, bmask, bextra,
            deterministic=False, rngs={"dropout": drng})
        if self.cfg.regression:
            return jnp.mean((logits[:, 0] - yb) ** 2)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, yb[:, None].astype(jnp.int32), 1))

    def loss_and_grads(self, texts_per_input, labels,
                       extra: np.ndarray | None = None,
                       dropout_seed: int = 0):
        """One forward-backward on the given batch (deterministic dropout
        key): the dp==single-device parity probe — raw gradients compare
        before Adam's rescaling amplifies reduction-order fp noise on
        near-zero elements."""
        c = self.cfg
        if self.params is None:
            self.init_params()
        ids, mask = self.tokenize(texts_per_input)
        y = np.asarray(labels).astype(
            np.float32 if c.regression else np.int32)
        bextra = (self._shard(jnp.asarray(extra, jnp.float32))
                  if extra is not None else None)
        loss, grads = jax.jit(jax.value_and_grad(self._loss))(
            self._replicate(self.params),
            self._shard(jnp.asarray(ids)), self._shard(jnp.asarray(mask)),
            bextra, self._shard(jnp.asarray(y)),
            jax.random.PRNGKey(dropout_seed))
        return float(loss), jax.device_get(grads)

    def encoder_param_norm_delta(self, params_before) -> float:
        """L2 distance between current and given encoder params — the
        learning proof that fine-tuning actually moves the encoder."""
        names = [k for k in self.params if k.startswith("encoder")]
        tot = 0.0
        for n in names:
            leaves_a = jax.tree_util.tree_leaves(self.params[n])
            leaves_b = jax.tree_util.tree_leaves(params_before[n])
            for a, b in zip(leaves_a, leaves_b):
                tot += float(jnp.sum((jnp.asarray(a) - jnp.asarray(b)) ** 2))
        return float(np.sqrt(tot))
