"""Pure-function loss library for the DACS objective family.

All functions are pure (params passed in explicitly), fp32 internally, and
fuse into the surrounding XLA graph. They reproduce the reference's numerics:

  * ``recall_family_loss``  — reference federated/src/models.py:187-260
    (RecallLoss: soft recall / precision / F1, weighted ``1 - metric`` forms)
  * ``am_softmax_loss``     — reference federated/src/models.py:131-185
    (AngularPenaltySMLoss; cosface default s=30, m=0.4). NOTE: the reference
    "normalizes" the fc weight in a loop that rebinds a local name and
    therefore does NOT actually normalize W — only the input x is normalized.
    We reproduce that behavior (normalize_weight=False by default).
  * ``fsm_attention_loss``  — reference centralized/Models.py:56-74
    (Frobenius norm of the 2x2 cross-cosine matrix of time-averaged masks)
  * ``cross_entropy_loss``  — torch ``nn.CrossEntropyLoss`` (mean reduction)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

RECALL_LOSS_KINDS = ("cel", "recall", "prec", "f1", "recall_ori", "prec_ori")


def _weighted_mean(x: jax.Array, w: jax.Array | None, axis=None) -> jax.Array:
    """Mean, or sample-weighted mean when ``w`` is given (w broadcasts on the
    leading batch axis; used to ignore rows padding out a short batch)."""
    if w is None:
        return jnp.mean(x, axis=axis)
    w = w.astype(x.dtype)
    while w.ndim < x.ndim:
        w = w[..., None]
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(jnp.broadcast_to(w, x.shape), axis=axis), 1e-9)


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, sample_weight: jax.Array | None = None
) -> jax.Array:
    """Mean softmax cross-entropy over the batch; logits [N, C], labels [N]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _weighted_mean(nll, sample_weight)


def recall_family_loss(
    logits: jax.Array,
    labels: jax.Array,
    kind: str,
    weight: Sequence[float] | None,
    sample_weight: jax.Array | None = None,
) -> jax.Array:
    """Soft recall / precision / F1 losses for imbalanced classification.

    Args:
      logits: [N, C] raw scores (the AD head's time-pooled output).
      labels: [N] int class ids.
      kind: one of ``recall | prec | f1 | recall_ori | prec_ori | cel``.
      weight: per-class weights [C]; normalized to sum 1 like the reference.

    The reference computes, with pt = softmax(logits):
      tp[n,c]      = pt[n,c] * onehot(labels)[n,c]
      recall[n,c]  = (tp + 1e-5) / (onehot + 1e-5)
      prec[n,c]    = (tp + 1e-5) / (pt + 1e-5)
      f1           = 2 r p / (r + p)
    then (with normalized weight w, C classes):
      recall loss   = mean((1 - recall) * w * C)
      prec loss     = mean((1 - prec)   * w * C)
      f1 loss       = 1 - mean(f1 * w * C)
      *_ori losses  = 1 - mean(metric * w * C)
    """
    if kind == "cel":
        return cross_entropy_loss(logits, labels, sample_weight)
    if kind not in RECALL_LOSS_KINDS:
        raise ValueError(f"unknown AD loss kind: {kind!r}")

    logits = logits.astype(jnp.float32)
    n, c = logits.shape
    pt = jax.nn.softmax(logits, axis=-1)  # [N, C]
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)  # [N, C]

    smooth = 1e-5
    tp = pt * onehot
    recall = (tp + smooth) / (onehot + smooth)
    precision = (tp + 1e-5) / (pt + 1e-5)
    f1 = 2.0 * recall * precision / (recall + precision)

    if weight is None:
        w = jnp.full((c,), 1.0 / c, dtype=jnp.float32)
    else:
        w = jnp.asarray(weight, dtype=jnp.float32)
        w = w / jnp.sum(w)

    wc = w[None, :] * c
    if kind == "recall":
        return _weighted_mean((1.0 - recall) * wc, sample_weight)
    if kind == "prec":
        return _weighted_mean((1.0 - precision) * wc, sample_weight)
    if kind == "f1":
        return 1.0 - _weighted_mean(f1 * wc, sample_weight)
    if kind == "recall_ori":
        return 1.0 - _weighted_mean(recall * wc, sample_weight)
    if kind == "prec_ori":
        return 1.0 - _weighted_mean(precision * wc, sample_weight)
    raise AssertionError(kind)


def am_softmax_loss(
    x: jax.Array,
    labels: jax.Array,
    fc_weight: jax.Array,
    loss_type: str = "cosface",
    s: float | None = None,
    m: float | None = None,
    eps: float = 1e-7,
    normalize_weight: bool = False,
    sample_weight: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Angular-penalty softmax ("diversity") loss.

    Args:
      x: [N, D] embeddings (lm-masked and AD-masked frames stacked).
      labels: [N] int class ids (0 = lm stream, 1 = AD stream).
      fc_weight: [C, D] weight of the (bias-free) projection, torch layout.
      loss_type: 'cosface' | 'arcface' | 'sphereface'.
      normalize_weight: the reference intends to L2-normalize W but its loop
        is a no-op; keep False for parity, True for the corrected math.

    Returns:
      (scalar loss, wf [N, C] projection scores) — like the reference, which
      returns ``(-mean(L), wf)``.
    """
    defaults = {"arcface": (64.0, 0.5), "sphereface": (64.0, 1.35), "cosface": (30.0, 0.4)}
    if loss_type not in defaults:
        raise ValueError(f"unknown loss_type: {loss_type!r}")
    s_def, m_def = defaults[loss_type]
    s = s_def if s is None else s
    m = m_def if m is None else m

    x = x.astype(jnp.float32)
    w = fc_weight.astype(jnp.float32)

    def _safe_normalize(v):
        # clamp INSIDE the sqrt: max() outside only guards the value — the
        # sqrt gradient at an all-zero row (a padded batch row) is inf and
        # poisons the whole backward with NaNs. Clamping the squared norm
        # routes the gradient to the constant branch instead (zero rows get
        # zero grads), and is identical for any non-degenerate row.
        sq = jnp.sum(v * v, axis=1, keepdims=True)
        return v * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))

    if normalize_weight:
        w = _safe_normalize(w)
    xn = _safe_normalize(x)
    wf = xn @ w.T  # [N, C]

    target = jnp.take_along_axis(wf, labels[:, None], axis=1)[:, 0]  # [N]
    if loss_type == "cosface":
        numerator = s * (target - m)
    elif loss_type == "arcface":
        numerator = s * jnp.cos(jnp.arccos(jnp.clip(target, -1.0 + eps, 1.0 - eps)) + m)
    else:  # sphereface
        numerator = s * jnp.cos(m * jnp.arccos(jnp.clip(target, -1.0 + eps, 1.0 - eps)))

    onehot = jax.nn.one_hot(labels, wf.shape[1], dtype=jnp.float32)
    # sum over non-target classes of exp(s * wf)
    excl = jnp.sum(jnp.exp(s * wf) * (1.0 - onehot), axis=1)
    denominator = jnp.exp(numerator) + excl
    loss = -_weighted_mean(numerator - jnp.log(denominator), sample_weight)
    return loss, wf


def fsm_attention_loss(
    lm_masks: jax.Array,
    ad_masks: jax.Array,
    frame_mask: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Mask-decorrelation loss: mean over batch of ||[[0,s12],[s21,0]]||_F.

    s12 = s21 = cosine similarity of the time-averaged lm vs AD masks, so the
    Frobenius norm is sqrt(2) * |cos|. ``frame_mask`` [B, T] restricts the
    time average to valid (unpadded) frames; the reference (batch size 1)
    averages over all frames.
    """
    lm = lm_masks.astype(jnp.float32)
    ad = ad_masks.astype(jnp.float32)
    if frame_mask is None:
        lm_mean = jnp.mean(lm, axis=1)  # [B, D]
        ad_mean = jnp.mean(ad, axis=1)
    else:
        fm = frame_mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(fm, axis=1), 1.0)
        lm_mean = jnp.sum(lm * fm, axis=1) / denom
        ad_mean = jnp.sum(ad * fm, axis=1) / denom
    num = jnp.sum(lm_mean * ad_mean, axis=-1)
    denom = jnp.maximum(
        jnp.linalg.norm(lm_mean, axis=-1) * jnp.linalg.norm(ad_mean, axis=-1), eps
    )
    cos = num / denom
    fro = jnp.sqrt(2.0 * cos * cos)
    return jnp.mean(fro)
