"""CTC loss with torch-compatible semantics, built for XLA/TPU.

Replaces the reference's ``nn.functional.ctc_loss`` call
(reference: federated/src/models.py:499-533 — fp32 log_softmax, blank =
pad_token_id, ``zero_infinity``, reduction from config). The implementation
is a numerically-stable log-space alpha recursion over the extended label
sequence, expressed as a single ``lax.scan`` over time with fully static
shapes (padded labels + length masking), so it jits once per bucket shape
and differentiates via autodiff.

Differences from a naive translation:
  * -inf is replaced by a ``LOG_EPSILON = -1e5`` sentinel so gradients stay
    finite (the standard JAX/optax trick), with exact-inf restored at the
    end for ``zero_infinity=False`` parity.
  * labels arrive padded ``[B, L]`` (padding value < 0, like HF's -100),
    not flattened, because TPU shapes must be static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_EPSILON = -1e5


def _extend_labels(labels: jax.Array, blank_id: int) -> jax.Array:
    """[B, L] -> [B, 2L+1] with blanks interleaved: b l1 b l2 b ... lL b."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_forward_log_alpha(
    log_probs: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Per-sample negative log-likelihood of the CTC alignment sum.

    Args:
      log_probs: [B, T, C] log-softmax outputs (fp32).
      labels: [B, L] label ids, padded with any value (masked by length).
      input_lengths: [B] valid frame counts (<= T).
      label_lengths: [B] valid label counts (<= L).
      blank_id: CTC blank (the reference uses pad_token_id = 0).

    Returns:
      [B] nll, using LOG_EPSILON as the "impossible" sentinel.
    """
    log_probs = log_probs.astype(jnp.float32)
    bsz, t_max, _ = log_probs.shape
    l_max = labels.shape[1]
    s_max = 2 * l_max + 1

    labels = jnp.where(labels < 0, 0, labels)  # make gather-safe
    ext = _extend_labels(labels, blank_id)  # [B, S]
    s_idx = jnp.arange(s_max)[None, :]  # [1, S]
    s_len = 2 * label_lengths[:, None] + 1  # [B, 1]
    valid_s = s_idx < s_len  # [B, S]

    # allow the s-2 skip where ext[s] is a label differing from ext[s-2]
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :s_max]
    can_skip = (ext != blank_id) & (ext != ext_shift2)  # [B, S]

    # alpha_0
    emit0 = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)  # [B, S]
    alpha0 = jnp.full((bsz, s_max), LOG_EPSILON, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit0[:, 1], LOG_EPSILON))
    alpha0 = jnp.where(valid_s, alpha0, LOG_EPSILON)

    def step(alpha, t):
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPSILON)[:, :s_max]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPSILON)[:, :s_max]
        prev2 = jnp.where(can_skip, prev2, LOG_EPSILON)
        stacked = jnp.stack([alpha, prev1, prev2], axis=0)  # [3, B, S]
        m = jnp.max(stacked, axis=0)
        m_safe = jnp.maximum(m, LOG_EPSILON)
        summed = m_safe + jnp.log(jnp.sum(jnp.exp(stacked - m_safe[None]), axis=0))
        emit = jnp.take_along_axis(log_probs[:, t, :], ext, axis=1)
        new_alpha = jnp.maximum(summed + emit, LOG_EPSILON)
        new_alpha = jnp.where(valid_s, new_alpha, LOG_EPSILON)
        # freeze rows whose input has ended
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha_final, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))

    # log p = logsumexp(alpha[S_last], alpha[S_last - 1]); S_last = 2 * len
    last = 2 * label_lengths  # index of final blank
    a_last = jnp.take_along_axis(alpha_final, last[:, None], axis=1)[:, 0]
    prev_idx = jnp.maximum(last - 1, 0)
    a_prev = jnp.take_along_axis(alpha_final, prev_idx[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, LOG_EPSILON)
    m = jnp.maximum(jnp.maximum(a_last, a_prev), LOG_EPSILON)
    log_p = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -log_p


def ctc_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
    reduction: str = "sum",
    zero_infinity: bool = True,
) -> jax.Array:
    """torch.nn.functional.ctc_loss-compatible CTC loss.

    ``reduction='mean'`` divides each sample's loss by its label length
    (clamped to 1) before averaging, matching torch. ``zero_infinity`` zeros
    losses for impossible alignments (target longer than input).
    """
    nll = ctc_forward_log_alpha(log_probs, labels, input_lengths, label_lengths, blank_id)
    # impossible alignments bottom out at ~|LOG_EPSILON|
    infeasible = nll > 0.5 * -LOG_EPSILON
    if zero_infinity:
        nll = jnp.where(infeasible, 0.0, nll)
    else:
        nll = jnp.where(infeasible, jnp.inf, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction: {reduction!r}")
