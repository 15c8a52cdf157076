"""Straight-through Gumbel-softmax sampling.

Matches the semantics of the reference's custom ``gumbel_softmax``
(reference: federated/src/models.py:75-129):

  * gumbels ~ Gumbel(0, 1); perturbed logits ``(logits + g) / tau``,
  * soft sample = softmax over ``axis``,
  * hard sample = one-hot(argmax of soft) with the straight-through trick
    ``y_hard - stop_grad(y_soft) + y_soft`` so the value is exactly one-hot
    but the gradient is that of the soft sample.

The reference regenerates gumbels when NaN/Inf appear (its torch
``.exponential_().log()`` can produce ``-inf`` when the exponential sample
is exactly 0). ``jax.random.gumbel`` samples in log-space and cannot
produce non-finite values, so no retry loop is needed; we keep a clamp for
belt-and-braces parity with the reference's guard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(
    rng: jax.Array,
    logits: jax.Array,
    tau: float = 1.0,
    hard: bool = False,
    axis: int = -1,
    noise: jax.Array | None = None,
) -> jax.Array:
    """Sample from the Gumbel-softmax distribution, optionally discretized.

    Args:
      rng: PRNG key.
      logits: `[..., num_features]` unnormalized log-probabilities.
      tau: non-negative temperature.
      hard: if True return straight-through one-hot samples.
      axis: softmax axis.
      noise: optional pre-drawn Gumbel(0,1) noise (for cross-framework
        parity tests); when given, ``rng`` is ignored.

    Returns:
      Tensor shaped like ``logits``; one-hot along ``axis`` if ``hard``.
    """
    if noise is not None:
        gumbels = noise.astype(jnp.float32)
    else:
        gumbels = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    # Guard against pathological values (parity with the reference's
    # NaN/Inf regeneration loop; jax.random.gumbel is finite by construction).
    gumbels = jnp.clip(gumbels, -1e9, 1e9)
    y = (logits.astype(jnp.float32) + gumbels) / tau
    y_soft = jax.nn.softmax(y, axis=axis)
    if not hard:
        return y_soft.astype(logits.dtype)
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis, dtype=y_soft.dtype)
    ret = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return ret.astype(logits.dtype)
