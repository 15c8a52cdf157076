"""Forced-toggle experiments (reference: centralized/eval_toggle_more.py:
140-228), re-expressed as vectorized rank/threshold ops instead of python
triple loops — they compile under jit and run on-device.

Inputs are the pre-Gumbel propensity scores ``y0 - y1`` per node ([..., D]):
larger means "should stay on" (the reference sorts ascending and turns off
the smallest).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mask_off_n_groups(scores, num_per_group: int, num_off: int):
    """Turn off the ``num_off * num_per_group`` lowest-scoring nodes per
    frame; all other nodes forced on (reference ``MaskOffNGroups``)."""
    scores = jnp.asarray(scores)
    d = scores.shape[-1]
    n_off = min(int(num_off * num_per_group), d)
    # rank of each node within its frame (0 = smallest score)
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return (ranks >= n_off).astype(jnp.float32)


def aggressive_passive_masking(scores, mask_ori, ratio: float, aggressive: bool):
    """Re-mask at ratio r relative to the original Gumbel mask.

    aggressive: originally-off stay off; of the originally-on nodes, the
      fraction ``ratio`` with the *lowest* scores also turn off.
    passive: originally-on stay on; of the originally-off nodes, the
      fraction ``ratio`` with the *highest* scores also turn on.

    Per-frame counts N = floor(ratio * #on) (agg) / floor(ratio * #off)
    (pas) match the reference exactly, including the ratio == 1 shortcuts.
    """
    scores = jnp.asarray(scores)
    mask_ori = jnp.asarray(mask_ori)
    if ratio == 1.0:
        fill = 0.0 if aggressive else 1.0
        return jnp.full_like(mask_ori, fill)

    if aggressive:
        n = jnp.floor(mask_ori.sum(axis=-1, keepdims=True) * ratio)  # [..., 1]
        # among originally-on nodes, rank ascending by score; the n smallest off
        on_scores = jnp.where(mask_ori == 1, scores, jnp.inf)
        order = jnp.argsort(on_scores, axis=-1)
        ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)
        turn_off = (mask_ori == 1) & (ranks < n)
        return jnp.where(turn_off, 0.0, mask_ori)
    n = jnp.floor((mask_ori.shape[-1] - mask_ori.sum(axis=-1, keepdims=True)) * ratio)
    # among originally-off nodes, rank descending by score; the n largest on
    off_scores = jnp.where(mask_ori == 0, scores, -jnp.inf)
    order = jnp.argsort(-off_scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)
    turn_on = (mask_ori == 0) & (ranks < n)
    return jnp.where(turn_on, 1.0, mask_ori)


def reference_mask_off_n_groups(scores: np.ndarray, num_per_group: int,
                                num_off: int) -> np.ndarray:
    """Direct loop transcription of the reference semantics (test oracle)."""
    b, t, d = scores.shape
    out = np.ones((b, t, d), dtype=np.float32)
    n_off = int(num_off * num_per_group)
    for i in range(b):
        for j in range(t):
            order = np.argsort(scores[i, j], kind="stable")
            out[i, j, order[:n_off]] = 0
    return out
