"""Greedy CTC decoding (device side) — the reference's eval path argmaxes
logits then ``processor.batch_decode`` (federated/src/update.py:162-212
``map_to_result``). The argmax happens on-device; padded frames are forced
to blank so the host-side CTC collapse ignores them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_ids(logits: jax.Array, frame_mask: jax.Array, blank_id: int = 0) -> jax.Array:
    """[B, T, V] logits -> [B, T] argmax ids with padding forced to blank."""
    ids = jnp.argmax(logits, axis=-1)
    return jnp.where(frame_mask.astype(bool), ids, blank_id)


def ad_vote(dementia_logits: jax.Array, frame_mask: jax.Array) -> jax.Array:
    """Per-utterance AD prediction: fraction of frames argmaxing AD > 0.5
    (reference: federated/src/update.py:177-180 ``map_to_result`` —
    ``mean(argmax(dementia_logits)) > 0.5``), over valid frames."""
    pred = jnp.argmax(dementia_logits, axis=-1).astype(jnp.float32)  # [B, T]
    fm = frame_mask.astype(jnp.float32)
    frac = jnp.sum(pred * fm, axis=1) / jnp.maximum(jnp.sum(fm, axis=1), 1.0)
    return (frac > 0.5).astype(jnp.int32)
