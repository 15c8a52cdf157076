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


def forced_toggle_extract(
    cfg,
    params,
    examples,
    tokenizer,
    mode: str,                      # "off_groups" | "aggressive" | "passive"
    batch_size: int = 16,
    time_multiple: int = 16000,
    num_per_group: int = 32,
    num_off: int = 0,
    ratio: float = 0.0,
    seed: int = 0,
):
    """Run extraction with the lm mask replaced by a forced-toggle variant
    (reference: eval_toggle_more.py's experiments re-decoding with modified
    masks). Propensity scores y0 - y1 come from the arbitrator's lm pair.

    Returns (rows, wer) where rows carry the modified-mask transcripts.
    """
    import jax

    from ..data.collate import LengthBucketBatcher
    from ..models.dacs import DACSModel
    from ..ops.decode import greedy_ids
    from ..train.metrics import wer as corpus_wer
    from ..train.steps import DeviceBatch

    model = DACSModel(cfg)

    @jax.jit
    def forward(p, batch: DeviceBatch):
        rngs = {"gumbel": jax.random.PRNGKey(seed)}
        out = model.apply({"params": p}, batch.input_values, batch.input_lengths,
                          deterministic=True, rngs=rngs)
        scores = out.lm_score[..., 0] - out.lm_score[..., 1]  # y0 - y1
        if mode == "off_groups":
            forced = mask_off_n_groups(scores, num_per_group, num_off)
        elif mode == "aggressive":
            forced = aggressive_passive_masking(scores, out.lm_mask, ratio, True)
        elif mode == "passive":
            forced = aggressive_passive_masking(scores, out.lm_mask, ratio, False)
        else:
            raise ValueError(mode)
        out2 = model.apply({"params": p}, batch.input_values, batch.input_lengths,
                           deterministic=True, rngs=rngs,
                           mask_override=(forced.astype(out.lm_mask.dtype), None))
        pred = greedy_ids(out2.logits, out2.frame_mask, cfg.backbone.pad_token_id)
        return pred, forced, out2.frame_lengths

    batcher = LengthBucketBatcher(examples, batch_size, time_multiple=time_multiple)
    by_path = {e.path: e for e in examples}
    rows, refs, hyps = [], [], []
    for b in batcher.epoch(epoch_seed=0):
        pred, forced, flen = jax.device_get(forward(params, DeviceBatch.from_host(b)))
        for i, path in enumerate(b.paths):
            text = by_path[path].text
            hyp = tokenizer.decode(pred[i])
            rows.append({"path": path, "text": text, "pred_str": hyp,
                         "forced_on_rate": float(forced[i, : int(flen[i])].mean())})
            if text:
                refs.append(text)
                hyps.append(hyp)
    return rows, (corpus_wer(refs, hyps) if refs else None)


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
