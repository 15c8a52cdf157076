"""Batched embedding / mask / transcript extraction (the reference L4).

Replaces ``Extract_Emb`` / ``get_Embs`` / ``map_to_result``
(reference: centralized/eval_toggle_GS.py:68-136, federated/src/update.py:
162-212, 495-524): one jitted batched forward on TPU, per-utterance rows
un-padded by frame length on the host, dumped to pickle-compatible
DataFrames (same columns as the reference's ``<csv>.pkl`` so the downstream
SVM / detail-WER / mask-statistics tools interoperate).

Method families (``cfg.method``) mirror the reference's per-method eval
scripts and their row schemas:

* ``dacs``          — eval_toggle_GS.py: both masks + AD-masked logits
* ``toggle_more``   — eval_toggle_more.py:230-262: same schema as dacs
* ``fsm``           — eval_FSM.py:177-230: both (sigmoid-threshold) masks
* ``single_toggle`` — eval_SingleToggle.py:118-132: ``lm_mask`` only; AD
                      logits come from the lm-masked stream
* ``grl``           — eval.py / eval_finetune.py: no masks; unmasked streams
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import LengthBucketBatcher
from ..data.dataset import AsrExample
from ..data.tokenizer import CTCCharTokenizer
from ..models.config import DACSConfig
from ..ops.decode import ad_vote, greedy_ids
from ..train.steps import DeviceBatch


@dataclass
class ExtractionRow:
    """One utterance's extraction record (reference row schema:
    update.py:182-212 — path/text/dementia_labels/hidden_states/pred_str/
    dementia_mask/lm_mask/pred_AD/dementia logits). Mask fields are None for
    methods whose model doesn't produce them (reference: eval_SingleToggle
    has no dementia_mask column, eval.py/eval_finetune.py dump neither)."""

    path: str
    text: str | None
    dementia_labels: int
    hidden_states: np.ndarray            # [T_valid, D]
    lm_mask: np.ndarray | None           # [T_valid, D]
    dementia_mask: np.ndarray | None     # [T_valid, D]
    pred_str: str
    pred_AD: int
    dementia_logits: np.ndarray          # [T_valid, 2]


def extract_embeddings(
    cfg: DACSConfig,
    params,
    examples: Sequence[AsrExample],
    tokenizer: CTCCharTokenizer,
    batch_size: int = 16,
    time_multiple: int = 16000,
    seed: int = 0,
    compute_dtype: str = "float32",
    beam_size: int = 0,
    lm_fn=None,
    lm_alpha: float = 0.3,
    lm_beta: float = 0.0,
    mesh=None,
) -> list[ExtractionRow]:
    """``compute_dtype="bfloat16"`` runs the forward in bf16 (the serving
    precision; dumped rows are float32 either way) and ``"int8"`` adds
    dynamic-W8A8 Dense matmuls (ops/quant.py) on top of bf16 — the
    reference's batched extraction runs fp32 under DataParallel, so that
    stays the default. ``beam_size > 0`` decodes ``pred_str`` with CTC
    prefix beam search (ops/beam.py; optional shallow LM fusion) instead of
    the reference's greedy argmax — an opt-in WER upgrade.

    ``mesh`` (a Mesh with a ``data`` axis, e.g. ``make_mesh(dp=N)``) runs
    the extraction data-parallel: params replicate, every batch's rows
    shard over the ``data`` axis and the jitted forward partitions under
    GSPMD — the TPU-native form of the reference's multi-GPU
    ``torch.nn.DataParallel`` eval (centralized/eval_toggle_GS.py:629-639).
    Requires ``batch_size`` divisible by the axis size."""
    from ..models.recipes import get_recipe

    cfg, dtype = cfg.resolve_compute(compute_dtype)
    rows_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        dp = int(mesh.shape["data"])
        if batch_size % dp:
            raise ValueError(
                f"extraction batch_size {batch_size} must divide over the "
                f"data axis ({dp})")
        params = jax.device_put(params, NamedSharding(mesh, P()))
        rows_sh = NamedSharding(mesh, P("data"))
    recipe = get_recipe(cfg.method)
    model = recipe.make_model(cfg, dtype=dtype)
    beam = beam_size > 0

    @jax.jit
    def forward(p, batch: DeviceBatch):
        out = model.apply(
            {"params": p}, batch.input_values, batch.input_lengths,
            deterministic=True, rngs={"gumbel": jax.random.PRNGKey(seed)},
        )
        ctc_logits, ad_logits, lm_mask, ad_mask = recipe.extract_streams(out, cfg)
        pred = greedy_ids(ctc_logits, out.frame_mask, cfg.backbone.pad_token_id)
        ad_pred = ad_vote(ad_logits, out.frame_mask)
        lp = (jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
              if beam else pred)  # placeholder keeps the output arity fixed
        return (out.hidden_states, lm_mask, ad_mask,
                ad_logits, pred, ad_pred, out.frame_lengths, lp)

    batcher = LengthBucketBatcher(examples, batch_size, time_multiple=time_multiple)
    by_path = {e.path: e for e in examples}
    rows: list[ExtractionRow] = []
    for b in batcher.epoch(epoch_seed=0):
        db = DeviceBatch.from_host(b)
        if rows_sh is not None:  # shard batch rows over the mesh's data axis
            db = jax.tree.map(lambda x: jax.device_put(x, rows_sh), db)
        h, lm, ad, dlog, pred, ad_pred, flen, lp = jax.device_get(
            forward(params, db))
        if beam:
            from ..ops.beam import beam_search_batch

            beams = beam_search_batch(
                lp[: len(b.paths)], flen[: len(b.paths)],
                beam_size=beam_size, blank_id=cfg.backbone.pad_token_id,
                lm_fn=lm_fn, lm_alpha=lm_alpha, lm_beta=lm_beta)
            texts = [tokenizer.decode(bm[0].ids, group_tokens=False)
                     for bm in beams]
        else:
            texts = [tokenizer.decode(pred[i]) for i in range(len(b.paths))]
        for i, path in enumerate(b.paths):
            n = int(flen[i])
            ex = by_path[path]
            rows.append(ExtractionRow(
                path=path,
                text=ex.text,
                dementia_labels=ex.dementia_label,
                hidden_states=np.asarray(h[i, :n], dtype=np.float32),
                lm_mask=(None if lm is None
                         else np.asarray(lm[i, :n], dtype=np.float32)),
                dementia_mask=(None if ad is None
                               else np.asarray(ad[i, :n], dtype=np.float32)),
                pred_str=texts[i],
                pred_AD=int(ad_pred[i]),
                dementia_logits=np.asarray(dlog[i, :n], dtype=np.float32),
            ))
    return rows


def write_results_csv(rows: list[ExtractionRow], save_path: str) -> None:
    """ASR output CSV with GroundTruth/PredStr columns (reference
    ``WriteResult``, centralized/utils.py:113-116)."""
    import pandas as pd

    Path(save_path).mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(
        {"GroundTruth": [r.text for r in rows],
         "PredStr": [r.pred_str for r in rows]})
    df.to_csv(f"{save_path}/Result.csv")
    print(f"Writing results to {save_path}")


def rows_to_pickle(rows: list[ExtractionRow], path: str) -> None:
    """Dump rows as a pandas DataFrame pickle with the reference's column
    names (so reference-era analysis notebooks load it directly)."""
    import pandas as pd

    def row_dict(r: ExtractionRow):
        d = {
            "path": r.path,
            "text": r.text,
            "dementia_labels": r.dementia_labels,
            # reference stores [1, T, D] (batch dim kept) — keep that shape
            "hidden_states": r.hidden_states[None],
            "pred_str": r.pred_str,
            "pred_AD": r.pred_AD,
            "dementia_logits": r.dementia_logits[None],
        }
        # mask columns only where the method produces them (reference:
        # eval_SingleToggle.py has no dementia_mask column)
        if r.lm_mask is not None:
            d["lm_mask"] = r.lm_mask[None]
        if r.dementia_mask is not None:
            d["dementia_mask"] = r.dementia_mask[None]
        return d

    df = pd.DataFrame([row_dict(r) for r in rows])
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(df, f)
