"""Teacher-student pseudo-transcription for unlabeled (ADReSSo) audio.

The reference transcribes ADReSSo train clips offline with Whisper large-v2
and merges the stored transcripts (``transcript.json`` — a list aligned with
the dataset order, or CSVs) into the dataset at startup
(reference: federated/src/federated_main.py:29-68 ``TeacherStudentLearning``,
:283-298 merge + filter). Whisper weights cannot be fetched in this
environment, so the teacher is an interface:

  * ``load_transcripts`` ingests the reference's transcript.json / CSV
    artifacts directly, and
  * any callable ``path -> text`` (e.g. our own fine-tuned CTC model via
    :func:`transcribe_with_ctc_model`) can stand in as the teacher.
"""

from __future__ import annotations

import csv
import json
from typing import Callable, Sequence

import numpy as np

from .dataset import AsrExample
from .tokenizer import CTCCharTokenizer


def load_transcripts(path: str) -> list[str] | dict[str, str]:
    """Load a transcript artifact: JSON (list aligned to dataset order, or
    {path: text} dict) or CSV with path,text columns."""
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    out: dict[str, str] = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out[row["path"]] = row.get("text", row.get("sentence", ""))
    return out


def add_transcripts(
    examples: Sequence[AsrExample],
    transcripts: list[str] | dict[str, str],
    tokenizer: CTCCharTokenizer | None = None,
    min_samples: int = 1600,
) -> list[AsrExample]:
    """Attach teacher transcripts and filter (len(audio) >= 1600 samples and
    non-empty text — the reference's ``FilterAvailAudios``)."""
    if isinstance(transcripts, dict):
        texts = [transcripts.get(e.path, "") for e in examples]
    else:
        if len(transcripts) != len(examples):
            raise ValueError(
                f"{len(transcripts)} transcripts for {len(examples)} examples")
        texts = list(transcripts)
    out = []
    for e, text in zip(examples, texts):
        text = (text or "").upper().strip()
        if len(e.array) < min_samples or not text:
            continue
        e.text = text
        if tokenizer is not None:
            e.labels = np.asarray(tokenizer.encode(text), dtype=np.int32)
        out.append(e)
    return out


def transcribe_with_ctc_model(
    cfg,
    params,
    examples: Sequence[AsrExample],
    tokenizer: CTCCharTokenizer,
    batch_size: int = 16,
    time_multiple: int = 16000,
) -> dict[str, str]:
    """Use a fine-tuned CTC model from this framework as the teacher
    (TPU-native stand-in for the offline Whisper pass)."""
    from ..evaluation.extract import extract_embeddings

    rows = extract_embeddings(cfg, params, examples, tokenizer,
                              batch_size=batch_size, time_multiple=time_multiple)
    return {r.path: r.pred_str for r in rows}
