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


class WhisperTeacher:
    """TPU-native port of the reference's Whisper teacher
    (``TeacherStudentLearning``, federated/src/federated_main.py:29-68):
    batched 30 s-window log-mel -> encoder -> KV-cached greedy decode,
    one jitted program for the whole batch.

    ``detokenize`` maps token-id lists to text (e.g.
    ``transformers.WhisperTokenizer.decode`` when HF assets are present;
    any ids->str callable works). Transcripts are uppercased/stripped like
    the reference's ``transcribe`` (:60).
    """

    def __init__(self, cfg, params, detokenize: Callable[[Sequence[int]], str],
                 dtype=None):
        import jax
        import jax.numpy as jnp

        from ..models.whisper import greedy_decode, log_mel_spectrogram, pad_or_trim

        self.cfg = cfg
        self.params = params
        self.detokenize = detokenize
        self._pad_or_trim = pad_or_trim
        dtype = dtype or jnp.float32

        def _run(params, audio):
            mel = log_mel_spectrogram(audio, cfg.num_mel_bins)
            return greedy_decode(cfg, params, mel, dtype=dtype)

        self._run = jax.jit(_run)

    def transcribe_batch(self, audios: Sequence[np.ndarray]) -> list[str]:
        batch = np.stack([self._pad_or_trim(np.asarray(a, np.float32))
                          for a in audios])
        ids = np.asarray(self._run(self.params, batch))
        out = []
        eot = self.cfg.eot_token
        for row in ids:
            keep = [int(t) for t in row if int(t) != eot]
            out.append(self.detokenize(keep).upper().strip())
        return out

    def transcribe(self, examples: Sequence[AsrExample],
                   batch_size: int = 8) -> dict[str, str]:
        """path -> transcript for a dataset (the reference's per-file loop,
        here batched)."""
        out: dict[str, str] = {}
        for i in range(0, len(examples), batch_size):
            chunk = examples[i : i + batch_size]
            texts = self.transcribe_batch([e.array for e in chunk])
            for e, t in zip(chunk, texts):
                out[e.path] = t
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
