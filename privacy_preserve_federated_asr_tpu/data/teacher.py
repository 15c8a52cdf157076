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


def fallback_transcribe(
    decode: Callable,
    n_windows: int,
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: float | None = 2.4,
    logprob_threshold: float | None = -1.0,
    seed: int = 0,
) -> list[str]:
    """whisper.transcribe's temperature-fallback loop over decode windows.

    ``decode(window_indices, temperature, seed) -> (texts, avg_logprobs)``
    decodes the given windows at one temperature. Every window first
    decodes greedily (``temperatures[0]``); a window whose text compresses
    too well (degenerate repetition, ``compression_ratio >
    compression_ratio_threshold``) or whose ``avg_logprob <
    logprob_threshold`` is re-decoded at the next temperature, escalating
    until it passes or temperatures run out (whisper's
    ``decode_with_fallback``; reference entry point
    federated/src/federated_main.py:29-68 ``whisper.transcribe``)."""
    from ..models.whisper import compression_ratio

    def needs_retry(text: str, lp: float) -> bool:
        if (compression_ratio_threshold is not None
                and compression_ratio(text) > compression_ratio_threshold):
            return True
        return logprob_threshold is not None and lp < logprob_threshold

    idx = list(range(n_windows))
    texts, lps = decode(idx, float(temperatures[0]), seed)
    texts, lps = list(texts), list(lps)
    for ti, t in enumerate(temperatures[1:], start=1):
        bad = [i for i in idx if needs_retry(texts[i], float(lps[i]))]
        if not bad:
            break
        re_texts, re_lps = decode(bad, float(t), seed + ti)
        for i, tx, lp in zip(bad, re_texts, re_lps):
            texts[i], lps[i] = tx, lp
    return texts


class WhisperTeacher:
    """TPU-native port of the reference's Whisper teacher
    (``TeacherStudentLearning``, federated/src/federated_main.py:29-68):
    batched 30 s-window log-mel -> encoder -> KV-cached scan decode, one
    jitted program for the whole batch, with ``whisper.transcribe``'s
    LONG-FORM semantics — audio beyond one window is split into
    consecutive windows whose transcripts are stitched, and windows
    failing whisper's quality gates (compression ratio > 2.4 or
    avg_logprob < -1.0) are re-decoded at escalating temperatures.

    ``detokenize`` maps token-id lists to text (e.g.
    ``transformers.WhisperTokenizer.decode`` when HF assets are present;
    any ids->str callable works). Transcripts are uppercased/stripped like
    the reference's ``transcribe`` (:60).
    """

    def __init__(self, cfg, params, detokenize: Callable[[Sequence[int]], str],
                 dtype=None,
                 temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                 compression_ratio_threshold: float | None = 2.4,
                 logprob_threshold: float | None = -1.0):
        import jax
        import jax.numpy as jnp

        from ..models.whisper import (
            chunk_samples,
            decode_with_stats,
            log_mel_spectrogram,
            pad_or_trim,
        )

        self.cfg = cfg
        self.params = params
        self.detokenize = detokenize
        self.chunk = chunk_samples(cfg)
        self.temperatures = tuple(temperatures)
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self._pad_or_trim = lambda a: pad_or_trim(a, self.chunk)
        dtype = dtype or jnp.float32

        def _run(params, audio, temperature, rng):
            mel = log_mel_spectrogram(audio, cfg.num_mel_bins)
            return decode_with_stats(cfg, params, mel,
                                     temperature=temperature, rng=rng,
                                     dtype=dtype)

        self._run = jax.jit(_run)

    def _decode_windows(self, windows: np.ndarray, idx, temperature, seed):
        """Decode ``windows[idx]`` at one temperature -> (texts, lps)."""
        import jax

        ids, lps = self._run(self.params, windows[np.asarray(idx)],
                             temperature, jax.random.PRNGKey(seed))
        ids, lps = np.asarray(ids), np.asarray(lps)
        eot = self.cfg.eot_token
        texts = [self.detokenize([int(t) for t in row if int(t) != eot])
                 .upper().strip() for row in ids]
        return texts, lps

    def transcribe_batch(self, audios: Sequence[np.ndarray]) -> list[str]:
        """Transcribe a batch of arbitrary-length clips: each is split into
        ceil(len/chunk) windows (1 minimum), all windows across the batch
        decode as ONE device batch per temperature pass, and each clip's
        window texts are stitched in order."""
        owner, windows = [], []
        for a_i, a in enumerate(audios):
            a = np.asarray(a, np.float32)
            n_win = max(1, -(-len(a) // self.chunk))
            for w in range(n_win):
                windows.append(self._pad_or_trim(
                    a[w * self.chunk:(w + 1) * self.chunk]))
                owner.append(a_i)
        stack = np.stack(windows)

        texts = fallback_transcribe(
            lambda idx, t, s: self._decode_windows(stack, idx, t, s),
            len(windows), self.temperatures,
            self.compression_ratio_threshold, self.logprob_threshold)

        out = [[] for _ in audios]
        for o, t in zip(owner, texts):
            if t:
                out[o].append(t)
        return [" ".join(parts) for parts in out]

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
