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


def fallback_transcribe_full(
    decode: Callable,
    n_windows: int,
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: float | None = 2.4,
    logprob_threshold: float | None = -1.0,
    seed: int = 0,
) -> tuple[list[str], list, list[float]]:
    """:func:`fallback_transcribe` variant that also returns each window's
    decoded token ids and the temperature that produced its final text —
    the conditioning path needs both (the next window's prompt is the
    previous window's TOKENS, and whisper drops the conditioning context
    after a window decoded at temperature > 0.5).

    ``decode(window_indices, temperature, seed) -> (texts, avg_logprobs,
    ids)`` where ids is a [n, T] array of eot-padded token rows."""
    from ..models.whisper import compression_ratio

    def needs_retry(text: str, lp: float) -> bool:
        if (compression_ratio_threshold is not None
                and compression_ratio(text) > compression_ratio_threshold):
            return True
        return logprob_threshold is not None and lp < logprob_threshold

    idx = list(range(n_windows))
    t0 = float(temperatures[0])
    texts, lps, ids = decode(idx, t0, seed)
    texts, lps, ids = list(texts), list(lps), list(ids)
    temps = [t0] * n_windows
    for ti, t in enumerate(temperatures[1:], start=1):
        bad = [i for i in idx if needs_retry(texts[i], float(lps[i]))]
        if not bad:
            break
        re_texts, re_lps, re_ids = decode(bad, float(t), seed + ti)
        for i, tx, lp, row in zip(bad, re_texts, re_lps, re_ids):
            texts[i], lps[i], ids[i], temps[i] = tx, lp, row, float(t)
    return texts, ids, temps


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
                 logprob_threshold: float | None = -1.0,
                 condition_on_previous_text: bool = True,
                 max_prompt_tokens: int | None = None,
                 timestamps: bool = False,
                 max_initial_timestamp: float | None = 1.0):
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
        # whisper transcribe's condition_on_previous_text (default True):
        # windows after the first decode with the previous window's tokens
        # as a <|startofprev|> prompt; the context resets after a window
        # that needed temperature > 0.5 (degenerate text must not leak
        # forward). Prompt capacity follows whisper's n_ctx//2 - 1, capped
        # so at least 1/4 of the positions stay for sampled tokens.
        self.condition_on_previous_text = condition_on_previous_text
        # whisper transcribe's default decodes WITH timestamp tokens and
        # seeks each window to the last predicted segment boundary
        # (timestamp_seek) instead of a fixed 30 s hop. The LIBRARY default
        # here is False (needs a timestamp-token vocab range, which test
        # configs lack); `cli teacher`'s Whisper path passes True by
        # default — the upstream semantics — with --no-timestamps opting
        # back into fixed windows.
        self.timestamps = timestamps
        self.max_initial_timestamp = max_initial_timestamp
        n_forced = len(cfg.forced_tokens(timestamps))
        self.max_prompt = (max_prompt_tokens if max_prompt_tokens is not None
                           else min(cfg.max_target_positions // 2 - 1,
                                    cfg.max_target_positions
                                    - n_forced
                                    - max(cfg.max_target_positions // 4, 1)))
        self._pad_or_trim = lambda a: pad_or_trim(a, self.chunk)
        dtype = dtype or jnp.float32

        def _run(params, audio, temperature, rng):
            mel = log_mel_spectrogram(audio, cfg.num_mel_bins)
            return decode_with_stats(cfg, params, mel,
                                     temperature=temperature, rng=rng,
                                     dtype=dtype, timestamps=timestamps,
                                     max_initial_timestamp=max_initial_timestamp)

        def _run_cond(params, audio, temperature, rng, prompt_ids, prompt_lens):
            mel = log_mel_spectrogram(audio, cfg.num_mel_bins)
            return decode_with_stats(cfg, params, mel,
                                     temperature=temperature, rng=rng,
                                     dtype=dtype, prompt_ids=prompt_ids,
                                     prompt_lens=prompt_lens,
                                     timestamps=timestamps,
                                     max_initial_timestamp=max_initial_timestamp)

        self._run = jax.jit(_run)
        self._run_cond = jax.jit(_run_cond)

    def _ids_to_text(self, row) -> str:
        eot = self.cfg.eot_token
        if self.timestamps:
            from ..models.whisper import timestamp_text_ids

            return self.detokenize(
                timestamp_text_ids(self.cfg, row)).upper().strip()
        return self.detokenize(
            [int(t) for t in row if int(t) != eot]).upper().strip()

    def _build_prompts(self, rows, prev):
        """Right-aligned ``<|startofprev|>`` conditioning prompts for the
        given clip rows from their previous-window contexts; the context
        resets after a window that needed temperature > 0.5 (whisper's
        rule) or that produced no tokens. Shared by the fixed-window and
        timestamp-seek loops."""
        eot = self.cfg.eot_token
        p = self.max_prompt
        prompts = np.full((len(rows), p), eot, np.int32)
        plens = np.zeros((len(rows),), np.int32)
        for j, i in enumerate(rows):
            ctx = prev[i]
            if ctx is None or ctx[1] > 0.5 or not ctx[0]:
                continue
            toks = [self.cfg.prev_token] + ctx[0][-(p - 1):]
            prompts[j, p - len(toks):] = toks
            plens[j] = len(toks)
        return prompts, plens

    def _decode_windows(self, windows: np.ndarray, idx, temperature, seed,
                        prompts: np.ndarray | None = None,
                        prompt_lens: np.ndarray | None = None):
        """Decode ``windows[idx]`` at one temperature -> (texts, lps, ids);
        ``prompts``/``prompt_lens`` (aligned with ``windows``) switch to the
        conditioned program."""
        import jax

        sel = np.asarray(idx)
        if prompts is None:
            ids, lps = self._run(self.params, windows[sel],
                                 temperature, jax.random.PRNGKey(seed))
        else:
            ids, lps = self._run_cond(
                self.params, windows[sel], temperature,
                jax.random.PRNGKey(seed), prompts[sel], prompt_lens[sel])
        ids, lps = np.asarray(ids), np.asarray(lps)
        texts = [self._ids_to_text(row) for row in ids]
        return texts, lps, ids

    def transcribe_batch(self, audios: Sequence[np.ndarray]) -> list[str]:
        """Transcribe a batch of arbitrary-length clips: each is split into
        ceil(len/chunk) windows (1 minimum) and each clip's window texts
        are stitched in order.

        With ``condition_on_previous_text`` (the reference
        ``whisper.transcribe`` default) windows decode frontier-by-frontier:
        all clips' window 0 as one device batch, then all window 1 (each
        conditioned on its clip's window-0 tokens), and so on — batching
        rides the clip axis instead of the window axis, and single-window
        (< 30 s) clips are bit-identical to the unconditioned path. Without
        it, ALL windows decode as one batch (round-3 behavior).

        With ``timestamps`` each window decodes with whisper's timestamp
        rules and advances by the last predicted segment boundary
        (``timestamp_seek``) instead of a fixed ``chunk`` hop — the
        remaining piece of ``whisper.transcribe``'s long-form semantics."""
        clips = [np.asarray(a, np.float32) for a in audios]
        if self.timestamps:
            return self._transcribe_seek(clips)
        n_wins = [max(1, -(-len(a) // self.chunk)) for a in clips]

        if not self.condition_on_previous_text or max(n_wins) == 1:
            owner, windows = [], []
            for a_i, a in enumerate(clips):
                for w in range(n_wins[a_i]):
                    windows.append(self._pad_or_trim(
                        a[w * self.chunk:(w + 1) * self.chunk]))
                    owner.append(a_i)
            stack = np.stack(windows)

            texts = fallback_transcribe(
                lambda idx, t, s: self._decode_windows(stack, idx, t, s)[:2],
                len(windows), self.temperatures,
                self.compression_ratio_threshold, self.logprob_threshold)

            out = [[] for _ in audios]
            for o, t in zip(owner, texts):
                if t:
                    out[o].append(t)
            return [" ".join(parts) for parts in out]

        eot = self.cfg.eot_token
        parts: list[list[str]] = [[] for _ in clips]
        # per-clip conditioning context: (tokens, producing temperature)
        prev: list[tuple[list[int], float] | None] = [None] * len(clips)
        for w in range(max(n_wins)):
            rows = [i for i, n in enumerate(n_wins) if w < n]
            stack = np.stack([
                self._pad_or_trim(
                    clips[i][w * self.chunk:(w + 1) * self.chunk])
                for i in rows])
            if w == 0:
                texts, ids, temps = fallback_transcribe_full(
                    lambda idx, t, s: self._decode_windows(stack, idx, t, s),
                    len(rows), self.temperatures,
                    self.compression_ratio_threshold, self.logprob_threshold,
                    seed=w)
            else:
                prompts, plens = self._build_prompts(rows, prev)
                texts, ids, temps = fallback_transcribe_full(
                    lambda idx, t, s: self._decode_windows(
                        stack, idx, t, s, prompts, plens),
                    len(rows), self.temperatures,
                    self.compression_ratio_threshold, self.logprob_threshold,
                    seed=w)
            for j, i in enumerate(rows):
                if texts[j]:
                    parts[i].append(texts[j])
                prev[i] = ([int(t) for t in ids[j] if int(t) != eot],
                           temps[j])
        return [" ".join(ps) for ps in parts]

    def _transcribe_seek(self, clips: list[np.ndarray]) -> list[str]:
        """Timestamp-seek long-form loop (upstream whisper.transcribe):
        each clip keeps its own ``seek`` frontier; a window's advance is the
        last CONSECUTIVE-timestamp-pair boundary it predicted (or the whole
        window when it ends mid-segment — :func:`models.whisper
        .timestamp_seek`, which also guards a non-positive advance).
        Batching rides the clip axis: all clips still needing audio decode
        together each iteration. Conditioning and the temperature-fallback
        gates compose unchanged; the conditioning context is the consumed
        text tokens only (timestamps/specials stripped), as upstream."""
        from ..models.whisper import timestamp_seek

        parts: list[list[str]] = [[] for _ in clips]
        seek = [0] * len(clips)
        prev: list[tuple[list[int], float] | None] = [None] * len(clips)
        pending = list(range(len(clips)))  # every clip decodes >= 1 window
        w = 0
        while pending:
            rows = pending
            stack = np.stack([
                self._pad_or_trim(clips[i][seek[i] : seek[i] + self.chunk])
                for i in rows])
            if self.condition_on_previous_text and w > 0:
                prompts, plens = self._build_prompts(rows, prev)
                _, ids, temps = fallback_transcribe_full(
                    lambda idx, t, s: self._decode_windows(
                        stack, idx, t, s, prompts, plens),
                    len(rows), self.temperatures,
                    self.compression_ratio_threshold, self.logprob_threshold,
                    seed=w)
            else:
                _, ids, temps = fallback_transcribe_full(
                    lambda idx, t, s: self._decode_windows(stack, idx, t, s),
                    len(rows), self.temperatures,
                    self.compression_ratio_threshold, self.logprob_threshold,
                    seed=w)
            pending = []
            for j, i in enumerate(rows):
                advance, text_ids = timestamp_seek(self.cfg, ids[j])
                txt = (self.detokenize(text_ids).upper().strip()
                       if text_ids else "")
                if txt:
                    parts[i].append(txt)
                prev[i] = (text_ids, temps[j])
                seek[i] += advance
                if seek[i] < len(clips[i]):
                    pending.append(i)
            w += 1
        return [" ".join(ps) for ps in parts]

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
