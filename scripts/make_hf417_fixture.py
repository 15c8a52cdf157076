#!/usr/bin/env python
"""Freeze transformers-4.17-semantics preprocessing goldens
(VERDICT r4 weak #5 / item #6).

The reference pins ``transformers==4.17`` (reference requirements.txt);
this container ships 4.57, so every live HF-parity test checks against
the NEW library. The preprocessing math at 4.17 is frozen here from the
4.17 sources themselves, hand-rolled in numpy — NOT via the installed
library — so the oracle can never drift with upgrades:

* Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm (4.17
  feature_extraction_wav2vec2.py): ``(x - x.mean()) / sqrt(x.var()+1e-7)``
  per utterance, before padding.
* Wav2Vec2CTCTokenizer encoding (4.17 tokenization_wav2vec2.py):
  per-character vocab lookup after replacing " " with the word
  delimiter "|"; unknown chars -> <unk>.
* CTC decode (4.17 ``convert_tokens_to_string``): group repeated tokens
  FIRST, then drop pad (so pad separates doubled letters), "|" -> space,
  strip.

Output: tests/fixtures/golden_preprocess_hf417.npz, asserted exactly by
tests/test_preprocess_golden.py. Deterministic (seeded); rerunning must
reproduce the committed file bit-for-bit.
"""

from __future__ import annotations

import itertools
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "fixtures" / "golden_preprocess_hf417.npz"

# the reference's vocab layout (Wav2Vec2 English CTC head ordering)
VOCAB = {
    "<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "E": 5, "T": 6,
    "A": 7, "O": 8, "N": 9, "I": 10, "H": 11, "S": 12, "R": 13, "D": 14,
    "L": 15, "U": 16, "M": 17, "W": 18, "C": 19, "F": 20, "G": 21, "Y": 22,
    "P": 23, "B": 24, "V": 25, "K": 26, "'": 27, "X": 28, "J": 29, "Q": 30,
    "Z": 31,
}

TEXTS = ["HELLO WORLD", "THE QUICK BROWN FOX", "DON'T STOP", "A",
         "TWO  SPACES", "MIXED? PUNCT."]
DECODE_CASES = [
    [0, 11, 11, 5, 0, 15, 15, 0, 15, 8, 4, 4, 0, 18, 8, 13, 15, 14, 0, 0],
    [7, 0, 7, 7, 4, 24, 5, 5],       # pad-separated double letter
    [0, 0, 0],                        # all blank
]


def norm_417(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    return ((x - x.mean()) / np.sqrt(x.var() + 1e-7)).astype(np.float32)


def encode_417(text: str) -> list[int]:
    return [VOCAB.get(ch, VOCAB["<unk>"])
            for ch in text.replace(" ", "|")]


def decode_417(ids: list[int]) -> str:
    grouped = [k for k, _ in itertools.groupby(int(i) for i in ids)]
    chars = [next(t for t, i in VOCAB.items() if i == g)
             for g in grouped if g != VOCAB["<pad>"]]
    return "".join(" " if c == "|" else c
                   for c in chars if c not in ("<s>", "</s>")).strip()


def main() -> None:
    rng = np.random.default_rng(417)
    waves = {
        "wave_gauss": rng.normal(0.0, 0.1, size=24001).astype(np.float32),
        "wave_dc": (rng.normal(0.3, 0.02, size=8000)).astype(np.float32),
        "wave_quiet": (rng.normal(0.0, 1e-5, size=4000)).astype(np.float32),
    }
    payload: dict = {}
    for name, w in waves.items():
        payload[name] = w
        payload[name + "_normalized"] = norm_417(w)
    payload["texts"] = np.asarray(TEXTS)
    enc = [encode_417(t) for t in TEXTS]
    width = max(len(e) for e in enc)
    ids = np.full((len(enc), width), -1, dtype=np.int32)
    for i, e in enumerate(enc):
        ids[i, : len(e)] = e
    payload["text_ids"] = ids
    dec_w = max(len(c) for c in DECODE_CASES)
    dec = np.full((len(DECODE_CASES), dec_w), -1, dtype=np.int32)
    for i, c in enumerate(DECODE_CASES):
        dec[i, : len(c)] = c
    payload["decode_ids"] = dec
    payload["decode_strings"] = np.asarray(
        [decode_417(c) for c in DECODE_CASES])
    payload["vocab_tokens"] = np.asarray(list(VOCAB.keys()))
    payload["vocab_ids"] = np.asarray(list(VOCAB.values()), dtype=np.int32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    # deterministic zip: np.savez writes members in dict order, no mtime
    # variance matters for content equality of arrays on reload
    np.savez(OUT, **payload)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
