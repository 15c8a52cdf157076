"""Downstream SVM AD prediction over extracted embeddings
(reference: centralized/pred_AD_svm.py).

Pipeline parity: pool each utterance's (optionally masked) hidden states
over time with min/max/mean/median; optionally fuse (concat) or replace
with session-level text embeddings; StandardScaler + SVC; **speaker-level
majority vote over PAR utterances** (vote > 0.5 -> AD); report
ACC/BACC/F1/Sens/Spec/UAR appended to a results CSV.
"""

from __future__ import annotations

import csv
import os
from typing import Mapping, Sequence

import numpy as np

POOLING = {"mean": np.mean, "min": np.min, "max": np.max, "median": np.median}


def _pool(x: np.ndarray, how: str) -> np.ndarray:
    x = np.asarray(x)
    if x.ndim == 3:  # reference keeps a leading batch dim of 1
        x = x[0]
    return POOLING[how](x, axis=0)


def _features(rows: Sequence[Mapping], pooling: str, masked: bool,
              text_embeddings: Mapping[str, np.ndarray] | None, mode: str):
    xs, ys, keep = [], [], []
    for r in rows:
        h = np.asarray(r["hidden_states"])
        if h.ndim == 3:
            h = h[0]
        if masked:
            m = np.asarray(r["lm_mask"])
            if m.ndim == 3:
                m = m[0]
            h = h * m
        audio_emb = POOLING[pooling](h, axis=0)
        if mode in ("fusion", "text"):
            session = r["path"].split("_")[0]
            if text_embeddings is None or session not in text_embeddings:
                continue
            t = np.asarray(text_embeddings[session])
            emb = np.concatenate([audio_emb, t]) if mode == "fusion" else t
        else:
            emb = audio_emb
        xs.append(emb)
        ys.append(int(r["dementia_labels"]))
        keep.append(r)
    return np.stack(xs), np.asarray(ys), keep


def speaker_vote_metrics(paths: Sequence[str], preds: Sequence[int],
                         spk2label: Mapping[str, int]) -> dict[str, float]:
    """Majority vote per PAR speaker, then ACC/BACC/F1/Sens/Spec/UAR
    (reference: pred_AD_svm.py:231-268)."""
    from sklearn.metrics import (
        accuracy_score, balanced_accuracy_score, confusion_matrix, f1_score,
        recall_score,
    )

    votes: dict[str, list[int]] = {}
    for path, pred in zip(paths, preds):
        parts = path.split("_")
        if len(parts) > 1 and parts[1] == "PAR":
            votes.setdefault(parts[0], []).append(int(pred))
    true, pred = [], []
    for spk, vs in votes.items():
        true.append(int(spk2label[spk]))
        pred.append(1 if sum(vs) / len(vs) > 0.5 else 0)
    cm = confusion_matrix(true, pred, labels=[0, 1])
    spec = cm[0, 0] / max(cm[0, 0] + cm[0, 1], 1)
    return {
        "ACC": accuracy_score(true, pred),
        "BACC": balanced_accuracy_score(true, pred),
        "F1": f1_score(true, pred, zero_division=0),
        "Sens": recall_score(true, pred, zero_division=0),
        "Spec": spec,
        "UAR": recall_score(true, pred, average="macro", zero_division=0),
    }


def predict_ad_svm(
    train_rows: Sequence[Mapping],
    test_rows: Sequence[Mapping],
    spk2label: Mapping[str, int],
    pooling: str = "min",
    masked: bool = False,
    mode: str = "audio",            # audio | text | fusion
    text_embeddings_train: Mapping[str, np.ndarray] | None = None,
    text_embeddings_test: Mapping[str, np.ndarray] | None = None,
    par_only: bool = True,
    results_csv: str | None = None,
    title: str = "dacs_tpu",
) -> dict[str, float]:
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    if par_only:  # reference default: train/test on participant utts only
        train_rows = [r for r in train_rows if "PAR" in r["path"]]
        test_rows = [r for r in test_rows if "PAR" in r["path"]]

    x_train, y_train, _ = _features(train_rows, pooling, masked,
                                    text_embeddings_train, mode)
    x_test, _, kept_test = _features(test_rows, pooling, masked,
                                     text_embeddings_test, mode)

    sc = StandardScaler().fit(x_train)
    svm = SVC().fit(sc.transform(x_train), y_train)
    preds = svm.predict(sc.transform(x_test))

    metrics = speaker_vote_metrics([r["path"] for r in kept_test], preds, spk2label)
    if results_csv is not None:
        os.makedirs(os.path.dirname(results_csv) or ".", exist_ok=True)
        exists = os.path.exists(results_csv)
        with open(results_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["model"] + list(metrics))
            if not exists:
                w.writeheader()
            w.writerow({"model": f"{title} spkid-wise", **metrics})
    return metrics
