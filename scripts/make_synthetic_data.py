"""Generate a synthetic ADReSS-shaped dataset (wavs + CSVs + spk2label) so
the full pipeline can be exercised without the licensed corpus."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from scipy.io import wavfile

SENTENCES = [
    "the boy is stealing cookies", "water is overflowing in the sink",
    "she is drying the dishes", "he is on a stool", "the window is open",
    "mother is standing by the sink", "the jar is on the shelf",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./data_synth")
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--utts_per_speaker", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = Path(args.out)
    clips = root / "clips"
    clips.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    rows_train, rows_test = [], []
    spk2label = {}
    for s in range(args.speakers):
        spk = f"S{s:03d}"
        spk2label[spk] = s % 2
        for u in range(args.utts_per_speaker):
            dur = rng.integers(8000, 48000)
            wav = (rng.normal(0, 0.08, dur) * 32767).astype(np.int16)
            name = f"{spk}_PAR_{u}_{u * 1000}_{u * 1000 + int(dur / 16)}.wav"
            wavfile.write(clips / name, 16000, wav)
            row = f"{name},{SENTENCES[(s * args.utts_per_speaker + u) % len(SENTENCES)]}"
            (rows_test if s >= args.speakers - 2 else rows_train).append(row)

    (root / "train.csv").write_text("path,sentence\n" + "\n".join(rows_train) + "\n")
    (root / "test.csv").write_text("path,sentence\n" + "\n".join(rows_test) + "\n")
    np.save(root / "spk2label.npy", spk2label)
    print(f"wrote {len(rows_train)} train / {len(rows_test)} test utts to {root}")


if __name__ == "__main__":
    main()
