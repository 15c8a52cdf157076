"""Golden END-TO-END pipeline fixture (r2 verdict Next #4a).

One deterministic protocol shared by the generator and the test
(tests/test_pipeline_golden.py imports this module): a seeded synthetic
multi-speaker corpus -> the FULL 3-stage `cli federated -fl_st 0`
(warm-start + FedAvg round per stage, reference federated_main.py
stage{1,2,3}_training) -> `extract` -> `svm` + `detail-wer`, with the
outputs FROZEN into golden_pipeline.json:

  * per-utterance greedy transcripts and AD votes of the final global
    model on the test split,
  * the detail-WER report (exact S/D/I/H counts + WER per group),
  * the SVM speaker-vote metrics,
  * L2 norms of the final global params per top-level subtree.

Regenerate (only after an intentional protocol/numerics change):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tests/fixtures/generate_golden_pipeline.py

The CLI smoke tests prove the pipeline RUNS; this fixture pins WHAT IT
COMPUTES — any silent drift in data prep, staging, aggregation, grafting,
extraction un-padding, WER math, or the SVM vote shows up as a diff
against frozen values.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
FIXTURE = HERE / "golden_pipeline.json"

SENTENCES = [
    "THE BOY IS STEALING COOKIES", "WATER IS OVERFLOWING IN THE SINK",
    "SHE IS DRYING THE DISHES", "HE IS ON A STOOL",
    "THE WINDOW IS OPEN", "MOTHER IS STANDING BY THE SINK",
]


def build_corpus(root: Path) -> Path:
    """Deterministic synthetic ADReSS-shaped corpus: 4 train speakers x 2
    utts + 2 test speakers x 2 utts, fixed durations, seeded noise."""
    from scipy.io import wavfile

    clips = root / "clips"
    clips.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1234)
    rows_train, rows_test = [], []
    spk2label = {}
    for s in range(6):
        spk = f"S{s:03d}"
        spk2label[spk] = s % 2
        for u in range(2):
            dur = 8000 + 4000 * ((s * 2 + u) % 4)
            wav = (rng.normal(0, 0.08, dur) * 32767).astype(np.int16)
            name = f"{spk}_PAR_{u}_{u * 1000}_{u * 1000 + dur // 16}.wav"
            wavfile.write(clips / name, 16000, wav)
            row = f"{name},{SENTENCES[(s * 2 + u) % len(SENTENCES)]}"
            (rows_test if s >= 4 else rows_train).append(row)
    (root / "train.csv").write_text(
        "path,sentence\n" + "\n".join(rows_train) + "\n")
    (root / "test.csv").write_text(
        "path,sentence\n" + "\n".join(rows_test) + "\n")
    np.save(root / "spk2label.npy", spk2label)
    return root


def run_pipeline(data: Path, work: Path) -> dict:
    """The frozen protocol. Returns the result dict the fixture stores."""
    import io
    from contextlib import redirect_stdout

    import jax

    from privacy_preserve_federated_asr_tpu.cli import main
    from privacy_preserve_federated_asr_tpu.train.checkpoint import load_params

    common = [
        "--model_type", "tiny",
        "--audio_dir", str(data / "clips"),
        "--train_csv", str(data / "train.csv"),
        "--test_csv", str(data / "test.csv"),
        "--spk2label", str(data / "spk2label.npy"),
        "--dataset_cache", str(work / "cache"),
        "--compute_dtype", "float32",
        "--train_batch_size", "2", "--eval_batch_size", "2",
        "--seed", "0",
    ]

    main(["federated", "-fl_st", "0", "--epochs", "1", "--num_users", "2",
          "--frac", "1.0", "--local_ep", "1", "--global_ep", "1",
          "-model_out", str(work / "fl"), "-log", "golden_fl.txt", *common])
    final = str(work / "fl") + "_final_global/final"

    main(["extract", "-st", "2", "-model_in", final, "-csv", "golden",
          "--csv_out_dir", str(work / "results"), *common])

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["svm",
              "--train_pkl", str(work / "results" / "golden_train.pkl"),
              "--test_pkl", str(work / "results" / "golden.pkl"),
              "--spk2label", str(data / "spk2label.npy"), "-sq", "mean",
              "--results_csv", str(work / "results" / "SVM" / "results.csv")])
    svm = json.loads(buf.getvalue().strip().splitlines()[-1])

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["detail-wer", "--pkl", str(work / "results" / "golden.pkl"),
              "-t", "2", "--out_dir", str(work / "wer")])
    wer = json.loads(buf.getvalue())  # one pretty-printed JSON report

    with open(work / "results" / "golden.pkl", "rb") as f:
        df = pickle.load(f)
    utts = sorted(
        ({"path": str(r["path"]), "pred_str": str(r["pred_str"]),
          "pred_ad": int(r["pred_AD"])} for _, r in df.iterrows()),
        key=lambda d: d["path"])

    params = load_params(final)
    norms = {k: float(jax.numpy.sqrt(sum(
        jax.numpy.sum(jax.numpy.square(x.astype("float32")))
        for x in jax.tree.leaves(v))))
        for k, v in sorted(params.items())}

    return {"utterances": utts, "detail_wer": wer, "svm": svm,
            "param_norms": norms}


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        data = build_corpus(td / "data")
        result = run_pipeline(data, td / "work")
    FIXTURE.write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    print(f"wrote {FIXTURE}: {len(result['utterances'])} utterances, "
          f"WER groups {sorted(result['detail_wer'])}")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    main()
