"""CLI smoke tests: run the real command surface end-to-end on synthetic
wavs (train -> extract -> svm / detail-wer / feat-scoring)."""

import json
import sys

import numpy as np
import pytest
from scipy.io import wavfile

from privacy_preserve_federated_asr_tpu.cli import main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    clips = root / "clips"
    clips.mkdir()
    rng = np.random.default_rng(0)
    rows = ["path,sentence"]
    for i in range(6):
        spk = f"S{i % 3:03d}"
        name = f"{spk}_PAR_{i}_0.wav"
        wav = (rng.normal(0, 0.1, 4000) * 32767).astype(np.int16)
        wavfile.write(clips / name, 16000, wav)
        rows.append(f"{name},hello there")
    (root / "train.csv").write_text("\n".join(rows[:5]) + "\n")
    (root / "test.csv").write_text("\n".join([rows[0]] + rows[5:]) + "\n")
    np.save(root / "spk2label.npy", {"S000": 0, "S001": 1, "S002": 0})
    return root


def _common(root, tmp):
    return [
        "--model_type", "tiny",
        "--audio_dir", str(root / "clips"),
        "--train_csv", str(root / "train.csv"),
        "--test_csv", str(root / "test.csv"),
        "--spk2label", str(root / "spk2label.npy"),
        "--dataset_cache", str(tmp / "cache"),
        "--compute_dtype", "float32",
        "--train_batch_size", "2", "--eval_batch_size", "2",
    ]


def test_cli_train_and_extract_and_analyze(data_dir, tmp_path, capsys):
    # train 1 epoch stage 0
    main(["train", "--epochs", "1", "-st", "0",
          "-model_out", str(tmp_path / "model"),
          "-log", "cli_test.txt",
          *_common(data_dir, tmp_path)])
    out = capsys.readouterr().out
    assert "eval_wer" in out

    # extract from the saved final checkpoint
    main(["extract", "-st", "2",
          "-model_in", str(tmp_path / "model" / "final"),
          "-csv", "cli_test", "--csv_out_dir", str(tmp_path / "results"),
          *_common(data_dir, tmp_path)])
    assert (tmp_path / "results" / "cli_test.pkl").exists()
    assert (tmp_path / "results" / "cli_test_train.pkl").exists()

    # downstream: svm
    main(["svm", "--train_pkl", str(tmp_path / "results" / "cli_test_train.pkl"),
          "--test_pkl", str(tmp_path / "results" / "cli_test.pkl"),
          "--spk2label", str(data_dir / "spk2label.npy"),
          "-sq", "mean",
          "--results_csv", str(tmp_path / "results" / "SVM" / "results.csv")])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(m) == {"ACC", "BACC", "F1", "Sens", "Spec", "UAR"}

    # detail-wer
    main(["detail-wer", "--pkl", str(tmp_path / "results" / "cli_test.pkl"),
          "-t", "2", "--out_dir", str(tmp_path / "wer")])
    rep = json.loads(capsys.readouterr().out)
    assert "overall" in rep and "AD" in rep
    assert (tmp_path / "wer" / "overall.txt").exists()

    # feat-scoring
    main(["feat-scoring", "--pkl", str(tmp_path / "results" / "cli_test.pkl"),
          "--out_dir", str(tmp_path / "fsm_info")])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mex_rate" in stats
    assert (tmp_path / "fsm_info" / "node_stats.npz").exists()


def test_cli_federated_smoke(data_dir, tmp_path, capsys):
    main(["federated", "-fl_st", "3", "--epochs", "1", "--num_users", "2",
          "--local_ep", "1", "--global_ep", "1",
          "-model_out", str(tmp_path / "flmodel"), "-log", "fl_test.txt",
          *_common(data_dir, tmp_path)])
    out = capsys.readouterr().out
    assert "eval_wer" in out


def test_cli_federated_multislice_mesh(data_dir, tmp_path, capsys):
    """--client_mesh/--data_mesh/--num_slices build the slice-aware device
    mesh and the jitted rounds execute on it (8 virtual CPU devices)."""
    main(["federated", "-fl_st", "3", "--epochs", "1", "--num_users", "2",
          "--local_ep", "1", "--global_ep", "1",
          "--client_mesh", "2", "--data_mesh", "4", "--num_slices", "2",
          "--compress_bits", "8", "--server_optimizer", "momentum",
          "-model_out", str(tmp_path / "flmesh"), "-log", "fl_mesh.txt",
          *_common(data_dir, tmp_path),
          # real per-client data parallelism: batch rows shard over the
          # 4-device data axis, so the batch must divide by it
          "--train_batch_size", "4"])
    out = capsys.readouterr().out
    assert "device mesh: client=2 x data=4 over 2 slices" in out
    assert "eval_wer" in out


def test_cli_federated_multitask_semi_supervised(data_dir, tmp_path, capsys):
    """The reference's --num_lms N-best semi-supervised FL flow
    (federated_main.py --supervised_level 0.5, ASRLocalUpdate_Multitask)
    runs end to end from the CLI; the unlabeled CSV doubles as ADReSSo."""
    main(["federated", "-fl_st", "1", "--epochs", "1", "--num_users", "2",
          "--local_ep", "1", "--global_ep", "1",
          "--num_lms", "3", "--supervised_level", "0.5",
          "--unsup_train_csv", str(data_dir / "train.csv"),
          "-model_out", str(tmp_path / "flmt"), "-log", "fl_mt.txt",
          *_common(data_dir, tmp_path)])
    out = capsys.readouterr().out
    assert "eval_wer" in out


def test_cli_text_branch(data_dir, tmp_path, capsys):
    # reuse the extract artifacts pipeline: train tiny then extract
    main(["train", "--epochs", "1", "-st", "0",
          "-model_out", str(tmp_path / "m2"), "-log", "t2.txt",
          *_common(data_dir, tmp_path)])
    main(["extract", "-st", "2", "-model_in", str(tmp_path / "m2" / "final"),
          "-csv", "t2", "--csv_out_dir", str(tmp_path / "r2"),
          *_common(data_dir, tmp_path)])
    capsys.readouterr()
    main(["text", "--train_pkl", str(tmp_path / "r2" / "t2_train.pkl"),
          "--test_pkl", str(tmp_path / "r2" / "t2.pkl"), "--epochs", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "test_acc" in out


def test_cli_sweep_text_and_svm(data_dir, tmp_path, capsys):
    """`cli sweep` replays the reference run_*.sh grids from pickles
    (run_dementia_BERTparamsTuning.sh / run_dementia_SVM.sh)."""
    main(["train", "--epochs", "1", "-st", "0",
          "-model_out", str(tmp_path / "m3"), "-log", "t3.txt",
          *_common(data_dir, tmp_path)])
    main(["extract", "-st", "2", "-model_in", str(tmp_path / "m3" / "final"),
          "-csv", "t3", "--csv_out_dir", str(tmp_path / "r3"),
          *_common(data_dir, tmp_path)])
    capsys.readouterr()

    csv_out = tmp_path / "sweep" / "text.csv"
    main(["sweep", "text",
          "--train_pkl", str(tmp_path / "r3" / "t3_train.pkl"),
          "--test_pkl", str(tmp_path / "r3" / "t3.pkl"),
          "--grid", "experiment=sentence_1input,session_text",
          "num_epochs=2", "learning_rate=1e-3",
          "--results_csv", str(csv_out)])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2 and all("acc" in l for l in lines)
    assert len(csv_out.read_text().strip().splitlines()) == 3  # header + 2 rows

    main(["sweep", "svm",
          "--train_pkl", str(tmp_path / "r3" / "t3_train.pkl"),
          "--test_pkl", str(tmp_path / "r3" / "t3.pkl"),
          "--spk2label", str(data_dir / "spk2label.npy"),
          "--preset", "dementia-svm",
          "--results_csv", str(tmp_path / "sweep" / "svm.csv")])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 4  # 4 poolings x 1 mode
    assert all("ACC" in l for l in lines)
    svm_csv = (tmp_path / "sweep" / "svm.csv").read_text().strip().splitlines()
    assert len(svm_csv) == 5  # header + 4 rows


def test_cli_sweep_asr_grid(data_dir, tmp_path, capsys):
    """ASR-side grid (run_HyperparameterTune.sh class): 2 configs trained
    and scored, best reported."""
    main(["sweep", "asr", "--epochs", "1",
          "--grid", "gs_tau=0.5,1.0",
          "--results_csv", str(tmp_path / "sweep" / "asr.csv"),
          *_common(data_dir, tmp_path)])
    out_lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in out_lines if l.startswith("{")]
    assert any("best" in r for r in rows)
    assert sum("eval_wer" in r for r in rows) == 2


def test_cli_pkl2csv(tmp_path, capsys):
    """pkl2csv keeps the reference's text columns and drops arrays
    (centralized/utils/PKL2csv.py)."""
    import pickle

    rows = [
        {"path": "a.wav", "text": "HI", "dementia_labels": 0,
         "pred_str": "HI", "hidden_states": np.zeros((3, 4))},
        {"path": "b.wav", "text": "NO", "dementia_labels": 1,
         "pred_str": "GO", "hidden_states": np.ones((3, 4))},
    ]
    pkl = tmp_path / "ex.pkl"
    import pandas as pd
    with open(pkl, "wb") as f:
        pickle.dump(pd.DataFrame(rows), f)
    main(["pkl2csv", "--pkl", str(pkl)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2 and "hidden_states" not in out["columns"]
    df = pd.read_csv(tmp_path / "ex.csv")
    assert list(df.columns) == ["path", "text", "dementia_labels", "pred_str"]
    assert df["pred_str"].tolist() == ["HI", "GO"]


def test_cli_text_experiment_with_real_bert(tmp_path, capsys):
    """A registry experiment driven through the CLI with a real (tiny) HF
    BERT checkpoint: the ported encoder replaces the offline fallback for
    text backends and the classifier sizes itself from its width."""
    import pickle

    import pandas as pd
    import torch
    from transformers import BertConfig, BertModel

    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        spk = f"S{i % 4:03d}"
        rows.append({
            "path": f"{spk}_PAR_{i}_0.wav",
            "text": ["the boy is stealing cookies", "a b the", "cookies boy",
                     "the the a"][i % 4],
            "pred_str": "the boy",
            "dementia_labels": i % 2,
        })
    for split, sel in (("train", rows[:6]), ("test", rows[6:] + rows[:2])):
        with open(tmp_path / f"{split}.pkl", "wb") as f:
            pickle.dump(pd.DataFrame(sel), f)

    hidden = 32
    hf_cfg = BertConfig(
        vocab_size=200, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64)
    torch.manual_seed(0)
    sd = BertModel(hf_cfg).state_dict()
    ckpt = tmp_path / "bert.bin"
    torch.save(sd, ckpt)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "boy", "is", "steal",
             "##ing", "cook", "##ies", "a", "b"] + [f"tok{i}" for i in range(187)]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    main(["text", "--experiment", "session_text",
          "--train_pkl", str(tmp_path / "train.pkl"),
          "--test_pkl", str(tmp_path / "test.pkl"),
          "--bert_checkpoint", str(ckpt), "--vocab", str(tmp_path / "vocab.txt"),
          "--epochs", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["experiment"] == "session_text"
    assert 0.0 <= out["acc"] <= 1.0


def test_cli_transcribe(data_dir, tmp_path, capsys):
    main(["transcribe", "--model_type", "tiny", "-st", "0",
          "--audio", str(data_dir / "clips"),
          "--out", str(tmp_path / "tx.csv"),
          "--eval_batch_size", "2", "--compute_dtype", "float32",
          "--max_seconds", "1.0"])
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 6
    row = json.loads(lines[0])
    assert {"path", "transcript", "ad_pred", "ad_prob"} <= set(row)
    assert (tmp_path / "tx.csv").read_text().count("\n") == 7  # header + 6


def test_cli_stream_report(data_dir, tmp_path, capsys):
    """stream-report prints one JSON row per right-context grid point with
    the finalization flip-rate fields (the data behind the streaming
    latency knob)."""
    main(["stream-report", "--max_utts", "2", "--hop_seconds", "0.1",
          "--right_context_grid", "0.1", "30.0",
          *_common(data_dir, tmp_path)])
    out = capsys.readouterr().out
    rows = [json.loads(l) for l in out.strip().splitlines()
            if l.startswith("{")]
    assert [r["right_context_seconds"] for r in rows] == [0.1, 30.0]
    for r in rows:
        assert {"finalized_frames", "finalized_fraction", "flips",
                "flip_rate"} <= set(r)
    # past-the-utterance right context finalizes nothing early
    assert rows[-1]["finalized_frames"] == 0


def test_cli_teacher_self_labeling(data_dir, tmp_path, capsys):
    """`cli teacher` (the reference's offline TeacherStudentLearning pass,
    federated_main.py:29-68): label an unlabeled CSV with the framework's
    own CTC model, write the path,sentence CSV + transcript JSON, and the
    CSV round-trips through the loader as labeled examples."""
    out_csv = tmp_path / "teacher" / "unsup.csv"
    main(["teacher", "--out", str(out_csv),
          *_common(data_dir, tmp_path)])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["transcribed"] == 4  # train.csv carries 4 utterances
    assert (tmp_path / "teacher" / "unsup.json").exists()
    import csv as _csv

    with open(out_csv, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert info["kept"] == len(rows)
    for r in rows:
        assert r["sentence"] == r["sentence"].upper().strip()
    # the JSON sidecar mirrors the CSV content for the kept rows
    trs = json.loads((tmp_path / "teacher" / "unsup.json").read_text())
    assert set(r["path"] for r in rows) <= set(trs)


def test_reproduce_wer_runbook_parses():
    """VERDICT r3 #8: the unattended WER runbook must stay in sync with the
    CLI — every `python -m ...cli` command line in scripts/reproduce_wer.sh
    is extracted, variable-substituted, and parse-validated against the
    real parser (argparse raises SystemExit on any drifted flag)."""
    import re
    import shlex
    from pathlib import Path

    from privacy_preserve_federated_asr_tpu.cli import build_parser

    script = Path(__file__).parent.parent / "scripts" / "reproduce_wer.sh"
    text = script.read_text().replace("\\\n", " ")
    m = re.search(r"COMMON=\((.*?)\)\n", text, re.S)
    assert m, "COMMON array not found in reproduce_wer.sh"
    common = " ".join(m.group(1).split())
    subs = {'"${COMMON[@]}"': common, '"$DATA': '"/data',
            '"$MODEL': '"/model', '"$OUT': '"/out'}
    cmds = []
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("python -m privacy_preserve_federated_asr_tpu.cli"):
            continue
        for k, v in subs.items():
            line = line.replace(k, v)
        # the conditional MMSE block: validate the optional flags too
        line = re.sub(r"\$\(.*\)",
                      "--id2mmse /data/meta-data/ID2MMSE.npy -t 3", line)
        cmds.append(shlex.split(line)[3:])  # drop python -m <module>
    assert len(cmds) == 4, f"expected 4 CLI invocations, found {len(cmds)}"
    assert [c[0] for c in cmds] == ["federated", "extract", "detail-wer", "svm"]
    parser = build_parser()
    for argv in cmds:
        args = parser.parse_args(argv)  # SystemExit = drifted runbook
        assert callable(args.fn)
