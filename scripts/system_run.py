#!/usr/bin/env python
"""One unattended ON-CHIP system run (VERDICT r4 item #4).

Runs the WHOLE system end to end on the real TPU — synthetic data ->
full 3-stage federated pipeline (cli federated -fl_st 0, with round
checkpoints) -> extraction from the final global model -> SVM AD
prediction -> detail-WER -> mask statistics — and writes a timing/golden
JSON artifact with per-stage wall clock and key outputs. This is the TPU
sibling of tests/test_pipeline_golden.py + scripts/run_quicktest.sh: it
proves the system COMPOSES on the chip (compile budget, checkpoint I/O,
engine <-> eval interplay) in one unattended pass, not just as microbench
slices.

Each stage runs in its own subprocess: the axon tunnel serves one
registered process at a time, a wedged stage degrades to an error field
instead of hanging the run, and the persistent compile cache
(/root/.jax_cache) carries programs across stages and rounds.

Usage:
    python scripts/system_run.py                    # on-chip, flagship
    python scripts/system_run.py --model_type tiny --platform cpu  # rehearsal
    python scripts/system_run.py --json SYSTEM_RUN_TPU.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_stage(name: str, argv: list[str], env: dict, timeout_s: float,
              log_dir: Path) -> dict:
    """Run one stage; record wall clock, return code, and the last JSON
    line it printed (the CLI's metric convention)."""
    t0 = time.perf_counter()
    log = log_dir / f"{name}.log"
    try:
        with open(log, "w") as f:
            proc = subprocess.run(argv, env=env, stdout=f,
                                  stderr=subprocess.STDOUT,
                                  timeout=timeout_s, cwd=str(REPO))
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        rc = -1
    wall = time.perf_counter() - t0
    last_json = None
    try:
        for line in reversed(log.read_text().splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    last_json = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
    except OSError:
        pass
    row = {"wall_s": round(wall, 1), "rc": rc}
    if rc != 0:
        tail = log.read_text().splitlines()[-5:] if log.exists() else []
        row["error"] = " | ".join(tail)[:400]
    if last_json is not None:
        row["output"] = last_json
    print(f"[system_run] {name}: rc={rc} wall={wall:.1f}s", flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dacs_system_run")
    ap.add_argument("--json", default=str(REPO / "SYSTEM_RUN_TPU.json"))
    ap.add_argument("--model_type", default="data2vec",
                    help="flagship (data2vec-audio-large) by default; "
                         "'tiny' for a CPU rehearsal")
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--rounds", type=int, default=1,
                    help="FL rounds per stage")
    ap.add_argument("--num_users", type=int, default=2)
    ap.add_argument("--local_ep", type=int, default=1)
    ap.add_argument("--global_ep", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--speakers", type=int, default=6)
    ap.add_argument("--utts", type=int, default=3)
    ap.add_argument("--stage_timeout_s", type=float, default=3600.0)
    args = ap.parse_args()

    out = Path(args.out)
    if out.exists():
        import shutil

        shutil.rmtree(out)
    out.mkdir(parents=True)
    (out / "logs").mkdir()

    env = dict(os.environ)
    if args.platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    dtype = "float32" if args.platform == "cpu" else "bfloat16"

    py = sys.executable
    cli = [py, "-m", "privacy_preserve_federated_asr_tpu.cli"]
    common = [
        "--model_type", args.model_type,
        "--audio_dir", f"{out}/data/clips",
        "--train_csv", f"{out}/data/train.csv",
        "--test_csv", f"{out}/data/test.csv",
        "--spk2label", f"{out}/data/spk2label.npy",
        "--dataset_cache", f"{out}/cache",
        "--compute_dtype", dtype,
        "--train_batch_size", str(args.batch),
        "--eval_batch_size", str(args.batch),
    ]

    stages: list[tuple[str, list[str]]] = [
        ("synthetic_data",
         [py, "scripts/make_synthetic_data.py", "--out", f"{out}/data",
          "--speakers", str(args.speakers),
          "--utts_per_speaker", str(args.utts)]),
        # the full 3-stage pipeline in ONE invocation (-fl_st 0): FLASR
        # fine-tune -> FLAD arbitrator -> final toggling stage, with the
        # reference's _FLASR_global/_FLAD_global/_final_global saves
        ("federated_pipeline",
         cli + ["federated", "-fl_st", "0",
                "--epochs", str(args.rounds),
                "--num_users", str(args.num_users),
                "--local_ep", str(args.local_ep),
                "--global_ep", str(args.global_ep),
                "-model_out", f"{out}/model",
                "-log", "system_run.txt"] + common),
        ("extract",
         cli + ["extract", "-st", "2",
                "-model_in", f"{out}/model_final_global/final",
                "-csv", "systemrun", "--csv_out_dir", f"{out}/results"]
         + common),
        ("svm",
         cli + ["svm", "--train_pkl", f"{out}/results/systemrun_train.pkl",
                "--test_pkl", f"{out}/results/systemrun.pkl",
                "--spk2label", f"{out}/data/spk2label.npy", "-sq", "mean",
                "--results_csv", f"{out}/results/SVM/results.csv"]),
        ("detail_wer",
         cli + ["detail-wer", "--pkl", f"{out}/results/systemrun.pkl",
                "-t", "2", "--out_dir", f"{out}/wer"]),
        ("feat_scoring",
         cli + ["feat-scoring", "--pkl", f"{out}/results/systemrun.pkl",
                "--out_dir", f"{out}/fsm_info"]),
    ]

    t0 = time.perf_counter()
    report: dict = {
        "platform": args.platform,
        "model_type": args.model_type,
        "shape": (f"K={args.num_users} rounds={args.rounds} "
                  f"local_ep={args.local_ep} B={args.batch} "
                  f"{args.speakers}spk x {args.utts}utt"),
        "stages": {},
    }
    ok = True
    for name, argv in stages:
        row = run_stage(name, argv, env, args.stage_timeout_s, out / "logs")
        report["stages"][name] = row
        if row["rc"] != 0:
            ok = False
            break
    report["total_wall_s"] = round(time.perf_counter() - t0, 1)
    report["ok"] = ok
    # golden summary: the committed artifact records what came out, so a
    # regression in any stage's OUTPUT (not just its exit code) is visible
    svm = report["stages"].get("svm", {}).get("output")
    if isinstance(svm, dict):
        report["svm_metrics"] = svm
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"ok": ok, "total_wall_s": report["total_wall_s"],
                      "json": args.json}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
