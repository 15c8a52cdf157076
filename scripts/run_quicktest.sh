#!/usr/bin/env bash
# End-to-end smoke driver (the reference's centralized/run_quicktest.sh
# role): synthetic data -> stage-0 train -> stage-2 extract -> SVM +
# detail-WER + mask statistics. Runs on CPU in a few minutes.
set -e
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=${QUICKTEST_PLATFORM:-cpu}

OUT=${1:-/tmp/dacs_quicktest}
rm -rf "$OUT"
mkdir -p "$OUT"

python scripts/make_synthetic_data.py --out "$OUT/data" --speakers 6 --utts_per_speaker 3

COMMON=(--model_type tiny --audio_dir "$OUT/data/clips"
        --train_csv "$OUT/data/train.csv" --test_csv "$OUT/data/test.csv"
        --spk2label "$OUT/data/spk2label.npy" --dataset_cache "$OUT/cache"
        --compute_dtype float32 --train_batch_size 4 --eval_batch_size 4)

python -m privacy_preserve_federated_asr_tpu.cli train \
  --epochs 2 -st 0 -model_out "$OUT/model" -log quicktest.txt "${COMMON[@]}"

python -m privacy_preserve_federated_asr_tpu.cli extract \
  -st 2 -model_in "$OUT/model/final" -csv quicktest \
  --csv_out_dir "$OUT/results" "${COMMON[@]}"

python -m privacy_preserve_federated_asr_tpu.cli svm \
  --train_pkl "$OUT/results/quicktest_train.pkl" \
  --test_pkl "$OUT/results/quicktest.pkl" \
  --spk2label "$OUT/data/spk2label.npy" -sq mean \
  --results_csv "$OUT/results/SVM/results.csv"

python -m privacy_preserve_federated_asr_tpu.cli detail-wer \
  --pkl "$OUT/results/quicktest.pkl" -t 2 --out_dir "$OUT/wer"

python -m privacy_preserve_federated_asr_tpu.cli feat-scoring \
  --pkl "$OUT/results/quicktest.pkl" --out_dir "$OUT/fsm_info"

echo "quicktest OK: artifacts under $OUT"
