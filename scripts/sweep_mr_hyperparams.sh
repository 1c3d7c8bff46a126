#!/usr/bin/env bash
# MR decode-knob sweep (reference:
# JacobiForcing/scripts/inference/scanning_hyperparameter_jacobi_decoding_mr.sh:23-122).
# The reference fans out over GPUs with a token semaphore; here points run
# sequentially on the chip — shard the grid across hosts if needed.
set -euo pipefail

MODEL=${1:?usage: sweep_mr_hyperparams.sh MODEL_CKPT [DATASET_JSONL] [OUT_DIR]}
DATASET=${2:-}
OUT=${3:-grid_out}

python -m jacobiforcing_tpu.apps.grid_search \
  --model "$MODEL" ${DATASET:+--dataset "$DATASET"} --output-dir "$OUT" \
  --block-sizes 8 16 32 64 128 256 \
  --Ks 1 2 3 4 \
  --rs 0.50 0.55 0.60 0.65 0.70 0.75 0.80 0.85 0.90 0.95 \
  --pools 1 2 4 8 12 \
  --max-new-tokens 1024

python -m jacobiforcing_tpu.apps.analyze_grid "$OUT/grid_results.csv" --plot-dir "$OUT"
