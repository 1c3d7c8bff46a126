#!/usr/bin/env bash
# Jacobi-Forcing consistency training, n=32 blocks (reference:
# JacobiForcing/scripts/train/train_jacobi_forcing_coder_n32.sh:10-38).
# On a TPU pod, run the same command on every host (jax.distributed joins them).
set -euo pipefail

MODEL=${1:?usage: train_jacobi_forcing_n32.sh MODEL_CKPT PACKED_JSONL [OUT_DIR]}
DATA=${2:?}
OUT=${3:-out/jacobi_forcing_n32}

python - "$MODEL" "$DATA" "$OUT" <<'PY'
import sys
from jacobiforcing_tpu.train.trainer import TrainerArgs, train

model, data, out = sys.argv[1:4]
train(TrainerArgs(
    target_model_path=model,
    data_path=data,
    output_dir=out,
    max_new_tokens=32,          # n_token_seq_size
    variant="single",           # "multiblock" / "window" for the variants
    learning_rate=1e-5,         # cosine to 5e-7 (min_lr_ratio=0.05)
    num_epochs=1,
    save_steps=500,
    seq_bucket=16384,           # model_max_length
))
PY
