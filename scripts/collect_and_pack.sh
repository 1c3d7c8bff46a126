#!/usr/bin/env bash
# Stage 1+2 of the data pipeline: collect Jacobi trajectories through the
# serving engine, then pack with the progressive noise-window schedule
# (reference: generate_trajectory/generation/*.sh + data/2_*.py).
set -euo pipefail

MODEL=${1:?usage: collect_and_pack.sh MODEL_CKPT PROMPTS_JSONL [OUT_DIR] [N]}
PROMPTS=${2:?}
OUT=${3:-data_out}
N=${4:-32}

mkdir -p "$OUT"
python - "$MODEL" "$PROMPTS" "$OUT" "$N" <<'PY'
import json, sys
from jacobiforcing_tpu.engine.llm import LLM
from jacobiforcing_tpu.data import collect_trajectories, pack_trajectories
from jacobiforcing_tpu.data.tools import profile_trajectory_dataset

model, prompts_path, out, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
llm = LLM(model=model)
prompts = []
with open(prompts_path) as f:
    for line in f:
        if line.strip():
            r = json.loads(line)
            prompts.append(r.get("prompt_ids") or llm.tokenizer.encode(r["prompt"]))

rows = collect_trajectories(
    llm.engine, prompts, block_len=n, max_tokens=1024, temperature=0.0,
    output_path=f"{out}/trajectories.jsonl",
)
print(json.dumps(profile_trajectory_dataset(rows), indent=2))
packed = pack_trajectories(rows, n, window_size=4, strategy="progressive",
                           output_path=f"{out}/packed.jsonl")
print(f"{len(rows)} trajectory rows -> {len(packed)} packed rows -> {out}/packed.jsonl")
PY
