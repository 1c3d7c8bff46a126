"""CLI wrapper for the engine-level batched serving benchmark.

Core lives in jacobiforcing_tpu/apps/bench_engine.py (bench.py embeds it as
the `engine_tps_at_tpf4` companion metric; this wrapper is for ad-hoc grid
runs on the real chip).

    python scripts/bench_engine.py [B] [prompt_len] [max_tokens]

Env knobs: JF_BENCH_L (Jacobi block length; 64 matches bench.py's headline,
32 is a reference training config that nearly doubles the iteration rate in
the compute-bound batched regime), JF_BENCH_CHUNK_ITERS, JF_BENCH_REQUESTS,
JF_BENCH_MAXLEN, JF_BENCH_CHUNK, JF_BENCH_STRATEGY=jacobi|nongreedy|mr,
JF_BENCH_TEMP (nongreedy), JF_BENCH_MR_BLOCKS, JF_BENCH_MR_POOL, PROFILE=1.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jacobiforcing_tpu.apps.bench_engine import run_engine_bench

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PROMPT_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MAX_TOKENS = int(sys.argv[3]) if len(sys.argv) > 3 else 256

out = run_engine_bench(
    B=B,
    prompt_len=PROMPT_LEN,
    max_tokens=MAX_TOKENS,
    L=int(os.environ.get("JF_BENCH_L", "64")),
    chunk_iters=int(os.environ.get("JF_BENCH_CHUNK_ITERS", "8")),
    requests=(
        int(os.environ["JF_BENCH_REQUESTS"])
        if "JF_BENCH_REQUESTS" in os.environ else None
    ),
    max_model_len=int(os.environ.get("JF_BENCH_MAXLEN", "8192")),
    chunk_tokens=int(os.environ.get("JF_BENCH_CHUNK", "128")),
    strategy=os.environ.get("JF_BENCH_STRATEGY", "jacobi"),
    temperature=float(os.environ.get("JF_BENCH_TEMP", "0.7")),
    mr_blocks=int(os.environ.get("JF_BENCH_MR_BLOCKS", "2")),
    mr_pool=int(os.environ.get("JF_BENCH_MR_POOL", "4")),
    mr_auto=os.environ.get("JF_BENCH_MR_AUTO", "0") == "1",
)
print(json.dumps(out))

if os.environ.get("PROFILE", "0") == "1":
    from jacobiforcing_tpu.utils.profiling import get_profiler

    print(get_profiler().report())
