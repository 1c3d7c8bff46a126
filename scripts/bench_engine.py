"""Engine-level batched serving throughput on the real chip.

The reference engine's headline figure — "800-1000 tok/s on a single GPU"
(reference README.md:192) — is an ENGINE-level number: it includes the
scheduler, prefill, host<->device chunk boundaries, and per-request
bookkeeping, not just the raw decode loop.  bench.py's batch8 companion times
the raw runner loop; this script times `LLMEngine.generate` end to end on 7B
W8A8 with B concurrent requests, so the comparison to the reference figure is
like for like.

Random weights accept ~1 token/iteration, so raw committed tokens/s would
conflate framework speed with (absent) model training.  We report:
  * iters/s through the whole engine (scheduler + prefill included), and
  * tok/s at the reference's measured TPF=4.0 (README.md:261) — the same
    convention as bench.py,
  * plus the raw committed tok/s for reference (= iters/s with random weights).

    python scripts/bench_engine.py [B] [prompt_len] [max_tokens]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PROMPT_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MAX_TOKENS = int(sys.argv[3]) if len(sys.argv) > 3 else 256
# Jacobi block length. 64 matches bench.py's headline; 32 is a reference
# training config (n_token_seq_len=32) and nearly doubles the iteration rate
# in the compute-bound batched regime (NOTES.md round-2 table).
L = int(os.environ.get("JF_BENCH_L", "64"))

import dataclasses

import jax
import jax.numpy as jnp

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine
from jacobiforcing_tpu.models.qwen import ModelConfig
from jacobiforcing_tpu.ops.quant import init_quantized_params

mc = dataclasses.replace(ModelConfig(), act_quant=True)  # 7B dims, int8 MXU
params = init_quantized_params(mc, jax.random.PRNGKey(0))

# R > B requests so the scheduler BACKFILLS finished slots (continuous
# batching): with exactly B requests the tail of the run decodes a draining,
# underfilled batch and the number misrepresents steady-state serving.
R = int(os.environ.get("JF_BENCH_REQUESTS", str(4 * B)))

# Sub-B batch buckets matter for ENGINE throughput even though steady-state
# decode always runs the full batch: backfill prefills admit 1-3 requests at
# a time (a (2,)-bucket prefill is 4x cheaper than padding to 8), and the
# drain tail decodes a shrinking batch (a 2-row trip is ~4x cheaper than an
# 8-padded one).  Each bucket is one warmed executable, persisted by the XLA
# compilation cache across processes.
bbs = tuple(b for b in (2, 4, 8, 16, 32) if b < B) + (B,)
cfg = Config(
    max_model_len=int(os.environ.get("JF_BENCH_MAXLEN", "8192")),
    max_num_seqs=B,
    jacobi_chunk_tokens=int(os.environ.get("JF_BENCH_CHUNK", "128")),
    # iteration-budget chunking: every unfinished row runs every device trip
    # (token-budget chunks idle fast rows once they hit the budget — measured
    # occupancy 0.45 at B=8 under random-weight TPF variance).  8 trips per
    # segment measured best (B=8/512: occupancy 0.958 @8 vs 0.882 @16 vs
    # 0.730 @32 — finer chunks backfill finished slots sooner and the
    # once-per-segment host sync is already amortized at 8).
    jacobi_chunk_iters=int(os.environ.get("JF_BENCH_CHUNK_ITERS", "8")),
    batch_buckets=bbs,
    prefill_token_buckets=(PROMPT_LEN + 64,),
    eos=-1,
)
pages_per_seq = (PROMPT_LEN + MAX_TOKENS + 3 * L) // cfg.kvcache_page_size + 1
eng = LLMEngine(
    cfg, model_cfg=mc, params=params,
    num_kv_pages=(B + 2) * pages_per_seq + 8,
)

rng = np.random.RandomState(0)
prompts = [
    rng.randint(1, mc.vocab_size, PROMPT_LEN - (i % 5)).tolist() for i in range(R)
]
sp = SamplingParams(
    temperature=0.0, max_tokens=MAX_TOKENS, decode_strategy="jacobi",
    jacobi_block_len=L, jacobi_max_blocks=1, ignore_eos=True,
    jacobi_max_iterations=1 << 20,
)

# Precompile every (bucket, strategy) executable through the real scheduler
# path so the measured run never compiles (persistent-cached across runs).
eng.warmup(strategies=("jacobi",), block_lens=(L,))
eng.generate(prompts[:B], sp, use_tqdm=False)

if os.environ.get("PROFILE", "0") == "1":
    from jacobiforcing_tpu.utils import profiling

    profiling.reset_profiler()

# Manual step loop (what generate() does) so we can timestamp every engine
# step and window out the DRAIN TAIL: once fewer than B requests remain
# unfinished there is nothing left to backfill with, and the shrinking batch
# measures the bench's finite request list, not the engine.  Steady state =
# from the first step until remaining unfinished < B.
seqs = [eng.add_request(p, s) for p, s in zip(prompts, [sp] * R)]
t0 = time.perf_counter()
it0 = eng.stats["jacobi_iterations"]
fw0 = eng.stats["chunk_forwards"]
timeline = []  # (t, iters, forwards, unfinished)
while not eng.scheduler.is_finished:
    eng.step()
    timeline.append((
        time.perf_counter() - t0,
        eng.stats["jacobi_iterations"] - it0,
        eng.stats["chunk_forwards"] - fw0,
        sum(not s.is_finished for s in seqs),
    ))
dt = time.perf_counter() - t0
iters = eng.stats["jacobi_iterations"] - it0
forwards = eng.stats["chunk_forwards"] - fw0
tokens = sum(len(s.completion_token_ids) for s in seqs)

steady = [x for x in timeline if x[3] >= B]
if steady:
    t_ss, it_ss, fw_ss, _ = steady[-1]
else:  # degenerate: R < B
    t_ss, it_ss, fw_ss = dt, iters, forwards

print(json.dumps({
    "metric": f"engine_tps_at_tpf4_7b_w8a8_B{B}_L{L}",
    "value": round(4.0 * it_ss / t_ss, 2),
    "unit": "tok/s",
    "steady_window_s": round(t_ss, 3),
    "steady_iters_per_s": round(it_ss / t_ss, 2),
    "steady_occupancy": round(it_ss / max(fw_ss * B, 1), 3),
    "overall_tps_at_tpf4": round(4.0 * iters / dt, 2),
    "iters_per_s": round(iters / dt, 2),
    "forwards": forwards,
    "ms_per_forward": round(1e3 * dt / max(forwards, 1), 2),
    "batch_occupancy": round(iters / max(forwards * B, 1), 3),
    "committed_tok_per_s": round(tokens / dt, 2),
    "wall_s": round(dt, 3),
    "prompt_len": PROMPT_LEN,
    "max_tokens": MAX_TOKENS,
    "requests": R,
}))

if os.environ.get("PROFILE", "0") == "1":
    from jacobiforcing_tpu.utils.profiling import get_profiler

    print(get_profiler().report())
