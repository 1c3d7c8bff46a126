"""Engine-level batched serving benchmark (importable core).

The reference engine's headline figure — "800-1000 tok/s on a single GPU"
(reference README.md:192) — is an ENGINE-level number: it includes the
scheduler, prefill, host<->device chunk boundaries, and per-request
bookkeeping, not just the raw decode loop.  `run_engine_bench` times
`LLMEngine.step` end to end on 7B W8A8 with B concurrent requests and
continuous batching (R > B so finished slots backfill), so the comparison to
the reference figure is like for like.  `scripts/bench_engine.py` is the CLI
wrapper; bench.py embeds it as the `engine_tps_at_tpf4` companion metric.

Random weights accept ~1 token/iteration, so raw committed tokens/s would
conflate framework speed with (absent) model training; throughput is
reported as iters/s x TPF with the reference's measured TPF=4.0 convention
(README.md:261), plus the measured-TPF variant when the caller knows one.

The STEADY-STATE window cuts the drain tail: once fewer than B requests
remain unfinished there is nothing left to backfill with, and the shrinking
batch measures the bench's finite request list, not the engine.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np


def run_engine_bench(
    B: int = 8,
    prompt_len: int = 512,
    max_tokens: int = 256,
    L: int = 64,
    chunk_iters: int = 8,
    requests: Optional[int] = None,
    max_model_len: int = 8192,
    chunk_tokens: int = 128,
    model_cfg=None,
    params=None,
    strategy: str = "jacobi",  # "jacobi" | "nongreedy" | "mr"
    temperature: float = 0.7,  # nongreedy only (greedy strategies ignore it)
    mr_blocks: int = 2,
    mr_pool: int = 4,
    mr_auto: bool = False,  # False = measure the raw MR configuration
    prefill_buckets: Optional[tuple] = None,
) -> dict:
    import jax

    from jacobiforcing_tpu.config import Config, SamplingParams
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine
    from jacobiforcing_tpu.models.qwen import ModelConfig
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    if model_cfg is None:
        # default benchmark model: 7B dims, int8 MXU (W8A8)
        model_cfg = dataclasses.replace(ModelConfig(), act_quant=True)
    mc = model_cfg
    if params is None:
        params = init_quantized_params(mc, jax.random.PRNGKey(0))
    R = requests if requests is not None else 4 * B

    # Sub-B batch buckets matter for ENGINE throughput even though
    # steady-state decode always runs the full batch: backfill prefills
    # usually admit a SINGLE request (a bucket-1 prefill is half the padded
    # work of bucket 2 — at 4k prompts prefill dominates the steady-state
    # tax, so this is a first-order term), and the drain tail decodes a
    # shrinking batch.  Each bucket is one warmed executable, persisted by
    # the XLA compilation cache across processes.
    bbs = tuple(b for b in (1, 2, 4, 8, 16, 32) if b < B) + (B,)
    cfg = Config(
        max_model_len=max_model_len,
        max_num_seqs=B,
        jacobi_chunk_tokens=chunk_tokens,
        # iteration-budget chunking, 8 trips/segment (measured best at
        # B=8/512: occupancy 0.958 @8 vs 0.882 @16 vs 0.730 @32 — finer
        # chunks backfill finished slots sooner and the once-per-segment
        # host sync is already amortized at 8)
        jacobi_chunk_iters=chunk_iters,
        jacobi_max_blocks=mr_blocks,
        jacobi_n_gram_pool_size=mr_pool,
        jacobi_mr_auto_policy=mr_auto,
        batch_buckets=bbs,
        prefill_token_buckets=(
            prefill_buckets if prefill_buckets else (prompt_len + 2 * L,)
        ),
        # A/B knob for the speculative host pipeline (defaults on)
        jacobi_async_host=os.environ.get("JF_ASYNC_HOST", "1") != "0",
        eos=-1,
    )
    pages_per_seq = (
        prompt_len + max_tokens + 3 * L
    ) // cfg.kvcache_page_size + 1
    eng = LLMEngine(
        cfg, model_cfg=mc, params=params,
        num_kv_pages=(B + 2) * pages_per_seq + 8,
    )

    rng = np.random.RandomState(0)
    prompts = [
        rng.randint(1, mc.vocab_size, prompt_len - (i % 5)).tolist()
        for i in range(R)
    ]
    if strategy == "nongreedy":
        sp = SamplingParams(
            temperature=temperature, max_tokens=max_tokens,
            decode_strategy="jacobi_nongreedy", jacobi_block_len=L,
            jacobi_max_blocks=1, ignore_eos=True,
            jacobi_max_iterations=1 << 20,
        )
        warm = ("jacobi_nongreedy",)
    elif strategy == "mr":
        sp = SamplingParams(
            temperature=0.0, max_tokens=max_tokens,
            decode_strategy="jacobi_multiblock_rejection_recycling",
            jacobi_block_len=L, jacobi_max_blocks=mr_blocks,
            jacobi_n_gram_pool_size=mr_pool, ignore_eos=True,
            jacobi_max_iterations=1 << 20,
        )
        # the auto-policy's single-block arm needs the jacobi executable warm
        warm = ("mr", "jacobi") if mr_auto else ("mr",)
    else:
        sp = SamplingParams(
            temperature=0.0, max_tokens=max_tokens, decode_strategy="jacobi",
            jacobi_block_len=L, jacobi_max_blocks=1, ignore_eos=True,
            jacobi_max_iterations=1 << 20,
        )
        warm = ("jacobi",)

    # Precompile every (bucket, strategy) executable through the real
    # scheduler path so the measured run never compiles.
    eng.warmup(strategies=warm, block_lens=(L,))
    eng.generate(prompts[:B], sp, use_tqdm=False)
    eng._mr_policies.clear()  # measured run starts with a fresh probe window

    from jacobiforcing_tpu.utils import profiling

    if profiling.get_profiler():  # PROFILE=1: window out warmup
        profiling.reset_profiler()

    seqs = [eng.add_request(p, s) for p, s in zip(prompts, [sp] * R)]
    t0 = time.perf_counter()
    it0 = eng.stats["jacobi_iterations"]
    fw0 = eng.stats["chunk_forwards"]
    g0 = eng.stats["generated_tokens"]
    timeline = []  # (t, iters, forwards, tokens, unfinished)
    while not eng.scheduler.is_finished:
        eng.step()
        timeline.append((
            time.perf_counter() - t0,
            eng.stats["jacobi_iterations"] - it0,
            eng.stats["chunk_forwards"] - fw0,
            eng.stats["generated_tokens"] - g0,
            sum(not s.is_finished for s in seqs),
        ))
    dt = time.perf_counter() - t0
    iters = eng.stats["jacobi_iterations"] - it0
    forwards = eng.stats["chunk_forwards"] - fw0
    tokens = sum(len(s.completion_token_ids) for s in seqs)

    steady = [x for x in timeline if x[4] >= B]
    if steady:
        t_ss, it_ss, fw_ss, tok_ss, _ = steady[-1]
    else:  # degenerate: R < B
        t_ss, it_ss, fw_ss, tok_ss = dt, iters, forwards, tokens

    tag = (
        "7b_w8a8"
        if (mc.hidden_size, mc.num_layers, mc.act_quant) == (3584, 28, True)
        else f"{mc.hidden_size}h{mc.num_layers}L"
    )
    stag = "" if strategy == "jacobi" else f"_{strategy}"
    out = {
        "metric": f"engine_tps_at_tpf4_{tag}{stag}_B{B}_L{L}",
        "value": round(4.0 * it_ss / t_ss, 2),
        "unit": "tok/s",
        "strategy": strategy,
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
        "prompt_len": prompt_len,
        "max_tokens": max_tokens,
        "requests": R,
    }
    # MR commits a variable token count per iteration (random weights still
    # recycle pool hits), so the real committed rate over the steady window
    # complements the @TPF4 convention for every strategy.
    out["committed_tok_per_s_steady"] = round(tok_ss / t_ss, 2)
    if strategy == "mr":
        if eng._mr_policies:
            out["mr_policy"] = eng.mr_policy_snapshot()
        for k in ("mr_full", "mr_nocand", "mr_ra_only", "mr_single"):
            if k in eng.stats:
                out[k] = int(eng.stats[k])
    eng.exit()
    return out
