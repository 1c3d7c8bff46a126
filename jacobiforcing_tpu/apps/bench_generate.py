"""Benchmark/eval driver: AR vs Jacobi vs MR generation with per-example
profiles.

Re-design of the reference benchmark harnesses
(JacobiForcing/jacobi_forcing_inference_humaneval.py:26-301,
jacobi_forcing_inference_MR_humaneval.py, jacobi_forcing_inference_MATH500.py,
ar_inference_baseline.py:17-227): per-prompt generation with the selected
decode strategy, JSONL generations (evalchemy-compatible: one record per task
with the completion) plus a CSV per-example profile (iterations, iters/token,
tok/s) and an EOS-only aggregate summary (reference :274-301).

Usage:
    python -m jacobiforcing_tpu.apps.bench_generate \
        --model /path/to/ckpt --dataset prompts.jsonl --strategy jacobi \
        --n-token-seq-len 64 --max-new-tokens 1024 --output-dir out/

The dataset is JSONL with {"task_id": ..., "prompt": "..."} (or
{"prompt_ids": [...]}); with no dataset, synthetic prompts exercise the
serving path for pure-performance runs.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from typing import List

import numpy as np


def build_sampling_params(args):
    from jacobiforcing_tpu.config import SamplingParams

    strategy = {
        "ar": "autoregressive",
        "jacobi": "jacobi",
        "mr": "jacobi_multiblock_rejection_recycling",
        "nongreedy": "jacobi_nongreedy",
    }[args.strategy]
    return SamplingParams(
        temperature=args.temperature,
        max_tokens=args.max_new_tokens,
        decode_strategy=strategy,
        jacobi_block_len=args.n_token_seq_len,
        jacobi_max_blocks=args.max_blocks,
        jacobi_spawn_ratio=args.spawn_ratio,
        jacobi_lookahead_start_ratio=args.lookahead_start_ratio,
        jacobi_n_gram_pool_size=args.n_gram_pool_size,
        jacobi_max_iterations=args.max_iterations,
    )


def load_prompts(args, tokenizer) -> List[dict]:
    rows = []
    if args.dataset:
        with open(args.dataset) as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                if "prompt_ids" in r:
                    ids = r["prompt_ids"]
                else:
                    assert tokenizer is not None, "text prompts need a tokenizer"
                    ids = tokenizer.encode(r["prompt"])
                rows.append({"task_id": r.get("task_id", f"task_{i}"), "prompt_ids": ids})
                if args.limit and len(rows) >= args.limit:
                    break
    else:
        rng = np.random.RandomState(0)
        for i in range(args.limit or 8):
            lo = min(16, args.synthetic_prompt_len)
            n = int(rng.randint(lo, args.synthetic_prompt_len + 1))
            rows.append({
                "task_id": f"synthetic_{i}",
                "prompt_ids": rng.randint(1, args.synthetic_vocab, n).tolist(),
            })
    return rows


def run(args, engine=None, tokenizer=None):
    if engine is None:
        from jacobiforcing_tpu.engine.llm import LLM

        llm = LLM(model=args.model)
        engine, tokenizer = llm.engine, llm.tokenizer

    sp = build_sampling_params(args)
    rows = load_prompts(args, tokenizer)
    os.makedirs(args.output_dir, exist_ok=True)

    profiles = []
    gen_path = os.path.join(args.output_dir, f"generations_{args.strategy}.jsonl")
    with open(gen_path, "w") as gen_f:
        for row in rows:
            iters0 = engine.stats["jacobi_iterations"]
            t0 = time.perf_counter()
            out = engine.generate([row["prompt_ids"]], sp)[0]
            dt = time.perf_counter() - t0
            toks = out["token_ids"]
            iters = engine.stats["jacobi_iterations"] - iters0
            rec = {"task_id": row["task_id"], "token_ids": toks}
            if tokenizer is not None:
                rec["completion"] = tokenizer.decode(toks)
            gen_f.write(json.dumps(rec) + "\n")
            eos_hit = bool(toks) and engine.config.eos >= 0 and toks[-1] == engine.config.eos
            profiles.append({
                "task_id": row["task_id"],
                "num_tokens": len(toks),
                "iterations": iters,
                "iters_per_token": round(iters / max(len(toks), 1), 4),
                "tokens_per_forward": round(len(toks) / max(iters, 1), 4),
                "wall_s": round(dt, 4),
                "tokens_per_s": round(len(toks) / max(dt, 1e-9), 2),
                "eos_terminated": eos_hit,
            })

    csv_path = os.path.join(args.output_dir, f"profile_{args.strategy}.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(profiles[0].keys()))
        w.writeheader()
        w.writerows(profiles)

    # EOS-only aggregate (reference jacobi_forcing_inference_humaneval.py:274-301)
    eos_rows = [p for p in profiles if p["eos_terminated"]] or profiles
    agg = {
        "strategy": args.strategy,
        "n_examples": len(profiles),
        "n_eos_terminated": sum(p["eos_terminated"] for p in profiles),
        "mean_tokens_per_forward": round(
            float(np.mean([p["tokens_per_forward"] for p in eos_rows])), 4
        ),
        "mean_tokens_per_s": round(
            float(np.mean([p["tokens_per_s"] for p in eos_rows])), 2
        ),
        "total_tokens": int(sum(p["num_tokens"] for p in profiles)),
    }
    with open(os.path.join(args.output_dir, f"summary_{args.strategy}.json"), "w") as f:
        json.dump(agg, f, indent=2)
    print(json.dumps(agg))
    return agg, profiles


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="")
    p.add_argument("--dataset", default="")
    p.add_argument("--output-dir", default="bench_out")
    p.add_argument("--strategy", choices=["ar", "jacobi", "mr", "nongreedy"], default="jacobi")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--n-token-seq-len", type=int, default=64)
    p.add_argument("--max-blocks", type=int, default=2)
    p.add_argument("--spawn-ratio", type=float, default=0.85)
    p.add_argument("--lookahead-start-ratio", type=float, default=0.0)
    p.add_argument("--n-gram-pool-size", type=int, default=4)
    p.add_argument("--max-iterations", type=int, default=1024)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--synthetic-prompt-len", type=int, default=64)
    p.add_argument("--synthetic-vocab", type=int, default=256)
    return p


if __name__ == "__main__":
    from jacobiforcing_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    run(make_parser().parse_args())
