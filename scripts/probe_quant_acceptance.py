"""Quantization vs acceptance on the TRAINED demo checkpoint (VERDICT r3 #7).

The W8A8 quality story previously rested on random-weight logit
perturbations (NOTES round 3); this probe ties quantization to the one
trained artifact in the repo: it runs the demo checkpoint
(v7 by default) through the real engine + eval harness at f32,
int8 weight-only, and W8A8, and reports

  * aggregate + mean tokens-per-forward per variant (acceptance),
  * TASK accuracy against the deterministic ground truth (positional
    token accuracy + exact-solution rate; on the round-5 countdown task
    the ground truth is phase-unambiguous and EOS-terminated, so these
    are meaningful accuracy numbers, unlike the phase-aliased cyclic
    task where strict positional accuracy collapsed on shifted rows),
  * token-exact-match vs the f32 generations (exact-match rate over
    held-out prompts + mean common-prefix fraction),

i.e. exactly the acceptance/quality axes of the reference's README table
(reference README.md:253-270 couples TPF to task accuracy).

Usage: python scripts/probe_quant_acceptance.py [demo_dir]  (runs on the
ambient backend — the real chip under axon).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(demo_dir: str, quantization: str | None):
    import jax.numpy as jnp

    from jacobiforcing_tpu.apps import bench_generate
    from jacobiforcing_tpu.config import Config
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine
    from jacobiforcing_tpu.utils.loader import load_checkpoint

    with open(os.path.join(demo_dir, "tpf_demo.json")) as f:
        meta = json.load(f)
    N = int(meta.get("block_len", 16))
    mc, params = load_checkpoint(demo_dir, dtype=jnp.float32)
    eng = LLMEngine(
        Config(kvcache_page_size=16, max_model_len=512, jacobi_chunk_tokens=64,
               eos=int(meta.get("eos", -1)),
               prefill_token_buckets=(32, 64, 128, 256, 512),
               quantization=quantization or ""),
        model_cfg=mc, params=params, num_kv_pages=1024,
    )
    args = bench_generate.make_parser().parse_args([])
    args.strategy = "jacobi"
    args.n_token_seq_len = N
    args.max_blocks = 1
    args.max_new_tokens = int(meta.get("max_tokens", 64))
    args.max_iterations = 1 << 20
    args.dataset = os.path.join(demo_dir, "heldout_prompts.jsonl")
    args.output_dir = tempfile.mkdtemp(prefix=f"jf_quant_{quantization or 'f32'}_")
    agg, profiles = bench_generate.run(args, engine=eng, tokenizer=None)
    gens = []
    with open(os.path.join(args.output_dir, "generations_jacobi.jsonl")) as f:
        for line in f:
            gens.append(json.loads(line)["token_ids"])
    eng.exit()
    return meta, agg, profiles, gens


def prefix_frac(a, b):
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i / max(len(a), len(b), 1)


def task_truth(p, task, max_len):
    """Deterministic ground-truth continuation for a demo prompt."""
    if task == "countdown":
        from jacobiforcing_tpu.apps.train_tpf_demo import CD_BASE, EOS_ID

        m = p[0] - CD_BASE
        body = list(p[1:])
        seq = []
        for k in range(m - 1, 0, -1):
            seq.append(CD_BASE + k)
            seq.extend(body)
        seq.append(EOS_ID)
        return seq
    return [p[i % len(p)] for i in range(max_len)]


def task_accuracy(prompts, gens, task):
    """TASK accuracy: positional token accuracy against the deterministic
    ground truth plus the exact-solution rate (generation == truth verbatim,
    incl. the EOS on the countdown task) — the analog of the reference's
    HumanEval/GSM8K accuracy column coupled to TPF (README.md:253-270)."""
    fr, exact = [], []
    for p, g in zip(prompts, gens):
        truth = task_truth(p, task, len(g))
        n = min(len(g), len(truth))
        fr.append(
            float(np.mean([a == b for a, b in zip(g[:n], truth[:n])]))
            if n else 0.0
        )
        exact.append(list(g) == list(truth))
    return round(float(np.mean(fr)), 4), round(float(np.mean(exact)), 4)


def main():
    demo_dir = sys.argv[1] if len(sys.argv) > 1 else "assets/tpf_demo_n32_v7"
    with open(os.path.join(demo_dir, "heldout_prompts.jsonl")) as f:
        prompts = [json.loads(l)["prompt_ids"] for l in f]
    out = {}
    base_gens = None
    for q in (None, "int8", "w8a8"):
        name = q or "f32"
        meta, agg, profiles, gens = run_variant(demo_dir, q)
        acc, solved = task_accuracy(
            prompts, gens, meta.get("task", "cyclic"))
        row = {
            "aggregate_tpf": agg["aggregate_tokens_per_forward"],
            "mean_tpf": agg["mean_tokens_per_forward"],
            "task_accuracy": acc,
            "exact_solution_rate": solved,
            "n_eos_terminated": agg.get("n_eos_terminated", 0),
            "n": agg["n_examples"],
        }
        if base_gens is None:
            base_gens = gens
        else:
            fr = [prefix_frac(a, b) for a, b in zip(base_gens, gens)]
            row["exact_match_rate_vs_f32"] = round(
                float(np.mean([a == b for a, b in zip(base_gens, gens)])), 4
            )
            row["mean_prefix_frac_vs_f32"] = round(float(np.mean(fr)), 4)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
