"""Tier mix + cost of multiblock rejection-recycling on a REALISTIC run.

VERDICT r2 #4's residual: the MR full tier forwards S*N = (1+C+K-1)*N rows
per iteration (engine/multiblock.py), but no measured tier mix existed from a
run where acceptance dynamics are real.  This probe decodes the in-repo
TRAINED demo checkpoint (apps/train_tpf_demo.py) over its held-out prompts
with decode_strategy=jacobi_multiblock_rejection_recycling and reports:

  * the tier mix (full / no-candidate / RA-only iteration counts) from the
    engine's stats counters,
  * end-to-end MR wall time + TPF vs the same prompts through single-block
    Jacobi (same engine geometry),

so the full-tier cost is weighted by how often a trained model actually hits
it.  Reference protocol: multiblock + rejection recycling is the HF path of
/root/reference/JacobiForcing/jacobi_forcing_inference_*.py (single-sequence
there; batched here).

    python scripts/probe_mr_tiermix.py [n_prompts] [K] [C]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from jacobiforcing_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # JF_PLATFORM=cpu for smoke runs
    import jax.numpy as jnp

    from jacobiforcing_tpu.config import Config, SamplingParams
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine
    from jacobiforcing_tpu.utils.loader import load_checkpoint

    n_prompts = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    demo = None
    for cand in ("assets/tpf_demo_n32_v7", "assets/tpf_demo_n32_v6",
                 "assets/tpf_demo_n32_v2", "assets/tpf_demo"):
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), cand)
        if os.path.isdir(d) and os.path.isfile(os.path.join(d, "tpf_demo.json")):
            demo = d
            break
    assert demo, "no demo checkpoint; run apps/train_tpf_demo.py"
    with open(os.path.join(demo, "tpf_demo.json")) as f:
        meta = json.load(f)
    N = int(meta.get("block_len", 32))
    mc, params = load_checkpoint(demo, dtype=jnp.float32)
    with open(os.path.join(demo, "heldout_prompts.jsonl")) as f:
        prompts = [json.loads(l)["prompt_ids"] for l in f][:n_prompts]

    rounds = int(os.environ.get("JF_TIERMIX_ROUNDS", "1"))

    TIER_KEYS = ("mr_full", "mr_nocand", "mr_ra_only", "mr_single")

    def run(strategy, mr_auto=False, force_arm=None, **sp_kw):
        if force_arm is not None:
            os.environ["JF_MR_FORCE_ARM"] = str(force_arm)
        else:
            os.environ.pop("JF_MR_FORCE_ARM", None)
        eng = LLMEngine(
            Config(kvcache_page_size=16, max_model_len=512,
                   jacobi_chunk_tokens=2 * N, eos=int(meta.get("eos", -1)),
                   prefill_token_buckets=(32, 64, 128, 256, 512),
                   batch_buckets=(min(8, n_prompts),),
                   max_num_seqs=min(8, n_prompts),
                   # raw MR by default so the tier mix measures the state
                   # machine, not the policy; mr_auto=True measures the
                   # shipping default on the same workload
                   jacobi_mr_auto_policy=mr_auto or force_arm is not None),
            model_cfg=mc, params=params, num_kv_pages=4096,
        )
        sp = SamplingParams(
            temperature=0.0, max_tokens=96, decode_strategy=strategy,
            jacobi_block_len=N, **sp_kw,
        )
        eng.generate(prompts[:2], sp, use_tqdm=False)  # warmup compiles
        # JF_TIERMIX_ROUNDS>1: repeated batches through ONE engine so the
        # auto-policy reaches its locked/backoff steady state; the reported
        # numbers are from the LAST round (long-lived serving regime)
        per_round = []
        for r in range(rounds):
            stats0 = dict(eng.stats)
            t0 = time.perf_counter()
            outs = eng.generate(prompts, sp, use_tqdm=False)
            dt = time.perf_counter() - t0
            per_round.append(round(
                sum(len(o["token_ids"]) for o in outs) / dt, 1))
        d = {k: eng.stats.get(k, 0) - stats0.get(k, 0)
             for k in ("jacobi_iterations", "generated_tokens") + TIER_KEYS}
        toks = sum(len(o["token_ids"]) for o in outs)
        os.environ.pop("JF_MR_FORCE_ARM", None)
        res = {
            "wall_s": round(dt, 3),
            "tokens": toks,
            "iters": d["jacobi_iterations"],
            "tpf": round(toks / max(d["jacobi_iterations"], 1), 3),
            "tok_per_s": round(toks / dt, 1),
            "ms_per_iter": round(1e3 * dt / max(d["jacobi_iterations"], 1), 3),
            "tiers": {k: d[k] for k in TIER_KEYS},
            "tok_per_s_rounds": per_round,
        }
        if mr_auto:
            res["policy"] = eng.mr_policy_snapshot()
        return res

    mr_kw = dict(jacobi_max_blocks=K, jacobi_n_gram_pool_size=C)
    single = run("jacobi", jacobi_max_blocks=3)
    mr = run("jacobi_multiblock_rejection_recycling", **mr_kw)
    # per-arm forced runs: the round-5 attribution of WHY the RA-only arm
    # cannot reach single-block (fixed MR glue + block-boundary cold drafts)
    # and proof the fourth arm does (same program, handed-off state)
    mr_ra = run("jacobi_multiblock_rejection_recycling", force_arm=2, **mr_kw)
    mr_sg = run("jacobi_multiblock_rejection_recycling", force_arm=3, **mr_kw)
    mr_auto = run("jacobi_multiblock_rejection_recycling", mr_auto=True, **mr_kw)
    tot = max(sum(mr["tiers"].values()), 1)
    out = {
        "probe": "mr_tiermix_trained_demo",
        "checkpoint": os.path.basename(demo),
        "N": N, "K": K, "C": C, "prompts": len(prompts),
        "single_block": single,
        "mr": mr,
        "mr_forced_ra_only": mr_ra,
        "mr_forced_single": mr_sg,
        "mr_auto_policy": mr_auto,
        "tier_mix_pct": {k: round(100.0 * v / tot, 1)
                         for k, v in mr["tiers"].items()},
        "mr_iter_cost_vs_single_x": round(
            mr["ms_per_iter"] / max(single["ms_per_iter"], 1e-9), 3),
        "mr_vs_single_tok_per_s_x": round(
            mr["tok_per_s"] / max(single["tok_per_s"], 1e-9), 3),
        "mr_ra_only_vs_single_tok_per_s_x": round(
            mr_ra["tok_per_s"] / max(single["tok_per_s"], 1e-9), 3),
        "mr_forced_single_vs_single_tok_per_s_x": round(
            mr_sg["tok_per_s"] / max(single["tok_per_s"], 1e-9), 3),
        "mr_auto_vs_single_tok_per_s_x": round(
            mr_auto["tok_per_s"] / max(single["tok_per_s"], 1e-9), 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
