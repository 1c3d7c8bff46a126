"""Nongreedy (rejection-sampling) Jacobi acceptance on the TRAINED demo
checkpoint (VERDICT r4 #7).

The round-4 engine grid measured nongreedy rows only on random weights
(TPF ~1, so the @TPF4 extrapolation had no measured acceptance companion).
This probe runs the trained demo checkpoint through `jacobi_nongreedy` at
temperature 0.7 on its held-out prompts and reports:

  * aggregate TPF (total committed tokens / total iterations) + committed
    tok/s — the measured acceptance companion for the nongreedy strategy;
  * the same prompts through greedy single-block Jacobi and through AR
    sampling at the same temperature (the speedup reference);
  * a TV-distance spot check of the first-token marginal vs AR sampling at
    the same temperature, calibrated against AR-vs-AR resampling noise
    (the reference's distribution-preservation criterion,
    inference_engine/tests/test_jacobi_decoding_nongreedy.py:90-160).

    python scripts/probe_nongreedy_trained.py [n_prompts] [temperature]
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

    n_prompts = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    temp = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    demo = None
    for cand in ("assets/tpf_demo_n32_v7", "assets/tpf_demo_n32_v6",
                 "assets/tpf_demo_n32_v2", "assets/tpf_demo"):
        d = os.path.join(root, cand)
        if all(os.path.isfile(os.path.join(d, f))
               for f in ("tpf_demo.json", "config.json")):
            demo = d
            break
    assert demo, "no demo checkpoint; run apps/train_tpf_demo.py"
    with open(os.path.join(demo, "tpf_demo.json")) as f:
        meta = json.load(f)
    N = int(meta.get("block_len", 32))
    eos = int(meta.get("eos", -1))
    max_tokens = int(meta.get("max_tokens", 96))
    mc, params = load_checkpoint(demo, dtype=jnp.float32)
    with open(os.path.join(demo, "heldout_prompts.jsonl")) as f:
        prompts = [json.loads(l)["prompt_ids"] for l in f][:n_prompts]

    def engine():
        return LLMEngine(
            Config(kvcache_page_size=16, max_model_len=512,
                   jacobi_chunk_tokens=2 * N, eos=eos,
                   prefill_token_buckets=(32, 64, 128, 256, 512),
                   batch_buckets=(min(8, n_prompts),),
                   max_num_seqs=min(8, n_prompts)),
            model_cfg=mc, params=params, num_kv_pages=4096,
        )

    def run(sp):
        eng = engine()
        eng.generate(prompts[:2], sp, use_tqdm=False)  # warmup compiles
        stats0 = dict(eng.stats)
        t0 = time.perf_counter()
        outs = eng.generate(prompts, sp, use_tqdm=False)
        dt = time.perf_counter() - t0
        iters = eng.stats["jacobi_iterations"] - stats0.get("jacobi_iterations", 0)
        toks = sum(len(o["token_ids"]) for o in outs)
        n_eos = sum(
            1 for o in outs
            if eos >= 0 and o["token_ids"] and o["token_ids"][-1] == eos
        )
        return {
            "wall_s": round(dt, 3),
            "tokens": toks,
            "iters": int(iters),
            "tpf": round(toks / max(iters, 1), 3),
            "tok_per_s": round(toks / dt, 1),
            "n_eos_terminated": n_eos,
        }

    nongreedy = run(SamplingParams(
        temperature=temp, max_tokens=max_tokens,
        decode_strategy="jacobi_nongreedy", jacobi_block_len=N,
        jacobi_max_iterations=1 << 20,
    ))
    greedy = run(SamplingParams(
        temperature=0.0, max_tokens=max_tokens, decode_strategy="jacobi",
        jacobi_block_len=N, jacobi_max_iterations=1 << 20,
    ))
    ar = run(SamplingParams(temperature=temp, max_tokens=max_tokens))
    ar["tpf"] = 1.0

    # ---- TV spot check: first-token marginal at the probe temperature ----
    n_samp = int(os.environ.get("JF_NG_TV_SAMPLES", "256"))
    batch = min(64, n_samp)

    def first_tokens(sp, seed):
        eng = LLMEngine(
            Config(kvcache_page_size=16, max_model_len=512,
                   jacobi_chunk_tokens=2 * N, eos=-1, seed=seed,
                   prefill_token_buckets=(32, 64, 128, 256, 512)),
            model_cfg=mc, params=params, num_kv_pages=4096,
        )
        toks = []
        for _ in range(n_samp // batch):
            outs = eng.generate([list(prompts[0])] * batch, sp, use_tqdm=False)
            toks.extend(o["token_ids"][0] for o in outs if o["token_ids"])
        return toks

    def tv(a, b):
        ha = np.bincount(a, minlength=mc.vocab_size) / len(a)
        hb = np.bincount(b, minlength=mc.vocab_size) / len(b)
        return 0.5 * float(np.abs(ha - hb).sum())

    sp_ar = SamplingParams(temperature=temp, max_tokens=3)
    sp_ng = SamplingParams(
        temperature=temp, max_tokens=3, decode_strategy="jacobi_nongreedy",
        jacobi_block_len=N, jacobi_max_iterations=256,
    )
    ar1 = first_tokens(sp_ar, seed=0)
    ar2 = first_tokens(sp_ar, seed=1)
    ng1 = first_tokens(sp_ng, seed=2)
    tv_noise = round(tv(ar1, ar2), 4)
    tv_ng = round(tv(ar1, ng1), 4)

    out = {
        "probe": "nongreedy_trained_demo",
        "checkpoint": os.path.basename(demo),
        "N": N, "temperature": temp, "prompts": len(prompts),
        "max_tokens": max_tokens,
        "nongreedy": nongreedy,
        "greedy_single_block": greedy,
        "ar_sampling": ar,
        "nongreedy_vs_ar_speedup_x": round(
            nongreedy["tok_per_s"] / max(ar["tok_per_s"], 1e-9), 3),
        "tv_first_token_ar_vs_nongreedy": tv_ng,
        "tv_first_token_ar_vs_ar_noise": tv_noise,
        "tv_samples": n_samp,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
