"""Non-greedy (rejection-sampling) Jacobi decoding tests.

Reference: inference_engine/tests/test_jacobi_decoding_nongreedy.py — per-position
token histograms of AR sampling vs Jacobi-RS compared with divergence metrics.
Here: total-variation distance self-calibrated against AR-vs-AR resampling
noise, plus exact determinism checks for degenerate shaping (top_k=1)."""

import numpy as np

from jacobiforcing_tpu.config import SamplingParams
from tests.test_engine import make_engine, make_prompts


def _run_samples(engine, prompt, n, sp, batch=64):
    toks = []
    for _ in range(n // batch):
        outs = engine.generate([list(prompt)] * batch, sp)
        toks.extend(o["token_ids"] for o in outs)
    return toks


def _tv(a, b, vocab=256):
    ha = np.bincount(a, minlength=vocab) / len(a)
    hb = np.bincount(b, minlength=vocab) / len(b)
    return 0.5 * np.abs(ha - hb).sum()


def test_nongreedy_topk1_equals_greedy():
    """top_k=1 collapses the target distribution to argmax: RS must reproduce
    greedy AR exactly."""
    prompts = make_prompts(256)[:2]
    greedy = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16)
    )
    rs = make_engine().generate(
        prompts,
        SamplingParams(
            temperature=1.0, top_k=1, max_tokens=16,
            decode_strategy="jacobi_nongreedy", jacobi_block_len=8,
            jacobi_max_blocks=1, jacobi_max_iterations=64,
        ),
    )
    for g, r in zip(greedy, rs):
        assert g["token_ids"] == r["token_ids"]


def test_nongreedy_distribution_matches_ar():
    """First-position marginal of Jacobi-RS must match AR sampling within
    resampling noise (delta-proposal RS is exactly distribution-preserving)."""
    prompt = make_prompts(256)[0]
    N = 512
    sp_ar = SamplingParams(temperature=1.0, max_tokens=3)
    sp_rs = SamplingParams(
        temperature=1.0, max_tokens=3, decode_strategy="jacobi_nongreedy",
        jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=64,
    )
    ar1 = _run_samples(make_engine(seed=0, num_pages=512), prompt, N, sp_ar)
    ar2 = _run_samples(make_engine(seed=1, num_pages=512), prompt, N, sp_ar)
    rs = _run_samples(make_engine(seed=2, num_pages=512), prompt, N, sp_rs)

    first_ar1 = [t[0] for t in ar1]
    first_ar2 = [t[0] for t in ar2]
    first_rs = [t[0] for t in rs]
    noise = _tv(first_ar1, first_ar2)
    dist = _tv(first_ar1, first_rs)
    # allow 2x the AR-vs-AR resampling noise plus slack
    assert dist < max(2.0 * noise, noise + 0.08), (dist, noise)


def test_nongreedy_progress_and_lengths():
    prompts = make_prompts(256)
    eng = make_engine()
    outs = eng.generate(
        prompts,
        SamplingParams(
            temperature=0.7, max_tokens=20, decode_strategy="jacobi_nongreedy",
            jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=128,
        ),
    )
    for o in outs:
        assert len(o["token_ids"]) == 20
    assert eng.stats["jacobi_iterations"] > 0
    # >= 1 token per iteration guaranteed by the RS commit rule
    assert eng.stats["generated_tokens"] >= eng.stats["jacobi_iterations"]


def test_nongreedy_large_vocab_chunked_path():
    """vocab > the argmax/logprob chunk size exercises the online-logsumexp
    scan paths end to end (the runner uses default chunk=32768)."""
    import jax
    from jacobiforcing_tpu.config import Config
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params

    mc = ModelConfig.tiny(vocab_size=40_000)
    params = init_params(mc, jax.random.PRNGKey(0))
    cfg = Config(kvcache_page_size=16, max_model_len=128, jacobi_chunk_tokens=16,
                 prefill_token_buckets=(32,), eos=-1)
    eng = LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=64)
    prompts = [[5, 7, 11, 13, 17]]
    # greedy jacobi == greedy AR through the chunked argmax
    ar = eng.generate(prompts, SamplingParams(temperature=0.0, max_tokens=10))
    ja = eng.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=10, decode_strategy="jacobi",
        jacobi_block_len=8, jacobi_max_blocks=1))
    assert ar[0]["token_ids"] == ja[0]["token_ids"]
    # nongreedy memory-light verify (chunked logprob) produces valid tokens
    rs = eng.generate(prompts, SamplingParams(
        temperature=1.0, max_tokens=10, decode_strategy="jacobi_nongreedy",
        jacobi_block_len=8, jacobi_max_blocks=1))
    assert len(rs[0]["token_ids"]) == 10
    assert all(0 <= t < 40_000 for t in rs[0]["token_ids"])
